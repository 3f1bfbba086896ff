"""Anchor-text aggregation (operators/anchors.py): extraction alignment,
the scheme resolution contract, and the index aggregate."""

from pyspark.sql import functions as F  # noqa: F401

from geospatial_web_scraper_spark.operators.anchors import (
    anchor_pairs,
    anchor_text_index,
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in rows], "url string, html binary"
    )


def test_resolution_contract(spark):
    html = (
        '<a href="https://other.org/x">abs</a>'
        '<a href="/rel/path.html">rootrel</a>'
        '<a href="mailto:a@b.c">mail</a>'
        '<a href="tel:+1555">call</a>'
        '<a href="page.html">pathrel-dropped</a>'
        '<a href="//proto.org/y">protorel-dropped</a>'
        '<a href="http://plain.org/z">plainhttp</a>'
    )
    got = {
        r["anchor_text"]: (r["pos"], r["target_url"])
        for r in anchor_pairs(
            _pages(spark, [("https://src.org/p", html)])
        ).collect()
    }
    assert got == {
        "abs": (0, "https://other.org/x"),
        "rootrel": (1, "https://src.org/rel/path.html"),
        "plainhttp": (6, "http://plain.org/z"),
    }


def test_index_counts_and_boilerplate_collapse(spark):
    rows = [
        (f"https://s{i}.org/p", '<a href="https://hub.org/">home</a>'
         '<a href="https://hub.org/">start</a>')
        for i in range(3)
    ]
    idx = {
        (r["url"], r["anchor_text"]): r["n_refs"]
        for r in anchor_text_index(anchor_pairs(_pages(spark, rows))).collect()
    }
    assert idx == {
        ("https://hub.org/", "home"): 3,
        ("https://hub.org/", "start"): 3,
    }
