"""Engine #2 (harvest) semantics: T2 quirk, Extract2 routing, and the
reference's own golden-server fixtures re-expressed (crawler2_test.go)."""

from pyspark.sql import functions as F

from geospatial_web_scraper_spark import corpus
from geospatial_web_scraper_spark.plans.harvest import (
    harvest,
    pseudo_embedding_expr,
    rank_seeds,
)

N = 300
Q = "geospatial dataset download"


def test_pseudo_embedding_deterministic(spark):
    df = spark.createDataFrame([("abc",), ("abc",), ("xyz",)], "t string")
    rows = [r["v"] for r in df.select(pseudo_embedding_expr(F.col("t")).alias("v")).collect()]
    assert rows[0] == rows[1] != rows[2]
    assert len(rows[0]) == 8 and all(0 <= x <= 1 for x in rows[0])


def test_t2_quirk_drops_best(spark):
    seeds = corpus.seeds_df(spark, N, k=13)
    quirked = rank_seeds(seeds, Q, top_k=10, quirk_compat=True)
    straight = rank_seeds(seeds, Q, top_k=10, quirk_compat=False)
    q_urls = {r["url"] for r in quirked.collect()}
    s_urls = {r["url"] for r in straight.collect()}
    best = straight.orderBy(F.desc("score"), F.asc("url")).first()["url"]
    assert best in s_urls and best not in q_urls
    assert len(q_urls) == 10 and len(s_urls) == 10


def test_rank_seeds_external_embeddings_match_default(spark):
    """The emb_col/query_vec path (the RPC production route) ranks
    identically when fed the same vectors the default path derives."""
    import hashlib

    seeds = corpus.seeds_df(spark, N, k=13)
    with_emb = seeds.withColumn(
        "embedding", pseudo_embedding_expr(F.col("description"))
    )
    qv = [
        int(hashlib.md5(f"{Q}:{d}".encode()).hexdigest()[:4], 16) / 65535.0
        for d in range(8)
    ]
    ext = rank_seeds(with_emb, Q, top_k=10, emb_col="embedding", query_vec=qv)
    dflt = rank_seeds(seeds, Q, top_k=10)
    assert sorted(r["url"] for r in ext.collect()) == sorted(
        r["url"] for r in dflt.collect()
    )


def test_harvest_depth1_only_and_routing(spark):
    """Harvested links come only from the selected seeds' own pages
    (depth-1: links are collected, never followed — crawler2.go:145,174);
    non-HTML/non-200 seeds contribute nothing."""
    pages = corpus.corpus_df(spark, N)
    out = harvest(spark, pages, corpus.seeds_df(spark, N, k=13), Q)
    rows = out.collect()
    assert rows
    sel = {r["url"] for r in rank_seeds(corpus.seeds_df(spark, N, k=13), Q).collect()}
    assert {r["seed_url"] for r in rows} <= sel
    # every harvested link is a direct out-edge of its seed page (formula)
    pd_pages = corpus.pages_dict(N)
    for r in rows:
        i = pd_pages[r["seed_url"]]["page_id"]
        expected = {u for u, _ in corpus.edges_of(i, N)}
        assert r["url"] in expected


def test_one_zip_fixture_via_harvest(spark):
    """crawler2_test.go:45-67: a selected page with one '/file.zip' anchor →
    harvest = that absolute zip URL, classified geo."""
    pages = spark.createDataFrame(
        [
            (
                "https://h.org/page.html",
                bytearray(b"<html><body><a href='/file.zip'>d</a></body></html>"),
                200,
                "text/html",
            ),
            (  # terminal-download seed → nothing harvested (crawler2.go:156-163)
                "https://h.org/direct.zip",
                bytearray(b""),
                200,
                "application/zip",
            ),
        ],
        "url string, html binary, status int, content_type string",
    )
    seeds = spark.createDataFrame(
        [(0, "https://h.org/page.html", "page about zips"),
         (1, "https://h.org/direct.zip", "a direct zip")],
        "seed_order int, url string, description string",
    )
    out = harvest(spark, pages, seeds, "zips", top_k=2, quirk_compat=False)
    rows = [(r["seed_url"], r["url"], r["is_geo"]) for r in out.collect()]
    assert rows == [("https://h.org/page.html", "https://h.org/file.zip", True)]
