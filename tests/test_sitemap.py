"""Sitemap ingestion (sources/sitemap.py): two-form body parity, loc
extraction goldens, and the crawl-ready seed flow end-to-end."""

import duckdb
from pyspark.sql import functions as F

from geospatial_web_scraper_spark import corpus
from geospatial_web_scraper_spark.plans.bfs import CrawlEngine
from geospatial_web_scraper_spark.sources.sitemap import (
    sitemap_locs_expr,
    sitemap_seeds,
)


def test_sitemap_bodies_two_form_parity():
    con = duckdb.connect()
    sql_bodies = dict(
        con.execute(
            f"WITH {corpus.sitemap_sql_bodies()} SELECT h, xml FROM smbodies"
        ).fetchall()
    )
    for h in range(corpus.N_HOSTS):
        assert sql_bodies[h] == corpus.sitemap_xml_of_host(h), h


def test_sitemap_locs_golden(spark):
    df = spark.createDataFrame(
        [
            (0, "<urlset><url><loc> https://a/x </loc></url>"
                "<url><loc>https://a/y</loc></url></urlset>"),
            (1, "<sitemapindex><sitemap><loc>https://b/s.xml</loc>"
                "</sitemap></sitemapindex>"),
            (2, "<urlset></urlset>"),        # no locs -> empty array
            (3, "<loc></loc>"),              # empty loc survives as ""
        ],
        "i long, xml string",
    )
    got = {
        r["i"]: r["locs"]
        for r in df.select(
            "i", sitemap_locs_expr(F.col("xml")).alias("locs")
        ).collect()
    }
    assert got[0] == ["https://a/x", "https://a/y"]  # padding trimmed
    assert got[1] == ["https://b/s.xml"]             # index locs extracted too
    assert got[2] == []
    assert got[3] == [""]


def test_sitemap_seed_flow_end_to_end(spark):
    """sitemap cache -> seeds -> crawl: first-wins dedup across hosts,
    (host, pos) global order, and the seed list actually drives the
    engine (same trace as handing the engine the equivalent literal
    seeds)."""
    sm = spark.createDataFrame(
        [
            ("host1.example.org",
             "<urlset><url><loc>https://host1.example.org/page/26.html</loc></url>"
             "<url><loc> https://host2.example.org/page/49.html </loc></url>"
             "<url><loc>https://host1.example.org/page/26.html</loc></url>"
             "</urlset>"),
            ("host2.example.org",
             "<urlset><url><loc>https://host2.example.org/page/49.html</loc></url>"
             "<url><loc>https://host2.example.org/page/3.html</loc></url>"
             "</urlset>"),
        ],
        "host string, xml string",
    )
    seeds = sitemap_seeds(sm)
    got = [
        (r["seed_order"], r["url"]) for r in seeds.orderBy("seed_order").collect()
    ]
    # host1's doc order first (dup loc deduped first-wins), then host2's
    # remaining new url
    assert got == [
        (0, "https://host1.example.org/page/26.html"),
        (1, "https://host2.example.org/page/49.html"),
        (2, "https://host2.example.org/page/3.html"),
    ]

    pages = corpus.corpus_df(spark, 60)
    run_a = CrawlEngine(spark, pages, max_crawl=None, lineage_detail=False).run(
        seeds
    )
    run_b = CrawlEngine(spark, pages, max_crawl=None, lineage_detail=False).run(
        spark.createDataFrame(got, "seed_order int, url string")
    )
    a = [tuple(r) for r in run_a.trace.orderBy("seq").collect()]
    b = [tuple(r) for r in run_b.trace.orderBy("seq").collect()]
    assert a == b and len(a) > 0


def test_multi_doc_host_seed_order_deterministic(spark):
    # a host contributing TWO sitemap documents (the sitemapindex child
    # expansion) must yield a seed order that is a pure function of the
    # cache contents — the md5 doc key breaks the (host, pos) tie that
    # would otherwise fall to physical row order (r4 review finding).
    import hashlib

    doc_a = "<urlset><url><loc>https://h1/x</loc></url></urlset>"
    doc_b = "<urlset><url><loc>https://h1/y</loc></url></urlset>"
    expect_first = (
        "https://h1/x"
        if hashlib.md5(doc_a.encode()).hexdigest()
        < hashlib.md5(doc_b.encode()).hexdigest()
        else "https://h1/y"
    )
    for rows in ([("host1", doc_a), ("host1", doc_b)],
                 [("host1", doc_b), ("host1", doc_a)]):
        got = [
            r["url"]
            for r in sitemap_seeds(
                spark.createDataFrame(rows, "host string, xml string")
                .repartition(2)
            ).orderBy("seed_order").collect()
        ]
        assert got[0] == expect_first
        assert set(got) == {"https://h1/x", "https://h1/y"}


def test_robots_sitemap_directive_extraction(spark):
    """Sitemap: directives in robots.txt: file-global, case-insensitive,
    whitespace-padded, comment-terminated; field-name near-misses and
    commented-out lines never match; \r\n bodies work (\r is \\s, so it
    terminates the value, never joins it)."""
    from geospatial_web_scraper_spark.sources.sitemap import (
        robots_sitemap_urls_expr,
    )

    bodies = [
        (
            "a",
            "User-agent: *\nDisallow: /x\n"
            "Sitemap: https://a.example.org/s.xml\n"
            "  sitemap: https://a.example.org/i.xml  # index\n"
            "SITEMAP:https://a.example.org/u.xml\n"
            "sitemapX: https://a.example.org/no.xml\n"
            "#Sitemap: https://a.example.org/commented.xml\n"
            "x Sitemap: https://a.example.org/midline.xml",
        ),
        ("b", "User-agent: *\r\nSitemap: https://b.example.org/s.xml\r\n"),
        ("c", "User-agent: *\nDisallow: /"),
    ]
    df = spark.createDataFrame(bodies, "host string, robots_txt string")
    got = {
        r["host"]: r["urls"]
        for r in df.select(
            "host",
            robots_sitemap_urls_expr(F.col("robots_txt")).alias("urls"),
        ).collect()
    }
    assert got["a"] == [
        "https://a.example.org/s.xml",
        "https://a.example.org/i.xml",
        "https://a.example.org/u.xml",
    ]
    assert got["b"] == ["https://b.example.org/s.xml"]
    assert got["c"] == []
