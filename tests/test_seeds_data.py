"""S3: the reference's actual seed corpus (data.go:110-474) shipped as
data/seeds.parquet — provenance, contract schema, and engine smoke."""

import os

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEEDS = os.path.join(REPO, "data", "seeds.parquet")
REF_DATA_GO = "/root/reference/internal/crawler/data.go"


def test_seeds_parquet_matches_reference_source():
    """The shipped parquet is exactly what gen_seeds.py parses out of the
    reference's Go map literal (source order, quotes unescaped)."""
    import pyarrow.parquet as pq

    import sys
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from gen_seeds import parse_seeds

    if not os.path.exists(REF_DATA_GO):
        pytest.skip("reference checkout not present")
    rows = parse_seeds(REF_DATA_GO)
    table = pq.read_table(SEEDS).to_pylist()
    assert len(rows) == len(table) == 116
    for (order, url, desc), got in zip(rows, table):
        assert got == {"seed_order": order, "url": url, "description": desc}
    assert all(r["description"] for r in table)


def test_engine_runs_from_reference_seeds(spark):
    """The crawl engine seeded from the real corpus: every seed URL is
    absent from the (synthetic) pages table → all 116 are fetch-miss leaves
    recorded at depth 0 in seed order."""
    from geospatial_web_scraper_spark import corpus
    from geospatial_web_scraper_spark.plans.bfs import CrawlEngine

    seeds = spark.read.parquet(SEEDS)
    assert dict(seeds.dtypes) == {
        "seed_order": "int", "url": "string", "description": "string"
    }
    eng = CrawlEngine(
        spark, corpus.corpus_df(spark, 50), max_crawl=None, lineage_detail=False
    )
    run = eng.run(seeds)
    trace = run.trace.orderBy("seq").collect()
    assert len(trace) == 116
    want = [r["url"] for r in seeds.orderBy("seed_order").collect()]
    assert [r["url"] for r in trace] == want
    assert all(r["depth"] == 0 for r in trace)
