"""Sharded Bloom seen-filter: zero false negatives, bounded FPP, and
engine-equivalence when enabled."""

import pytest
from pyspark.sql import functions as F

from geospatial_web_scraper_spark import corpus
from geospatial_web_scraper_spark.operators.seen import ShardedBloomSeenFilter
from geospatial_web_scraper_spark.plans.bfs import CrawlEngine

N = 120


def test_power_of_two_enforced(spark):
    with pytest.raises(ValueError):
        ShardedBloomSeenFilter(spark, n_shards=12)


def test_no_false_negatives_and_low_fpp(spark):
    f = ShardedBloomSeenFilter(spark, n_shards=8, bits_per_shard=1 << 16, n_hashes=5)
    seen = spark.range(0, 2000).select(
        F.concat(F.lit("https://h.org/a/"), F.col("id")).alias("url")
    )
    f.update(seen)
    # every seen url must be flagged maybe-seen (no false negatives)
    new_df, maybe_df = f.split(seen)
    assert new_df.count() == 0
    assert maybe_df.count() == 2000
    # fresh urls: false-positive rate stays near the theoretical estimate
    fresh = spark.range(0, 2000).select(
        F.concat(F.lit("https://h.org/b/"), F.col("id")).alias("url")
    )
    new2, maybe2 = f.split(fresh)
    fp = maybe2.count()
    assert new2.count() + fp == 2000
    assert fp / 2000 <= max(5 * f.est_fpp(), 0.02), (fp, f.est_fpp())


def test_engine_with_bloom_matches_engine_without(spark):
    pages = corpus.corpus_df(spark, N)
    seeds = corpus.seeds_df(spark, N)
    plain = CrawlEngine(spark, pages, max_crawl=400).run(seeds)
    bloom = CrawlEngine(
        spark,
        pages,
        max_crawl=400,
        seen_filter=ShardedBloomSeenFilter(spark, n_shards=8, bits_per_shard=1 << 16),
    ).run(seeds)
    a = [tuple(r) for r in plain.trace.orderBy("seq").collect()]
    b = [tuple(r) for r in bloom.trace.orderBy("seq").collect()]
    assert a == b


def test_split_probe_cache_is_single_round(spark):
    """split() persists its probe so the double filter evaluates the UDF
    once — but the cache must be bounded to ONE round: the next split()
    releases the previous probe, and release() (called by the engine at
    crawl end) clears the last one. Before r4 a long crawl accumulated one
    cached DataFrame per round."""
    f = ShardedBloomSeenFilter(spark, n_shards=4, bits_per_shard=1 << 12)
    df = spark.createDataFrame(
        [(f"https://h.org/p{i}",) for i in range(10)], "url string"
    )
    new1, maybe1 = f.split(df)
    assert new1.count() + maybe1.count() == 10  # materialize the probe
    p1 = f._probed
    assert p1 is not None and p1.is_cached
    f.split(df)
    assert not p1.is_cached, "previous round's probe cache not released"
    assert f._probed is not None and f._probed.is_cached
    f.release()
    assert f._probed is None
