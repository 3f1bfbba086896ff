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
