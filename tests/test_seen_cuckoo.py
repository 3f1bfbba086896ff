"""Sharded cuckoo seen-filter: zero false negatives, delete support
(the capability the bloom lacks), stash overflow path, and engine
equivalence when enabled."""

import pytest
from pyspark.sql import functions as F

from geospatial_web_scraper_spark import corpus
from geospatial_web_scraper_spark.operators.seen import ShardedCuckooSeenFilter
from geospatial_web_scraper_spark.plans.bfs import CrawlEngine

N = 120


def _urls(spark, prefix, n):
    return spark.range(0, n).select(
        F.concat(F.lit(f"https://h.org/{prefix}/"), F.col("id")).alias("url")
    )


def test_power_of_two_enforced(spark):
    with pytest.raises(ValueError):
        ShardedCuckooSeenFilter(spark, n_shards=12)
    with pytest.raises(ValueError):
        ShardedCuckooSeenFilter(spark, n_shards=8, buckets_per_shard=100)


def test_no_false_negatives_and_low_fp(spark):
    f = ShardedCuckooSeenFilter(spark, n_shards=8, buckets_per_shard=1 << 10)
    seen = _urls(spark, "a", 2000)
    f.update(seen)
    new_df, maybe_df = f.split(seen)
    assert new_df.count() == 0  # no false negatives
    assert maybe_df.count() == 2000
    fresh = _urls(spark, "b", 2000)
    new2, maybe2 = f.split(fresh)
    fp = maybe2.count()
    assert new2.count() + fp == 2000
    # 16-bit fingerprints over 2 buckets x 4 slots: fp rate ~ 8/2^16
    assert fp / 2000 <= 0.01, fp


def test_delete_restores_crawlability(spark):
    f = ShardedCuckooSeenFilter(spark, n_shards=4, buckets_per_shard=1 << 10)
    a, b = _urls(spark, "keep", 1000), _urls(spark, "expire", 1000)
    f.update(a)
    f.update(b)
    f.delete(b)
    # every still-inserted key must remain maybe-seen (FN-free after delete)
    new_a, maybe_a = f.split(a)
    assert new_a.count() == 0
    assert maybe_a.count() == 1000
    # deleted keys become definitely-new again (minus bounded collisions)
    new_b, maybe_b = f.split(b)
    assert maybe_b.count() / 1000 <= 0.01, maybe_b.count()
    assert new_b.count() + maybe_b.count() == 1000


def test_delete_unknown_key_raises(spark):
    f = ShardedCuckooSeenFilter(spark, n_shards=4, buckets_per_shard=1 << 10)
    f.update(_urls(spark, "a", 10))
    with pytest.raises(Exception) as e:
        f.delete(_urls(spark, "never-inserted", 10))
    assert "never inserted" in str(e.value)


def test_stash_overflow_keeps_fn_free(spark):
    # 1 shard x 8 buckets x 4 slots = 32 table slots; 200 keys force heavy
    # eviction and a populated stash — membership must still be exact
    f = ShardedCuckooSeenFilter(spark, n_shards=1, buckets_per_shard=8)
    seen = _urls(spark, "s", 200)
    f.update(seen)
    assert f.stash_size() > 0
    new_df, maybe_df = f.split(seen)
    assert new_df.count() == 0
    assert maybe_df.count() == 200
    # deletes must also reach the stash
    f.delete(seen)
    assert f.stash_size() == 0
    assert f.occupancy() == 0.0


def test_engine_with_cuckoo_matches_engine_without(spark):
    pages = corpus.corpus_df(spark, N)
    seeds = corpus.seeds_df(spark, N)
    plain = CrawlEngine(spark, pages, max_crawl=400).run(seeds)
    cuckoo = CrawlEngine(
        spark,
        pages,
        max_crawl=400,
        seen_filter=ShardedCuckooSeenFilter(spark, n_shards=8, buckets_per_shard=1 << 10),
    ).run(seeds)
    a = [tuple(r) for r in plain.trace.orderBy("seq").collect()]
    b = [tuple(r) for r in cuckoo.trace.orderBy("seq").collect()]
    assert a == b


def test_recrawl_with_maintained_cuckoo_matches_exact(spark):
    """The TTL-expiry flow the deletable cuckoo exists for, end-to-end:
    crawl → delete the expired slice from the filter (NOT a rebuild) →
    run_with_seen(update_filter=False). The incrementally-maintained
    filter must yield the exact same recrawl trace as the filterless
    engine — i.e. delete restores crawlability for exactly the expired
    URLs while every surviving key stays routed through the anti-join."""
    from geospatial_web_scraper_spark.functions.ordering import with_global_seq

    pages = corpus.corpus_df(spark, N)
    seeds = corpus.seeds_df(spark, N)
    trace1 = (
        CrawlEngine(spark, pages, max_crawl=None, lineage_detail=False)
        .run(seeds)
        .trace.select("seq", "url")
        .localCheckpoint()
    )
    host_odd = F.regexp_extract("url", r"host(\d+)", 1).cast("int") % 2 == 1
    expired, _ = with_global_seq(
        trace1.where(host_odd), ["seq"], seq_col="seed_order"
    )
    seeds2 = expired.select("seed_order", "url").localCheckpoint()
    keep = trace1.where(~host_odd).select("url").localCheckpoint()

    exact = CrawlEngine(
        spark, pages, max_crawl=None, lineage_detail=False
    ).run_with_seen(seeds2, keep)

    f = ShardedCuckooSeenFilter(spark, n_shards=8, buckets_per_shard=1 << 10)
    f.update(trace1.select("url"))           # crawl-1 inserts
    f.delete(expired.select("url"))          # TTL expiry
    maintained = CrawlEngine(
        spark, pages, max_crawl=None, lineage_detail=False, seen_filter=f
    ).run_with_seen(seeds2, keep, update_filter=False)

    a = [tuple(r) for r in exact.trace.orderBy("seq").collect()]
    b = [tuple(r) for r in maintained.trace.orderBy("seq").collect()]
    assert a == b
    # the recrawl re-records every expired URL at depth 0, in crawl-1 order
    n_expired = seeds2.count()
    depth0 = [t for t in a if t[2] == 0]
    assert len(depth0) == n_expired
    # and the survivors are never re-fetched
    refetched = {t[1] for t in a}
    assert not refetched & {r["url"] for r in keep.collect()}


@pytest.mark.parametrize("mod,res", [(3, 0), (5, 2), (7, 4)])
def test_recrawl_property_arbitrary_expiry(spark, mod, res):
    """Property over arbitrary expiry subsets (id % mod == res on the page
    number): the recrawl's depth-0 slice is exactly the expired set in
    crawl-1 seq order, no surviving URL is ever re-fetched, and every
    deeper row is genuinely new (neither expired nor kept)."""
    from geospatial_web_scraper_spark.functions.ordering import with_global_seq

    pages = corpus.corpus_df(spark, N)
    trace1 = (
        CrawlEngine(spark, pages, max_crawl=None, lineage_detail=False)
        .run(corpus.seeds_df(spark, N))
        .trace.select("seq", "url")
        .localCheckpoint()
    )
    page_num = F.regexp_extract("url", r"/(?:page/|data/file_)(\d+)", 1).cast("int")
    is_exp = page_num % mod == res
    expired, n_exp = with_global_seq(
        trace1.where(is_exp), ["seq"], seq_col="seed_order"
    )
    keep_urls = {r["url"] for r in trace1.where(~is_exp).collect()}
    exp_ordered = [
        r["url"] for r in expired.orderBy("seed_order").collect()
    ]
    run2 = CrawlEngine(
        spark, pages, max_crawl=None, lineage_detail=False
    ).run_with_seen(
        expired.select("seed_order", "url"),
        trace1.where(~is_exp).select("url"),
    )
    rows = [tuple(r) for r in run2.trace.orderBy("seq").collect()]
    d0 = [t for t in rows if t[2] == 0]
    assert [t[1] for t in d0] == exp_ordered          # exact order by crawl-1 seq
    assert len(d0) == n_exp
    fetched = [t[1] for t in rows]
    assert len(fetched) == len(set(fetched))          # no URL recorded twice
    assert not set(fetched) & keep_urls               # survivors never re-fetched
    deeper = {t[1] for t in rows if t[2] > 0}
    assert not deeper & set(exp_ordered)
