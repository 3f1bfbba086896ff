"""Rendezvous shard assignment (operators/rendezvous.py): exactness
against the straight-line Python argmax, and the HRW resize contract —
adding a shard moves ONLY keys the new shard wins; removing one moves
ONLY its own keys."""

import hashlib

import pytest
from pyspark.sql import functions as F

from geospatial_web_scraper_spark.operators.rendezvous import (
    rendezvous_assign,
    rendezvous_shard_expr,
)


def _py_shard(key: str, n: int) -> int:
    """The spec: argmax over md5-60bit('s:key'), ties to the higher id."""
    best = max(
        (int(hashlib.md5(f"{s}:{key}".encode()).hexdigest()[:15], 16), s)
        for s in range(n)
    )
    return best[1]


def _keys_df(spark, n_keys: int):
    return spark.range(n_keys).select(
        F.concat(F.lit("https://h"), (F.col("id") % 37).cast("string"),
                 F.lit(".example/p/"), F.col("id").cast("string"))
        .alias("url")
    )


def test_matches_python_argmax(spark):
    df = rendezvous_assign(_keys_df(spark, 200), "url", 8)
    for r in df.collect():
        assert r["shard"] == _py_shard(r["url"], 8), r["url"]


def test_add_shard_moves_only_to_new(spark):
    """n → n+1: every relocated key lands on the NEW shard (exact HRW
    property — survivors' pairwise argmax order is untouched), and the
    moved fraction is near 1/(n+1)."""
    df = (
        rendezvous_assign(_keys_df(spark, 800), "url", 8, "s8")
        .withColumn("s9", rendezvous_shard_expr(F.col("url"), 9))
        .collect()
    )
    moved = [r for r in df if r["s8"] != r["s9"]]
    assert all(r["s9"] == 8 for r in moved)
    # expected 800/9 ≈ 89; binomial σ ≈ 8.9 — allow ±5σ
    assert 45 <= len(moved) <= 135, len(moved)
    # removal is the same statement read right-to-left: keys that differ
    # between 9 and 8 shards are exactly those the 9th shard owned
    assert {r["url"] for r in moved} == {
        r["url"] for r in df if r["s9"] == 8
    }


def test_every_shard_populated(spark):
    counts = (
        rendezvous_assign(_keys_df(spark, 800), "url", 8)
        .groupBy("shard")
        .count()
        .collect()
    )
    assert sorted(r["shard"] for r in counts) == list(range(8))
    assert all(r["count"] > 20 for r in counts)  # ~100 expected per shard


def test_single_shard_and_validation(spark):
    one = rendezvous_assign(_keys_df(spark, 10), "url", 1)
    assert all(r["shard"] == 0 for r in one.collect())
    with pytest.raises(ValueError):
        rendezvous_shard_expr(F.lit("x"), 0)
