"""largest_remainder_quotas (operators/apportion.py) — Hamilton
apportionment semantics: exact budget conservation, ±1 quota bound,
deterministic tie rule, fail-loud empty input."""

import random

import pytest
from pyspark.sql import functions as F

from geospatial_web_scraper_spark.operators.apportion import (
    largest_remainder_quotas,
)


def _alloc(spark, weights, budget):
    w = spark.createDataFrame(
        list(weights.items()), "host_id long, weight_fp long"
    )
    rows = largest_remainder_quotas(w, budget).collect()
    return {r["host_id"]: r.asDict() for r in rows}


def test_budget_conserved_exactly(spark):
    rng = random.Random(4177)
    weights = {h: rng.randrange(1, 10**12) for h in range(37)}
    for budget in (1, 96, 997, 10**6):
        got = _alloc(spark, weights, budget)
        assert sum(r["quota"] for r in got.values()) == budget
        assert all(r["extra"] in (0, 1) for r in got.values())


def test_quota_within_one_of_exact_share(spark):
    rng = random.Random(97)
    weights = {h: rng.randrange(0, 10**9) for h in range(25)}
    weights[3] = 10**9  # ensure a positive total
    budget = 1000
    total = sum(weights.values())
    got = _alloc(spark, weights, budget)
    for h, r in got.items():
        lo = budget * weights[h] // total
        assert r["quota"] in (lo, lo + 1)


def test_tie_breaks_to_smallest_host(spark):
    # equal weights, budget not divisible: 7 = 3×2 + 1 extra → host 0
    got = _alloc(spark, {0: 5, 1: 5, 2: 5}, 7)
    assert {h: r["quota"] for h, r in got.items()} == {0: 3, 1: 2, 2: 2}


def test_zero_weight_host_gets_zero(spark):
    got = _alloc(spark, {0: 10, 1: 0, 2: 10}, 11)
    assert got[1]["quota"] == 0
    assert sum(r["quota"] for r in got.values()) == 11


def test_all_zero_raises(spark):
    w = spark.createDataFrame([(0, 0), (1, 0)], "host_id long, weight_fp long")
    with pytest.raises(ValueError, match="all-zero"):
        largest_remainder_quotas(w, 10)


def test_negative_budget_raises(spark):
    w = spark.createDataFrame([(0, 1)], "host_id long, weight_fp long")
    with pytest.raises(ValueError, match="negative budget"):
        largest_remainder_quotas(w, -1)


def test_corpus_apportioned_budget_shape(spark):
    # the politeness composition's budget table: liveness floor 1, the
    # hot host (host0, ~30% of pages and links) gets the largest share
    from geospatial_web_scraper_spark.entry_queries import (
        APPORTION_TOKENS,
        _corpus_apportioned_budget,
    )

    rows = {r["host"]: r["tokens_per_round"]
            for r in _corpus_apportioned_budget(spark).collect()}
    assert len(rows) == 10
    assert all(v >= 1 for v in rows.values())
    assert sum(rows.values()) >= APPORTION_TOKENS
    assert rows["host0.example.org"] == max(rows.values())
