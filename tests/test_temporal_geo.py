"""Edge-case units for the r4 session-3 operators: as-of join contract
corners (NULL-value carry, inclusive ties, no-predecessor), grid spatial
join boundary/adjacency exactness, mixture-weight arithmetic, and DSIR
target discrimination. The full-corpus value checks live in the oracle
mirror (test_entry_contract); these pin the semantic corners a uniform
corpus can't reach."""

import pytest
from pyspark.sql import functions as F

from geospatial_web_scraper_spark.operators.geo import (
    radius_pairs,
    synth_points,
)
from geospatial_web_scraper_spark.operators.temporal import asof_join


def _left(spark, rows):
    return spark.createDataFrame(rows, "k int, ts bigint, tag string")


def _right(spark, rows):
    return spark.createDataFrame(rows, "k int, ts bigint, v double")


def test_asof_basic_and_no_predecessor(spark):
    left = _left(spark, [(1, 5, "a"), (1, 0, "b"), (2, 7, "c")])
    right = _right(spark, [(1, 2, 10.0), (1, 4, 20.0), (3, 1, 99.0)])
    out = {
        (r.k, r.ts): r.asof_value
        for r in asof_join(left, right, "k", "ts", "v").collect()
    }
    assert out[(1, 5)] == 20.0  # latest at-or-before
    assert out[(1, 0)] is None  # no predecessor
    assert out[(2, 7)] is None  # key absent on the right


def test_asof_tie_is_inclusive(spark):
    left = _left(spark, [(1, 4, "a")])
    right = _right(spark, [(1, 4, 7.0), (1, 3, 5.0)])
    [row] = asof_join(left, right, "k", "ts", "v").collect()
    assert row.asof_value == 7.0


def test_asof_null_value_row_is_present_not_skipped(spark):
    """A right row whose VALUE is NULL still wins the as-of (presence is
    the struct wrapper, not the value): the ts=3 NULL must mask the ts=1
    10.0, not fall through to it."""
    right = _right(spark, [(1, 1, 10.0), (1, 3, None)])
    left = _left(spark, [(1, 5, "a")])
    [row] = asof_join(left, right, "k", "ts", "v").collect()
    assert row.asof_value is None


def test_asof_keeps_all_left_columns(spark):
    left = _left(spark, [(1, 5, "a")])
    right = _right(spark, [(1, 2, 1.5)])
    df = asof_join(left, right, "k", "ts", "v", out_col="last_v")
    assert df.columns == ["k", "ts", "tag", "last_v"]


def test_asof_bucketed_equals_plain_on_every_corner(spark):
    """asof_join_bucketed == asof_join row-for-row (VERDICT r4 #4) on a
    fixture hitting every boundary the bucket decomposition introduces:
    answers WITHIN the left row's own bucket, answers carried across one
    or many empty buckets, NULL-value carry, inclusive ties at a bucket
    EDGE, no-predecessor, keys absent on the right — at several widths,
    including one so wide everything shares a bucket (degenerates to the
    plain algorithm) and one so narrow every row sits alone."""
    s = 1_000_000  # ts columns are already-micros BIGINTs
    left = _left(
        spark,
        [
            (1, 0, "no-pred"),
            (1, 2 * s + 500_000, "in-bucket"),
            (1, 9 * s, "carried-far"),  # across empty buckets 3..8
            (1, 4 * s, "tie-at-edge"),  # right row AT 4s, inclusive
            (2, 7 * s, "null-carry"),
            (3, 5 * s, "absent-key"),
        ],
    )
    right = _right(
        spark,
        [
            (1, 2 * s, 10.0),
            (1, 2 * s + 700_000, 11.0),  # after the in-bucket left row
            (1, 4 * s, 20.0),
            (2, 1 * s, 30.0),
            (2, 3 * s, None),  # NULL value must carry as present
            (9, 0, 99.0),
        ],
    )
    from geospatial_web_scraper_spark.operators.temporal import (
        asof_join_bucketed,
    )

    want = sorted(
        tuple(r) for r in asof_join(left, right, "k", "ts", "v").collect()
    )
    for width in (1, 2, 3, 1000):
        got = sorted(
            tuple(r)
            for r in asof_join_bucketed(
                left, right, "k", "ts", "v", bucket_width_s=width
            ).collect()
        )
        assert got == want, (width, got, want)
    with pytest.raises(ValueError):
        asof_join_bucketed(left, right, "k", "ts", "v", bucket_width_s=0)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, lat long, lon long")


def test_radius_pairs_boundary_exact(spark):
    """dist == r is IN (<=), dist == r+1 is out — exact integers, and the
    in-pair crosses a cell boundary (9 and 10 sit in different div-10
    cells), exercising the neighborhood probe."""
    pts = _pts(spark, [(1, 0, 9), (2, 0, 19), (3, 0, 30)])
    got = {
        (r.a_id, r.b_id): r.dist2
        for r in radius_pairs(pts, radius=10).collect()
    }
    assert got == {(1, 2): 100}  # 19-9=10 → dist2=100=r²; 30-19=11 out


def test_radius_pairs_emitted_once_and_ordered(spark):
    """Same-cell AND adjacent-cell partners appear exactly once each,
    always as a_id < b_id (the mirror-kill rule)."""
    pts = _pts(spark, [(5, 100, 100), (6, 101, 101), (7, 109, 100)])
    rows = radius_pairs(pts, radius=10).collect()
    pairs = sorted((r.a_id, r.b_id) for r in rows)
    assert pairs == [(5, 6), (5, 7), (6, 7)]
    assert len(rows) == len(set(pairs))


def test_radius_pairs_rejects_bad_radius(spark):
    with pytest.raises(ValueError):
        radius_pairs(_pts(spark, [(1, 0, 0)]), radius=0)


def test_synth_points_deterministic_in_box(spark):
    df = spark.range(50).select(F.col("id").alias("doc_id"))
    a = {r.doc_id: (r.lat, r.lon) for r in synth_points(df).collect()}
    b = {r.doc_id: (r.lat, r.lon) for r in synth_points(df).collect()}
    assert a == b
    assert all(0 <= v < 1_000_000 for xy in a.values() for v in xy)


def test_mixture_weights_alpha1_is_proportional(spark):
    from geospatial_web_scraper_spark.operators.sampling import (
        mixture_weights,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d", "s1"), (2, "a b", "s2"), (3, "a b", "s2")],
        "doc_id bigint, text string, source string",
    )
    out = {
        r.source: (r.n_tok, r.weight6, r.epochs6)
        for r in mixture_weights(
            docs, alpha=1.0, budget_tokens=800
        ).collect()
    }
    assert out["s1"][0] == 4 and out["s2"][0] == 4
    assert out["s1"][1] == out["s2"][1] == 0.5
    assert out["s1"][2] == 100.0  # 0.5 · 800 / 4 tokens = 100 epochs


def test_mixture_weights_small_alpha_upweights_small_source(spark):
    from geospatial_web_scraper_spark.operators.sampling import (
        mixture_weights,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 100), "big"), (2, "w w", "small")],
        "doc_id bigint, text string, source string",
    )
    out = {
        r.source: r.weight6
        for r in mixture_weights(docs, alpha=0.3, budget_tokens=10).collect()
    }
    # n^0.3: 100^0.3 ≈ 3.98 vs 2^0.3 ≈ 1.23 — far above the 2/100 raw ratio
    assert out["small"] / out["big"] > 0.25
    with pytest.raises(ValueError):
        mixture_weights(docs, alpha=0.0, budget_tokens=10)


def test_dsir_prefers_target_like_documents(spark):
    from geospatial_web_scraper_spark.operators.dsir import dsir_topk

    tgt = [(i, "alpha beta gamma delta", "t") for i in range(10)]
    raw = [(100 + i, "zig zag zig zag", "r") for i in range(10)]
    probe = [(500, "alpha beta gamma", "r"), (501, "zig zag zig", "r")]
    docs = spark.createDataFrame(
        tgt + raw + probe, "doc_id bigint, text string, kind string"
    )
    top = dsir_topk(docs, F.col("kind") == "t", k=30)
    score = {r.doc_id: r.score6 for r in top.collect()}
    # target-distinctive bigrams must outrank raw-only ones (absolute sign
    # is smoothing-dominated at toy counts — only the ORDER is the estimator)
    assert score[500] > score[501]
    assert max(score[d] for d in range(10)) > score[501]


def test_knn_excludes_self_ties_and_radius(spark):
    from geospatial_web_scraper_spark.operators.geo import knn_within

    # 1 at origin; 2 and 3 equidistant (tie → smaller id first); 4 beyond r
    pts = _pts(
        spark, [(1, 0, 0), (2, 0, 5), (3, 5, 0), (4, 0, 50), (9, 0, 6)]
    )
    rows = sorted(
        ((r.a_id, r.rank), (r.b_id, r.dist2))
        for r in knn_within(pts, k=2, radius=10).collect()
        if r.a_id == 1
    )
    assert rows == [((1, 1), (2, 25)), ((1, 2), (3, 25))]

    import pytest as _pt

    with _pt.raises(ValueError):
        knn_within(pts, k=0, radius=10)


def test_range_join_inclusive_band_and_key_isolation(spark):
    """[ts+lo, ts+hi] is inclusive BOTH ends; other keys never match; the
    in-band match crossing a bucket boundary (bucket width = band width
    = 10: left 7 probes buckets 0 and 10, right 16 lives in bucket 10)
    must still be found."""
    from geospatial_web_scraper_spark.operators.temporal import range_join

    left = spark.createDataFrame(
        [(1, 7, "L1"), (2, 7, "L2")], "k int, ts bigint, tag string"
    )
    right = spark.createDataFrame(
        [(1, 9, 1.0), (1, 16, 2.0), (1, 17, 3.0), (1, 20, 4.0), (1, 6, 5.0)],
        "k int, ts bigint, v double",
    )
    rows = range_join(left, right, "k", "ts", lo_us=2, hi_us=10).collect()
    got = sorted((r.tag, r.ts_r, r.v) for r in rows)
    # band for ts=7 is [9, 17]: 9 ✓ (lo edge), 16 ✓ (bucket crossing),
    # 17 ✓ (hi edge), 20 ✗, 6 ✗; key 2 matches nothing
    assert got == [("L1", 9, 1.0), ("L1", 16, 2.0), ("L1", 17, 3.0)]
    assert rows[0].asDict().keys() >= {"k", "ts", "tag", "ts_r", "v"}


def test_range_join_negative_offsets_and_bad_band(spark):
    from geospatial_web_scraper_spark.operators.temporal import range_join

    left = spark.createDataFrame([(1, 100, "a")], "k int, ts bigint, tag string")
    right = spark.createDataFrame(
        [(1, 95, 1.0), (1, 89, 2.0), (1, 101, 3.0)],
        "k int, ts bigint, v double",
    )
    got = sorted(
        r.ts_r
        for r in range_join(
            left, right, "k", "ts", lo_us=-10, hi_us=0
        ).collect()
    )
    assert got == [95]  # 89 below band, 101 above (hi = ts itself)
    with pytest.raises(ValueError):
        range_join(left, right, "k", "ts", lo_us=5, hi_us=5)


def test_rollup_levels_equal_direct_aggregation(spark):
    """Every coarser level must equal aggregating raw directly at that
    width — the re-aggregatability contract (count/sum-micro/min/max)."""
    from geospatial_web_scraper_spark.operators.temporal import rollup_time

    rows = [
        (i, 1000 + i * 7_000_000, "t" if i % 2 else "u", float(i) * 1.25)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts bigint, event_type string, value double"
    )
    import calendar
    import math

    out = rollup_time(df, "ts", ["event_type"], "value", [10, 100, 1000])
    by_gran = {}
    for r in out.collect():
        by_gran.setdefault(r.gran_s, []).append(r)
    for wid in (10, 100, 1000):
        direct = {}
        for _, ts, et, v in rows:
            bk = ts - ts % (wid * 1_000_000)
            key = (bk, et)
            n, s, lo, hi = direct.get(key, (0, 0, None, None))
            direct[key] = (
                n + 1,
                s + math.floor(v * 1_000_000),
                v if lo is None else min(lo, v),
                v if hi is None else max(hi, v),
            )
        got = {
            (
                calendar.timegm(r.bucket_start.utctimetuple()) * 1_000_000
                + r.bucket_start.microsecond,
                r.event_type,
            ): (r.n, r.sum_value_micro, r.min_value, r.max_value)
            for r in by_gran[wid]
        }
        assert got == direct, wid


def test_rollup_rejects_non_multiple_widths(spark):
    from geospatial_web_scraper_spark.operators.temporal import rollup_time

    df = spark.createDataFrame(
        [(1, 0, "a", 1.0)],
        "event_id bigint, ts bigint, event_type string, value double",
    )
    with pytest.raises(ValueError):
        rollup_time(df, "ts", ["event_type"], "value", [10, 25])
    with pytest.raises(ValueError):
        rollup_time(df, "ts", ["event_type"], "value", [])


def test_cluster_points_chain_and_singleton(spark):
    """Transitive chain 1-2-3 (each hop ≤ r, ends > r apart) is ONE
    cluster labeled by the min id; 7 is a singleton of size 1."""
    from geospatial_web_scraper_spark.operators.geo import cluster_points

    pts = _pts(
        spark, [(1, 0, 0), (2, 0, 9), (3, 0, 18), (7, 500, 500)]
    )
    got = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in cluster_points(pts, radius=10).collect()
    }
    assert got == {1: (1, 3), 2: (1, 3), 3: (1, 3), 7: (7, 1)}


def test_knn_large_radius_no_int_overflow(spark):
    """radius > 46341 makes r² exceed int32 — the literal must be
    computed in Python, not wrapped by int arithmetic in the plan."""
    from geospatial_web_scraper_spark.operators.geo import radius_pairs

    pts = _pts(spark, [(1, 0, 0), (2, 0, 60_000)])
    [row] = radius_pairs(pts, radius=60_000).collect()
    assert (row.a_id, row.b_id, row.dist2) == (1, 2, 3_600_000_000)
