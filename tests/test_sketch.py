"""KMV cardinality sketch (operators/sketch.py): exact-below-k, estimate
accuracy vs true distinct, and lossless shard mergeability."""

import hashlib

from pyspark.sql import functions as F

from geospatial_web_scraper_spark.operators.sketch import (
    HASH_SPACE,
    hll_constants,
    hll_merge,
    hll_sketch,
    kmv_merge,
    kmv_sketch,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v string")


def test_exact_below_k(spark):
    """A group with fewer than k distinct values reports the EXACT count
    (duplicates included in n_rows but not in the sketch)."""
    rows = [("a", f"v{i % 10}") for i in range(40)] + [
        ("b", f"w{i}") for i in range(63)
    ]
    out = {
        r["g"]: r
        for r in kmv_sketch(_df(spark, rows), "g", "v", k=64).collect()
    }
    assert out["a"]["n_sketch"] == 10 and out["a"]["est_distinct"] == 10.0
    assert out["a"]["n_rows"] == 40
    assert out["b"]["n_sketch"] == 63 and out["b"]["est_distinct"] == 63.0
    assert len(out["a"]["sketch"]) == 10
    assert out["a"]["sketch"] == sorted(out["a"]["sketch"])


def test_estimate_accuracy(spark):
    """k=64 gives ~1/sqrt(k-2) ≈ 12.7% standard error; 2000 distinct
    values must estimate well within 3σ (±40%)."""
    n_true = 2000
    rows = [("g", f"value-{i}") for i in range(n_true)]
    row = kmv_sketch(_df(spark, rows), "g", "v", k=64).collect()[0]
    assert row["n_sketch"] == 64
    est = row["est_distinct"]
    assert 0.6 * n_true < est < 1.4 * n_true, est
    # the estimate is exactly the closed form over the held statistic
    assert est == round(63.0 * float(HASH_SPACE) / row["kth_hash"], 1)


def test_estimate_matches_python_kmv(spark):
    """The held hashes are exactly the k smallest md5-60bit values the
    straight-line Python mirror computes — no sampling, no RNG."""
    vals = [f"tok{i}" for i in range(300)]
    rows = [("g", v) for v in vals]
    row = kmv_sketch(_df(spark, rows), "g", "v", k=64).collect()[0]
    hashes = sorted(
        int(hashlib.md5(v.encode()).hexdigest()[:15], 16) for v in set(vals)
    )
    assert list(row["sketch"]) == hashes[:64]
    assert row["kth_hash"] == hashes[63]


def test_merge_equals_direct(spark):
    """Per-shard sketches merged == the sketch of the concatenated shards
    (the 100 TB roll-up path): identical sketch contents, kth, n_rows and
    estimate — overlap between shards must not double-count."""
    shard1 = [("s", f"v{i}") for i in range(150)]
    shard2 = [("s", f"v{i}") for i in range(100, 260)]  # overlaps shard1
    direct = kmv_sketch(_df(spark, shard1 + shard2), "g", "v", k=64).collect()[0]

    sk1 = kmv_sketch(_df(spark, shard1), "g", "v", k=64)
    sk2 = kmv_sketch(_df(spark, shard2), "g", "v", k=64)
    merged = kmv_merge(sk1.unionByName(sk2), "g", k=64).collect()[0]

    assert list(merged["sketch"]) == list(direct["sketch"])
    assert merged["kth_hash"] == direct["kth_hash"]
    assert merged["n_sketch"] == direct["n_sketch"]
    assert merged["n_rows"] == direct["n_rows"]
    assert merged["est_distinct"] == direct["est_distinct"]


def test_group_isolation(spark):
    """Sketches never mix hashes across groups."""
    rows = [("a", f"x{i}") for i in range(80)] + [
        ("b", f"y{i}") for i in range(80)
    ]
    out = kmv_sketch(_df(spark, rows), "g", "v", k=64)
    a, b = [
        set(r["sketch"]) for r in sorted(out.collect(), key=lambda r: r["g"])
    ]
    assert not (a & b)


def test_cms_estimate_one_sided_and_exact_at_width(spark):
    from geospatial_web_scraper_spark.operators.sketch import (
        cms_counts,
        cms_estimate,
    )

    rows = [(f"t{i % 7}",) for i in range(70)] + [("rare",)]
    df = spark.createDataFrame(rows, "term string")
    exact = {}
    for (t,) in rows:
        exact[t] = exact.get(t, 0) + 1
    # tiny sketch: estimates are one-sided overestimates
    cms = cms_counts(df, "term", width=4, depth=2)
    est = {
        r["term"]: r["est"]
        for r in cms_estimate(cms, df, "term", width=4, depth=2).collect()
    }
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)
    # wide sketch: no collisions -> exact
    cms2 = cms_counts(df, "term", width=4096, depth=4)
    est2 = {
        r["term"]: r["est"]
        for r in cms_estimate(cms2, df, "term", width=4096, depth=4).collect()
    }
    assert est2 == exact


def test_cms_merge_equals_whole(spark):
    from geospatial_web_scraper_spark.operators.sketch import (
        cms_counts,
        cms_estimate,
        cms_merge,
    )

    rows = [(f"w{i % 11}",) for i in range(99)]
    df = spark.createDataFrame(rows, "term string").withColumn(
        "half", (F.monotonically_increasing_id() % 2).cast("int")
    )
    whole = cms_counts(df, "term", width=64, depth=3)
    merged = cms_merge(
        cms_counts(df.where("half = 0"), "term", width=64, depth=3).unionByName(
            cms_counts(df.where("half = 1"), "term", width=64, depth=3)
        )
    )
    q = df.select("term").distinct()
    a = {r["term"]: r["est"]
         for r in cms_estimate(whole, q, "term", width=64, depth=3).collect()}
    b = {r["term"]: r["est"]
         for r in cms_estimate(merged, q, "term", width=64, depth=3).collect()}
    assert a == b


# ----------------------------------------------------------------- HLL


def _hll_py_registers(values, m=128):
    """Straight-line Python mirror of hll_sketch's register build."""
    regs = [0] * m
    for v in set(values):
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        b, w = h & (m - 1), h >> 7
        rho = 54 if w == 0 else 1 + ((w & -w) - 1).bit_count()
        regs[b] = max(regs[b], rho)
    return regs


def test_hll_registers_match_python_mirror(spark):
    """The dense register array is exactly the straight-line Python fold
    over md5-60bit hashes — no RNG, no float, engine-portable."""
    vals = [f"tok{i}" for i in range(500)]
    rows = [("g", v) for v in vals] + [("g", vals[0])]  # dup folds away
    row = hll_sketch(_df(spark, rows), "g", "v").collect()[0]
    regs = _hll_py_registers(vals)
    assert list(row["registers"]) == regs
    assert row["n_rows"] == len(vals) + 1
    assert row["n_buckets"] == sum(1 for r in regs if r > 0)
    assert row["v_zero"] == sum(1 for r in regs if r == 0)
    assert row["max_rho"] == max(regs)
    assert row["z_int"] == sum(1 << (54 - r) for r in regs)


def test_hll_estimate_accuracy(spark):
    """m=128 gives 1.04/sqrt(128) ≈ 9.2% standard error; 5000 distinct
    values must land within 3σ (±30%)."""
    n_true = 5000
    rows = [("g", f"value-{i}") for i in range(n_true)]
    row = hll_sketch(_df(spark, rows), "g", "v").collect()[0]
    est = row["est_distinct"]
    assert 0.7 * n_true < est < 1.3 * n_true, est
    # and the estimate is the closed form over the held statistic
    _, c, lin = hll_constants()
    raw = c / float(row["z_int"])
    expected = lin[row["v_zero"] - 1] if (row["v_zero"] > 0 and raw <= 320.0) else raw
    assert est == round(expected, 1)


def test_hll_small_set_linear_counting(spark):
    """A small group takes the tabulated linear-counting branch (v_zero
    high, raw estimate under 2.5m) and lands near the exact count."""
    n_true = 30
    rows = [("g", f"x{i}") for i in range(n_true)]
    row = hll_sketch(_df(spark, rows), "g", "v").collect()[0]
    assert row["v_zero"] > 0
    _, c, lin = hll_constants()
    assert c / float(row["z_int"]) <= 320.0  # the branch actually fires
    assert row["est_distinct"] == round(lin[row["v_zero"] - 1], 1)
    assert 0.75 * n_true < row["est_distinct"] < 1.25 * n_true


def test_hll_merge_equals_whole(spark):
    """Register-wise max over per-shard sketches == the sketch of the
    concatenated shards, digit-for-digit (including the registers and
    the estimate) — the lossless roll-up a 100 TB audit relies on."""
    rows = [("g", f"v{i}") for i in range(3000)] + [
        ("h", f"w{i}") for i in range(200)
    ]
    whole = _df(spark, rows)
    shard_a = whole.where(F.abs(F.xxhash64("v")) % 3 == 0)
    shard_b = whole.where(F.abs(F.xxhash64("v")) % 3 == 1)
    shard_c = whole.where(F.abs(F.xxhash64("v")) % 3 == 2)
    merged = hll_merge(
        hll_sketch(shard_a, "g", "v")
        .unionByName(hll_sketch(shard_b, "g", "v"))
        .unionByName(hll_sketch(shard_c, "g", "v")),
        "g",
    )
    direct = hll_sketch(whole, "g", "v")
    m = {r["g"]: r for r in merged.collect()}
    d = {r["g"]: r for r in direct.collect()}
    assert set(m) == set(d)
    for g in d:
        assert list(m[g]["registers"]) == list(d[g]["registers"])
        for col in ("n_rows", "n_buckets", "v_zero", "max_rho", "z_int",
                    "est_distinct"):
            assert m[g][col] == d[g][col], (g, col)
