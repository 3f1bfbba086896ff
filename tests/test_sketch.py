"""KMV cardinality sketch (operators/sketch.py): exact-below-k, estimate
accuracy vs true distinct, and lossless shard mergeability."""

import hashlib

from pyspark.sql import functions as F

from geospatial_web_scraper_spark.operators.sketch import (
    HASH_SPACE,
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
