"""KMV (k-minimum-values) distinct-cardinality sketches.

A 100 TB corpus build constantly asks "how many distinct X per group?" —
vocabulary size per source, distinct URLs per host, unique shingles per
shard — and an exact ``count(DISTINCT x)`` shuffles every distinct value.
The KMV estimator (Bar-Yossef et al. 2002; Beyer et al. 2007 "On synopses
for distinct-value estimation") keeps only the k smallest hash values per
group: if the k-th smallest of n uniform hashes in [0, M) is h_k, then
n ≈ (k-1)·M/h_k. The sketch is tiny (k longs), MERGEABLE (union the
hash sets, re-take the k smallest — exactly how per-shard sketches roll
up to a corpus total without re-scanning), and with fewer than k distinct
values it degrades to the EXACT count.

Unlike HyperLogLog (Spark's ``approx_count_distinct``), KMV is
deterministic given the hash function and exactly reproducible in any SQL
engine: the hash here is the repo's md5-based 60-bit value
(``dedup._md5_hash64_expr`` — bit-identical in Spark and DuckDB), so the
sketch contents, the k-th minimum, and the estimate all oracle-check
digit-for-digit. The only float is the final estimate, a single division
of two exact integers (IEEE-correctly-rounded, identical in any engine —
the same two-exact-ints trick as lm.bigram_lm_scores' h6).

Scale shape: one ``(group, hash)`` distinct (map-side combining hash
aggregate), then the salted two-phase k-smallest (``grouped_topk`` — the
same no-per-group-window reduction every ANN path uses: a group's hashes
spread over salt_parts reducers, ≤k survive per salt, final hash agg over
≤ groups·salt_parts·k rows). No global window, no skewed shuffle: a group
with 10^9 distinct values never lands on one reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _md5_hash64_expr
from .similarity import grouped_topk

#: hash space: _md5_hash64_expr yields 15 hex chars = [0, 16^15) = [0, 2^60)
HASH_SPACE = 16**15


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    value_col,
    k: int = 64,
) -> DataFrame:
    """Per-``group_col`` KMV sketch of ``value_col`` (a column name or
    Column expression).

    Returns one row per group::

        (group, n_rows BIGINT,        -- total value occurrences (exact)
         n_sketch BIGINT,             -- hashes held (= exact distinct if < k)
         kth_hash BIGINT,             -- max held hash (the KMV statistic)
         sketch ARRAY<BIGINT>,        -- the k smallest hashes, ascending
         est_distinct DOUBLE)         -- exact n_sketch if n_sketch < k,
                                      -- else round((k-1)·M/kth, 1)

    ``n_rows/est_distinct`` is the duplication factor a curation audit
    reports per source. Sketches from disjoint shards merge losslessly via
    :func:`kmv_merge`.
    """
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    hashed = df.select(
        F.col(group_col).alias("_g"), _md5_hash64_expr(val).alias("_h")
    )
    totals = hashed.groupBy("_g").agg(F.count("*").alias("n_rows"))
    distinct = hashed.distinct()
    # k-smallest == top-k of the negated hash; salt on the hash itself so
    # a hot group's distinct stream spreads across reducers
    low = grouped_topk(
        distinct.withColumn("_neg", -F.col("_h")),
        "_g",
        "_h",
        "_neg",
        k,
        salt_col="_h",
    )
    sk = low.groupBy("_g").agg(
        F.count("*").cast("long").alias("n_sketch"),
        F.max("_h").alias("kth_hash"),
        F.sort_array(F.collect_list("_h")).alias("sketch"),
    )
    est = (
        F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double"))
        .otherwise(
            F.round(
                F.lit(float(k - 1))
                * F.lit(float(HASH_SPACE))
                / F.col("kth_hash").cast("double"),
                1,
            )
        )
        .alias("est_distinct")
    )
    return sk.join(totals, "_g").select(
        F.col("_g").alias(group_col),
        "n_rows",
        "n_sketch",
        "kth_hash",
        "sketch",
        est,
    )


def kmv_jaccard(
    sk_a: DataFrame, sk_b: DataFrame, group_col: str, k: int = 64
) -> DataFrame:
    """Set-overlap estimate per group from two KMV sketches (Beyer et al.
    2007 §5.2): take the k smallest hashes of the UNION of the two
    sketches; the Jaccard estimate is the fraction of those present in
    BOTH input sketches (each union k-minimum is a uniform sample of the
    union, and membership in both sketches == membership in the
    intersection). When the union sketch holds fewer than k hashes it is
    the whole union, so jaccard and the counts are EXACT.

    Returns ``(group, n_union_sketch, n_both, kth_hash, jaccard6 DOUBLE,
    est_union DOUBLE, est_intersection DOUBLE)``. All inputs to the three
    floats are exact integers (plus the already-rounded jaccard6), so
    every digit reproduces in any engine.

    Scale shape: sketches are k longs per group — everything here is
    sketch-sized (explode + hash-agg + plain grouped_topk, no salt
    needed: ≤ 2k rows per group by construction).
    """
    ea = sk_a.select(
        F.col(group_col).alias("_g"), F.explode("sketch").alias("_h")
    ).withColumn("_s", F.lit("a"))
    eb = sk_b.select(
        F.col(group_col).alias("_g"), F.explode("sketch").alias("_h")
    ).withColumn("_s", F.lit("b"))
    flags = (
        ea.unionByName(eb)
        .groupBy("_g", "_h")
        .agg(
            F.max(F.when(F.col("_s") == "a", 1).otherwise(0)).alias("_ina"),
            F.max(F.when(F.col("_s") == "b", 1).otherwise(0)).alias("_inb"),
        )
    )
    low = grouped_topk(
        flags.withColumn("_neg", -F.col("_h")),
        "_g",
        "_h",
        "_neg",
        k,
        carry_cols=("_ina", "_inb"),
    )
    agg = low.groupBy("_g").agg(
        F.count("*").cast("long").alias("n_union_sketch"),
        F.sum(
            ((F.col("_ina") == 1) & (F.col("_inb") == 1)).cast("long")
        ).alias("n_both"),
        F.max("_h").alias("kth_hash"),
    )
    j6 = F.round(
        F.col("n_both").cast("double") / F.col("n_union_sketch"), 6
    ).alias("jaccard6")
    est_u = (
        F.when(
            F.col("n_union_sketch") < k, F.col("n_union_sketch").cast("double")
        )
        .otherwise(
            F.round(
                F.lit(float(k - 1))
                * F.lit(float(HASH_SPACE))
                / F.col("kth_hash").cast("double"),
                1,
            )
        )
        .alias("est_union")
    )
    out = agg.select(
        F.col("_g").alias(group_col),
        "n_union_sketch",
        "n_both",
        "kth_hash",
        j6,
        est_u,
    )
    return out.withColumn(
        "est_intersection",
        F.when(
            F.col("n_union_sketch") < k, F.col("n_both").cast("double")
        ).otherwise(F.round(F.col("jaccard6") * F.col("est_union"), 1)),
    )


def kmv_merge(sketches: DataFrame, group_col: str, k: int = 64) -> DataFrame:
    """Merge per-shard sketches (rows of ``(group, n_rows, sketch)``) into
    one sketch per group — union the held hashes, re-take the k smallest.
    Exactly equals :func:`kmv_sketch` run over the concatenated shards
    (pinned by tests/test_sketch.py): the k smallest of a union are a
    subset of the per-shard k-smallest sets.
    """
    exploded = sketches.select(
        F.col(group_col).alias("_g"),
        F.col("n_rows"),
        F.explode("sketch").alias("_h"),
    )
    totals = (
        sketches.groupBy(F.col(group_col).alias("_g"))
        .agg(F.sum("n_rows").alias("n_rows"))
    )
    distinct = exploded.select("_g", "_h").distinct()
    low = grouped_topk(
        distinct.withColumn("_neg", -F.col("_h")),
        "_g",
        "_h",
        "_neg",
        k,
        salt_col="_h",
    )
    sk = low.groupBy("_g").agg(
        F.count("*").cast("long").alias("n_sketch"),
        F.max("_h").alias("kth_hash"),
        F.sort_array(F.collect_list("_h")).alias("sketch"),
    )
    est = (
        F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double"))
        .otherwise(
            F.round(
                F.lit(float(k - 1))
                * F.lit(float(HASH_SPACE))
                / F.col("kth_hash").cast("double"),
                1,
            )
        )
        .alias("est_distinct")
    )
    return sk.join(totals, "_g").select(
        F.col("_g").alias(group_col),
        "n_rows",
        "n_sketch",
        "kth_hash",
        "sketch",
        est,
    )


# --------------------------------------------------------------------------
# Count-Min sketch — bounded-memory frequency estimation
# --------------------------------------------------------------------------

#: default Count-Min shape: depth rows of width counters
CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_counts(
    df: DataFrame,
    value_col: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of a value stream →
    the counter table ``(row, bucket, cnt)`` — at most ``depth · width``
    rows REGARDLESS of input size, the bounded-memory answer to "how
    often does each token appear?" when the exact (value, count) table
    (operators/profile.py heavy_hitters) is itself too wide to keep.

    Each value increments one counter per row: ``bucket = md5-60bit(
    row ':' value) % width`` — the repo's engine-portable hash family, so
    the sketch contents are bit-identical in any SQL engine and the
    ``cms_token_counts`` catalog query value-checks counters AND
    estimates. The table form is MERGEABLE by construction: per-shard
    sketches union + re-sum (:func:`cms_merge`), the same roll-up shape
    as the KMV sketches above.

    Scale: one narrow ``(int, int)`` shuffle with map-side combine; the
    depth-way explode multiplies rows BEFORE the combine, never after.
    """
    rows = df.select(
        F.col(value_col).alias("_v"),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row"),
    )
    bucket = (
        _md5_hash64_expr(
            F.concat(F.col("row").cast("string"), F.lit(":"), F.col("_v"))
        )
        % width
    )
    return (
        rows.select("row", bucket.alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Union of per-shard counter tables → one sketch (counter-wise sum;
    merge-then-estimate equals estimate-over-the-whole, pinned)."""
    return sketches.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    queries: DataFrame,
    value_col: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Point-query the sketch → ``(value_col, est)`` per distinct queried
    value: the MINIMUM of its ``depth`` counters — always ≥ the true
    count (one-sided error; overestimation ≤ collisions' mass). The query
    side is tiny (it broadcasts into the sketch join); ``width``/``depth``
    must match the build."""
    q = queries.select(F.col(value_col).alias("_v")).distinct()
    bucket = (
        _md5_hash64_expr(
            F.concat(F.col("row").cast("string"), F.lit(":"), F.col("_v"))
        )
        % width
    )
    qe = q.select(
        "_v",
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row"),
    ).select("_v", "row", bucket.alias("bucket"))
    return (
        qe.join(cms, ["row", "bucket"], "left")
        .groupBy("_v")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
        .select(F.col("_v").alias(value_col), "est")
    )
