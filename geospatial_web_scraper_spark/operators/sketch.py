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


# --------------------------------------------------------------------------
# HyperLogLog-style register sketch — constant-size cardinality estimation
# --------------------------------------------------------------------------

#: register count m = 2^p. 128 registers → 1.04/√128 ≈ 9.2% standard
#: error in 128 ints per group — the constant-size alternative to KMV
#: above (whose size grows with k). 128 also keeps the linear-counting
#: table under the repo's 256-literal Janino budget (see pq._lut_col).
HLL_P = 7
HLL_M = 1 << HLL_P
#: md5-60bit hash → p bucket bits + 53 payload bits
_HLL_WBITS = 60 - HLL_P
#: rho of an all-zero payload (max possible register value)
HLL_RHO_MAX = _HLL_WBITS + 1


def hll_constants(m: int = HLL_M) -> tuple[float, float, list[float]]:
    """``(alpha_m, C, linear_table)`` — the three float constants of the
    estimator (Flajolet et al. 2007 §4), computed ONCE here and
    repr-embedded in the DuckDB oracle (entry_queries._hll_oracle_sql)
    so both engines divide the identical doubles — the same doctrine as
    relevance.bm25_constants. ``C = alpha_m · m² · 2^HLL_RHO_MAX`` is the
    raw-estimate numerator over the integer statistic ``z_int`` (below);
    ``linear_table[v-1] = m·ln(m/v)`` is the small-range linear-counting
    correction, tabulated so no engine evaluates a transcendental at
    query time (ln differs across libm builds in the last ulp)."""
    import math

    alpha = 0.7213 / (1.0 + 1.079 / m)
    c = alpha * m * m * float(1 << HLL_RHO_MAX)
    lin = [m * math.log(m / v) for v in range(1, m + 1)]
    return alpha, c, lin


def _hll_rho(w):
    """rho statistic of the 53-bit payload ``w``: 1 + (trailing zero
    bits), or HLL_RHO_MAX when w = 0. Trailing zeros give the identical
    P(rho ≥ k) = 2^-(k-1) geometric law as Flajolet's leading zeros but
    stay EXACT integer arithmetic in every engine: the lowest set bit is
    ``w & -w`` (a power of two) and its position is ``bit_count((w&-w)-1)``
    — no log2, no float. Mirrored verbatim in the DuckDB oracle."""
    return (
        F.when(w == 0, F.lit(HLL_RHO_MAX))
        .otherwise(
            F.lit(1) + F.bit_count((w.bitwiseAND(-w)) - F.lit(1))
        )
        .cast("int")
    )


def _dense_registers(regs: DataFrame, m: int) -> DataFrame:
    """``(_g, _b, _m)`` max-register rows → ``(_g, registers ARRAY<INT>)``
    dense (missing buckets 0) — shared by build and merge so the two can
    never diverge on densification."""
    dense = regs.groupBy("_g").agg(
        F.map_from_entries(F.collect_list(F.struct("_b", "_m"))).alias("_map")
    )
    return dense.select(
        "_g",
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda b: F.coalesce(F.element_at(F.col("_map"), b), F.lit(0)),
        )
        .cast("array<int>")
        .alias("registers"),
    )


def _hll_estimate(df: DataFrame, m: int = HLL_M) -> DataFrame:
    """Append ``(n_buckets, v_zero, max_rho, z_int, est_distinct)`` to a
    frame holding a dense ``registers ARRAY<INT>`` column.

    ``z_int = Σ_b 2^(HLL_RHO_MAX − M_b)`` is the indicator sum in exact
    integer units of 2^-HLL_RHO_MAX: every term is a BIGINT power of two
    (empty buckets contribute 2^HLL_RHO_MAX), the sum is ≤ m·2^54 < 2^62,
    and the order-independent integer total makes the raw estimate
    ``C / z_int`` ONE division of two exactly-agreed values — the same
    two-exact-ints trick as the KMV estimate above. The small-range
    branch (v_zero > 0 and raw ≤ 2.5m) reads the tabulated linear-count
    double; both the branch condition and the table are bit-identical
    across engines, so ``est_distinct`` reproduces digit-for-digit."""
    _, c, lin = hll_constants(m)
    z = F.expr(
        "aggregate(registers, cast(0 as long), "
        f"(acc, x) -> acc + shiftleft(cast(1 as long), {HLL_RHO_MAX} - x))"
    )
    out = df.select(
        "*",
        F.expr("aggregate(registers, cast(0 as long), "
               "(acc, x) -> acc + if(x > 0, 1L, 0L))").alias("n_buckets"),
        F.expr("aggregate(registers, cast(0 as long), "
               "(acc, x) -> acc + if(x = 0, 1L, 0L))").alias("v_zero"),
        F.expr("aggregate(registers, 0, (acc, x) -> greatest(acc, x))")
        .cast("int")
        .alias("max_rho"),
        z.alias("z_int"),
    )
    raw = F.lit(c) / F.col("z_int").cast("double")
    lin_arr = F.array(*[F.lit(x) for x in lin])
    est = F.round(
        F.when(
            (F.col("v_zero") > 0) & (raw <= F.lit(2.5 * m)),
            F.element_at(lin_arr, F.col("v_zero").cast("int")),
        ).otherwise(raw),
        1,
    )
    return out.withColumn("est_distinct", est)


def hll_sketch(
    df: DataFrame, group_col: str, value_col, m: int = HLL_M
) -> DataFrame:
    """Per-``group_col`` HLL register sketch of ``value_col``.

    Returns one row per group::

        (group, n_rows BIGINT,         -- total value occurrences (exact)
         registers ARRAY<INT>,         -- m registers, dense, 0 = empty
         n_buckets BIGINT, v_zero BIGINT, max_rho INT,
         z_int BIGINT,                 -- exact indicator sum (see above)
         est_distinct DOUBLE)

    Scale shape: one ``(group, hash)`` distinct (map-side combining hash
    aggregate), one ``(group, bucket) → max(rho)`` hash aggregate (at
    most m·groups output rows), then an m-entry collect per group — the
    whole reduction is register-sized, never value-sized, and unlike the
    KMV top-k needs no salted two-phase pass (max() combines map-side).
    Sketches from disjoint shards merge losslessly via :func:`hll_merge`
    (register-wise max)."""
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    hashed = df.select(
        F.col(group_col).alias("_g"), _md5_hash64_expr(val).alias("_h")
    )
    totals = hashed.groupBy("_g").agg(F.count("*").alias("n_rows"))
    w = F.shiftright(F.col("_h"), HLL_P)
    regs = (
        hashed.distinct()
        .select(
            "_g",
            F.col("_h").bitwiseAND(F.lit(m - 1)).cast("int").alias("_b"),
            _hll_rho(w).alias("_r"),
        )
        .groupBy("_g", "_b")
        .agg(F.max("_r").alias("_m"))
    )
    return (
        _hll_estimate(_dense_registers(regs, m), m)
        .join(totals, "_g")
        .select(
            F.col("_g").alias(group_col),
            "n_rows",
            "registers",
            "n_buckets",
            "v_zero",
            "max_rho",
            "z_int",
            "est_distinct",
        )
    )


def hll_merge(sketches: DataFrame, group_col: str, m: int = HLL_M) -> DataFrame:
    """Merge per-shard sketches (rows of ``(group, n_rows, registers)``)
    into one sketch per group: register-wise MAX — the lossless HLL merge
    — then the shared estimator. Exactly equals :func:`hll_sketch` over
    the concatenated shards (max of per-shard maxima == global max;
    pinned by tests/test_sketch.py)."""
    regs = (
        sketches.select(
            F.col(group_col).alias("_g"),
            F.posexplode("registers").alias("_b", "_r"),
        )
        .groupBy("_g", "_b")
        .agg(F.max("_r").alias("_m"))
    )
    totals = sketches.groupBy(F.col(group_col).alias("_g")).agg(
        F.sum("n_rows").alias("n_rows")
    )
    return (
        _hll_estimate(_dense_registers(regs, m), m)
        .join(totals, "_g")
        .select(
            F.col("_g").alias(group_col),
            "n_rows",
            "registers",
            "n_buckets",
            "v_zero",
            "max_rho",
            "z_int",
            "est_distinct",
        )
    )
