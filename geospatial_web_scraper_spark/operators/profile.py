"""Corpus profiling: exact per-group heavy hitters and distribution
quantiles — the audit numbers a 100 TB curation run reports per source
alongside corpus_report's scalars.

Both are EXACT (no sampling, no sketch error) yet scale-shaped:

* **heavy hitters** — one map-side-combining ``groupBy(group, value)``
  count collapses the corpus to its distinct values, then the salted
  two-phase ``grouped_topk`` reduces to the top-k per group. No per-group
  window ever sees raw rows; a group with 10^9 occurrences of one token
  is ONE row after the combine.
* **quantiles** — type-1 (lower-value) quantiles computed on the
  value-AGGREGATED ``(group, value, count)`` table: the running-sum
  window is over DISTINCT VALUES per group, not rows, so it's bounded by
  the value domain (token counts, quality scores in fixed units), not by
  corpus size. For genuinely unbounded continuous columns, bin first —
  the docstring contract, not a hidden assumption.

Determinism: counts and cumulative ranks are exact BIGINTs; the only
float is the quantile probe ``ceil(q * n)`` where ``q`` is the same
literal double on both engine sides (IEEE multiply + ceil — identical),
so the selected value is identical in any engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import grouped_topk


def heavy_hitters(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k most frequent ``value_col`` per ``group_col``.

    Returns ``(group, value, cnt BIGINT, rank)`` with ties broken toward
    the lexicographically smaller value (grouped_topk's (desc count,
    asc value) total order — reproducible in any engine).
    """
    counts = df.groupBy(
        F.col(group_col).alias("_g"), F.col(value_col).alias("_v")
    ).agg(F.count("*").cast("long").alias("cnt"))
    top = grouped_topk(counts, "_g", "_v", "cnt", k, salt_col="_v")
    return top.select(
        F.col("_g").alias(group_col),
        F.col("_v").alias(value_col),
        F.col("cnt"),
        "rank",
    )


def group_quantiles(
    df: DataFrame,
    group_col: str,
    num_col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Exact type-1 quantiles of ``num_col`` per ``group_col``: for each
    q, the smallest value whose cumulative count reaches ``ceil(q·n)``.

    Returns ``(group, q DOUBLE, n BIGINT, value)`` — one row per
    (group, q). The value column keeps its input type.
    """
    counts = df.groupBy(
        F.col(group_col).alias("_g"), F.col(num_col).alias("_v")
    ).agg(F.count("*").cast("long").alias("_c"))
    # running sum over the aggregated distinct-value table (bounded by the
    # value domain per group — the scale contract in the module docstring)
    w = Window.partitionBy("_g").orderBy("_v")
    cum = counts.withColumn("_cum", F.sum("_c").over(w))
    tot = counts.groupBy("_g").agg(F.sum("_c").cast("long").alias("n"))
    probes = F.explode(
        F.array(*[F.lit(float(q)) for q in qs])
    ).alias("q")
    return (
        cum.join(tot, "_g")
        .select("_g", "_v", "_cum", "n", probes)
        .where(F.col("_cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("_g", "q", "n")
        .agg(F.min("_v").alias("value"))
        .select(F.col("_g").alias(group_col), "q", "n", "value")
    )


def sampled_quantiles(
    df: DataFrame,
    group_col: str,
    num_col: str,
    id_col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    rate_denom: int = 4,
    salt: str = "qsk",
) -> DataFrame:
    """Approximate per-group quantiles over a DETERMINISTIC 1/rate_denom
    hash sample — the mergeable scale path beside :func:`group_quantiles`.

    The exact operator's running-sum window is bounded by the distinct
    VALUE domain per group; when that domain is itself corpus-sized
    (high-resolution floats, web-scale length counts), the sketch path
    bounds the aggregated table by the sample instead. The sample is
    keyed on ROW IDENTITY (``md5('<salt>:' || id) % rate_denom == 0``),
    not on the value:

    - identity keying keeps duplicates of a value independently sampled
      (value keying would include all-or-none of a heavy value and bias
      every quantile around it);
    - the keep decision is a pure function of the id, so per-shard
      samples UNION to exactly the global sample — mergeable across
      shards/partitions/days by construction, reproducible across runs
      and engines (the seedless-md5 discipline of sampling.py).

    Returns :func:`group_quantiles`'s shape ``(group, q, n, value)``
    computed exactly on the sample; ``n`` is the per-group SAMPLE size
    (the honest denominator — callers scale by rate_denom if they want
    population-count estimates). Standard sampling error applies: the
    q-quantile estimate's rank error is O(sqrt(q(1-q)/n_sample))."""
    if rate_denom <= 0:
        raise ValueError(f"rate_denom must be positive, got {rate_denom}")
    from .dedup import _md5_hash64_expr

    keep = (
        _md5_hash64_expr(
            F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
        )
        % F.lit(int(rate_denom))
        == 0
    )
    return group_quantiles(df.where(keep), group_col, num_col, qs)


#: ppm unit for vocab_coverage's exact ratio columns (mirrors the
#: catalog-wide micro-unit discipline; embedded in the DuckDB oracle)
PPM = 1_000_000


def vocab_coverage(
    tokens: DataFrame,
    *,
    k: int = 256,
    group_col: str = "source",
    token_col: str = "w",
) -> DataFrame:
    """Tokenizer-audit: per-group coverage of the corpus-global top-``k``
    vocabulary — the out-of-vocabulary (OOV) rate a fixed-vocab model
    pays on each source, plus the chars-per-token ratio that predicts
    its sequence-length blow-up. The vocabulary is the exact global
    top-``k`` tokens by (count desc, token asc) — deterministic, so the
    report is digit-identical in any engine.

    Returns one row per group::

        (group, n_tokens, n_oov, oov_ppm, distinct_oov, cpt_micro)

    all BIGINT: ``oov_ppm`` = n_oov·1e6 div n_tokens, ``cpt_micro`` =
    total token chars·1e6 div n_tokens (both exact floor divisions).

    Scale shape: ONE map-side-combining global ``groupBy(token)`` count
    collapses the corpus to its distinct vocabulary, the salted
    two-phase ``grouped_topk`` (constant group key, token-salted) cuts
    it to k rows with no single-reducer window, and the k-row vocab
    broadcast-left-joins back into the token stream feeding one
    per-group hash aggregate (the distinct-OOV count is Spark's
    standard two-phase distinct aggregate). Raw text never shuffles —
    only (group, token) pairs."""
    t = tokens.select(
        F.col(group_col).alias("g"), F.col(token_col).alias("w")
    )
    counts = (
        t.groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
        .withColumn("_g", F.lit(0))
    )
    vocab = grouped_topk(counts, "_g", "w", "cnt", k, salt_col="w").select(
        "w", F.lit(1).alias("_v")
    )
    j = t.join(F.broadcast(vocab), "w", "left")
    oov = F.col("_v").isNull()
    return (
        j.groupBy("g")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(oov, 1).otherwise(0)).cast("long").alias("n_oov"),
            F.count_distinct(F.when(oov, F.col("w")))
            .cast("long")
            .alias("distinct_oov"),
            F.sum(F.length("w")).cast("long").alias("_chars"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_tokens",
            "n_oov",
            F.expr(f"n_oov * {PPM} div n_tokens").alias("oov_ppm"),
            "distinct_oov",
            F.expr(f"_chars * {PPM} div n_tokens").alias("cpt_micro"),
        )
    )


def token_entropy(
    tokens: DataFrame,
    *,
    group_col: str = "source",
    token_col: str = "w",
) -> DataFrame:
    """Per-group token Shannon entropy + type-token ratio — the corpus
    DIVERSITY audit beside vocab_coverage's fixed-vocab view: a source
    whose token distribution collapsed (template spam, boilerplate
    floods) shows low entropy long before a human reads it, and mixture
    reweighting (mixture_weights, dsir) wants exactly this number per
    source.

    H = Σ_types (cnt/N)·ln(N/cnt), computed with the catalog's micro-nat
    determinism trick (operators/lm.py): each TYPE's term is rounded to
    integer micro-nats — ``round((((ln N − ln cnt) · cnt) / N) · 1e6)``,
    the identical IEEE expression tree on both engines — then
    integer-summed, so the total is order-independent under any shuffle;
    the per-type rounding error is ≤ 0.5e-6 · n_types, vocabulary-
    bounded, far under the 6-decimal report. Returns one row per group::

        (group, n_tokens, n_types, ttr_ppm, entropy6)

    ``ttr_ppm`` = n_types·1e6 div n_tokens (BIGINT floor division),
    ``entropy6`` the entropy in nats rounded to 6 decimals.

    Scale shape: one map-side-combining (group, token) count groupBy
    collapses the corpus to its per-group vocabulary; everything after
    runs on type rows (vocabulary-sized, never corpus-sized) — one
    per-group total, one broadcast-sized join back, one integer sum."""
    c = (
        tokens.select(
            F.col(group_col).alias("g"), F.col(token_col).alias("w")
        )
        .groupBy("g", "w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    n = c.groupBy("g").agg(
        F.sum("cnt").cast("long").alias("nt"),
        F.count("*").cast("long").alias("n_types"),
    )
    cnt_d = F.col("cnt").cast("double")
    nt_d = F.col("nt").cast("double")
    terms = c.join(n, "g").select(
        "g",
        F.round(
            (F.log(nt_d) - F.log(cnt_d)) * cnt_d / nt_d * F.lit(1000000.0)
        )
        .cast("long")
        .alias("term"),
    )
    s = terms.groupBy("g").agg(F.sum("term").cast("long").alias("s"))
    return n.join(s, "g").select(
        F.col("g").alias(group_col),
        F.col("nt").alias("n_tokens"),
        "n_types",
        F.expr(f"n_types * {PPM} div nt").alias("ttr_ppm"),
        F.round(F.col("s") / F.lit(1000000.0), 6).alias("entropy6"),
    )


def zipf_fit(
    tokens: DataFrame,
    *,
    group_col: str = "source",
    token_col: str = "w",
) -> DataFrame:
    """Per-group Zipf rank-frequency fit — the third corpus-law audit
    beside vocab_coverage and token_entropy: natural text follows
    freq ∝ rank^s with s ≈ −1 (Zipf 1949), and a source whose fitted
    slope drifts far from −1 is template spam (flat head, s → 0) or
    boilerplate floods (cliff past the template vocabulary). The fit is
    ordinary least squares of ln(freq) on ln(rank) over the group's
    type table.

    Determinism uses the catalog's micro-unit discipline end to end:
    ranks are exact integers ((count desc, token asc) — the standard
    tie rule), both logs are rounded to integer micro-nats per TYPE
    (the identical IEEE expression tree on both engines), and every OLS
    component — n, Σx, Σy, Σxy, Σx² — is an exact BIGINT sum of those
    integers (order-independent under any shuffle). Only the final
    slope/intercept ratio is floating point: one fixed-shape expression
    over five scalars, identical in the oracle. BIGINT bound:
    Σx·y ≈ n_types · (28e6)² needs n_types ≲ 10⁴ per group at micro
    units — vocabulary-sized by construction (drop to milli units
    for larger type tables).

    Returns one row per group::

        (group, n_types, slope6, intercept6)

    with the degenerate single-type group guarded to slope 0.0.
    Scale shape: one (group, token) count groupBy collapses the corpus;
    the rank window runs over DISTINCT TYPES per group (bounded by the
    vocabulary, not the corpus — the group_quantiles argument); one
    map-side-combining five-scalar aggregate per group finishes."""
    c = (
        tokens.select(
            F.col(group_col).alias("g"), F.col(token_col).alias("w")
        )
        .groupBy("g", "w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    rk = Window.partitionBy("g").orderBy(F.desc("cnt"), F.asc("w"))
    t = c.withColumn("r", F.row_number().over(rk)).select(
        "g",
        F.round(F.log(F.col("r").cast("double")) * F.lit(1000000.0))
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("cnt").cast("double")) * F.lit(1000000.0))
        .cast("long")
        .alias("y"),
    )
    s = t.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sx2"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    den = nd * F.col("sx2").cast("double") - sxd * sxd
    slope_raw = (nd * F.col("sxy").cast("double") - sxd * syd) / den
    return s.select(
        F.col("g").alias(group_col),
        F.col("n").alias("n_types"),
        F.when(den == 0.0, F.lit(0.0))
        .otherwise(F.round(slope_raw, 6))
        .alias("slope6"),
        F.when(den == 0.0, F.round(syd / nd / F.lit(1000000.0), 6))
        .otherwise(
            F.round((syd - slope_raw * sxd) / nd / F.lit(1000000.0), 6)
        )
        .alias("intercept6"),
    )
