"""Fixed-point power iteration over an embedding table — the spectral
sibling of ``graph.link_pagerank``'s exact-integer iteration.

``power_iteration_top_component`` computes the dominant right singular
direction of the (uncentered) embedding matrix G — the top principal
axis of GᵀG — entirely in BIGINT arithmetic so the result is
bit-identical between Spark and the unrolled DuckDB oracle
(``entry_queries._pca_oracle_sql``): floating-point cross-row sums are
shuffle-order-dependent, integer sums are not.

The fixed-point scheme (constants repr-embedded in the oracle — change
them HERE and the oracle generator together):

- ``SX`` — embeddings quantize once as ``q_ij = floor(x_ij · SX)``
  (floor of an exactly-promoted float32 is engine-independent).
- ``SV`` — the iterate v is held in integer units ``vq_j`` of ``1/SV``.
- per row:  ``s_i   = Σ_j q_ij · vq_j``            (exact BIGINT)
- downscale ``sd_i  = s_i div SX``                  (trunc toward zero —
  Spark ``div``, DuckDB ``//`` and Python's trunc all agree, verified)
- per dim:  ``w_j   = Σ_i q_ij · sd_i``             (exact BIGINT)
- normalize ``vq'_j = w_j div max(max_j|w_j| div SV, 1)`` so
  ``|vq'| ≈ SV`` with integer ops only (no sqrt anywhere).

A fixed ``iters`` count makes the output a closed-form function of the
input — no convergence test, so the oracle can unroll the exact same
number of rounds.

Scale shape (10^10 rows): the quantized projection is materialized once;
each iteration is ONE map-side-combining groupBy over ``dim`` keys (the
Gᵀ side — 64 keys, partial sums combine before the shuffle) plus a
model-sized collect (d longs), exactly the kmeans/pagerank driver-state
pattern. The per-row fold (G v) never shuffles. BIGINT headroom: with
``SX = SV = 10^6`` and |x| ≤ 1 the per-dim sum carries ~10^13 per row —
safe to ~10^5 rows per the default scales; at larger n lower ``SX`` (the
per-term magnitude falls quadratically) or aggregate per-partition into
DECIMAL(38,0). Reference scope: beyond the Go crawler; first-class
LLM-pipeline operator (embedding-space analysis) per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SX = 10**6  # embedding quantization scale
SV = 10**6  # iterate (component vector) scale


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division for b > 0 (Python ``//``
    floors, which disagrees with Spark ``div`` / DuckDB ``//`` on
    negative dividends)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def quantize(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """→ one column ``q``: the BIGINT fixed-point projection of
    ``vec_col`` (``floor(x · SX)`` element-wise)."""
    return df.select(
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x * F.lit(float(SX))).cast("long"),
        ).alias("q")
    )


def _dim_products(qdf: DataFrame, vq: list[int]) -> DataFrame:
    """One power-iteration round as a DataFrame: per dim ``j`` the exact
    integer sum ``w_j = Σ_i q_ij · (Σ_k q_ik vq_k div SX)`` — the plan the
    scale pin inspects (explode → map-side-combining HashAggregate on d
    keys; no window, no cartesian)."""
    vlit = F.array(*[F.lit(int(v)).cast("long") for v in vq])
    s = F.aggregate(
        F.zip_with(F.col("q"), vlit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, y: acc + y,
    )
    return (
        qdf.withColumn("s", s)
        .withColumn("sd", F.expr(f"s div {SX}"))
        .select(F.col("sd"), F.posexplode("q").alias("j", "qx"))
        .groupBy("j")
        .agg(F.sum(F.col("qx") * F.col("sd")).alias("w"))
    )


def power_iteration_top_component(
    df: DataFrame,
    vec_col: str = "embedding",
    iters: int = 4,
) -> DataFrame:
    """Dominant principal axis of the (uncentered) embedding matrix via
    ``iters`` fixed-point power-iteration rounds from the all-ones start
    (see module docstring for the exact integer scheme and why it is
    oracle-exact).

    → ``(dim_id INT, pc1_q BIGINT, w_raw BIGINT)``: the final iterate in
    ``1/SV`` units plus the pre-normalization per-dim sum of the last
    round (both value-checked by the oracle). ``pc1_q / SV`` is the unit
    (∞-norm) direction estimate; its sign follows the all-ones start.

    Convergence is the usual power-iteration (λ₂/λ₁)^iters: on a
    spectrum with a real gap a handful of rounds suffice
    (numpy-direction golden in tests); on gap-free data (iid-noise
    embeddings — the synthetic sf tables measure λ₂/λ₁ ≈ 0.98) no
    iteration count finds a "top" axis because none exists, and the
    output is simply the exact ``iters``-round iterate (still
    deterministic and oracle-checked bit-for-bit)."""
    spark = df.sparkSession
    head = df.select(F.size(vec_col).alias("d")).first()
    if head is None:
        raise ValueError(
            "power_iteration_top_component: input DataFrame is empty — "
            "no embedding rows to derive a dimensionality from"
        )
    d = head["d"]
    qdf = quantize(df, vec_col).localCheckpoint()
    vq = [SV] * d
    w = [0] * d
    for _ in range(int(iters)):
        rows = _dim_products(qdf, vq).collect()
        got = {r["j"]: int(r["w"]) for r in rows}
        w = [got.get(j, 0) for j in range(d)]
        md = max(_tdiv(max(abs(x) for x in w), SV), 1)
        vq = [_tdiv(x, md) for x in w]
    out = [(j, vq[j], w[j]) for j in range(d)]
    return spark.createDataFrame(out, "dim_id int, pc1_q long, w_raw long")
