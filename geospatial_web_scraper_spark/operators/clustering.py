"""Exact fixed-point Lloyd k-means over the embedding corpus.

The float :func:`..similarity.kmeans_fit` trains IVF/SemDeDup centroids
fast (BLAS, sample-sized) but its FP summation order makes it
oracle-uncheckable. This twin is the *auditable* fit: every quantity is a
64-bit integer — components quantized to micro-units ``floor(v·1e6)``
(IEEE-754-deterministic: float32→double is exact and one double multiply
rounds identically everywhere), squared-L2 distances summed in BIGINT,
centroid updates by truncating integer division (Spark ``div`` and DuckDB
``//`` both truncate toward zero) — so an unrolled DuckDB oracle
reproduces the full iteration digit-for-digit, the same fixed-point trick
as ``graph.pagerank_fixed_point``. Deterministic tie-break: the argmin key
is ``dist2·k + cid`` (dist2 ≤ dim·(2·10^6)² ≈ 2.6e14, ·k well inside
int64), so equal distances go to the smaller centroid id on both engines.

Scale shape (10^10 vectors): per iteration ONE Arrow assignment pass over
broadcast centroids (``k×dim`` int64 ndarray in the UDF closure — the
same broadcast-model shape as ``similarity.argmax_cell_kernel``; numpy
int64 arithmetic is exact, no FP anywhere) and ONE map-side-combining
groupBy on the k-sized cid key for the per-dimension sums; the only
driver materialization is the k×dim centroid table between iterations
(model-sized, the sanctioned collect class). Rows never shuffle — the
update aggregates dim partial sums per cid. Empty clusters simply drop
out of the next round's centroid set (both engines derive survivors from
the same assignment, so parity holds).

Reference parity note: the reference engine has no clustering; this is
pipeline infrastructure feeding ``similarity.semdedup`` (caller-supplied
centroids) and ``pq``/IVF coarse quantizers with an auditable trainer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: micro-unit quantization scale (matches the corpus-wide fixed-point idiom)
SCALE = 1_000_000


def quantize_expr(vec: Column) -> Column:
    """``array<long>`` micro-unit quantization ``floor(v·1e6)`` of a
    float vector — exact and engine-independent (see module doc)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(float(SCALE)))
    )


def _assign_kernel(cids: np.ndarray, cmat: np.ndarray, k: int):
    """Arrow batch kernel: exact int64 argmin of squared L2 to the
    broadcast centroids, key = dist2·k + cid (k = len of the FULL initial
    centroid set, constant across iterations so the key arithmetic never
    shifts when a cluster empties)."""

    def assign(batch: pd.Series) -> pd.DataFrame:
        mat = np.stack(batch.to_numpy()).astype(np.int64)  # n × dim
        # (n, c, dim) diffs are exact int64; sum over dim stays < 2^48
        d2 = ((mat[:, None, :] - cmat[None, :, :]) ** 2).sum(
            axis=2, dtype=np.int64
        )
        keys = d2 * np.int64(k) + cids[None, :]
        best = keys.min(axis=1)
        return pd.DataFrame(
            {"cid": best % np.int64(k), "dist2": best // np.int64(k)}
        )

    return assign


def kmeans_lloyd_exact(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``iters`` full Lloyd rounds (assign → integer-mean update) from
    the deterministic init ``centroid cid = the row with id_col == cid``
    (cid < k), then a final assignment against the last centroids →
    ``(id_col, cid, dist2)`` exact BIGINT. See module doc for the
    fixed-point contract and the per-iteration plan shape."""
    if k <= 0 or iters < 0:
        raise ValueError(f"need k > 0, iters >= 0; got k={k}, iters={iters}")
    q = emb.select(
        F.col(id_col).alias("_id"), quantize_expr(F.col(vec_col)).alias("_q")
    ).localCheckpoint(eager=False)

    init = (
        q.where(F.col("_id") < k)
        .select(F.col("_id").cast("long").alias("cid"), "_q")
        .collect()
    )
    if not init:
        raise ValueError(f"no init rows: need id_col values 0..{k - 1}")
    cids = np.array([r["cid"] for r in init], dtype=np.int64)
    cmat = np.stack([np.array(r["_q"], dtype=np.int64) for r in init])

    out_schema = T.StructType(
        [
            T.StructField("cid", T.LongType()),
            T.StructField("dist2", T.LongType()),
        ]
    )

    def assigned() -> DataFrame:
        fn = F.pandas_udf(_assign_kernel(cids, cmat, k), out_schema)
        a = q.select("_id", fn(F.col("_q")).alias("_a"))
        return a.select("_id", "_a.cid", "_a.dist2")

    dim = cmat.shape[1]
    for _ in range(iters):
        upd = (
            assigned()
            .join(q, "_id")
            .groupBy("cid")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum(F.element_at("_q", d + 1)).alias(f"_s{d}")
                    for d in range(dim)
                ],
            )
            .select(
                "cid",
                F.array(
                    *[F.expr(f"_s{d} div _n") for d in range(dim)]
                ).alias("_q"),
            )
            .collect()
        )
        cids = np.array([r["cid"] for r in upd], dtype=np.int64)
        order = np.argsort(cids)
        cids = cids[order]
        cmat = np.stack(
            [np.array(r["_q"], dtype=np.int64) for r in upd]
        )[order]

    return assigned().select(
        F.col("_id").alias(id_col), "cid", "dist2"
    )
