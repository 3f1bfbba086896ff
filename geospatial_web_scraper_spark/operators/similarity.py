"""Vector similarity operators over ``array<float>`` embedding columns.

``cosine_expr`` is the reference's C2 (``methods.go:69-133`` — parallel
partial-sum cosine with zero-vector error) as a single native Catalyst
expression: ``zip_with`` + ``aggregate`` keep it JVM-side inside whole-stage
codegen; the reference's chunked partial sums are exactly what Tungsten's
evaluation does anyway. Zero vectors yield NULL (the Go error → null+filter).

ANN search (a 100 TB training-pipeline primitive, beyond the reference):

* :func:`ann_bruteforce_topk` — exact baseline: broadcast the (small) query
  set against the corpus, rank per query. One shuffle (the per-query top-k
  window), no cartesian blowup because queries are broadcast.
* :func:`ann_lsh_topk` — the scale path: random-hyperplane LSH buckets
  (signs of dot products against deterministic pseudo-random planes),
  candidates = bucket collisions, exact cosine re-rank inside buckets.
  At 10^10 vectors the bucket join replaces the full scan per query.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """NULL when either vector has zero norm (reference zero-vector error)."""
    denom = norm2_expr(a) * norm2_expr(b)
    return F.when(denom > 0, dot_expr(a, b) / denom).otherwise(F.lit(None))


def ann_bruteforce_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector. Queries are broadcast
    (small side), so the 'cross join' is a broadcast nested-loop over the
    corpus scan — one pass, no shuffle until the per-query top-k."""
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.select(
        F.col(corpus_id), F.col(vec_col).alias("_cvec")
    ).crossJoin(F.broadcast(q)).select(
        query_id,
        corpus_id,
        cosine_expr(F.col("_cvec"), F.col("_qvec")).alias("score"),
    )
    # NULL scores (zero vectors) sort last under desc, so filtering AFTER the
    # rank cut is equivalent — and keeps the isNotNull predicate from being
    # pushed into the join condition, where Catalyst would re-evaluate the
    # whole cosine aggregate a second time per pair.
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") <= k) & F.col("score").isNotNull())
    )


def _planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature packed into a LONG bucket id."""
    bucket = F.lit(0).cast("long")
    for p_idx, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot_expr(vec, plane_col) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + bit.cast("long") * F.lit(1 << p_idx).cast("long")
    return bucket


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int | None = None,
    n_planes: int = 6,
    multiprobe: int = 1,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Bucketed ANN: equi-join on LSH bucket, exact rerank inside buckets.
    Recall < 1 by design; n_planes trades recall for candidate-set size.
    ``multiprobe=1`` additionally probes every Hamming-1 neighbor bucket on
    the (small, broadcast) query side — the standard multi-probe LSH trick:
    candidate volume grows ×(n_planes+1) per query, recall grows much more,
    and the corpus side is untouched (no extra scan or shuffle)."""
    if dim is None:
        dim = len(queries.select(vec_col).first()[0])
    planes = _planes(dim, n_planes, seed)
    c = corpus.select(
        F.col(corpus_id),
        F.col(vec_col).alias("_cvec"),
        lsh_bucket_expr(F.col(vec_col), planes).alias("_bucket"),
    )
    qb = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("_qvec"),
        lsh_bucket_expr(F.col(vec_col), planes).alias("_b0"),
    )
    if multiprobe >= 1:
        probes = F.array(
            F.col("_b0"),
            *[
                F.col("_b0").bitwiseXOR(F.lit(1 << i).cast("long"))
                for i in range(n_planes)
            ],
        )
        q = qb.select(query_id, "_qvec", F.explode(probes).alias("_bucket"))
    else:
        q = qb.withColumnRenamed("_b0", "_bucket")
    scored = c.join(F.broadcast(q), "_bucket").select(
        query_id,
        corpus_id,
        cosine_expr(F.col("_cvec"), F.col("_qvec")).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(corpus_id))
    return (
        scored.filter(F.col("score").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
