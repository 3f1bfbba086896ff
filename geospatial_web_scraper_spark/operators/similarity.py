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
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def argmax_cell_kernel(
    mat: np.ndarray, cmat: np.ndarray, cnorm: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """THE shared cosine-argmax kernel for every broadcast-centroid
    assignment (kmeans assign, :func:`..pq.residuals`,
    :func:`..pq.ivf_pq_encode`): one BLAS matmul, normalization by the
    PRODUCT of norms (the same ``dot / (|v|·|c|)`` association the native
    ``cosine_expr`` and the DuckDB oracles use), ties toward the first
    (= smallest-cid, rows pre-sorted) index. Returns ``(best_index,
    vector_norms)`` — callers must drop zero-norm rows (``vn == 0``), the
    cosine NULL contract. Centralized so the tie rule / clamping / norm
    association can never silently diverge between the three call sites.

    Honest caveat (review r3): numpy's matmul accumulates dot products in
    BLAS order while Catalyst/DuckDB fold sequentially, so two centroids
    whose cosines differ by ~1 ulp could in principle rank differently
    across backends. The assignment RULE is identical; bit-parity of the
    comparison inputs is not guaranteed by IEEE — oracle runs at both
    test scales pass, and anything nearer than ~1e-15 relative is a
    measure-zero tie in real embedding data.

    Zero-norm CENTROID columns are masked to -inf (review r4): cosine to
    a zero vector is undefined — the native ``cosine_expr`` yields NULL
    and every oracle excludes such centroids from the candidate set — so
    a zero-norm centroid must never win the argmax (before the mask, its
    clamped 0.0 won whenever every real cosine was negative). Callers
    must supply at least one non-zero-norm centroid; with none, every
    row's score is -inf and the returned index 0 is meaningless
    (:func:`semdedup` pre-filters and handles the empty case)."""
    vn = np.linalg.norm(mat, axis=1)
    cos = (mat @ cmat.T) / np.maximum(
        vn[:, None] * cnorm[None, :], 1e-300
    )
    cos[:, cnorm == 0] = -np.inf
    return cos.argmax(axis=1), vn


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


def grouped_topk(
    scored: DataFrame,
    group_col: str,
    id_col: str,
    score_col: str,
    k: int,
    salt_col: str | None = None,
    salt_parts: int = 32,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Distributed per-group top-k WITHOUT a per-group window exchange.

    ``Window.partitionBy(group).orderBy(score desc)`` over a full corpus
    scan is a skewed-shuffle scale-killer: with a handful of query keys,
    every scored row hashes to one reducer task per query, which then
    sorts the whole corpus — the single-task pattern that cannot survive
    10^10 rows. Two phases instead:

    1. **salted pre-cut** (``salt_col`` given — use it on full scans):
       rank within ``(group, pmod(xxhash64(salt_col), salt_parts))`` and
       keep ≤ k rows per salt. The shuffle is BALANCED (each group spreads
       over ``salt_parts`` reducers) and no true top-k row is lost: a row
       in the global top-k of its group is a fortiori in the top-k of the
       subset that is its salt partition.
    2. **final reduce**: ``groupBy(group).agg(slice(array_sort(
       collect_list(struct(-score, id, ...))), 1, k))`` + ``posexplode`` —
       a hash aggregate with map-side partial aggregation over the
       ≤ groups·salt_parts·k survivors; no window operator at all.

    NULL scores are dropped (the zero-vector contract); the drop happens
    AFTER the pre-cut window so Catalyst cannot push an ``isNotNull`` on
    the score expression below the projection that computes it (which
    would re-evaluate the cosine/ADC aggregate once more per row). Ties
    break toward the smaller ``id_col``, exactly like the
    ``row_number().over(partitionBy(group).orderBy(desc(score), asc(id)))``
    form this replaces; ``rank`` is 1-based. ``carry_cols`` ride along in
    the sort struct (they never affect order: (-score, id) is already a
    total order) and come back as output columns.
    """
    if salt_col is not None:
        w = Window.partitionBy(group_col, "_salt").orderBy(
            F.desc(score_col), F.asc(id_col)
        )
        scored = (
            scored.withColumn(
                "_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt_parts))
            )
            .withColumn("_pr", F.row_number().over(w))
            .where((F.col("_pr") <= k) & F.col(score_col).isNotNull())
            .drop("_salt", "_pr")
        )
    else:
        scored = scored.where(F.col(score_col).isNotNull())
    struct_fields = [
        (-F.col(score_col)).alias("_ns"),
        F.col(id_col).alias("_id"),
    ] + [F.col(c).alias(f"_c{i}") for i, c in enumerate(carry_cols)]
    agg = scored.groupBy(group_col).agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct(*struct_fields))), 1, k
        ).alias("_top")
    )
    return agg.select(
        F.col(group_col), F.posexplode("_top").alias("_pos", "_t")
    ).select(
        group_col,
        F.col("_t._id").alias(id_col),
        (-F.col("_t._ns")).alias(score_col),
        *[F.col(f"_t._c{i}").alias(c) for i, c in enumerate(carry_cols)],
        (F.col("_pos") + 1).alias("rank"),
    )


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
    corpus scan — one pass, no shuffle until the (salted two-phase)
    per-query top-k reduce."""
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
    # full scan per query → salted two-phase reduce; never a window
    # hash-partitioned on the (tiny-cardinality) query_id alone
    return grouped_topk(scored, query_id, corpus_id, "score", k, salt_col=corpus_id)


def _planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def md5_planes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes derived from md5 — the values
    are reproducible in any SQL engine as
    ``('0x' || substr(md5(p || ':' || d), 1, 4))::INT / 65535.0 - 0.5``,
    which lets a DuckDB oracle replicate the exact LSH bucket assignment
    (value-for-value, including the sign of every dot product)."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:4], 16) / 65535.0 - 0.5
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


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
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Bucketed ANN: equi-join on LSH bucket, exact rerank inside buckets.
    Recall < 1 by design; n_planes trades recall for candidate-set size.
    ``multiprobe=1`` additionally probes every Hamming-1 neighbor bucket on
    the (small, broadcast) query side — the standard multi-probe LSH trick:
    candidate volume grows ×(n_planes+1) per query, recall grows much more,
    and the corpus side is untouched (no extra scan or shuffle)."""
    if planes is None:
        if dim is None:
            dim = len(queries.select(vec_col).first()[0])
        planes = _planes(dim, n_planes, seed)
    else:
        n_planes = len(planes)
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
    # candidates are bucket-bounded, but a hot bucket is still a skewed key:
    # the same salted two-phase reduce keeps every reducer task ≤ k·|salts|
    return grouped_topk(scored, query_id, corpus_id, "score", k, salt_col=corpus_id)


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: ``(id_a < id_b, cosine ≥ τ)``.

    The fourth dedup family (alongside exact / MinHash / SimHash): duplicates
    by *semantic* similarity of an embedding column. With ``planes`` given,
    candidates are restricted to LSH bucket collisions (equi-join — the
    10^10-row path, same blocking idea as MinHash bands); without, the exact
    all-pairs self-join (bounded subsets / verify stage)."""
    base = emb.select(F.col(id_col), F.col(vec_col).alias("_v")).withColumn(
        "_n", norm2_expr(F.col("_v"))
    )
    if planes is not None:
        base = base.withColumn("_bucket", lsh_bucket_expr(F.col("_v"), planes))
        join_on = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")) & (
            F.col("a._bucket") == F.col("b._bucket")
        )
    else:
        join_on = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    # materialize norms (and buckets) per ROW before the self-join —
    # projection collapse would otherwise inline norm2 into the post-join
    # projection and recompute it per PAIR (measured 3× on the all-pairs
    # benchmark); the checkpointed side is tiny (id, vec, norm)
    base = base.localCheckpoint()
    a, b = base.alias("a"), base.alias("b")
    score = F.when(
        (F.col("a._n") > 0) & (F.col("b._n") > 0),
        dot_expr(F.col("a._v"), F.col("b._v")) / (F.col("a._n") * F.col("b._n")),
    )
    return (
        a.join(b, join_on)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(score, 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic distributed spherical k-means (Lloyd's) → the centroid
    table :func:`ann_ivf_topk` takes as input. → (cid, embedding).

    Per iteration: one corpus scan assigns each vector to its max-cosine
    centroid — a per-row Arrow-vectorized numpy argmax against the
    centroid matrix carried as broadcast model weights, so assignment
    SHUFFLES NOTHING (no groupBy, no join; the r2 form's
    ``groupBy(id, vector)`` argmax exchanged every vector once per
    iteration) — then new centroids are elementwise means via posexplode
    → groupBy(cid, dim): one shuffle of (cid, dim, value) scalars, never
    of whole vectors. Deterministic by construction: init = the k
    smallest ids, ties broken toward the smaller centroid id (numpy
    argmax first-index over cid-sorted rows), zero-norm vectors are
    unassigned (the cosine NULL contract), empty cells keep their
    previous centroid. At 10^10 vectors this is the standard pattern: k
    is thousands (still driver-collectable model weights), and the
    per-iteration cost is one scan + one scalar-triple shuffle."""
    cent = emb.orderBy(id_col).limit(k).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("embedding")
    ).localCheckpoint(eager=True)
    base = emb.select(F.col(id_col), F.col(vec_col).alias("_v")).localCheckpoint()
    for _ in range(iters):
        rows = cent.orderBy("cid").collect()
        cids = np.array([r["cid"] for r in rows], dtype=np.int64)
        cmat = np.stack(
            [np.asarray(r["embedding"], dtype=np.float64) for r in rows]
        )
        cnorm = np.linalg.norm(cmat, axis=1)
        dim = cmat.shape[1]

        @F.pandas_udf(T.LongType())
        def assign(vs: pd.Series) -> pd.Series:
            out = [None] * len(vs)
            ok = vs.map(lambda v: v is not None and len(v) == dim)
            if ok.any():
                mat = np.stack(vs[ok].map(np.asarray).to_numpy()).astype(
                    np.float64
                )
                best, vn = argmax_cell_kernel(mat, cmat, cnorm)
                for p, b, n in zip(np.flatnonzero(ok.to_numpy()), best, vn):
                    if n > 0:
                        out[p] = int(cids[b])
            return pd.Series(out, dtype="object")

        assigned = base.select(
            id_col, "_v", assign(F.col("_v")).alias("cid")
        ).where(F.col("cid").isNotNull())
        dims = assigned.select(
            "cid", F.posexplode(F.col("_v")).alias("_d", "_x")
        )
        means = (
            dims.groupBy("cid", "_d")
            .agg(F.avg(F.col("_x").cast("double")).alias("_mu"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_d"), F.col("_mu")))
                    ),
                    lambda s: s["_mu"],
                ).alias("embedding")
            )
        )
        # empty cells keep their previous centroid (left join, coalesce)
        cent = (
            cent.alias("old")
            .join(means.alias("new"), "cid", "left")
            .select(
                "cid",
                F.coalesce(F.col("new.embedding"), F.col("old.embedding")).alias(
                    "embedding"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return cent


def ann_ivf_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    corpus_id: str = "vec_id",
    centroid_id: str = "cid",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: partition the corpus into Voronoi cells around the
    (small, broadcast) centroid set — each vector assigned to its
    max-cosine centroid — then answer queries by probing only the
    ``n_probe`` nearest cells and exact-reranking inside them.

    At 10^10 vectors this is the standard scale path: the corpus is scanned
    once for assignment (a broadcast nested-loop against |C| centroids,
    no shuffle), written partitioned by cell, and each query touches
    n_probe/|C| of the data. Centroids would come from k-means sampling in
    production; they are an input here so the assignment itself stays
    deterministic and oracle-checkable."""
    cent = centroids.select(F.col(centroid_id), F.col(vec_col).alias("_cv"))

    def _scored(side: DataFrame, side_id: str, keep_vec: str) -> DataFrame:
        return side.select(F.col(side_id), F.col(vec_col).alias(keep_vec)).crossJoin(
            F.broadcast(cent)
        ).select(
            side_id,
            keep_vec,
            centroid_id,
            cosine_expr(F.col(keep_vec), F.col("_cv")).alias("_cscore"),
        )

    # corpus → its single best cell: a hash aggregate (max over a
    # (score, -cid) struct), never a window — partial aggregation folds the
    # |C| candidate rows per vector back to one BEFORE the shuffle, so the
    # exchange carries N vectors, not N·|C|
    cells = (
        _scored(corpus, corpus_id, "_v")
        .where(F.col("_cscore").isNotNull())
        .groupBy(corpus_id, "_v")
        .agg(
            F.max(
                F.struct(F.col("_cscore"), (-F.col(centroid_id)).alias("_nc"))
            ).alias("_m")
        )
        .select(corpus_id, "_v", (-F.col("_m._nc")).alias(centroid_id))
    )
    probes = grouped_topk(
        _scored(queries, query_id, "_qv"),
        query_id,
        centroid_id,
        "_cscore",
        n_probe,
        carry_cols=("_qv",),
    ).select(query_id, "_qv", centroid_id)
    scored = cells.join(F.broadcast(probes), centroid_id).select(
        query_id,
        corpus_id,
        cosine_expr(F.col("_v"), F.col("_qv")).alias("score"),
    )
    # candidates are cell-bounded but still concentrate per query key —
    # same salted two-phase reduce as the full-scan paths
    return grouped_topk(scored, query_id, corpus_id, "score", k, salt_col=corpus_id)


def ivf_assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    corpus_id: str = "vec_id",
    centroid_id: str = "cid",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (corpus_id, cid): each vector's max-cosine Voronoi cell — the
    partitioner :func:`ann_ivf_topk` applies internally, exported so
    IVF-PQ (``operators.pq.ann_ivf_pq_topk``) and offline cell-partitioned
    writes can reuse the exact same deterministic assignment (broadcast
    nested-loop over |C| centroids, ties toward the smaller cid, zero
    shuffle of the corpus)."""
    cent = centroids.select(F.col(centroid_id), F.col(vec_col).alias("_cv"))
    scored = corpus.select(F.col(corpus_id), F.col(vec_col).alias("_v")).crossJoin(
        F.broadcast(cent)
    ).select(
        corpus_id,
        centroid_id,
        cosine_expr(F.col("_v"), F.col("_cv")).alias("_cs"),
    )
    # argmax as a hash aggregate (max over a (score, -cid) struct): the |C|
    # candidate rows per vector fold map-side, and no window ever sorts them
    return (
        scored.filter(F.col("_cs").isNotNull())
        .groupBy(corpus_id)
        .agg(
            F.max(
                F.struct(F.col("_cs"), (-F.col(centroid_id)).alias("_nc"))
            ).alias("_m")
        )
        .select(corpus_id, (-F.col("_m._nc")).alias(centroid_id))
    )


def semdedup(
    emb: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "cid",
    max_cell: int | None = 100_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    cluster-then-prune — the 5th dedup family (exact / MinHash / SimHash /
    embedding-LSH / semantic-cluster), the one production corpus builds run
    over embedding columns when near-dup pairs are *paraphrases*, not
    shared shingles.

    Every non-zero-norm vector is assigned to its max-cosine centroid cell
    (``argmax_cell_kernel`` over the broadcast centroid matrix — per-row
    Arrow, ZERO shuffle of the corpus, the same deterministic tie rule as
    ``ivf_assign_cells`` / k-means assign), then within each cell a vector
    is dropped iff some smaller-id cell-mate has cosine ≥ ``threshold``
    (keep-min-id — the deterministic form of the paper's keep-one-per-
    epsilon-group; decidable per row from pairs, no iteration).

    → ``(id_col, cid, kept:boolean)`` for every non-zero-norm vector
    (zero-norm rows are unassignable — the cosine NULL contract — and
    excluded, as in :func:`ann_ivf_topk`).

    Scale shape: assignment scans once and shuffles nothing; the only
    exchange is the within-cell self-join — an equi-join on ``cid`` whose
    quadratic term is bounded per cell, which is the paper's own cost
    model (pick k ~ sqrt(N) cells so cells stay ~sqrt(N)). Norms and cell
    ids are materialized (localCheckpoint) BEFORE the self-join so
    projection collapse cannot re-derive them per pair (measured 3× on the
    embedding near-dup benchmark).

    That cost model is ENFORCED, not assumed (review r3): centroids are
    caller-supplied, and the classic web-corpus failure mode — boilerplate
    pages collapsing into one mega-cluster — would silently make that
    cell's self-join quadratic-hot. A cell with more than ``max_cell``
    members raises ValueError (one O(cells) hash-agg over the already-
    checkpointed assignment — no extra corpus scan) naming the hot cells;
    re-cluster with more centroids (k ~ sqrt(N) keeps cells at the
    10^10-corpus design point under the 100k default) or raise/disable
    the bound (``max_cell=None``) when the quadratic term is intended.

    Zero-norm CENTROIDS are excluded before assignment — cosine to a zero
    vector is undefined, so such a row can never own a cell (matching the
    DuckDB oracle, which drops them from the candidate set; review r4).
    With no usable centroid at all the result is empty."""
    rows = [
        r
        for r in centroids.orderBy(centroid_id).collect()
        if any(x != 0 for x in r[vec_col])
    ]
    if not rows:
        return (
            emb.select(F.col(id_col))
            .limit(0)
            .withColumn(centroid_id, F.lit(None).cast("long"))
            .withColumn("kept", F.lit(True))
        )
    cids = np.array([r[centroid_id] for r in rows], dtype=np.int64)
    cmat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    cnorm = np.linalg.norm(cmat, axis=1)
    dim = cmat.shape[1]

    @F.pandas_udf(T.LongType())
    def assign(vs: pd.Series) -> pd.Series:
        out = [None] * len(vs)
        ok = vs.map(lambda v: v is not None and len(v) == dim)
        if ok.any():
            mat = np.stack(vs[ok].map(np.asarray).to_numpy()).astype(np.float64)
            best, vn = argmax_cell_kernel(mat, cmat, cnorm)
            for p, b, n in zip(np.flatnonzero(ok.to_numpy()), best, vn):
                if n > 0:
                    out[p] = int(cids[b])
        return pd.Series(out, dtype="object")

    base = (
        emb.select(F.col(id_col), F.col(vec_col).alias("_v"))
        .withColumn("_n", norm2_expr(F.col("_v")))
        .withColumn(centroid_id, assign(F.col("_v")))
        .where(F.col(centroid_id).isNotNull() & (F.col("_n") > 0))
        .localCheckpoint()
    )
    if max_cell is not None:
        hot = (
            base.groupBy(centroid_id)
            .count()
            .where(F.col("count") > max_cell)
            .orderBy(F.desc("count"))
            .limit(5)
            .collect()
        )
        if hot:
            detail = ", ".join(
                f"{centroid_id}={r[centroid_id]}:{r['count']}" for r in hot
            )
            raise ValueError(
                f"semdedup cell(s) exceed max_cell={max_cell} ({detail}); "
                "the within-cell self-join would go quadratic on them — "
                "re-cluster with more centroids (k ~ sqrt(N)) or pass "
                "max_cell=None to accept the cost"
            )
    a, b = base.alias("a"), base.alias("b")
    dropped = (
        a.join(
            b,
            (F.col(f"a.{centroid_id}") == F.col(f"b.{centroid_id}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"b.{id_col}").alias(id_col),
            F.round(
                dot_expr(F.col("a._v"), F.col("b._v"))
                / (F.col("a._n") * F.col("b._n")),
                6,
            ).alias("_cos"),
        )
        .where(F.col("_cos") >= threshold)
        .select(id_col)
        .distinct()
        .withColumn("_drop", F.lit(True))
    )
    return (
        base.select(id_col, centroid_id)
        .join(dropped, id_col, "left")
        .select(id_col, centroid_id, F.col("_drop").isNull().alias("kept"))
    )
