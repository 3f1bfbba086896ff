"""Product quantization (IVF-PQ-style) for embedding columns.

Completes the ANN family (brute-force → LSH → IVF in
``operators/similarity.py``) with the standard 10^10-vector memory path:
each ``dim``-float vector is compressed to ``m`` one-byte codes (one per
subspace), and queries score compressed vectors through a per-query lookup
table without ever touching the original floats (asymmetric distance
computation, ADC — Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011; same layout FAISS uses).

Scale shape, by stage:

* :func:`pq_fit` — Lloyd's per subspace, all ``m`` subspaces trained in ONE
  dataflow: vectors explode into (sub_id, subvec) rows once, assignment is
  an Arrow-vectorized numpy argmin against the broadcast codebook (the
  classic "UDF is fine when it's a BLAS kernel" case), and the centroid
  update shuffles only (sub_id, code, dim, value) scalars — never whole
  vectors. Deterministic: init = subvectors of the ``k`` smallest ids,
  numpy argmin ties break toward the smaller code.
* :func:`pq_encode` — one scan, no shuffle: same vectorized argmin; output
  is ``array<smallint>`` (m bytes of information per vector — a 64-dim
  float32 row shrinks 64→256:4, i.e. ×64 at m=4).
* :func:`ann_pq_topk` — the per-row hot path is 100% JVM-side whole-stage
  codegen: a coded corpus row scores with ``zip_with(codes, lut,
  (c, row) -> row[c])`` summed — no Python per corpus row, no shuffle
  until the per-query top-k. The per-QUERY lookup table ``lut[m][k]`` is
  built either as a native literal expression (tiny codebooks) or by one
  Arrow batch on the broadcast query side (``_lut_col`` dispatches on
  ``_LUT_LITERAL_BUDGET``; outputs are bit-identical).
* :func:`ivf_pq_encode` / ``ann_ivf_pq_topk(by_residual=True)`` — the
  FAISS IVFPQ design proper: codes quantize the residual
  v − centroid[cell] (one fused, shuffle-free build scan), and serving
  adds the per-(query, probed-cell) scalar q·centroid to the ADC sum.
  Residual codebooks spend their bits on within-cell spread, which is
  what makes PQ able to RANK neighbors inside a cell.

The corpus side reads only ``(vec_id, codes)`` — at 10^10 rows that is the
whole point: the scan is ~m bytes/row instead of 4·dim, fits page cache,
and the optional exact re-rank touches original vectors for just the
top-``refine`` ADC candidates per query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .similarity import (
    argmax_cell_kernel,
    cosine_expr,
    dot_expr,
    grouped_topk,
)


def _check_dims(dim: int, m: int) -> int:
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")
    return dim // m


def _codebook_np(codebooks: DataFrame) -> np.ndarray:
    """(sub_id, code, codeword) rows → ndarray (m, k, ds). The codebook is
    a model, not data: m·k·ds floats (e.g. 4·16·16 = 1 KiB), so a driver
    collect is the broadcast, exactly like ML model weights."""
    rows = codebooks.select("sub_id", "code", "codeword").collect()
    m = max(r["sub_id"] for r in rows) + 1
    k = max(r["code"] for r in rows) + 1
    ds = len(rows[0]["codeword"])
    cb = np.zeros((m, k, ds), dtype=np.float64)
    for r in rows:
        cb[r["sub_id"], r["code"]] = r["codeword"]
    return cb


def _argmin_codes(mat: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """mat (n, dim) × cb (m, k, ds) → codes (n, m) by min L2 per subspace.
    ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² is constant per argmin, so
    rank by (||c||² - 2x·c) — one einsum, no n×k×ds temporary."""
    n, dim = mat.shape
    m, k, ds = cb.shape
    x = mat.reshape(n, m, ds)
    # scores[n, m, k]
    scores = np.einsum("nms,mks->nmk", x, cb) * -2.0 + (cb * cb).sum(-1)[None]
    return scores.argmin(axis=2)


def pq_encode(
    emb: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id_col, codes: array<smallint>[m]). Arrow-batched numpy argmin
    against the broadcast codebook; nulls/malformed rows get NULL codes."""
    cb = _codebook_np(codebooks)
    dim = cb.shape[0] * cb.shape[2]

    @F.pandas_udf(T.ArrayType(T.ShortType()))
    def encode(vs: pd.Series) -> pd.Series:
        ok = vs.map(lambda v: v is not None and len(v) == dim)
        out = pd.Series([None] * len(vs), dtype=object)
        if ok.any():
            mat = np.stack(vs[ok].map(np.asarray).to_numpy()).astype(np.float64)
            codes = _argmin_codes(mat, cb).astype(np.int16)
            for p, c in zip(np.flatnonzero(ok.to_numpy()), codes):
                out.iat[p] = c.tolist()
        return out

    return emb.select(F.col(id_col), encode(F.col(vec_col)).alias("codes"))


def pq_fit(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train per-subspace codebooks → (sub_id, code, codeword).

    One explode of the training set into (id, sub_id, subvec); per Lloyd
    iteration: vectorized argmin assignment (no shuffle) + elementwise
    mean via posexplode → groupBy(sub_id, code, dim) (scalar shuffle).
    Empty cells keep their previous codeword. In production the training
    set is a sample (``emb.sample(...)``) — PQ codebooks need ~100k rows,
    not the corpus.

    NULL-safe (review r3): :func:`residuals` emits ``(id, cid=NULL,
    embedding=NULL)`` for zero-norm vectors (the cosine NULL contract), and
    the documented ``by_residual`` flow trains on that output — NULL and
    empty rows are dropped up front, which also matches the
    ``ann_ivf_pq_residual`` DuckDB oracle's ``norm > 0`` init filter."""
    emb = emb.where(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0)
    )
    first = emb.select(vec_col).first()
    if first is None:
        raise ValueError("pq_fit: no non-null training vectors")
    dim = len(first[0])
    ds = _check_dims(dim, m)
    subs = emb.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[
                F.slice(F.col(vec_col), j * ds + 1, ds) for j in range(m)
            ])
        ).alias("sub_id", "subvec"),
    ).localCheckpoint()

    # deterministic init: per subspace, the subvectors of the k smallest ids
    w = Window.partitionBy("sub_id").orderBy(id_col)
    cb_df = (
        subs.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k)
        .select("sub_id", (F.col("_r") - 1).alias("code"),
                F.col("subvec").alias("codeword"))
        .localCheckpoint(eager=True)
    )

    for _ in range(iters):
        cb = _codebook_np(cb_df)

        @F.pandas_udf(T.ShortType())
        def assign(sub_id: pd.Series, sv: pd.Series) -> pd.Series:
            out = np.empty(len(sv), dtype=np.int16)
            sid = sub_id.to_numpy()
            mat = np.stack(sv.map(np.asarray).to_numpy()).astype(np.float64)
            for j in np.unique(sid):
                sel = sid == j
                scores = mat[sel] @ cb[j].T * -2.0 + (cb[j] * cb[j]).sum(-1)
                out[sel] = scores.argmin(axis=1)
            return pd.Series(out)

        assigned = subs.select(
            "sub_id", "subvec",
            assign(F.col("sub_id"), F.col("subvec")).alias("code"),
        )
        means = (
            assigned.select(
                "sub_id", "code",
                F.posexplode(F.col("subvec")).alias("_d", "_x"),
            )
            .groupBy("sub_id", "code", "_d")
            .agg(F.avg(F.col("_x").cast("double")).alias("_mu"))
            .groupBy("sub_id", "code")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_d"), F.col("_mu")))
                    ),
                    lambda s: s["_mu"],
                ).alias("codeword")
            )
        )
        cb_df = (
            cb_df.alias("old")
            .join(means.alias("new"), ["sub_id", "code"], "left")
            .select(
                "sub_id", "code",
                F.coalesce(F.col("new.codeword"), F.col("old.codeword")).alias(
                    "codeword"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return cb_df


def _centroids_np(
    centroids: DataFrame,
    centroid_id: str = "cid",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """Centroid table → (cids sorted asc, matrix[|C|, dim]). Like the
    codebook, centroids are model weights (|C|·dim floats): a driver
    collect IS the broadcast."""
    rows = centroids.select(centroid_id, vec_col).collect()
    cids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    order = np.argsort(cids)
    return cids[order], mat[order]


def residuals(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "cid",
) -> DataFrame:
    """→ (id_col, cid, vec_col = v − centroid[cid]) in ONE shuffle-free
    scan: cell assignment (max-cosine, ties toward the smaller cid — the
    same rule as :func:`..similarity.ivf_assign_cells`, via the shared
    :func:`..similarity.argmax_cell_kernel`; see that kernel's docstring
    for the honest IEEE near-tie caveat vs the sequential fold) and residual
    subtraction fused in a single Arrow batch against the broadcast
    centroid matrix. Train the residual codebook on a SAMPLE of this
    (FAISS ``by_residual``): residuals carry the within-cell signal that
    raw-vector PQ quantizes away, which is what makes IVF-PQ rank
    neighbors INSIDE a cell."""
    cids, cmat = _centroids_np(centroids, centroid_id, vec_col)
    cnorm = np.linalg.norm(cmat, axis=1)
    dim = cmat.shape[1]

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("cid", T.LongType()),
                T.StructField("res", T.ArrayType(T.DoubleType())),
            ]
        )
    )
    def assign_residual(vs: pd.Series) -> pd.DataFrame:
        out_cid = [None] * len(vs)
        out_res = [None] * len(vs)
        ok = vs.map(lambda v: v is not None and len(v) == dim)
        if ok.any():
            mat = np.stack(vs[ok].map(np.asarray).to_numpy()).astype(
                np.float64
            )
            # argmax first-index = smallest cid after the sort in
            # _centroids_np — same tie rule as ivf_assign_cells
            best, vn = argmax_cell_kernel(mat, cmat, cnorm)
            res = mat - cmat[best]
            for p, b, r, n in zip(
                np.flatnonzero(ok.to_numpy()), best, res, vn
            ):
                if n > 0:  # zero vectors have no cell (cosine NULL contract)
                    out_cid[p] = int(cids[b])
                    out_res[p] = r.tolist()
        return pd.DataFrame({"cid": out_cid, "res": out_res})

    return emb.select(
        F.col(id_col), assign_residual(F.col(vec_col)).alias("_ar")
    ).select(
        id_col,
        F.col("_ar.cid").alias(centroid_id),
        F.col("_ar.res").alias(vec_col),
    )


def ivf_pq_encode(
    emb: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "cid",
) -> DataFrame:
    """The one-pass IVF-PQ build scan → (id_col, cid, codes).

    Fuses cell assignment, residual subtraction, and PQ encoding of the
    residual into a single Arrow batch per partition: the corpus is read
    ONCE and nothing shuffles — both models (centroids + residual
    codebooks) ride into the workers as numpy broadcast weights. This is
    the index-build dataflow FAISS calls IVFPQ with ``by_residual=true``;
    at 10^10 rows you'd follow it with a write partitioned/bucketed by
    ``cid`` so serving probes prune at the file level."""
    cids, cmat = _centroids_np(centroids, centroid_id, vec_col)
    cnorm = np.linalg.norm(cmat, axis=1)
    cb = _codebook_np(codebooks)
    dim = cb.shape[0] * cb.shape[2]
    if cmat.shape[1] != dim:
        raise ValueError(
            f"centroid dim {cmat.shape[1]} != codebook dim {dim}"
        )

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("cid", T.LongType()),
                T.StructField("codes", T.ArrayType(T.ShortType())),
            ]
        )
    )
    def enc(vs: pd.Series) -> pd.DataFrame:
        out_cid = [None] * len(vs)
        out_codes = [None] * len(vs)
        ok = vs.map(lambda v: v is not None and len(v) == dim)
        if ok.any():
            mat = np.stack(vs[ok].map(np.asarray).to_numpy()).astype(
                np.float64
            )
            best, vn = argmax_cell_kernel(mat, cmat, cnorm)
            codes = _argmin_codes(mat - cmat[best], cb).astype(np.int16)
            for p, b, c, n in zip(
                np.flatnonzero(ok.to_numpy()), best, codes, vn
            ):
                if n > 0:
                    out_cid[p] = int(cids[b])
                    out_codes[p] = c.tolist()
        return pd.DataFrame({"cid": out_cid, "codes": out_codes})

    return emb.select(
        F.col(id_col), enc(F.col(vec_col)).alias("_e")
    ).select(
        id_col,
        F.col("_e.cid").alias(centroid_id),
        F.col("_e.codes").alias("codes"),
    )


# m·k·ds literal nodes the native LUT expression may embed before the Arrow
# path wins. Measured on this box: 1024 literals cost ~3-4 s of Janino
# compile PER EXECUTION (uncached — the literal tree is unique per
# codebook) vs ~0 for the pandas_udf; 2048 literals cost ~27 s. The
# fallback is bit-identical (sequential accumulation in the same IEEE
# order as the native fold), so the only trade is where the per-QUERY
# table is built — the per-row ADC scan stays native codegen either way.
_LUT_LITERAL_BUDGET = 256


def _lut_expr(qvec: Column, cb: np.ndarray) -> Column:
    """Native ADC lookup table for one query row: lut[j][t] =
    dot(q_sub_j, codeword[j][t]) — built entirely from the codebook
    LITERAL, so the whole thing stays in codegen. Only safe for small
    codebooks (≤ ``_LUT_LITERAL_BUDGET`` m·k·ds literals); use
    :func:`_lut_col`, which dispatches."""
    m, k, ds = cb.shape
    return F.array(*[
        F.array(*[
            F.aggregate(
                F.zip_with(
                    F.slice(qvec, j * ds + 1, ds),
                    F.array(*[F.lit(float(x)) for x in cb[j, t]]),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for t in range(k)
        ])
        for j in range(m)
    ])


def _lut_pandas_udf(cb: np.ndarray):
    """Arrow-batched LUT builder for codebooks too large to embed as
    literals (k=256-style FAISS configs): one einsum per query batch,
    (n,m,ds)×(m,k,ds)→(n,m,k). Runs only on the broadcast query side —
    n = |queries|, so the Python cost is per-query, never per-corpus-row."""
    m, k, ds = cb.shape
    cbm = np.ascontiguousarray(cb, dtype=np.float64)

    @F.pandas_udf(T.ArrayType(T.ArrayType(T.DoubleType())))
    def lut(qvecs: pd.Series) -> pd.Series:
        q = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in qvecs]
        ).reshape(len(qvecs), m, ds)
        # accumulate over the ds axis IN INDEX ORDER so every lut entry is
        # the same IEEE-754 sum the native fold produces (acc=0.0; acc+=x_t
        # for t=0..ds-1) — bit-identical outputs keep the DuckDB oracle
        # hashes stable whichever path a codebook size selects
        luts = np.zeros((len(qvecs), m, cbm.shape[1]), dtype=np.float64)
        for t in range(ds):
            luts += q[:, :, None, t] * cbm[None, :, :, t]
        return pd.Series([[row.tolist() for row in l] for l in luts])

    return lut


def _lut_col(qvec: Column, cb: np.ndarray) -> Column:
    """ADC LUT for one query row — native codegen expression when the
    codebook is small enough to embed, pandas_udf past the literal budget
    (ADVICE r2: m·k·ds ≈ 32k literal nodes breaks Janino)."""
    m, k, ds = cb.shape
    if m * k * ds <= _LUT_LITERAL_BUDGET:
        return _lut_expr(qvec, cb)
    return _lut_pandas_udf(cb)(qvec)


def adc_score_expr(codes: Column, lut: Column) -> Column:
    """Σ_j lut[j][codes[j]] — the per-row ADC inner product; pure codegen."""
    return F.aggregate(
        F.zip_with(codes, lut, lambda c, row: F.element_at(row, c + 1)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ann_pq_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 10,
    refine: int = 0,
    corpus: DataFrame | None = None,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by ADC inner product over PQ codes.

    ``codes`` = output of :func:`pq_encode`; queries (small side) are
    broadcast carrying their native-built LUTs. With ``refine > 0`` the
    top-``refine`` ADC candidates per query are re-ranked by exact cosine
    against ``corpus`` (a semi-join touching only candidate rows — the
    IVF-PQ refinement stage)."""
    cb = _codebook_np(codebooks)
    q = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("_qvec"),
        _lut_col(F.col(vec_col), cb).alias("_lut"),
    )
    # only (query_id, corpus_id, adc) flows into the top-k shuffle — the
    # query vector is re-attached AFTER the rank cut (broadcast join with
    # the tiny query set), so the wide ADC scan shuffles 3 scalars per row
    scored = (
        codes.where(F.col("codes").isNotNull())
        .crossJoin(F.broadcast(q.drop("_qvec")))
        .select(
            query_id,
            corpus_id,
            adc_score_expr(F.col("codes"), F.col("_lut")).alias("adc"),
        )
    )
    # full compressed scan per query → salted two-phase reduce (pre-cut per
    # (query_id, salt) partition, then a hash-aggregate top-k) — never a
    # window hash-partitioned on query_id alone, which would funnel all
    # 10^10 scored codes per query into one reducer task
    cut = max(k, refine)
    top = grouped_topk(scored, query_id, corpus_id, "adc", cut, salt_col=corpus_id)
    if refine <= 0 or corpus is None:
        return top.select(
            query_id, corpus_id, F.round(F.col("adc"), 6).alias("adc"), "rank"
        )
    exact = top.join(
        F.broadcast(q.select(query_id, "_qvec")), query_id
    ).join(
        corpus.select(F.col(corpus_id), F.col(vec_col).alias("_cvec")),
        corpus_id,
    ).select(
        query_id,
        corpus_id,
        F.round(F.col("adc"), 6).alias("adc"),
        cosine_expr(F.col("_cvec"), F.col("_qvec")).alias("score"),
    )
    # the refine set is ≤ refine·|queries| rows — the plain (unsalted)
    # hash-aggregate top-k suffices
    return grouped_topk(
        exact, query_id, corpus_id, "score", k, carry_cols=("adc",)
    ).select(query_id, corpus_id, "adc", "score", "rank")


def write_ivf_pq_index(
    coded: DataFrame, path: str, centroid_id: str = "cid"
) -> None:
    """Materialize the fused :func:`ivf_pq_encode` output partitioned by
    cell. This is the claim "probes prune at the file level" made
    executable: the directory layout is ``cid=<c>/``, so a serving read
    that filters on the probed cells never opens the other cells' files —
    at 10^10 codes the scan cost is ``n_probe/nlist`` of the index BY
    CONSTRUCTION of the storage, not by a post-scan filter."""
    coded.write.mode("overwrite").partitionBy(centroid_id).parquet(path)


def load_ivf_pq_cells(
    spark,
    path: str,
    cids: list[int] | None = None,
    centroid_id: str = "cid",
) -> DataFrame:
    """Read the partitioned index, optionally pruned to ``cids`` — the
    filter is a partition predicate (``PartitionFilters`` in the physical
    plan; pinned by tests/test_scale_plan.py), so only the probed cells'
    files are listed and read. Feed the result to
    :func:`ann_ivf_pq_topk` as ``codes`` with ``cells=None``."""
    df = spark.read.parquet(path)
    if cids is not None:
        df = df.where(F.col(centroid_id).isin([int(c) for c in cids]))
    return df.select(
        *[c for c in df.columns if c != centroid_id],
        F.col(centroid_id).cast("long").alias(centroid_id),
    )


def ann_ivf_pq_topk(
    codes: DataFrame,
    cells: DataFrame | None,
    centroids: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    refine: int = 0,
    corpus: DataFrame | None = None,
    by_residual: bool = False,
    corpus_id: str = "vec_id",
    centroid_id: str = "cid",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FAISS-style IVF-PQ: probe ``n_probe`` Voronoi cells, score ONLY the
    probed cells' PQ codes by ADC, optionally exact-refine.

    ``cells`` = (corpus_id, cid) from :func:`..similarity.ann_ivf_topk`'s
    assignment (or any partitioner); ``codes`` = :func:`pq_encode` output.
    The two tables join on the id (colocate them by bucketing on it in
    production); pass ``cells=None`` when ``codes`` already carries the
    ``cid`` column (the fused :func:`ivf_pq_encode` output — no join at
    all). Queries broadcast with their LUTs, and the scan touches
    ``n_probe/|C|`` of the compressed corpus — the standard 10^10-vector
    serving shape: IVF bounds the scan, PQ bounds the bytes.

    ``by_residual=True`` (FAISS IVFPQ default): codes quantize the
    RESIDUAL v − centroid[cid], so the ADC estimate of q·v decomposes as
    q·centroid[cid] (one scalar per probed (query, cell), computed in the
    probe stage) + LUT-sum over the residual codewords. Same per-row scan
    cost, dramatically finer within-cell ranking — the residual codebook
    spends its 2^bits on the spread INSIDE a cell instead of the spread of
    the whole space.
    """
    from .similarity import cosine_expr as _cos  # noqa: F401 (refine path)

    cb = _codebook_np(codebooks)
    cent = centroids.select(F.col(centroid_id), F.col(vec_col).alias("_cv"))
    probe_carry = ("_qv", "_qc") if by_residual else ("_qv",)
    probes = grouped_topk(
        queries.select(F.col(query_id), F.col(vec_col).alias("_qv"))
        .crossJoin(F.broadcast(cent))
        .select(
            query_id,
            "_qv",
            centroid_id,
            _cos(F.col("_qv"), F.col("_cv")).alias("_cs"),
            *(
                [dot_expr(F.col("_qv"), F.col("_cv")).alias("_qc")]
                if by_residual
                else []
            ),
        ),
        query_id,
        centroid_id,
        "_cs",
        n_probe,
        carry_cols=probe_carry,
    ).select(query_id, "_qv", centroid_id,
             *(["_qc"] if by_residual else []))
    q = probes.select(
        query_id,
        centroid_id,
        "_qv",
        *(["_qc"] if by_residual else []),
        _lut_col(F.col("_qv"), cb).alias("_lut"),
    )
    coded_cells = codes if cells is None else codes.join(cells, corpus_id)
    adc = adc_score_expr(F.col("codes"), F.col("_lut"))
    if by_residual:
        adc = adc + F.col("_qc")
    scored = coded_cells.where(F.col("codes").isNotNull()).join(
        F.broadcast(q.drop("_qv")), centroid_id
    ).select(
        query_id,
        corpus_id,
        adc.alias("adc"),
    )
    # probed-cell scan → same salted two-phase reduce as ann_pq_topk: IVF
    # bounds the candidate volume, the salt bounds the per-task volume
    cut = max(k, refine)
    top = grouped_topk(scored, query_id, corpus_id, "adc", cut, salt_col=corpus_id)
    if refine <= 0 or corpus is None:
        return top.select(
            query_id, corpus_id, F.round(F.col("adc"), 6).alias("adc"), "rank"
        )
    exact = top.join(
        F.broadcast(q.select(query_id, "_qv").dropDuplicates([query_id])),
        query_id,
    ).join(
        corpus.select(F.col(corpus_id), F.col(vec_col).alias("_cvec")),
        corpus_id,
    ).select(
        query_id,
        corpus_id,
        F.round(F.col("adc"), 6).alias("adc"),
        _cos(F.col("_cvec"), F.col("_qv")).alias("score"),
    )
    return grouped_topk(
        exact, query_id, corpus_id, "score", k, carry_cols=("adc",)
    ).select(query_id, corpus_id, "adc", "score", "rank")
