"""Deduplication operators for web-scale training data.

Four families, each a standard large-corpus technique re-expressed as
DataFrame dataflow (no per-row Python except the SimHash pandas UDF, which
is Arrow-batched numpy):

* **exact** — md5 of normalized text, first-wins by min id. One shuffle.
* **MinHash + LSH** — word-shingle minhash signatures (one md5-based base
  hash per shingle, k affine universal families ``(a·h+b) mod P`` folded by
  explode → groupBy(min×k) — one shuffle, whole-stage codegen), banded into
  b buckets; candidate pairs are bucket collisions (self-join on band
  hash), then verified with exact word-set Jaccard. This is the canonical
  near-dup pipeline at 10^10 docs: the band join replaces the quadratic
  pairwise scan, and the verify join only sees collision candidates.
* **SimHash** — 64-bit sign-aggregated token hashes (Arrow/numpy UDF),
  near-dups = signatures within a Hamming radius, bucketed by the 4×16-bit
  block trick (Manku et al., WWW'07) so the comparison is again an
  equi-join, not a scan.
* **n-gram / word-set Jaccard** — exact similarity on exploded distinct
  tokens: explode → self-join on token → |A∩B| / (|A|+|B|−|A∩B|).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.ckpt import checkpoint as _stats_reset_checkpoint
from .textstats import tokens_expr, winnow_fingerprints_expr, word_ngrams_expr


# --------------------------------------------------------------------- exact
def normalized_text_expr(text: Column) -> Column:
    return F.array_join(tokens_expr(text), " ")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (content_hash, n_dups, keep_id): one row per distinct content,
    keep_id = lowest id (first-wins, the crawl F1 policy applied to content)."""
    return (
        df.select(
            F.md5(normalized_text_expr(F.col(text_col))).alias("content_hash"),
            F.col(id_col),
        )
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("keep_id"),
        )
    )


# ------------------------------------------------------------------- minhash
_MINHASH_P = 2147483647  # Mersenne prime 2^31-1: a*h + b stays inside int64


def _md5_hash64_expr(s: Column) -> Column:
    """60-bit positive hash from md5 (first 15 hex chars). Chosen over
    xxhash64 because md5 is bit-identical in every SQL engine, which lets
    DuckDB oracle-check the whole MinHash+LSH pipeline value-for-value."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def minhash_coefficients(k: int = 16) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the k universal hash families,
    derived from md5 so the DuckDB oracle embeds the identical literals.
    a_i odd, both < 2^29 → a*h + b < 2^61 (no int64 overflow anywhere)."""
    import hashlib

    def _h7(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)

    return [(_h7(f"a{i}") * 2 + 1, _h7(f"b{i}")) for i in range(k)]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    ngram: int = 3,
) -> DataFrame:
    """→ (id, sig array<long>): k-family minhash over word n-gram shingles.

    Scale shape: ONE strong hash per shingle (md5-based, SQL-portable), then
    k cheap affine families ``(a_i*h + b_i) mod P`` folded by a single
    explode → groupBy(min×k). Everything stays in whole-stage codegen and
    each shingle is hashed exactly once — the earlier per-family md5
    (k × shingles md5 evaluations, re-run on every projection-collapsed
    pass) measured ~40× slower on the 5k-doc benchmark. At 10^10 docs this
    is also the right dataflow: the signature table is one shuffle, written
    once, and the band join reads it instead of recomputing text hashes."""
    grams = df.select(
        F.col(id_col),
        F.explode(word_ngrams_expr(F.col(text_col), ngram)).alias("_s"),
    )
    h = (_md5_hash64_expr(F.col("_s")) % F.lit(_MINHASH_P)).alias("_h")
    hashed = grams.select(id_col, h)
    aggs = [
        F.min((F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(_MINHASH_P)).alias(f"_m{i}")
        for i, (a, b) in enumerate(minhash_coefficients(k))
    ]
    return (
        hashed.groupBy(id_col)
        .agg(*aggs)
        .select(id_col, F.array(*[f"_m{i}" for i in range(k)]).alias("sig"))
    )


def minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    ngram: int = 3,
) -> DataFrame:
    """→ (id_col, band_idx, band_hash): the LSH banding of the minhash
    signatures — the table a committed corpus PERSISTS so future batches
    join against it instead of re-banding the corpus (see
    :func:`incremental_dedup`)."""
    rows_per_band = k // bands
    sig = minhash_signatures(df, text_col, id_col, k, ngram)
    return sig.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: _md5_hash64_expr(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice("sig", b * rows_per_band + 1, rows_per_band),
                            lambda h: h.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band_idx", "band_hash"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    ngram: int = 3,
) -> DataFrame:
    """→ candidate near-dup pairs (id_a < id_b) from LSH band collisions.
    The banded signature table is localCheckpoint'ed: it is tiny (k longs
    per doc) and both sides of the self-join read it without re-deriving
    signatures from text."""
    banded = minhash_bands(df, text_col, id_col, k, bands, ngram).localCheckpoint()
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


# ------------------------------------------------------------------- jaccard
def wordset_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Exact word-set Jaccard over all pairs via token explode + equi-join
    (|A∩B| from the join, sizes from a groupBy) — the verify stage for LSH
    candidates, or standalone on bounded subsets."""
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens_expr(F.col(text_col)))).alias("w")
    )
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    ngram: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Full pipeline: LSH candidates → exact n-gram-set Jaccard verify."""
    cand = minhash_lsh_candidates(df, text_col, id_col, k, bands, ngram)
    grams = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams_expr(F.col(text_col), ngram))).alias("g"),
    )
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("sz"))
    ga = grams.select(F.col(id_col).alias("id_a"), F.col("g"))
    gb = grams.select(F.col(id_col).alias("id_b"), F.col("g"))
    inter = (
        cand.join(ga, "id_a")
        .join(gb, ["id_b", "g"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def lsh_recall_eval(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    ngram: int = 3,
    pct_floor: int = 1,
) -> DataFrame:
    """Candidate-stage recall of the MinHash-LSH banding vs EXACT gram-set
    Jaccard ground truth → ``(pct_bucket, n_truth, n_caught, recall6)``,
    one row per integer similarity percentile bucket (``floor(100·J)``).
    The dedup twin of ``ann_recall_eval``: before you trust an LSH config
    (k hashes, b bands) to dedup a corpus, measure where its collision
    S-curve ``1-(1-s^(k/b))^b`` actually lands on YOUR data — truth pairs
    the banding misses are duplicates that survive dedup.

    Truth is computed INDEPENDENTLY of the candidate set: every pair
    sharing ≥1 shingle via the gram inverted-index equi-join (exact for
    any ``pct_floor`` ≥ 1, since J > 0 requires a shared gram — never a
    cartesian), bucketed by exact-integer arithmetic
    (``n_inter·100 ≥ u·pct_floor`` / ``floor(n_inter·100/u)``, no float
    thresholds to disagree across engines). ``n_caught`` counts truth
    pairs present in :func:`minhash_lsh_candidates`' band-collision
    output.

    Scale shape: exact all-pairs truth is O(sample²) worst case — run
    this on a BOUNDED eval sample (the catalog row caps ``doc_id``), the
    way you'd audit a production dedup config; the candidate side is the
    unchanged production LSH join. Exact-duplicate pairs (identical gram
    sets ⇒ identical signatures ⇒ identical bands) are caught with
    probability 1, so the top bucket's recall is exactly 1.0 — pinned in
    tests/test_dedup_recall.py."""
    cand = minhash_lsh_candidates(df, text_col, id_col, k, bands, ngram)
    grams = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_ngrams_expr(F.col(text_col), ngram))
        ).alias("g"),
    )
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("sz"))
    ga = grams.select(F.col(id_col).alias("id_a"), "g")
    gb = grams.select(F.col(id_col).alias("id_b"), "g")
    inter = (
        ga.join(gb, (ga["g"] == gb["g"]) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    truth = (
        inter.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")),
            "id_b",
        )
        .withColumn("u", F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
        .filter(F.col("n_inter") * 100 >= F.col("u") * pct_floor)
        .withColumn("pct_bucket", F.floor(F.col("n_inter") * 100 / F.col("u")))
    )
    flagged = truth.join(
        cand.withColumn("hit", F.lit(1)), ["id_a", "id_b"], "left"
    ).withColumn("hit", F.coalesce("hit", F.lit(0)))
    return (
        flagged.groupBy("pct_bucket")
        .agg(
            F.count("*").cast("long").alias("n_truth"),
            F.sum("hit").cast("long").alias("n_caught"),
        )
        .withColumn(
            "recall6",
            F.round(F.col("n_caught") / F.col("n_truth"), 6),
        )
    )


# ----------------------------------------------------------- containment
def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    window: int = 4,
    threshold: float = 0.5,
    max_df: int = 20,
    hash_fn=None,
) -> DataFrame:
    """Directional Broder containment C(A⊆B) = |fp(A)∩fp(B)| / |fp(A)|
    over winnowing fingerprints (Broder, SEQUENCES'97 "resemblance and
    containment"; fingerprints per Schleimer et al., SIGMOD'03) →
    ``(src_id, dst_id, containment)`` rows where at least ``threshold``
    of src's fingerprints also occur in dst. Catches the asymmetric
    duplication that symmetric Jaccard near-dup structurally misses: a
    short page quoted inside a long one, a partial scrape, a
    boilerplate-wrapped mirror — resemblance of a small doc against a
    huge superset is ~0 while containment is ~1.

    Scale shape (100 TB): one explode of the per-doc DISTINCT
    fingerprint set, then a document-frequency cap (``max_df``) applied
    BEFORE pair generation — simultaneously the skew guard for the
    fingerprint equi-join (no hot boilerplate fingerprint survives with
    more than ``max_df`` rows, so the join's per-key fan-out is bounded
    by ``max_df²``) and a precision filter (ubiquitous fingerprints
    carry no containment signal). Candidate pairs come from the
    fingerprint equi-join; sizes from one scalar aggregate. No quadratic
    stage. The capped fingerprint table is localCheckpoint'ed so the
    self-join reads it instead of re-deriving the higher-order winnow
    expression on both sides (the projection-collapse recompute trap);
    at cluster scale swap that for ``persist(DISK_ONLY)``."""
    fp_expr = winnow_fingerprints_expr(
        F.col(text_col), n=n, window=window, hash_fn=hash_fn
    )
    fps = df.select(F.col(id_col), F.explode(fp_expr).alias("fp"))
    rare = fps.groupBy("fp").agg(F.count("*").alias("dfreq"))
    kept = fps.join(
        rare.filter(F.col("dfreq") <= max_df).select("fp"), "fp"
    ).localCheckpoint()
    sizes = kept.groupBy(id_col).agg(F.count("*").alias("n_fp"))
    a = kept.alias("a")
    b = kept.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("src_id"),
            F.col(f"b.{id_col}").alias("dst_id"),
        )
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(
            sizes.select(F.col(id_col).alias("src_id"), "n_fp"), "src_id"
        )
        .withColumn(
            "containment",
            F.round(F.col("shared") / F.col("n_fp").cast("double"), 6),
        )
        .filter(F.col("containment") >= threshold)
        .select("src_id", "dst_id", "containment")
    )


# -------------------------------------------------------------- components
def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """→ (id, component): connected components of the near-dup pair graph
    by STAR CONTRACTION — the step that turns pairwise near-duplicates
    into dedup GROUPS (keep one doc per component).

    r5 rewrite: the previous one-hop min-label propagation needed
    diameter-many rounds (measured 65 at sf0.1 on the radius-chain geo
    graph — chains with monotone ids defeat plain pointer jumping, since
    each node's best label is only one hop closer to the min). Star
    contraction is the standard worst-case-logarithmic MapReduce CC
    shape instead: each outer round (1) labels every node with the min
    of itself and its 1-hop neighbors (one edge groupBy — every
    non-isolated node merges into a strictly-smaller neighbor ball, so
    the supernode count at least HALVES per round ⇒ ≤ log₂ n outer
    rounds for any id ordering), (2) compresses the resulting pointer
    forest to its roots by label-of-label doubling (cheap label-table
    self-joins, ≤ log₂ chain length), (3) rewrites the edge list
    through the round's labels, dropping self-loops and duplicates —
    the contracted edge set shrinks geometrically, so total work ≈ 2×
    the first round. The per-round label tables are composed into the
    final id→component mapping BACKWARD after the loop (suffix-compose
    from the last, smallest table up: join sizes telescope to ≈2n
    total, versus folding an n-row global mapping every round). All
    steps are id-keyed equi-joins / hash aggregates; nothing is
    diameter-bounded.

    Compression runs to the pointer-forest roots (full compression is
    what makes the halving guarantee ordering-independent: with partial
    compression an increasing-id chain shifts injectively and nothing
    merges), detected by the monotone label sum — labels only ever
    decrease, so an unchanged decimal label-sum ⇔ all pointers are
    roots (decimal because at corpus scale ids are full-range hashes
    and ~1e10 of them would overflow an int64 sum). Doublings needed =
    log₂ of the longest pointer chain, so the inner loop is log-bounded
    too. The outer loop ends when the contracted edge set is empty.
    Deterministic: component id = min member id (the component min is a
    local min in every round, so it survives as its own supernode and
    every other member contracts into it). Every step checkpoints
    through :func:`...functions.ckpt.checkpoint` — localCheckpoint plus
    a Catalyst size-statistics RESET, because self-join chains SQUARE
    the copied sizeInBytes estimate per step and the driver ends up in
    multi-megabit BigInteger math (measured r5: 43 s of driver CPU for
    a 2-row round). Fail-loud past ``max_iters`` on either loop — with
    halving / doubling those bounds mean >2^max_iters nodes, i.e. they
    only fire on a real bug."""
    raw = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    # checkpoint the symmetrized base ONCE — mapping and edges both
    # derive from it, and the upstream pair plan (a banded self-join or
    # a grid radius join) must not be evaluated twice
    sym = _stats_reset_checkpoint(
        raw.unionByName(
            raw.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
    )
    # the output covers every endpoint (self-loop-only nodes keep their
    # own id, matching the old propagation's init), but self-loops never
    # enter the contraction
    mapping = _stats_reset_checkpoint(
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    edges = _stats_reset_checkpoint(
        sym.filter(F.col("a") != F.col("b")).distinct()
    )

    def _compress(lab: DataFrame) -> DataFrame:
        """Pointer-double ``(id, lbl)`` to its forest roots: lbl ← lbl(lbl)
        until the (monotone-decreasing) label sum stops changing.
        Checkpoint per step — a lazy f∘f references f twice, so an
        unmaterialized doubling chain is an exponentially-sized plan."""
        prev = None
        for _ in range(max_iters):
            lab = _stats_reset_checkpoint(
                lab.alias("x")
                .join(
                    lab.alias("y"),
                    F.col("x.lbl") == F.col("y.id"),
                    "left",
                )
                .select(
                    F.col("x.id").alias("id"),
                    F.coalesce(F.col("y.lbl"), F.col("x.lbl")).alias("lbl"),
                )
            )
            cur = lab.agg(
                F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
            ).collect()[0]["s"]
            if prev is not None and cur == prev:
                return lab
            prev = cur
        raise RuntimeError(
            f"connected_components pointer compression did not converge "
            f"in {max_iters} doublings (chain longer than 2^{max_iters})"
        )

    labs: list[DataFrame] = []
    for _ in range(max_iters):
        if edges.isEmpty():
            break
        # star step: every node points at the min of its 1-hop ball
        lab = _compress(
            _stats_reset_checkpoint(
                edges.groupBy("a")
                .agg(F.min("b").alias("nb"))
                .select(
                    F.col("a").alias("id"),
                    F.least(F.col("a"), F.col("nb")).alias("lbl"),
                )
            )
        )
        labs.append(lab)
        # contract: rewrite both endpoints through the labels, drop the
        # collapsed self-loops and merged duplicates
        la = lab.select(
            F.col("id").alias("a"), F.col("lbl").alias("na")
        )
        lb = lab.select(
            F.col("id").alias("b"), F.col("lbl").alias("nb2")
        )
        edges = _stats_reset_checkpoint(
            edges.join(la, "a")
            .join(lb, "b")
            .select(F.col("na").alias("a"), F.col("nb2").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
    else:
        # a silent exit here would present non-converged labels as final
        # components — wrong dedup groups with no symptom
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            f"contraction rounds: the pair graph would need more than "
            f"2^{max_iters} nodes for that, so this is a bug, not a "
            "data-shape problem"
        )
    # suffix-compose the per-round labels, smallest first: comp_r maps
    # round-r supernodes to their FINAL roots. A round-r label absent
    # from comp_{r+1} became edge-isolated after round r — already final
    # (left join + coalesce keeps it).
    comp = None
    for lab in reversed(labs):
        if comp is None:
            comp = lab.select("id", F.col("lbl").alias("component"))
            continue
        comp = _stats_reset_checkpoint(
            lab.alias("l")
            .join(comp.alias("c"), F.col("l.lbl") == F.col("c.id"), "left")
            .select(
                F.col("l.id").alias("id"),
                F.coalesce(F.col("c.component"), F.col("l.lbl")).alias(
                    "component"
                ),
            )
        )
    if comp is None:
        return mapping  # no edges at all: every endpoint is its own root
    # nodes never contracted (self-loop-only) keep their own id
    return (
        mapping.alias("m")
        .join(comp.alias("c"), "id", "left")
        .select(
            F.col("id"),
            F.coalesce(F.col("c.component"), F.col("m.component")).alias(
                "component"
            ),
        )
    )


# ------------------------------------------------------------------- simhash
@F.pandas_udf(T.LongType())
def simhash64_udf(tokens: pd.Series) -> pd.Series:
    """64-bit SimHash over a token array column. Arrow-batched numpy; token
    hashes via blake2b-8 (deterministic across sessions, unlike Python's
    builtin hash).

    Vectorized per batch: each DISTINCT token in the batch is hashed once
    and expanded to its ±1 bit-vote row (natural-language batches repeat
    tokens heavily, so this collapses most of the hashing), then per-row
    votes are a segment-sum over the flattened token stream — no per-token
    Python inside the row loop. Measured ~4× over the naive per-token loop
    on the 5k-doc benchmark."""
    if len(tokens) == 0:
        return pd.Series(np.empty(0, dtype=np.int64))
    lengths = np.array(
        [0 if t is None else len(t) for t in tokens], dtype=np.int64
    )
    flat: list[str] = []
    for t in tokens:
        if t is not None and len(t) > 0:
            flat.extend(t)
    if not flat:
        return pd.Series(np.zeros(len(tokens), dtype=np.int64))
    uniq, inv = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
    votes_u = np.empty((len(uniq), 64), dtype=np.int64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for u_i, tok in enumerate(uniq):
        h = np.uint64(
            int.from_bytes(
                hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "big"
            )
        )
        votes_u[u_i] = np.where((h >> bit_idx) & np.uint64(1) == 1, 1, -1)
    # segment-sum the per-token votes back into rows
    row_of = np.repeat(np.arange(len(tokens)), lengths)
    acc = np.zeros((len(tokens), 64), dtype=np.int64)
    np.add.at(acc, row_of, votes_u[inv])
    weights = (np.uint64(1) << bit_idx).astype(np.uint64)
    sigs = ((acc > 0).astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
    sigs = np.where(lengths > 0, sigs, np.uint64(0))
    return pd.Series(sigs.astype(np.int64))


def simhash48_expr(tokens: Column) -> Column:
    """48-bit SimHash as a pure Catalyst expression (no Python): token hashes
    are the first 12 hex chars of md5 (bit-identical in every SQL engine →
    DuckDB can oracle-check the whole near-dup pipeline), per-bit ±1 votes
    folded with ``aggregate``. 48 bits so the signature and all shifts stay
    exact in a signed 64-bit long everywhere."""
    # note (r5 audit): `hashes` is the aggregate's INPUT argument, not a
    # subtree inside its lambda, so ordinary subexpression elimination
    # dedupes it across the 48 votes — measured identical wall time with
    # an explicit array-bind. The no-CSE trap only bites subtrees INSIDE
    # a lambda body (winnow_fingerprints_expr, token_window_spans_expr).
    hashes = F.transform(
        tokens, lambda t: F.conv(F.substring(F.md5(t), 1, 12), 16, 10).cast("long")
    )
    sig = F.lit(0).cast("long")
    for b in range(48):
        vote = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        sig = sig + F.when(vote > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def simhash_neardup_pairs_native(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 6,
    n_blocks: int = 4,
) -> DataFrame:
    """SimHash near-dup with the all-native 48-bit signature: Manku block
    candidates (4 × 12-bit equi-join) then exact Hamming verify — zero
    Python, fully oracle-checkable. Semantically the same dataflow as
    :func:`simhash_neardup_pairs`; this variant trades the numpy kernel for
    end-to-end SQL portability."""
    bits_per_block = 48 // n_blocks
    mask = (1 << bits_per_block) - 1
    sigs = df.select(
        F.col(id_col), simhash48_expr(tokens_expr(F.col(text_col))).alias("sig")
    )
    blocks = sigs.select(
        id_col,
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sig"), b * bits_per_block).bitwiseAND(
                        F.lit(mask)
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("block_idx", "block_val"),
    )
    a = blocks.alias("a")
    b = blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))
    )


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ radius. Blocking uses the
    Manku 4-block trick: signatures within distance ≤3 must agree exactly on
    at least one of 4 16-bit blocks → equi-join per block, then exact
    Hamming verify via bit_count(xor)."""
    sigs = df.select(
        F.col(id_col),
        simhash64_udf(tokens_expr(F.col(text_col))).alias("sig"),
    )
    blocks = sigs.select(
        id_col,
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sig"), b * 16).bitwiseAND(F.lit(0xFFFF))
                    for b in range(4)
                ]
            )
        ).alias("block_idx", "block_val"),
    )
    a = blocks.alias("a")
    b = blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def keep_canonical(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """The APPLY stage of the dedup pipeline: filter a corpus to one
    canonical document per near-dup group, keeping every ungrouped doc.

    ``components`` is :func:`connected_components` output (id, component)
    with component = min member id, so exactly the rows with
    component != id are the duplicates to drop — expressed as a LEFT-ANTI
    join against that (narrow, grouped-subset-only) id set. Docs absent
    from the pair graph and each group's canonical member pass through
    untouched. At 10^10 docs the drop set is the duplicate fraction only;
    when it broadcasts, the corpus is filtered inside its own scan with no
    shuffle of the wide document columns at all — the same J1 shape as the
    crawl's seen anti-join."""
    non_canonical = components.where(
        F.col("component") != F.col("id")
    ).select(F.col("id").alias(id_col))
    return docs.join(non_canonical, id_col, "left_anti")


def incremental_dedup(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    ngram: int = 3,
    threshold: float = 0.7,
    corpus_hashes: DataFrame | None = None,
    corpus_bands: DataFrame | None = None,
    corpus_gram_counts: DataFrame | None = None,
) -> DataFrame:
    """Admission filter for a continuously-ingesting corpus build: admit
    only the genuinely-new documents of an incoming batch against an
    already-committed corpus. → surviving (id_col, content_hash).

    Three gates, cheapest first:

    1. exact-vs-corpus: drop batch docs whose normalized ``content_hash``
       is already committed — a left-anti equi-join on the hash (one
       scalar shuffle, never the text).
    2. exact-within-batch: first-wins per batch content hash (the crawl F1
       policy applied to content).
    3. near-vs-corpus: the batch survivors' minhash LSH bands equi-join the
       corpus bands — candidates are bounded by band collisions, never
       batch × corpus — then exact n-gram-set Jaccard verifies CANDIDATE
       pairs only; a batch doc within ``threshold`` of any committed doc
       is dropped.

    Within-batch NEAR dups are deliberately admitted: near-dup groups need
    canonical *selection* (:func:`minhash_neardup_pairs` →
    :func:`connected_components` → :func:`keep_canonical`), not admission
    filtering — run the full pipeline over the batch before calling this.

    Scale shape: the committed side is touched ONLY through artifacts that
    are per-doc-bounded — the distinct hash set, the band table, and the
    per-doc gram counts — and the committed TEXT is n-gram-exploded only
    for the band-collision candidate ids (an explicit broadcast semi-join
    BEFORE the explode, pinned by
    tests/test_scale_plan.py::test_incremental_verify_is_candidate_bounded),
    so a batch's cost is O(batch + collisions), independent of corpus
    size. At 10^10 committed docs you don't even re-derive the artifacts:
    pass the ones persisted at commit time — ``corpus_hashes``
    (content_hash; :func:`exact_dedup`-shaped), ``corpus_bands``
    (doc_id/``id_col``, band_idx, band_hash; :func:`minhash_bands`
    output) and ``corpus_gram_counts`` (``id_col``, n_grams) — and the
    only committed-text scan left is the candidate-sliced verify read."""
    new_h = new_docs.select(
        F.col(id_col),
        F.md5(normalized_text_expr(F.col(text_col))).alias("content_hash"),
    )
    corpus_h = (
        corpus_hashes.select("content_hash").distinct()
        if corpus_hashes is not None
        else corpus_docs.select(
            F.md5(normalized_text_expr(F.col(text_col))).alias("content_hash")
        ).distinct()
    )
    # gate 1 + 2
    s2 = (
        new_h.join(corpus_h, "content_hash", "left_anti")
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "content_hash")
    )
    survivors = new_docs.join(s2.select(id_col), id_col)
    # gate 3: band-collision candidates (batch survivor, committed doc)
    nb = minhash_bands(survivors, text_col, id_col, k, bands, ngram)
    cb = (
        corpus_bands.select(
            F.col(id_col).alias("_cid"), "band_idx", "band_hash"
        )
        if corpus_bands is not None
        else minhash_bands(corpus_docs, text_col, id_col, k, bands, ngram)
        .select(F.col(id_col).alias("_cid"), "band_idx", "band_hash")
    )
    # the candidate set is re-read three times below (verify explode,
    # gram counts when underived, the intersection join) — materialize it
    # once so the band self-join never recomputes
    cand = (
        nb.join(cb, ["band_idx", "band_hash"])
        .select(F.col(id_col), F.col("_cid"))
        .distinct()
        .localCheckpoint()
    )
    cand_ids = F.broadcast(cand.select("_cid").distinct())
    # exact n-gram Jaccard on candidates only (same formula as the batch
    # verify stage in minhash_neardup_pairs). The committed side is
    # candidate-bounded BEFORE any gram is generated: the broadcast
    # semi-join on _cid sits under the explode, so committed text never
    # streams through the gram shuffle for non-candidate docs (the r3
    # scale defect — gate 3 used to explode the whole corpus per batch).
    gn = survivors.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_ngrams_expr(F.col(text_col), ngram))
        ).alias("g"),
    )
    gc = (
        corpus_docs.select(F.col(id_col).alias("_cid"), F.col(text_col))
        .join(cand_ids, "_cid")
        .select(
            "_cid",
            F.explode(
                F.array_distinct(word_ngrams_expr(F.col(text_col), ngram))
            ).alias("g"),
        )
    )
    sz_n = gn.groupBy(id_col).agg(F.count("*").alias("_szn"))
    sz_c = (
        corpus_gram_counts.select(
            F.col(id_col).alias("_cid"), F.col("n_grams").alias("_szc")
        ).join(cand_ids, "_cid")
        if corpus_gram_counts is not None
        else gc.groupBy("_cid").agg(F.count("*").alias("_szc"))
    )
    inter = (
        cand.join(gn, id_col)
        .join(gc, ["_cid", "g"])
        .groupBy(id_col, "_cid")
        .agg(F.count("*").alias("_inter"))
    )
    near_dropped = (
        inter.join(sz_n, id_col)
        .join(sz_c, "_cid")
        .where(
            F.round(
                F.col("_inter")
                / (F.col("_szn") + F.col("_szc") - F.col("_inter")).cast(
                    "double"
                ),
                6,
            )
            >= threshold
        )
        .select(id_col)
        .distinct()
    )
    return s2.join(near_dropped, id_col, "left_anti")


# --------------------------------------------------------- span-level dedup
def token_window_spans_expr(text: Column, span_tokens: int = 12) -> Column:
    """Non-overlapping ``span_tokens``-token windows of a document, each
    joined back to a string — the deterministic "sentence" proxy this
    corpus needs (its synthetic text has no newlines or punctuation). On
    real web text pass ``F.split(text, '\\n')`` (or a sentence splitter)
    to :func:`span_dedup` instead; the dedup dataflow is span-agnostic."""
    # bind the token array once (r5): `slice(toks, start, …)` inside the
    # transform lambda re-derives the whole tokenization per span (no CSE
    # in HOF lambdas — the winnow trap). Parity on this corpus's ~50-token
    # docs (4 spans), but real web documents are 10-100× longer and the
    # unbound form is O(n²/span) in them.
    def _spans(t: Column) -> Column:
        n = F.size(t)
        return F.when(
            n > 0,
            F.transform(
                F.sequence(F.lit(1), n, F.lit(span_tokens)),
                lambda start: F.array_join(
                    F.slice(t, start, span_tokens), " "
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.get(F.transform(F.array(tokens_expr(text)), _spans), 0)


def span_dedup(
    df: DataFrame,
    spans_expr: Column | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style cross-document span dedup (Raffel et al., JMLR'20 §2.2
    removed any three-sentence span occurring more than once in the
    corpus): every span occurrence except its global first — first =
    lowest (doc id, span index) — is dropped, and each document is
    reassembled from its surviving spans.

    → one row per document with ≥1 span:
    ``(id_col, n_spans, n_kept, kept_hash)`` where ``kept_hash`` is the md5
    of the surviving spans joined in document order (the reassembled text's
    identity, without re-emitting the text).

    Scale shape (10^10 docs): the global first-occurrence decision is a
    groupBy on ``md5(span)`` with map-side partial aggregation — duplicate
    mass combines before the shuffle, so a boilerplate span repeated 10^9
    times contributes one row per map task, not 10^9 shuffled rows (the
    skew-safe alternative to a window over the span hash). The winners
    table (one row per DISTINCT span) then hash-joins back; only that join
    and the per-document reassembly shuffle span text, each exactly once.
    AQE's skew-join split covers residual hot hashes on the probe side."""
    if spans_expr is None:
        spans_expr = token_window_spans_expr(F.col(text_col))
    exploded = df.select(
        F.col(id_col), F.posexplode(spans_expr).alias("span_idx", "span")
    ).withColumn("span_hash", F.md5("span"))
    winners = exploded.groupBy("span_hash").agg(
        F.min(F.struct(F.col(id_col), F.col("span_idx"))).alias("_first")
    )
    flagged = exploded.join(winners, "span_hash").withColumn(
        "_kept",
        (F.col(id_col) == F.col("_first")[id_col])
        & (F.col("span_idx") == F.col("_first")["span_idx"]),
    )
    return _reassemble_survivors(flagged, id_col, "n_spans")


def _reassemble_survivors(
    flagged: DataFrame, id_col: str, total_alias: str
) -> DataFrame:
    """Shared tail of :func:`span_dedup` / :func:`line_dedup`: given the
    exploded segments with a boolean ``_kept`` flag, reassemble each
    document from its survivors — ``(id, <total_alias>, n_kept,
    kept_hash)`` where ``kept_hash`` is the md5 of the surviving segments
    joined in document order (the cleaned text's identity, without
    re-emitting the text)."""
    return flagged.groupBy(id_col).agg(
        F.count("*").alias(total_alias),
        F.sum(F.col("_kept").cast("long")).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_kept"),
                                F.struct(F.col("span_idx"), F.col("span")),
                            )
                        )
                    ),
                    lambda s: s["span"],
                ),
                " ",
            )
        ).alias("kept_hash"),
    )


def line_dedup(
    df: DataFrame,
    spans_expr: Column | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
) -> DataFrame:
    """CCNet-style corpus-frequency line dedup (Wenzek et al., LREC'20
    §4.1 hash every paragraph and drop the ones already seen corpus-wide;
    the production variant strips high-frequency boilerplate — cookie
    banners, nav chrome — from EVERY page that carries it): each
    occurrence of a segment whose corpus DOCUMENT frequency reaches
    ``min_df`` is dropped, including the first. This is the
    frequency-rule sibling of :func:`span_dedup` (first-wins keeps one
    global copy; here boilerplate keeps none) over the identical
    non-overlapping 12-token segmentation
    (``textstats.token_window_spans_expr``), so the two rows differ only
    in the survival rule. Frequency counts documents, not occurrences: a
    segment repeated within one document but nowhere else survives.

    → one row per document with ≥1 segment:
    ``(id_col, n_lines, n_kept, kept_hash)`` where ``kept_hash`` is the
    md5 of the surviving segments joined in document order.

    Scale shape (10^10 docs): the document-frequency table is
    ``count(DISTINCT id)`` grouped by ``md5(segment)`` — Catalyst expands
    distinct aggregation into a two-stage plan with map-side partial
    aggregation on (hash, id), so a banner on 10^9 pages shuffles one row
    per map task, not 10^9 rows. The df table (one row per DISTINCT
    segment) hash-joins back onto the exploded segments — an equi-join,
    with AQE's skew split covering hot segments on the probe side — and
    only that probe join plus the per-document reassembly shuffle segment
    text, each exactly once. No window over the segment hash anywhere.

    Reference scope: beyond the Go crawler (no text curation there);
    first-class LLM-pipeline operator per the build brief."""
    if spans_expr is None:
        spans_expr = token_window_spans_expr(F.col(text_col))
    exploded = df.select(
        F.col(id_col), F.posexplode(spans_expr).alias("span_idx", "span")
    ).withColumn("span_hash", F.md5("span"))
    freq = exploded.groupBy("span_hash").agg(
        F.countDistinct(F.col(id_col)).alias("_df_docs")
    )
    flagged = exploded.join(freq, "span_hash").withColumn(
        "_kept", F.col("_df_docs") < F.lit(int(min_df))
    )
    return _reassemble_survivors(flagged, id_col, "n_lines")


# ----------------------------------------------------------- decontamination
def decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 5,
) -> DataFrame:
    """Eval-set contamination scan (the GPT-3 appendix-C / open-LM-suite
    n-gram decontamination): for every training document, how many of its
    distinct word ``ngram``-grams also occur anywhere in the eval set.

    → ``(id_col, n_grams, n_overlap, contam_frac)`` for EVERY training doc
    (zero-overlap docs included, so the output is a drop-in gate:
    ``where(contam_frac < cutoff)``).

    Scale shape: the eval side collapses to its DISTINCT gram set first —
    eval suites are a few thousand documents even when the train side is
    10^10, so that set is explicitly ``F.broadcast``; the train grams are
    probed map-side (never shuffled), and the only exchange is the scalar
    per-doc overlap count."""
    eval_grams = (
        eval_docs.select(
            F.explode(
                F.array_distinct(word_ngrams_expr(F.col(text_col), ngram))
            ).alias("g")
        )
        .distinct()
    )
    train_grams = train_docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_ngrams_expr(F.col(text_col), ngram))
        ).alias("g"),
    )
    overlap = (
        train_grams.join(F.broadcast(eval_grams), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )
    base = train_docs.select(
        F.col(id_col),
        F.size(
            F.array_distinct(word_ngrams_expr(F.col(text_col), ngram))
        ).cast("long").alias("n_grams"),
    )
    return (
        base.join(overlap, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
            F.round(
                F.when(
                    F.col("n_grams") > 0,
                    F.coalesce(F.col("n_overlap"), F.lit(0)).cast("double")
                    / F.col("n_grams").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("contam_frac"),
        )
    )
