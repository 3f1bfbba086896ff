"""Deterministic data-mixture sampling for training-corpus builds.

A corpus build rarely trains on the raw crawl mixture: each source (domain,
dump, subcorpus) is down-sampled to a token budget so the final mixture
matches a target recipe (The Pile, LLaMA-style mixture tables). The
operator here is the distributed primitive those recipes need:
coin-flip-free, seedless, deterministic sampling — a document's keep/drop
decision is a pure function of its identity, so re-runs, resumes, and
incremental batches all agree without coordination.

All hashing is md5-based (bit-identical in every SQL engine) so the whole
decision — including the keep threshold comparison — is value-checkable by
the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _md5_hash64_expr
from .textstats import token_count_expr

_TWO_60 = float(1 << 60)


def uniform_unit_hash_expr(key: Column) -> Column:
    """Deterministic uniform draw in [0, 1): the 60-bit md5 hash of ``key``
    divided by 2^60. int64→double rounding and the power-of-two division
    are IEEE-identical across engines, so thresholding this value is
    reproducible anywhere (unlike rand(seed), which is engine-private)."""
    return _md5_hash64_expr(key) / F.lit(_TWO_60)


def sample_token_budget(
    df: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_tok_col: Column | None = None,
) -> DataFrame:
    """Down-sample each source to ≈``budget_tokens`` whitespace tokens:
    keep a document iff its deterministic unit hash ``u`` (keyed by
    ``source:id``) falls below ``rate_s = min(1, budget / tokens_s)``.
    Sources already under budget are kept whole (rate 1).

    ``n_tok_col`` swaps the whitespace count for any other per-doc token
    measure — pass ``tokenize.bpe_token_count_expr(F.col(text_col),
    merges)`` to budget in MODEL tokens (the real shard currency); the
    mixture math is count-agnostic.

    → ``(id_col, source_col, n_tok, u, kept)`` for every input document —
    a flag column, not a filter, so callers can audit the mixture
    (``groupBy(source).agg(sum(when(kept, n_tok)))``) before dropping.

    Scale shape (10^10 docs): per-source token totals are ONE map-side-
    combining groupBy on the source key; the totals table is one row per
    source — explicitly broadcast back — and the keep decision is then
    evaluated map-side, so document rows never shuffle at all."""
    n_tok = (
        token_count_expr(F.col(text_col)) if n_tok_col is None else n_tok_col
    )
    toks = df.select(
        F.col(id_col),
        F.col(source_col),
        n_tok.cast("long").alias("n_tok"),
        uniform_unit_hash_expr(
            F.concat(F.col(source_col), F.lit(":"), F.col(id_col))
        ).alias("_u"),
    )
    totals = toks.groupBy(source_col).agg(F.sum("n_tok").alias("_tokens_s"))
    rate = F.when(
        F.col("_tokens_s") > budget_tokens,
        F.lit(float(budget_tokens)) / F.col("_tokens_s").cast("double"),
    ).otherwise(F.lit(1.0))
    return (
        toks.join(F.broadcast(totals), source_col)
        .select(
            id_col,
            source_col,
            "n_tok",
            F.round(F.col("_u"), 6).alias("u"),
            (F.col("_u") < rate).alias("kept"),
        )
    )


def split_corpus(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic train/val/test split → ``(id_col, u, split)``: label
    each row by which cumulative-fraction band its unit hash falls in
    (``u`` keyed by ``salt:id`` — change ``salt`` to draw an independent
    split without touching the sampling keys). The assignment is a pure
    function of the id: re-runs, resumes, late-arriving shards and other
    engines all agree, and — the property rand(seed) cannot give you —
    a document KEEPS its split when the corpus around it grows, so eval
    sets never silently absorb training documents across corpus versions.

    ``group_col`` switches the hash key to ``salt:group`` and adds the
    group column to the output — a GROUP-DISJOINT split: every document
    of a group (host, source, dump) lands in the SAME band, so same-site
    near-duplicates can never straddle train/eval (the leakage a
    doc-keyed split cannot prevent: boilerplate-sharing pages from one
    host land in different splits and eval scores inherit the overlap).
    Still a pure map-side expression — the group's hash is computed
    per-row from the group value itself, so no aggregation, join, or
    shuffle is needed at any corpus size; per-group and per-doc keying
    cost identically.

    ``fractions`` maps label → fraction in iteration order; they must sum
    to 1 (±1e-9). The last band absorbs the boundary (u < cum for every
    earlier band, else last), so coverage is total by construction. Pure
    codegen map-side expression — zero shuffle at any corpus size.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if len(fractions) < 2:
        raise ValueError("need at least two split labels")
    key_col = group_col if group_col is not None else id_col
    u = uniform_unit_hash_expr(
        F.concat(F.lit(salt), F.lit(":"), F.col(key_col))
    )
    labels = list(fractions)
    expr = F.lit(labels[-1])
    cum = 0.0
    bands = []
    for lab in labels[:-1]:
        cum += fractions[lab]
        bands.append((lab, cum))
    for lab, c in reversed(bands):
        expr = F.when(u < F.lit(c), F.lit(lab)).otherwise(expr)
    out_cols = [F.col(id_col)]
    if group_col is not None:
        out_cols.append(F.col(group_col))
    return df.select(
        *out_cols,
        F.round(u, 6).alias("u"),
        expr.alias("split"),
    )


def mixture_weights(
    df: DataFrame,
    alpha: float,
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    n_tok_col: Column | None = None,
) -> DataFrame:
    """α-temperature domain mixture weights (the multilingual-LM /
    LLaMA-style recipe: sample source s with probability ∝ n_s^α, α<1
    up-weighting small sources) → one row per source:
    ``(source_col, n_tok, weight6, epochs6)`` where ``weight6`` is the
    normalized mixture weight and ``epochs6 = weight · budget / n_s`` is
    how many passes over the source the ``budget_tokens`` mixture implies
    (>1 means the recipe repeats the source — the audit signal for
    up-sampling-induced duplication).

    Determinism: n_s^α is computed as exp(α·ln n) and rounded to integer
    MICRO-units before normalization, so the denominator is an exact
    BIGINT sum (order-independent) and every output digit is engine-
    reproducible. Scale shape: ONE map-side-combining groupBy on the
    source key; the per-source table is tiny — everything after the agg
    is arithmetic on a broadcast-sized frame."""
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    n_tok = (
        token_count_expr(F.col(text_col)) if n_tok_col is None else n_tok_col
    )
    per_src = (
        df.select(F.col(source_col), n_tok.cast("long").alias("_n"))
        .groupBy(source_col)
        .agg(F.sum("_n").alias("n_tok"))
        .where(F.col("n_tok") > 0)
    )
    pw = (
        F.round(
            F.exp(F.lit(float(alpha)) * F.log(F.col("n_tok").cast("double")))
            * 1_000_000,
            0,
        )
        .cast("long")
        .alias("_pw")
    )
    scored = per_src.select(source_col, "n_tok", pw)
    tot = scored.agg(F.sum("_pw").cast("long").alias("_tot"))
    return scored.crossJoin(F.broadcast(tot)).select(
        source_col,
        "n_tok",
        F.round(F.col("_pw") / F.col("_tot").cast("double"), 6).alias(
            "weight6"
        ),
        F.round(
            (F.col("_pw") * F.lit(int(budget_tokens)))
            / F.col("_tot").cast("double")
            / F.col("n_tok").cast("double"),
            6,
        ).alias("epochs6"),
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Weighted random sample WITHOUT replacement, k per group →
    ``(group_col, rank, id_col, weight, key)``: the Efraimidis–Spirakis
    (IPL 2006) reduction — give each row the key ``u^(1/w)`` (monotone
    form used here: ``ln(u)/w``, same order) for its deterministic unit
    hash ``u``; the k largest keys per group ARE a weight-proportional
    without-replacement sample. One pass, mergeable (top-k of per-shard
    top-ks), and — because u is the salt-keyed md5 hash, not rand() —
    exactly reproducible across runs, resumes and engines.

    The key is rounded to integer MICRO-units before ranking (ties break
    toward the smaller id), so the selection can never flip on a float
    ulp — and the per-group top-k is the salted two-phase
    ``grouped_topk``, never a bare per-group window over the corpus.
    Rows with non-positive weight never sample. The canonical corpus
    use: ``weight_col`` = token count, giving every TOKEN equal
    probability of entering the mixture regardless of how documents cut
    the stream."""
    from .similarity import grouped_topk

    # clamp u away from 0 (a zero hash is a 2^-60 event but ln(0) = -inf,
    # which integer-casts differently per engine); the clamp value is the
    # hash grid's own resolution, so no achievable draw is disturbed
    u = F.greatest(
        uniform_unit_hash_expr(
            F.concat(F.lit(salt), F.lit(":"), F.col(id_col))
        ),
        F.lit(2.0 ** -60),
    )
    key = F.round(
        F.log(u) / F.col(weight_col).cast("double") * 1_000_000, 0
    ).cast("long")
    scored = df.where(F.col(weight_col) > 0).select(
        F.col(group_col),
        F.col(id_col),
        F.col(weight_col).cast("long").alias("weight"),
        key.alias("_key"),
    )
    top = grouped_topk(
        scored, group_col, id_col, "_key", k,
        salt_col=id_col, carry_cols=("weight",),
    )
    return top.select(
        group_col, "rank", id_col, "weight", F.col("_key").alias("key")
    )
