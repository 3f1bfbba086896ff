"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023) over hashed bigram features.

The pretraining-data question: given a huge raw crawl and a small target
corpus (wiki, books, a domain), pick the raw documents most
target-distributed. DSIR's estimator: fit unigram/bigram bag-of-hashed-
ngrams models to target and raw, then weight each raw document by its
log-likelihood ratio

    log w(d) = Σ_{ngram g ∈ d} [ log p_target(bucket(g)) − log p_raw(bucket(g)) ]

and sample/select by that weight. Hashing n-grams into B buckets makes
the feature space fixed and tiny regardless of vocabulary — the model is
two B-row count tables.

Determinism: bucket = md5-60bit of the bigram mod B (bit-identical in
any engine); per-occurrence log-ratio terms are rounded to integer
micro-nats BEFORE the per-document sum (integer addition commutes, so
shuffle order can never flip a digit — the lm.py trick); add-one
smoothing keeps every bucket finite.

Scale shape (10^10 docs): the two count tables are map-side-combining
groupBys on a ≤B-cardinality key folded to ≤B rows, broadcast back into
the token stream — document rows shuffle exactly once (the per-doc sum,
map-side combined). Selection is the salted two-phase ``grouped_topk``,
never a global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import textstats
from .dedup import _md5_hash64_expr

#: hashed-feature bucket count (paper uses 10^4; small here so the toy
#: corpus populates every bucket — the dataflow is bucket-count-agnostic)
N_BUCKETS = 512


def _bigram_buckets(docs: DataFrame, doc_id: str, text: str) -> DataFrame:
    """→ one row per bigram occurrence: ``(doc_id, b)`` with b the hashed
    feature bucket. Lowercased whitespace tokens; docs with <2 tokens
    contribute no features (the length gates own them)."""
    toked = docs.select(
        F.col(doc_id).alias("doc_id"),
        F.transform(
            textstats.tokens_expr(F.col(text)), lambda x: F.lower(x)
        ).alias("a"),
    )
    bg = (
        toked.filter(F.size("a") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(a) - 1),"
                    " i -> concat(a[i-1], ' ', a[i]))"
                )
            ).alias("g"),
        )
    )
    return bg.select(
        "doc_id",
        (
            _md5_hash64_expr(F.concat(F.lit("dsir:"), F.col("g")))
            % F.lit(N_BUCKETS)
        ).alias("b"),
    )


def dsir_topk(
    docs: DataFrame,
    target_pred: Column,
    k: int,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Select the ``k`` documents whose hashed-bigram log-likelihood ratio
    vs the ``target_pred`` subcorpus is highest → ``(doc_id, n_feats,
    score6, rank)``, rank 1-based by (score desc, doc_id asc), ``score6``
    the log-ratio in nats rounded to 6 decimals.

    The raw model is fit on ALL of ``docs`` (the paper's q); the target
    model on the ``target_pred`` rows (p). Documents with no bigrams are
    not scored.
    """
    feats = _bigram_buckets(docs, doc_id, text)
    # the target flag rides the bucket stream via a broadcast of the
    # target doc-id set (one boolean column, map-side)
    tgt_ids = (
        docs.where(target_pred).select(F.col(doc_id).alias("doc_id"))
    )
    feats = feats.join(
        F.broadcast(tgt_ids.withColumn("_is_target", F.lit(True))),
        "doc_id",
        "left",
    ).withColumn("_is_target", F.coalesce("_is_target", F.lit(False)))

    raw_counts = feats.groupBy("b").agg(F.count("*").alias("cr"))
    tgt_counts = (
        feats.where("_is_target").groupBy("b").agg(F.count("*").alias("ct"))
    )
    model = (
        raw_counts.join(tgt_counts, "b", "left")
        .withColumn("ct", F.coalesce("ct", F.lit(0)))
    )
    totals = model.agg(
        F.sum("cr").cast("long").alias("tr"),
        F.sum("ct").cast("long").alias("tt"),
    )
    model = model.crossJoin(F.broadcast(totals)).select(
        "b",
        F.round(
            (
                F.log(
                    (F.col("ct") + 1)
                    / (F.col("tt") + F.lit(N_BUCKETS)).cast("double")
                )
                - F.log(
                    (F.col("cr") + 1)
                    / (F.col("tr") + F.lit(N_BUCKETS)).cast("double")
                )
            )
            * 1_000_000,
            0,
        )
        .cast("long")
        .alias("lr"),
    )
    scored = (
        feats.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.sum("lr").alias("_s"),
        )
    )
    from .similarity import grouped_topk

    top = grouped_topk(
        scored.withColumn("_g", F.lit(0)),
        "_g",
        "doc_id",
        "_s",
        k,
        salt_col="doc_id",
        carry_cols=("n_feats",),
    )
    return top.select(
        "doc_id",
        "n_feats",
        F.round(F.col("_s") / 1_000_000.0, 6).alias("score6"),
        F.col("rank").cast("long").alias("rank"),
    )
