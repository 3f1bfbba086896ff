"""CCNet-style n-gram language-model quality scoring.

CCNet (Wenzek et al. 2020) buckets web documents into head / middle / tail
by the perplexity of a language model trained on clean text, and modern
corpus builds keep the gate. This operator is the same dataflow with the
LM trained *on the corpus itself* — an add-one-smoothed bigram model —
so the pipeline is self-contained (no external model artifact) and every
number is reproducible from the documents table alone:

    p(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)
    H(doc)     = -mean over the doc's bigrams of ln p(w2 | w1)   (nats)

Documents are then ranked by (H, doc_id) and cut into exact tertiles:
``head`` (lowest cross-entropy = most in-distribution), ``middle``,
``tail``. Docs with fewer than two tokens have no bigrams and are
excluded (they carry no LM evidence; the length gates elsewhere in the
curation pipeline own them).

Determinism: per-bigram log-probabilities are rounded to integer
micro-nats (×1e6, BIGINT) before the per-document sum — integer addition
is order-independent, so shuffle partitioning can never flip a digit
(same trick as corpus_report's micro-unit quality mean). The final H is
a double computed from the two exact integers (sum, count), identical in
any engine. Tertile boundaries are pure integer arithmetic on the exact
global rank.

Scale shape: unigram and bigram counts are two map-side-combining
shuffles on token keys; the count-join back to the bigram stream is an
equi-join on (w1, w2) — skewed on stopword bigrams, which AQE's skew-join
splitting handles (no salting needed: the skewed side is the *stream*,
the count side is one row per key). V and the corpus totals are scalars.
The tertile cut uses the two-pass global-seq pattern
(functions/ordering.py) — never a single-reducer window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ordering import with_global_seq
from . import textstats


def _lower_tokens(text_col):
    return F.transform(textstats.tokens_expr(text_col), lambda x: F.lower(x))


def bigram_lm_scores(
    docs: DataFrame, *, doc_id: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Score every document against the corpus-trained bigram LM.

    Returns one row per document with ≥2 tokens:
    ``(doc_id, n_bigrams BIGINT, h6 DOUBLE, bucket STRING)`` where ``h6``
    is the cross-entropy in nats rounded to 6 decimals and ``bucket`` is
    the exact tertile ``head`` / ``middle`` / ``tail`` by (h6, doc_id).
    """
    toked = docs.select(
        F.col(doc_id).alias("doc_id"), _lower_tokens(F.col(text)).alias("a")
    ).localCheckpoint()  # tokenization feeds three consumers; never re-derive

    tok = toked.select("doc_id", F.explode("a").alias("w"))
    uni = tok.groupBy("w").agg(F.count("*").alias("cu"))
    vocab = uni.agg(F.count("*").cast("long").alias("v"))

    # filter BEFORE sequence(): Spark's sequence(1, 0) counts *down*, so a
    # 0/1-token doc would fabricate null bigrams instead of none
    bg = (
        toked.filter(F.size("a") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(a) - 1),"
                    " i -> struct(a[i-1] AS w1, a[i] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("cb"))

    scored = (
        bg.join(bgc, ["w1", "w2"])
        .join(uni, bg["w1"] == uni["w"])
        .join(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(
                F.log((F.col("cb") + 1) / (F.col("cu") + F.col("v"))) * 1000000,
                0,
            )
            .cast("long")
            .alias("lp"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("lp").alias("s"),
    )
    h = agg.select(
        "doc_id",
        "n_bigrams",
        F.round((-F.col("s")) / F.col("n_bigrams") / 1000000.0, 6).alias("h6"),
    )
    ranked, total = with_global_seq(h, ["h6", "doc_id"], seq_col="_rn")
    return ranked.select(
        "doc_id",
        "n_bigrams",
        "h6",
        F.when(F.col("_rn") * 3 < total, F.lit("head"))
        .when(F.col("_rn") * 3 < 2 * total, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
