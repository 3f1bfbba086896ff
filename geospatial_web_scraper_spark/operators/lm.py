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


def pmi_collocations(
    docs: DataFrame,
    *,
    min_count: int = 5,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Pointwise-mutual-information collocations over the corpus — the
    classic vocabulary/tokenizer-working-set signal (Church & Hanks 1990):
    which adjacent token pairs co-occur far more than chance. Corpus
    builders run this next to BPE training (operators/tokenize.py) to
    audit what the merge table should be learning, and next to the LM
    gate to spot boilerplate n-grams that survive the quality filters.

        pmi(w1,w2) = ln p(w1,w2) − ln p(w1) − ln p(w2)
                   = ln c12 − ln c1 − ln c2 + 2·ln Tu − ln Tb

    with c1/c2/Tu unigram counts/total and c12/Tb bigram counts/total.
    Only pairs with c12 ≥ ``min_count`` are emitted (the standard guard:
    PMI of a hapax pair is pure noise and would dominate the ranking).

    Determinism: every count is an exact BIGINT; the five logs are taken
    over those exact integers and combined in ONE fixed left-to-right
    expression per pair — no float is ever summed ACROSS rows, so there
    is no aggregation-order hazard at all (stricter than lm_perplexity's
    micro-nat trick, which still sums row-local roundings); the result is
    rounded to 6 decimals, giving the DuckDB oracle ~9 orders of margin
    over any last-ulp libm disagreement. 2·ln Tu is written ``2.0 * ln``
    — doubling is exact in IEEE 754.

    Returns ``(w1, w2, n_pair, pmi6)``, one row per surviving pair.
    Scale shape: two map-side-combining count shuffles (unigrams,
    bigrams) — the same aggregations the bigram LM already pays — then
    the min_count filter cuts the pair table BEFORE the two count
    equi-joins (the long tail of hapax pairs never joins), and the two
    corpus totals broadcast as a 1-row dimension. No window, no UDF,
    all whole-stage codegen."""
    toked = docs.select(
        F.col(doc_id).alias("doc_id"), _lower_tokens(F.col(text)).alias("a")
    ).localCheckpoint()  # feeds the unigram AND bigram streams

    tok = toked.select(F.explode("a").alias("w"))
    uni = tok.groupBy("w").agg(F.count("*").alias("cu")).localCheckpoint()
    bg = toked.filter(F.size("a") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(a) - 1),"
                " i -> struct(a[i-1] AS w1, a[i] AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("cb")).localCheckpoint()

    totals = uni.agg(F.sum("cu").cast("long").alias("tu")).crossJoin(
        bgc.agg(F.sum("cb").cast("long").alias("tb"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("cu").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cu").alias("c2"))
    return (
        bgc.filter(F.col("cb") >= min_count)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            F.col("cb").alias("n_pair"),
            F.round(
                F.log(F.col("cb").cast("double"))
                - F.log(F.col("c1").cast("double"))
                - F.log(F.col("c2").cast("double"))
                + F.lit(2.0) * F.log(F.col("tu").cast("double"))
                - F.log(F.col("tb").cast("double")),
                6,
            ).alias("pmi6"),
        )
    )
