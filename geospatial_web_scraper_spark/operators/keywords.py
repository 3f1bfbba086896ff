"""TF-IDF keyword extraction — top-k distinguishing terms per document.

The per-document keyword list every corpus pipeline wants somewhere:
search-index boosting, weak topic labels, dedup explanations, document
routing. Scoring is the standard smoothed form
``tf · (ln((N + 1) / (df + 1)) + 1)`` (the sklearn smoothing — always
positive, no division by zero on corpus-wide terms).

Determinism contract: the idf factor is rounded to 6 decimals and scaled
to integer MICRO-units once per term, so every per-(doc, term) score is
the exact integer ``tf · idf_micro`` — ranking ties can never flip on a
float's last ulp between engines, and the tie rule is the library-wide
(score desc, term asc). Top-k per document uses the salted two-phase
``grouped_topk`` (operators/similarity.py) — never a bare per-doc window
over the full term table, the skewed-shuffle scale-killer rule r2
established.

Scale shape: one (doc, term) count groupBy (map-side combine), one
term-level df aggregate (tiny — vocabulary-sized), a broadcast-friendly
equi-join of scores onto df, and the two-phase top-k. The document text
is read once; only (id, term, int) tuples shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import grouped_topk
from .textstats import tokens_expr

__all__ = ["tfidf_keywords"]

#: micro-unit scale for the integer-exact idf factor
MICRO = 1_000_000


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ ``(id_col, rank, term, tf, score)``: the ``k`` highest-TF-IDF
    lower-cased terms per document, rank 1-based, ties toward the
    lexicographically smaller term. ``score`` is the exact integer
    product rendered back to 6-decimal units (``tf · idf_micro / 1e6``).
    """
    n_docs = docs.count()
    tf = (
        docs.select(
            F.col(id_col),
            F.explode(tokens_expr(F.lower(F.col(text_col)))).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("_df"))
    # round the MICRO-scaled factor to 0 decimals (never truncate-cast a
    # rounded 6-decimal double times 1e6 — the product can land 1 ulp
    # under the integer and floor away a unit on one engine only)
    idf_micro = F.round(
        (F.log(F.lit(float(n_docs + 1)) / (F.col("_df") + 1)) + 1)
        * MICRO,
        0,
    ).cast("long")
    scored = tf.join(df.select("term", idf_micro.alias("_idfm")), "term").select(
        id_col,
        "term",
        "tf",
        (F.col("tf") * F.col("_idfm")).alias("_sm"),
    )
    top = grouped_topk(
        scored, id_col, "term", "_sm", k, salt_col="term", carry_cols=("tf",)
    )
    return top.select(
        id_col,
        "rank",
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.round(F.col("_sm") / F.lit(float(MICRO)), 6).alias("score"),
    )
