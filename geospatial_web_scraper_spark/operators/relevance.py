"""BM25 topical-relevance scoring over the documents table.

Corpus builds filter by topic ("keep pages relevant to these domain
terms") long before any embedding model runs; the classical,
cheap-at-100-TB way is BM25 (Robertson & Walker 1994; the Lucene-style
variant with the +1-floored IDF) against a small fixed term set::

    idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    s(d, t) = idf(t) * tf * (k1+1) / (tf + k1*(1-b) + k1*b * dl * N / T)
    score(d) = sum over query terms t present in d

with N = corpus document count, T = total token count (so avgdl = T/N —
folded into the norm term as dl·N/T to keep every input an exact
integer), dl = the document's token count, tf the term's count in d.

Determinism contract (the repo-wide rule): every per-(doc, term)
contribution is rounded to integer micro-units (×1e6, BIGINT) BEFORE the
per-document sum, so integer addition makes the result independent of
shuffle order; the doubles feeding that rounding are computed from exact
integers and literal constants with the SAME operation order in the Spark
expression and the DuckDB oracle. The derived constants k1+1, k1·(1-b),
k1·b are computed ONCE in Python (:func:`bm25_constants`) and embedded on
both sides via ``repr`` so the parsed doubles are bit-identical.

Scale shape: the exploded token stream is filtered to the (tiny, literal)
term set FIRST — everything downstream touches only matching tokens. tf
is one map-side-combining groupBy on (doc, term); df_t is a groupBy on
the ≤|terms| keys, broadcast back; N and T are a one-row aggregate
broadcast-cross-joined (never collected). No window anywhere; the output
is one row per matching document.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import textstats


def bm25_constants(k1: float = 1.2, b: float = 0.75) -> tuple[float, float, float]:
    """(k1+1, k1*(1-b), k1*b) — computed once so Spark and the SQL oracle
    embed bit-identical doubles (1.2*0.25 != the literal 0.3 in IEEE754)."""
    return (k1 + 1.0, k1 * (1.0 - b), k1 * b)


def bm25_scores(
    docs: DataFrame,
    terms: Sequence[str],
    *,
    doc_id: str = "doc_id",
    text: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document containing at least one of ``terms``.

    Returns ``(doc_id, n_terms BIGINT, score6 DOUBLE)`` — distinct query
    terms matched, and the BM25 score in micro-unit-rounded nats-of-IDF
    (6 decimals). Documents matching no term are absent (score 0).
    """
    c1, c2, c3 = bm25_constants(k1, b)
    toked = docs.select(
        F.col(doc_id).alias("doc_id"),
        F.transform(
            textstats.tokens_expr(F.col(text)), lambda x: F.lower(x)
        ).alias("a"),
    )
    lens = toked.select("doc_id", F.size("a").cast("long").alias("dl"))
    totals = lens.agg(
        F.count("*").cast("long").alias("nd"),
        F.sum("dl").cast("long").alias("tt"),
    )
    tok = toked.select("doc_id", F.explode("a").alias("w")).filter(
        F.col("w").isin(*[t.lower() for t in terms])
    )
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").cast("long").alias("tf"))
    dft = tf.groupBy("w").agg(F.count("*").cast("long").alias("df"))
    scored = (
        tf.join(lens, "doc_id")
        .join(F.broadcast(dft), "w")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("nd") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (
                    (F.col("tf") * F.lit(c1))
                    / (
                        F.col("tf")
                        + F.lit(c2)
                        + F.lit(c3) * F.col("dl") * F.col("nd") / F.col("tt")
                    )
                )
                * 1000000,
                0,
            )
            .cast("long")
            .alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_terms"),
        F.round(F.sum("lp") / 1000000.0, 6).alias("score6"),
    )


def bm25_oracle_sql(
    terms: Sequence[str],
    *,
    toks_sql: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """The DuckDB mirror of :func:`bm25_scores` over the ``documents``
    view. ``toks_sql`` is the repo's shared whitespace-tokenizer fragment
    applied to the ``text`` column (entry_queries._sql_toks). Constants
    are embedded via ``repr`` and CAST to DOUBLE (DuckDB parses bare
    decimal literals as DECIMAL, which would change the arithmetic)."""
    c1, c2, c3 = bm25_constants(k1, b)
    termlist = ", ".join("'" + t.lower().replace("'", "''") + "'" for t in terms)
    return f"""
WITH d AS (SELECT doc_id, list_transform({toks_sql}, x -> lower(x)) AS a
           FROM documents),
lens AS MATERIALIZED (SELECT doc_id, len(a)::BIGINT AS dl FROM d),
tot AS (SELECT count(*)::BIGINT AS nd, sum(dl)::BIGINT AS tt FROM lens),
tok AS (SELECT doc_id, unnest(a) AS w FROM d),
tf AS MATERIALIZED (SELECT doc_id, w, count(*)::BIGINT AS tf FROM tok
      WHERE w IN ({termlist}) GROUP BY 1, 2),
dft AS (SELECT w, count(*)::BIGINT AS df FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
    CAST(round(
      ln(CAST('1.0' AS DOUBLE)
         + (tot.nd - dft.df + CAST('0.5' AS DOUBLE))
           / (dft.df + CAST('0.5' AS DOUBLE)))
      * ((tf.tf * CAST('{c1!r}' AS DOUBLE))
         / (tf.tf + CAST('{c2!r}' AS DOUBLE)
            + CAST('{c3!r}' AS DOUBLE) * lens.dl * tot.nd / tot.tt))
      * 1000000, 0) AS BIGINT) AS lp
  FROM tf JOIN lens ON lens.doc_id = tf.doc_id
  JOIN dft ON dft.w = tf.w CROSS JOIN tot)
SELECT doc_id, count(*)::BIGINT AS n_terms,
  round(CAST(sum(lp) AS DOUBLE) / CAST('1000000.0' AS DOUBLE), 6) AS score6
FROM sc GROUP BY 1
"""
