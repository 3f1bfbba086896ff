"""BM25 relevance (operators/relevance.py): parity with a straight-line
Python implementation of the same formula+rounding, and ranking sanity."""

import math

from geospatial_web_scraper_spark.operators.relevance import (
    bm25_constants,
    bm25_scores,
)

DOCS = [
    (0, "spark spark spark window join"),
    (1, "hash table scan hash"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "spark"),
    (4, ""),
    (5, "window window window window window window window window"),
    (6, "spark hash window customer all four terms here"),
]
TERMS = ("spark", "window", "hash", "customer")


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    c1, c2, c3 = bm25_constants(k1, b)
    toks = {i: t.lower().split() for i, t in docs}
    nd = len(docs)
    tt = sum(len(a) for a in toks.values())
    termset = {t.lower() for t in terms}
    dft = {
        t: sum(1 for a in toks.values() if t in a) for t in termset
    }
    out = {}
    for i, a in toks.items():
        lps = []
        for t in sorted(termset):
            tf = a.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (nd - dft[t] + 0.5) / (dft[t] + 0.5))
            frac = (tf * c1) / (tf + c2 + c3 * len(a) * nd / tt)
            lps.append(int(round(idf * frac * 1000000, 0)))
        if lps:
            out[i] = (len(lps), round(sum(lps) / 1000000.0, 6))
    return out


def test_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_terms"], r["score6"])
        for r in bm25_scores(df, TERMS).collect()
    }
    assert got == _py_bm25(DOCS, TERMS)


def test_non_matching_docs_absent(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    ids = {r["doc_id"] for r in bm25_scores(df, TERMS).collect()}
    assert 2 not in ids and 4 not in ids
    assert ids == {0, 1, 3, 5, 6}


def test_ranking_sanity(spark):
    """Same doc length: more matched query terms => higher score; and tf
    saturation: 3x'spark' in a 5-token doc beats 1x'spark' alone is NOT
    guaranteed (length norm), but the 4-term doc must beat every
    single-term doc of similar length."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["score6"] for r in bm25_scores(df, TERMS).collect()}
    assert got[6] > got[1]  # 4 distinct terms beats 2x one term
    assert got[6] > got[3]  # and beats the single-hit doc


def test_custom_k1_b(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_terms"], r["score6"])
        for r in bm25_scores(df, TERMS, k1=2.0, b=0.5).collect()
    }
    assert got == _py_bm25(DOCS, TERMS, k1=2.0, b=0.5)
