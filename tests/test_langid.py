"""Char-trigram NB language ID (operators/langid.py, r5): golden labels
on real-language sentences, the 'und' sentinel contract, tie/ordering
determinism, weight-table freshness vs the training script, the python
mirror of the scoring arithmetic, and the curate_corpus lang_gate flag.
The full-corpus value check vs the DuckDB oracle is the lang_id_ngram
row in the entry-contract mirror."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from geospatial_web_scraper_spark.operators.langid import (
    langid_ngram_expr,
    langid_ngram_scores_expr,
)
from geospatial_web_scraper_spark.operators.langid_weights import (
    LANGID_LANGS,
    LANGID_WEIGHTS,
    N_BUCKETS,
)

SENTENCES = {
    "en": "the cat sat on the mat and it is for all of them that we are here",
    "es": "el perro y la casa de los amigos que vienen con un regalo por la tarde",
    "fr": "le chien et la maison dans les rues pour une belle journee que nous aimons",
}


def _score_py(text: str, lang: str) -> int:
    """Pure-python mirror of the Spark scoring expression."""
    toks = text.strip().split()
    s = " ".join(toks).lower()
    w = LANGID_WEIGHTS[lang]
    total = 0
    for i in range(len(s) - 2):
        g = s[i : i + 3]
        total += w[int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % N_BUCKETS]
    return total


def test_golden_labels_and_score_mirror(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(SENTENCES.values())],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            langid_ngram_expr(F.col("text")).alias("lang"),
            langid_ngram_scores_expr(F.col("text")).alias("sc"),
        ).collect()
    }
    for i, (lang, text) in enumerate(SENTENCES.items()):
        assert rows[i].lang == lang, (lang, rows[i])
        assert rows[i].sc == [_score_py(text, g) for g in LANGID_LANGS]


def test_und_sentinel_and_negativity(spark):
    """No trigrams → all-zero scores → 'und'; any trigram → strictly
    negative scores (the weight table has no non-negative entry, pinned
    here so a retrained table can't silently break the sentinel)."""
    assert all(w < 0 for ws in LANGID_WEIGHTS.values() for w in ws)
    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, "ab"), (3, "  a  b  "), (4, "abc")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.lang, r.sc)
        for r in df.select(
            "doc_id",
            langid_ngram_expr(F.col("text")).alias("lang"),
            langid_ngram_scores_expr(F.col("text")).alias("sc"),
        ).collect()
    }
    for i in (0, 1, 2):
        assert out[i] == ("und", [0, 0, 0]), (i, out[i])
    # "  a  b  " normalizes to "a b" (3 chars) → one trigram → a label
    assert out[3][0] in LANGID_LANGS and all(s < 0 for s in out[3][1])
    assert out[4][0] in LANGID_LANGS


def test_weights_match_training_script():
    """langid_weights.py is GENERATED — re-derive it from the same
    stopword inventories and formula; a drift here means someone
    hand-edited the frozen table or changed the script without
    regenerating (the single-source contract with the SQL oracle)."""
    from geospatial_web_scraper_spark.operators.textstats import STOPWORDS

    assert LANGID_LANGS == tuple(sorted(STOPWORDS))
    for lang in LANGID_LANGS:
        counts = [0] * N_BUCKETS
        s = " ".join(STOPWORDS[lang]).lower()
        for i in range(len(s) - 2):
            g = s[i : i + 3]
            counts[
                int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % N_BUCKETS
            ] += 1
        total = sum(counts)
        want = [
            round(1_000_000 * math.log((c + 1) / (total + N_BUCKETS)))
            for c in counts
        ]
        assert LANGID_WEIGHTS[lang] == want, lang


def test_subword_evidence_beats_vote(spark):
    """The upgrade's point: a doc with NO exact stopword token still
    carries language trigram mass ('themselves'/'another' contain 'the'/
    'not'-family trigrams), so the ngram gate admits docs the vote calls
    'und'."""
    from geospatial_web_scraper_spark.operators.textstats import lang_id_expr

    text = (
        "themselves another therefore something whatever gathered "
        "clothing brother weather leather feather "
    ) * 3
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    [row] = df.select(
        lang_id_expr(F.col("text")).alias("vote"),
        langid_ngram_expr(F.col("text")).alias("ngram"),
    ).collect()
    assert row.vote == "und"
    assert row.ngram == "en"


def test_curate_lang_gate_flag(spark):
    """lang_gate='ngram' threads the classifier into curate_corpus:
    the sub-word-evidence doc above survives the ngram pipeline and is
    dropped by the vote pipeline; an invalid flag fails loud."""
    from geospatial_web_scraper_spark.operators.curate import curate_corpus

    text = (
        "themselves another therefore something whatever gathered "
        "clothing brother weather leather feather "
    ) * 3
    docs = spark.createDataFrame(
        [(0, text), (1, SENTENCES["en"]), (2, SENTENCES["es"])],
        "doc_id long, text string",
    )
    vote_ids = {
        r.doc_id
        for r in curate_corpus(docs, min_quality=0.0, lang_gate="vote").collect()
    }
    ngram_ids = {
        r.doc_id
        for r in curate_corpus(docs, min_quality=0.0, lang_gate="ngram").collect()
    }
    assert 0 not in vote_ids and 1 in vote_ids
    assert {0, 1} <= ngram_ids and 2 not in ngram_ids
    with pytest.raises(ValueError, match="lang_gate"):
        curate_corpus(docs, lang_gate="nope")
