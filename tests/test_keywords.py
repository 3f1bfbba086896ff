"""TF-IDF keyword extraction (operators/keywords.py): hand-computed
goldens, the smoothed-idf formula, and the tie rule."""

import math

from geospatial_web_scraper_spark.operators.keywords import (
    MICRO,
    tfidf_keywords,
)


def test_goldens_and_tie_rule(spark):
    docs = spark.createDataFrame(
        [
            (0, "apple apple banana common"),
            (1, "banana cherry common"),
            (2, "common common cherry"),
        ],
        "doc_id long, text string",
    )
    got = {}
    for r in tfidf_keywords(docs, k=2).collect():
        got.setdefault(r["doc_id"], []).append(r)
    for v in got.values():
        v.sort(key=lambda r: r["rank"])

    def idf_micro(df, n=3):
        return int(round((math.log((n + 1) / (df + 1)) + 1) * MICRO))

    # doc 0: apple tf=2 df=1 beats banana tf=1 df=2 and common tf=1 df=3
    assert [r["term"] for r in got[0]] == ["apple", "banana"]
    assert got[0][0]["tf"] == 2
    assert got[0][0]["score"] == round(2 * idf_micro(1) / MICRO, 6)
    # doc 1: banana and cherry tie exactly (tf=1, df=2) -> term ASC
    assert [r["term"] for r in got[1]] == ["banana", "cherry"]
    # doc 2: common tf=2·idf(3) vs cherry 1·idf(2): 2·(ln(4/4)+1)=2e6
    # beats ln(4/3)+1 ≈ 1.29e6
    assert [r["term"] for r in got[2]] == ["common", "cherry"]
    assert got[2][0]["score"] == 2.0
