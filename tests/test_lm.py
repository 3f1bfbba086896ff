"""Bigram-LM perplexity gate (operators/lm.py): numpy-free pure-Python
reference on a hand corpus, short-doc exclusion, exact tertile cut."""

import math

from pyspark.sql import functions as F

from geospatial_web_scraper_spark.operators.lm import bigram_lm_scores


def _py_scores(texts):
    toks = {i: t.split() for i, t in texts.items()}
    toks = {i: [w.lower() for w in a] for i, a in toks.items()}
    uni, bgc = {}, {}
    for a in toks.values():
        for w in a:
            uni[w] = uni.get(w, 0) + 1
        for x, y in zip(a, a[1:]):
            bgc[(x, y)] = bgc.get((x, y), 0) + 1
    v = len(uni)
    out = {}
    for i, a in toks.items():
        if len(a) < 2:
            continue
        s = 0
        for x, y in zip(a, a[1:]):
            lp = math.log((bgc[(x, y)] + 1) / (uni[x] + v))
            s += int(round(lp * 1000000))
        out[i] = (len(a) - 1, round(-s / (len(a) - 1) / 1000000.0, 6))
    return out


def test_matches_python_reference(spark):
    texts = {
        0: "the cat sat on the mat",
        1: "the cat sat on the cat",
        2: "a dog ran",
        3: "zx qy vw uk",  # all-novel bigrams -> highest cross-entropy
        4: "single",  # excluded: no bigrams
        5: "",  # excluded
        6: "the cat sat on the mat",  # exact dup of 0: identical score
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in bigram_lm_scores(docs).collect()}
    want = _py_scores(texts)
    assert set(got) == set(want)
    for i, (nb, h6) in want.items():
        assert got[i]["n_bigrams"] == nb
        assert abs(got[i]["h6"] - h6) < 1e-9, (i, got[i]["h6"], h6)
    assert got[0]["h6"] == got[6]["h6"]
    # exact tertiles over 5 scored docs (rn*3 < 5 | < 10 | else):
    # ranks 0-1 head, 2-3 middle, 4 tail
    order = sorted(want, key=lambda i: (want[i][1], i))
    buckets = [got[i]["bucket"] for i in order]
    assert buckets == ["head", "head", "middle", "middle", "tail"]
    # the all-novel doc is worst
    assert order[-1] == 3


def test_all_docs_too_short_yields_empty(spark):
    docs = spark.createDataFrame(
        [(0, "one"), (1, ""), (2, "two")], "doc_id long, text string"
    )
    assert bigram_lm_scores(docs).count() == 0
