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


# --------------------------------------------------------------------------
# r5h: PMI collocations (pmi_collocations)
# --------------------------------------------------------------------------

from geospatial_web_scraper_spark.operators.lm import pmi_collocations  # noqa: E402


def _py_pmi(texts, min_count):
    toks = [[w.lower() for w in t.split()] for t in texts.values()]
    uni, bgc = {}, {}
    for a in toks:
        for w in a:
            uni[w] = uni.get(w, 0) + 1
        for x, y in zip(a, a[1:]):
            bgc[(x, y)] = bgc.get((x, y), 0) + 1
    tu = sum(uni.values())
    tb = sum(bgc.values())
    out = {}
    for (x, y), cb in bgc.items():
        if cb < min_count:
            continue
        pmi = (
            math.log(cb) - math.log(uni[x]) - math.log(uni[y])
            + 2.0 * math.log(tu) - math.log(tb)
        )
        out[(x, y)] = (cb, round(pmi, 6))
    return out


def _run_pmi(spark, texts, min_count):
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = pmi_collocations(docs, min_count=min_count)
    return {
        (r["w1"], r["w2"]): (r["n_pair"], r["pmi6"]) for r in got.collect()
    }


def test_pmi_matches_python_reference(spark):
    texts = {
        0: "a b a b",
        1: "A b c",  # lowercased: 'A' and 'a' are the same unigram
        2: "c c",
        3: "single",  # one token: unigram only, no bigrams
        4: "",  # empty: contributes nothing
    }
    want = _py_pmi(texts, 1)
    got = _run_pmi(spark, texts, 1)
    assert got == want
    # hand check the dominant pair: c(a,b)=3, c(a)=c(b)=3, Tu=10, Tb=6
    # pmi = ln(3·100/(9·6)) = ln(50/9)
    assert got[("a", "b")] == (3, round(math.log(3 * 10 * 10 / (3 * 3 * 6)), 6))


def test_pmi_min_count_guards_hapax(spark):
    texts = {0: "a b a b", 1: "a b c", 2: "c c"}
    got = _run_pmi(spark, texts, 2)
    assert set(got) == {("a", "b")}  # every other pair occurs once
    assert got[("a", "b")][0] == 3


def test_pmi_collocation_outranks_chance(spark):
    # 'new york' only ever adjacent; 'the' pairs with many different
    # right-neighbors: PMI must rank the true collocation higher even
    # though 'the a' repeats too
    texts = {
        0: "new york new york",
        1: "the a the b the c",
        2: "the a new york",
    }
    got = _run_pmi(spark, texts, 2)
    assert set(got) == {("new", "york"), ("the", "a")}
    assert got[("new", "york")][1] > got[("the", "a")][1]
