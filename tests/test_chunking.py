"""Overlapping retrieval chunking (operators/chunking.py): window-count
boundaries, span lineage, overlap stitching, and full-coverage."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from geospatial_web_scraper_spark.operators.chunking import chunk_documents


def _run(spark, texts, size=8, overlap=2):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = {}
    rows = chunk_documents(df, size=size, overlap=overlap).collect()
    for r in rows:
        out.setdefault(r["doc_id"], []).append(r)
    for v in out.values():
        v.sort(key=lambda r: r["chunk_idx"])
    return out


def test_window_count_boundaries(spark):
    w = lambda n: " ".join(f"t{i}" for i in range(n))  # noqa: E731
    got = _run(spark, ["", w(1), w(8), w(9), w(14), w(15)], size=8, overlap=2)
    # n=0 -> no chunks; n<=8 -> 1; 9..14 -> 2 (last start=6); 15 -> 2 (6+8=14>=15? 6..13 covers 14 of 15... ceil((15-8)/6)=2 -> 3)
    assert 0 not in got
    assert len(got[1]) == 1 and len(got[2]) == 1
    assert len(got[3]) == 2 and len(got[4]) == 2
    assert len(got[5]) == 3
    # lineage + tail length
    assert [r["tok_start"] for r in got[4]] == [0, 6]
    assert [r["n_tokens"] for r in got[4]] == [8, 8]
    assert [r["n_tokens"] for r in got[3]] == [8, 3]


def test_overlap_stitching_and_coverage(spark):
    n, size, overlap = 23, 8, 2
    text = " ".join(f"w{i}" for i in range(n))
    (chunks,) = _run(spark, [text], size=size, overlap=overlap).values()
    toks = text.split()
    covered = []
    for r in chunks:
        ct = r["chunk_text"].split()
        assert ct == toks[r["tok_start"] : r["tok_start"] + r["n_tokens"]]
        covered.extend(range(r["tok_start"], r["tok_start"] + r["n_tokens"]))
        # adjacent chunks share exactly `overlap` tokens (except the tail,
        # which may share more if clamped — not the case at these sizes)
    assert set(covered) == set(range(n))
    starts = [r["tok_start"] for r in chunks]
    assert starts == [0, 6, 12, 18]


def test_bad_params(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, size=8, overlap=8)


def test_chunking_coverage_property(spark):
    # hypothesis-style sweep: for every (n, size, overlap) shape, windows
    # tile the token range — full coverage, correct starts, tail rule
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=60),
        size=st.integers(min_value=2, max_value=16),
        overlap=st.integers(min_value=0, max_value=8),
    )
    def prop(n, size, overlap):
        if not overlap < size:
            return
        text = " ".join(f"t{i}" for i in range(n))
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        rows = sorted(
            chunk_documents(df, size=size, overlap=overlap).collect(),
            key=lambda r: r["chunk_idx"],
        )
        if n == 0:
            assert rows == []
            return
        step = size - overlap
        import math

        assert len(rows) == 1 + math.ceil(max(0, n - size) / step)
        covered = set()
        for r in rows:
            assert r["tok_start"] == r["chunk_idx"] * step
            assert r["n_tokens"] == min(size, n - r["tok_start"])
            covered.update(
                range(r["tok_start"], r["tok_start"] + r["n_tokens"])
            )
        assert covered == set(range(n))

    prop()
