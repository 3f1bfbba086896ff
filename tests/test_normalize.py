"""Unicode normalization units: probe-corpus integrity (codepoint-level,
so an editor/tool silently recomposing the source literals fails loud),
NFC composition classes through the real operator, cleaner semantics,
NULL contract, and the dedup integration the pass exists for."""

import pytest
from pyspark.sql import functions as F

from geospatial_web_scraper_spark.operators.normalize import (
    CONTROL_CLASS,
    EXOTIC_SPACE_CODEPOINTS,
    PROBES,
    SPACE_CLASS,
    clean_expr,
    normalize_text_expr,
    probes_sql_list,
)

EXPECTED_PROBES = [
    (0x63, 0x61, 0x66, 0xE9),
    (0x63, 0x61, 0x66, 0x65, 0x301),
    (0x41, 0x30A, 0x301) + tuple(map(ord, "ngstrom")),
    (0x212B, 0x20) + tuple(map(ord, "sign")),
    (0x1100, 0x1161, 0x11A8, 0x20) + tuple(map(ord, "jamo")),
    (0xA0, 0x2007, 0x3000) + tuple(map(ord, "spaced")),
    tuple(map(ord, "bell")) + (0x07, 0x1F) + tuple(map(ord, "ctl")),
    (),
]


def test_probe_corpus_codepoints_pinned():
    assert [tuple(map(ord, p)) for p in PROBES] == EXPECTED_PROBES
    # every probe's spaces/controls are covered by the cleaner classes
    assert 0x2007 in EXOTIC_SPACE_CODEPOINTS
    assert 0x3000 in EXOTIC_SPACE_CODEPOINTS
    assert "\\x0e-" in CONTROL_CLASS.replace("\\\\", "\\")
    assert SPACE_CLASS.startswith("[\\x{00a0}")


def test_probes_sql_list_is_pure_ascii_chr_calls():
    sql = probes_sql_list()
    assert sql.isascii()
    assert "chr(769)" in sql  # U+0301 combining acute
    assert sql.endswith(", '']")


def _norm(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "t string")
    return [r["n"] for r in df.select(normalize_text_expr(F.col("t")).alias("n")).collect()]


def test_nfc_composition_classes(spark):
    decomposed = [
        "cafe\u0301",          # combining acute
        "A\u030a\u0301",       # stacked ring + acute
        "\u212b",              # angstrom-sign singleton
        "\u1100\u1161\u11a8",  # Hangul jamo triple
    ]
    composed = ["caf\u00e9", "\u01fa", "\u00c5", "\uac01"]
    assert _norm(spark, decomposed) == _norm(spark, composed) == composed


def test_cleaner_controls_spaces_collapse(spark):
    got = _norm(spark, ["a\x07b", "a\u00a0\u3000b", "  a\t\n b ", " x "])
    assert got == ["ab", "a b", "a b", "x"]


def test_normalize_null_preserved(spark):
    df = spark.createDataFrame([(1, None), (2, "ok")], "i long, t string")
    rows = {r["i"]: r["n"] for r in df.select(
        "i", normalize_text_expr(F.col("t")).alias("n")).collect()}
    assert rows == {1: None, 2: "ok"}


def test_clean_expr_alone_keeps_decomposed_marks(spark):
    """clean_expr is the native half only — combining marks pass through
    untouched (NFC is the Arrow step)."""
    df = spark.createDataFrame([("cafe\u0301",)], "t string")
    got = df.select(clean_expr(F.col("t")).alias("n")).first()["n"]
    assert got == "cafe\u0301"


def test_dedup_sees_normalized_twins_as_duplicates(spark):
    """The reason the pass runs before the dedup family: the decomposed
    and precomposed spellings md5-collide only after normalization."""
    from geospatial_web_scraper_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(
        [(1, "café crawl"), (2, "café crawl"), (3, "other")],
        "doc_id long, text string",
    )
    raw = exact_dedup(docs)
    normed = exact_dedup(
        docs.select("doc_id", normalize_text_expr(F.col("text")).alias("text"))
    )
    assert raw.count() == 3 and normed.count() == 2
    assert sorted(r["keep_id"] for r in normed.collect()) == [1, 3]
