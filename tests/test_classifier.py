"""Hash-n-gram linear classifier (operators/classifier.py): Python-mirror
goldens for the native codegen path, native↔Arrow dispatch parity, and
the zero-feature NULL contract."""

import hashlib

import pytest
from pyspark.sql import functions as F  # noqa: F401  (parity with suite style)

from geospatial_web_scraper_spark.operators import classifier
from geospatial_web_scraper_spark.operators.classifier import (
    MICRO,
    quality_classifier,
    synthetic_weights,
)

DOCS = [
    (0, "The quick brown fox jumps over the lazy dog"),
    (1, "spark spark spark quality filter"),
    (2, ""),
    (3, "single"),
    (4, "Mixed CASE Tokens lower the same way"),
]


def _mirror(text, weights, threshold=0.0):
    toks = text.lower().split()
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    if not feats:
        return (0, None, False)
    k = len(weights)
    wm = [int(round(w * MICRO)) for w in weights]
    s = sum(
        wm[int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % k]
        for t in feats
    )
    score = round(s / len(feats) / MICRO, 6)
    return (len(feats), score, s >= int(round(threshold * MICRO)) * len(feats))


def _run(spark, weights, threshold=0.0):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_features"], r["score"], r["kept"])
        for r in quality_classifier(df, weights, threshold=threshold).collect()
    }


def test_native_path_matches_python_mirror(spark):
    w = synthetic_weights(64)
    got = _run(spark, w, threshold=0.0)
    for i, text in DOCS:
        n, score, kept = _mirror(text, w)
        assert got[i][0] == n, (i, got[i])
        if n == 0:
            assert got[i][1] is None and got[i][2] is False
        else:
            assert got[i][1] == pytest.approx(score, abs=1e-9)
            assert got[i][2] == kept


def test_arrow_path_matches_native(spark, monkeypatch):
    # same 300-bucket model through both code paths: dispatch is on the
    # NATIVE_BUCKET_BUDGET global, integer sums make outputs identical
    w = synthetic_weights(300)
    arrow = _run(spark, w)  # 300 > 256 -> Arrow kernel
    monkeypatch.setattr(classifier, "NATIVE_BUCKET_BUDGET", 512)
    native = _run(spark, w)  # now the codegen fold
    assert arrow == native


def test_keep_expr_matches_operator_kept(spark):
    # classifier_keep_expr (the scan-local curate gate) must make the
    # IDENTICAL keep decision as quality_classifier's kept column, at
    # several thresholds including a negative one — same fold, same
    # integer-exact compare, pinned so they can't drift apart.
    from geospatial_web_scraper_spark.operators.classifier import (
        classifier_keep_expr,
    )

    w = synthetic_weights(64)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for thr in (0.0, 0.25, -0.4):
        via_expr = {
            r["doc_id"]: r["k"]
            for r in df.select(
                "doc_id",
                classifier_keep_expr(F.col("text"), w, thr).alias("k"),
            ).collect()
        }
        via_op = {
            r["doc_id"]: r["kept"]
            for r in quality_classifier(df, w, threshold=thr).collect()
        }
        assert via_expr == via_op, thr


def test_keep_expr_refuses_arrow_scale_models(spark):
    from geospatial_web_scraper_spark.operators.classifier import (
        classifier_keep_expr,
    )

    with pytest.raises(ValueError, match="NATIVE_BUCKET_BUDGET"):
        classifier_keep_expr(F.col("text"), synthetic_weights(300))


def test_threshold_gate_is_integer_exact(spark):
    # threshold above every mean weight -> nothing kept except NULL-safe
    w = synthetic_weights(64)
    got = _run(spark, w, threshold=1.5)
    assert not any(kept for (_, _, kept) in got.values())


def test_null_text_parity_between_paths(spark, monkeypatch):
    # NULL text -> (NULL n_features, NULL score, kept False) on BOTH
    # dispatch paths (r4 review finding: the Arrow kernel crashed on None)
    df = spark.createDataFrame(
        [(0, None), (1, "some text here")], "doc_id long, text string"
    )
    w = synthetic_weights(300)
    arrow = {
        r["doc_id"]: (r["n_features"], r["score"], r["kept"])
        for r in quality_classifier(df, w).collect()
    }
    monkeypatch.setattr(classifier, "NATIVE_BUCKET_BUDGET", 512)
    native = {
        r["doc_id"]: (r["n_features"], r["score"], r["kept"])
        for r in quality_classifier(df, w).collect()
    }
    assert arrow == native
    assert arrow[0][1] is None and arrow[0][2] is False
