"""SQ8 scalar quantization (operators/sq.py): code range, zero-vector
contract, decode round-trip error bound, and symmetry."""

from pyspark.sql import functions as F

from geospatial_web_scraper_spark.operators.sq import (
    SQ_LEVELS,
    sq8_decode,
    sq8_encode,
)


def _vecs(spark):
    return spark.createDataFrame(
        [
            (0, [1.0, -0.5, 0.25, 0.0]),
            (1, [0.0, 0.0, 0.0, 0.0]),       # zero vector
            (2, [-2.0, 2.0, 1.0, -1.0]),     # symmetric
            (3, [1e-6, -1e-6, 5e-7, 0.0]),   # tiny magnitudes
        ],
        "vec_id long, embedding array<float>",
    )


def test_encode_range_and_zero_vector(spark):
    got = {r["vec_id"]: r for r in sq8_encode(_vecs(spark)).collect()}
    for r in got.values():
        assert all(-SQ_LEVELS <= c <= SQ_LEVELS for c in r["codes"])
    assert got[1]["scale"] == 0.0 and got[1]["codes"] == [0, 0, 0, 0]
    assert got[0]["scale"] == 1.0
    assert got[0]["codes"] == [127, -64, 32, 0]  # round-half-away: 31.75->32
    # symmetry: decode(-x) == -decode(x) comes from the +-127 range
    assert got[2]["codes"] == [-127, 127, 64, -64]


def test_decode_roundtrip_error_bound(spark):
    enc = sq8_encode(_vecs(spark))
    dec = {r["vec_id"]: r["vector"] for r in sq8_decode(enc).collect()}
    orig = {r["vec_id"]: r["embedding"] for r in _vecs(spark).collect()}
    for vid, x in orig.items():
        scale = max(abs(v) for v in x)
        half_step = (scale / SQ_LEVELS) / 2 + 1e-12
        for a, b in zip(x, dec[vid]):
            assert abs(a - b) <= half_step, (vid, a, b)
