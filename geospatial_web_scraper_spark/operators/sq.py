"""SQ8 scalar quantization — the int8 serving format for embeddings.

Product quantization (operators/pq.py) is the ×64 long-tail compressor;
the FIRST compression every vector-serving deployment applies is plain
per-vector symmetric int8: ``code_i = round(x_i / scale · 127)`` with
``scale = max|x|`` — 4× smaller than float32, SIMD-friendly integer dot
products, and reconstruction error small enough that re-ranking restores
exact order (the FAISS ``SQ8`` / vector-DB default). This module is the
deterministic Spark form: all arithmetic is element-wise whole-stage
codegen over the row, zero shuffle, and — because the elements are cast
to double BEFORE any division (Spark promotes float division to double,
DuckDB does not; casting first makes both engines run the identical
double ops) — codes, scales and reconstruction errors oracle-check
digit-for-digit (`sq8_encode` catalog query).

Zero vectors quantize to scale 0 with all-zero codes (no division) and
decode back to exact zeros — consistent with the cosine NULL contract's
treatment of zero-norm vectors elsewhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["SQ_LEVELS", "sq8_encode", "sq8_decode"]

#: symmetric int8 range: codes in [-127, 127] (−128 unused, keeps the
#: quantizer symmetric so decode(-x) == -decode(x))
SQ_LEVELS = 127


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def sq8_encode(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ ``(id_col, scale, codes)``: per-vector symmetric int8 codes.
    ``scale`` is ``max|x_i|`` (double); ``codes[i] = round(x_i / scale ·
    127)`` — always in [-127, 127] by construction since ``|x_i| ≤
    scale``. Pure codegen; the vector is bound once via the
    transform-wrap (HOF lambdas get no CSE)."""
    # double transform-wrap: bind the vector once, then bind its scale
    # once — a bare array_max inside the per-element lambda would rescan
    # the vector per element (O(d^2); HOF lambdas get no CSE)
    enc = F.transform(
        F.array(_as_double(F.col(vec_col))),
        lambda v: F.transform(
            F.array(F.array_max(F.transform(v, F.abs))),
            lambda s: F.struct(
                s.alias("scale"),
                F.transform(
                    v,
                    lambda x: F.when(
                        s > 0,
                        F.round(x / s * SQ_LEVELS, 0).cast("int"),
                    ).otherwise(F.lit(0)),
                ).alias("codes"),
            ),
        )[0],
    )[0]
    return emb.select(
        F.col(id_col),
        enc.alias("_e"),
    ).select(
        id_col,
        F.col("_e.scale").alias("scale"),
        F.col("_e.codes").alias("codes"),
    )


def sq8_decode(
    encoded: DataFrame,
    id_col: str = "vec_id",
    scale_col: str = "scale",
    codes_col: str = "codes",
) -> DataFrame:
    """→ ``(id_col, vector array<double>)``: ``x̂_i = codes[i] · scale /
    127`` — the reconstruction used for re-ranking after an integer-dot
    candidate pass."""
    scale = F.col(scale_col)
    vec = F.transform(
        F.col(codes_col),
        lambda c: c.cast("double") * scale / F.lit(float(SQ_LEVELS)),
    )
    return encoded.select(F.col(id_col), vec.alias("vector"))
