"""Multimodal column plumbing — images/audio/video as opaque binary columns.

The Spark-side contract is real and tested: schema, Arrow batch shape,
partition-size control, and mapInPandas iterator plumbing all run; only the
codec kernels are stubbed (this container ships no image/audio libraries).
Each stub is deterministic so tests can assert the full distributed path.

Pattern: ``media(asset_id, kind, payload:binary, meta:struct)`` →
``mapInPandas`` batches → decoded features. ``mapInPandas`` (not a scalar
UDF) because decode output is variable-shape (frames explode rows) and
because per-batch setup (codec contexts) amortizes across the batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "asset_id long, kind string, payload binary, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "asset_id long, kind string, n_bytes long, feature array<float>"
FRAME_SCHEMA = "asset_id long, frame_idx int, ts_ms int, frame_bytes long"

_FEATURE_DIM = 8


def _fake_decode_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder (STUB).

    Real implementation would be e.g. PIL/torchvision decode + model
    forward; not installable here. The fake folds payload bytes into a
    fixed-dim float vector so the distributed plumbing is fully testable.
    """
    acc = [0] * _FEATURE_DIM
    for idx, byte in enumerate(payload):
        acc[idx % _FEATURE_DIM] = (acc[idx % _FEATURE_DIM] + byte) % 997
    return [float(x) / 997.0 for x in acc]


def decode_features(media: DataFrame) -> DataFrame:
    """media → (asset_id, kind, n_bytes, feature). Arrow-batched iterator;
    one output row per asset."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)),
                    "feature": payloads.map(
                        lambda b: _fake_decode_feature(bytes(b or b""))
                    ),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (row explosion
    inside mapInPandas — variable fan-out per input row). Frame decode is
    stubbed (raises for non-video kinds; emits deterministic frame stats)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "asset_id": [], "frame_idx": [], "ts_ms": [], "frame_bytes": []
            }
            for _, row in pdf.iterrows():
                if row["kind"] != "video":
                    continue
                duration = int(row["duration_ms"] or 0)
                n = len(bytes(row["payload"] or b""))
                for frame_idx, ts in enumerate(range(0, duration, every_ms)):
                    out["asset_id"].append(row["asset_id"])
                    out["frame_idx"].append(frame_idx)
                    out["ts_ms"].append(ts)
                    # STUB: real path decodes the frame; fake = payload slice size
                    out["frame_bytes"].append(n // max(1, duration // every_ms))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(batches, FRAME_SCHEMA)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:  # pragma: no cover
    """Image resize — NOT implementable in this container (no PIL/opencv).
    The signature and schema are the contract; raises until a codec lib is
    present on the cluster."""
    raise NotImplementedError(
        "image resize requires an image codec library (PIL/opencv) on the "
        "executors; install it cluster-side and replace _fake_decode_feature "
        "with the real kernel"
    )
