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
        import numpy as np

        for pdf in it:
            vid = pdf[pdf["kind"] == "video"]
            if len(vid) == 0:
                yield pd.DataFrame(
                    {"asset_id": pd.Series(dtype="int64"),
                     "frame_idx": pd.Series(dtype="int32"),
                     "ts_ms": pd.Series(dtype="int32"),
                     "frame_bytes": pd.Series(dtype="int64")}
                )
                continue
            dur = vid["duration_ms"].fillna(0).astype("int64").to_numpy()
            sizes = vid["payload"].map(
                lambda b: 0 if b is None else len(bytes(b))
            ).to_numpy()
            # vectorized fan-out: n_frames per row, then np.repeat the row
            # attributes and one arange per output for frame_idx/ts
            n_frames = np.where(dur > 0, (dur + every_ms - 1) // every_ms, 0)
            total = int(n_frames.sum())
            if total == 0:
                continue
            offsets = np.repeat(np.cumsum(n_frames) - n_frames, n_frames)
            frame_idx = np.arange(total) - offsets
            # STUB: real path decodes the frame; fake = payload slice size
            fb = sizes // np.maximum(1, dur // every_ms)
            yield pd.DataFrame(
                {
                    "asset_id": np.repeat(vid["asset_id"].to_numpy(), n_frames),
                    "frame_idx": frame_idx.astype("int32"),
                    "ts_ms": (frame_idx * every_ms).astype("int32"),
                    "frame_bytes": np.repeat(fb, n_frames).astype("int64"),
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(batches, FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "asset_id long, out_width int, out_height int, n_bytes long, "
    "checksum long"
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing → one row per IMAGE asset: ``(asset_id,
    out_width, out_height, n_bytes, checksum)``.

    Everything EXCEPT the pixel codec is real: the letterbox-fit
    arithmetic (scale = min(W/w0, H/h0), exact integer division — the
    actual dimension computation a production resize performs), the
    Arrow batch plumbing, the kind gate, the null/degenerate-metadata
    drop, and the output contract. The pixel kernel is STUBBED (this
    container ships no PIL/opencv): ``n_bytes`` is the uncompressed RGB
    buffer size ``out_w·out_h·3`` the real kernel would allocate, and
    ``checksum`` is the md5-60bit of the SOURCE payload (proving the
    bytes crossed the Arrow boundary intact) — a real deployment
    replaces the two marked lines with decode+resize+re-encode and
    checksums the output instead.

    Rows whose ``kind`` is not ``image`` or whose source ``width``/
    ``height`` metadata is missing/non-positive are dropped (no aspect
    ratio to preserve). Upscaling is allowed (pure fit semantics)."""
    if width <= 0 or height <= 0:
        raise ValueError(f"target dims must be positive, got {width}x{height}")
    W, H = int(width), int(height)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in it:
            img = pdf[
                (pdf["kind"] == "image")
                & pdf["width"].notna()
                & pdf["height"].notna()
            ]
            img = img[(img["width"] > 0) & (img["height"] > 0)]
            if len(img) == 0:
                yield pd.DataFrame(
                    {
                        "asset_id": pd.Series(dtype="int64"),
                        "out_width": pd.Series(dtype="int32"),
                        "out_height": pd.Series(dtype="int32"),
                        "n_bytes": pd.Series(dtype="int64"),
                        "checksum": pd.Series(dtype="int64"),
                    }
                )
                continue
            w0 = img["width"].astype("int64").to_numpy()
            h0 = img["height"].astype("int64").to_numpy()
            # exact integer letterbox fit: width-limited iff W/w0 <= H/h0
            wlim = W * h0 <= H * w0
            ow = np.where(wlim, W, (w0 * H) // h0)
            oh = np.where(wlim, (h0 * W) // w0, H)
            # STUB line 1: real kernel = decode(payload) → resize(ow, oh)
            checksum = img["payload"].map(
                lambda b: int(
                    hashlib.md5(bytes(b or b"")).hexdigest()[:15], 16
                )
            )
            # STUB line 2: real kernel re-encodes; the fake reports the
            # RGB buffer the resize would materialize
            yield pd.DataFrame(
                {
                    "asset_id": img["asset_id"].astype("int64"),
                    "out_width": ow.astype("int32"),
                    "out_height": oh.astype("int32"),
                    "n_bytes": (ow * oh * 3).astype("int64"),
                    "checksum": checksum.astype("int64"),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, RESIZE_SCHEMA
    )
