"""Real netpbm codec behind the multimodal plumbing (r5, VERDICT r4 #2):
decode_image / nn_resample / encode_image golden pins, the resize_images
real-path contract (header-authoritative dims, output-bytes checksum),
and the stub-path regression guards (non-netpbm payloads must behave
exactly as before — the catalog's multimodal_resize oracle row depends
on it)."""

import hashlib

import numpy as np
import pytest

from geospatial_web_scraper_spark.operators.multimodal import (
    decode_features,
    decode_image,
    encode_image,
    nn_resample,
    resize_images,
)

MEDIA_SCHEMA = (
    "asset_id bigint, kind string, payload binary, "
    "width int, height int, duration_ms int"
)


def _md5_60(b: bytes) -> int:
    return int(hashlib.md5(b).hexdigest()[:15], 16)


def _ppm(w: int, h: int, px: bytes, header: bytes | None = None) -> bytes:
    head = header if header is not None else b"P6\n%d %d\n255\n" % (w, h)
    return head + px


# ---------------------------------------------------------------- decoder


def test_decode_p6_roundtrip_and_golden():
    # 2x2 RGB: pixels laid out row-major, 3 bytes each
    px = bytes(range(12))
    img = decode_image(_ppm(2, 2, px))
    assert img is not None and img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [0, 1, 2]
    assert img[1, 1].tolist() == [9, 10, 11]
    assert decode_image(encode_image(img)).tolist() == img.tolist()


def test_decode_p5_grayscale():
    img = decode_image(b"P5\n3 2\n255\n" + bytes([10, 20, 30, 40, 50, 60]))
    assert img is not None and img.shape == (2, 3, 1)
    assert img[1, 2, 0] == 60
    assert encode_image(img).startswith(b"P5\n3 2\n255\n")


def test_decode_header_comments_and_whitespace():
    payload = b"P6 # magic comment\n# full line\n 2\t1 # dims\n255 " + bytes(6)
    img = decode_image(payload)
    assert img is not None and img.shape == (1, 2, 3)


@pytest.mark.parametrize(
    "payload",
    [
        b"",  # empty
        b"hello world, definitely text",  # wrong magic
        b"P3\n1 1\n255\n0 0 0",  # ASCII variant not supported
        b"P6\n2 2\n255\n" + bytes(11),  # raster one byte short
        b"P6\n2 2\n255\n" + bytes(13),  # raster one byte long (strict)
        b"P6\n2 2\n65535\n" + bytes(24),  # 2-byte samples unsupported
        b"P6\n0 2\n255\n",  # degenerate dims
        b"P6\n2 2\n255",  # missing raster separator
    ],
)
def test_decode_rejects_malformed(payload):
    assert decode_image(payload) is None


def test_nn_resample_exact_integer_mapping():
    # 2x2 -> 4x4: src index = (dst * 2) // 4 = dst // 2 (block replicate)
    img = decode_image(_ppm(2, 2, bytes(range(12))))
    up = nn_resample(img, 4, 4)
    assert up.shape == (4, 4, 3)
    assert up[0, 1].tolist() == img[0, 0].tolist()
    assert up[3, 3].tolist() == img[1, 1].tolist()
    # 4x4 -> 2x2 downsample picks pixels (0,0),(0,2),(2,0),(2,2)
    down = nn_resample(up, 2, 2)
    assert down.tolist() == img.tolist()


# ------------------------------------------------------- resize real path


def _media(spark, rows):
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_resize_real_path_golden(spark):
    """A real P6 payload is decoded, letterbox-resampled with the exact
    floor mapping, re-encoded, and the checksum/n_bytes describe the
    OUTPUT bytes — computed independently here with the same numpy ops."""
    px = bytes((i * 17) % 256 for i in range(2 * 2 * 3))
    payload = _ppm(2, 2, px)
    # metadata dims deliberately WRONG: the header must win on this path
    [row] = resize_images(
        _media(spark, [(1, "image", payload, 999, 1, None)]), 4, 4
    ).collect()
    expected = encode_image(nn_resample(decode_image(payload), 4, 4))
    assert (row.out_width, row.out_height) == (4, 4)
    assert row.n_bytes == len(expected)
    assert row.checksum == _md5_60(expected)


def test_resize_real_path_letterbox_dims_from_header(spark):
    # 4x2 source into 4x4 target: height-limited? W/w0 = 1, H/h0 = 2 →
    # width-limited (W*h0=8 <= H*w0=16): ow=4, oh=(2*4)//4=2
    px = bytes(4 * 2 * 3)
    [row] = resize_images(
        _media(spark, [(2, "image", _ppm(4, 2, px), None, None, None)]),
        4, 4,
    ).collect()
    assert (row.out_width, row.out_height) == (4, 2)
    # metadata missing is FINE on the real path (header is ground truth)


def test_resize_p5_real_path(spark):
    payload = b"P5\n2 2\n255\n" + bytes([0, 64, 128, 255])
    [row] = resize_images(
        _media(spark, [(3, "image", payload, None, None, None)]), 2, 2
    ).collect()
    expected = encode_image(decode_image(payload))
    assert row.n_bytes == len(expected)
    assert row.checksum == _md5_60(expected)


def test_resize_stub_path_unchanged(spark):
    """Non-netpbm payloads keep the frozen stub contract: metadata-driven
    dims, RGB-buffer n_bytes, SOURCE-payload checksum — the catalog
    oracle row's semantics."""
    payload = "café contents".encode()
    [row] = resize_images(
        _media(spark, [(7, "image", payload, 10, 10, None)]), 640, 480
    ).collect()
    # 10x10 into 640x480 → min scale 48 → 480x480 (height-limited)
    assert (row.out_width, row.out_height) == (480, 480)
    assert row.n_bytes == 480 * 480 * 3
    assert row.checksum == _md5_60(payload)
    # stub path still drops metadata-less rows
    assert (
        resize_images(
            _media(spark, [(8, "image", payload, None, 10, None)]), 640, 480
        ).count()
        == 0
    )


def test_decode_features_real_pixels(spark):
    px = bytes([0, 0, 0, 255, 255, 255, 10, 20, 30, 40, 50, 60])
    payload = _ppm(2, 2, px)
    [row] = decode_features(
        _media(spark, [(1, "image", payload, None, None, None)])
    ).collect()
    w, h, c, mn, mx, mean, ch0, bright = row.feature
    assert (w, h, c) == (2.0, 2.0, 3.0)
    assert (mn, mx) == (0.0, 255.0)
    assert mean == pytest.approx(sum(px) / 12, abs=1e-6)
    assert ch0 == pytest.approx((0 + 255 + 10 + 40) / 4, abs=1e-6)
    assert bright == pytest.approx(3 / 12, abs=1e-6)
    # non-netpbm payload keeps the byte-fold stub feature
    [stub] = decode_features(
        _media(spark, [(2, "image", b"\x01\x02\x03\x04", None, None, None)])
    ).collect()
    assert len(stub.feature) == 8 and stub.feature != row.feature


# ------------------------------------------------------- audio (PCM16 WAV)

from geospatial_web_scraper_spark.operators.multimodal import (  # noqa: E402
    decode_audio,
    encode_audio,
)


def _wav(rate=8000, frames=16, channels=1, amp=1000):
    sam = (
        np.arange(frames * channels, dtype=np.int64).reshape(frames, channels)
        * 37
        % (2 * amp)
        - amp
    ).astype(np.int16)
    return encode_audio(rate, sam), sam


def test_wav_roundtrip_and_golden():
    payload, sam = _wav(rate=16000, frames=8, channels=2)
    rate, ch, got = decode_audio(payload)
    assert (rate, ch) == (16000, 2)
    assert got.tolist() == sam.tolist()


def test_wav_chunk_walk_skips_extra_chunks():
    """A LIST chunk (with odd size, exercising word alignment) between
    fmt and data must be skipped per the RIFF spec."""
    payload, sam = _wav(frames=4)
    # splice an odd-sized junk chunk before 'data'
    di = payload.find(b"data")
    junk = b"LIST" + (3).to_bytes(4, "little") + b"xyz" + b"\x00"
    spliced = payload[:di] + junk + payload[di:]
    spliced = spliced[:4] + (len(spliced) - 8).to_bytes(4, "little") + spliced[8:]
    rate, ch, got = decode_audio(spliced)
    assert got.tolist() == sam.tolist()


@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: b"",  # empty
        lambda p: b"RIFX" + p[4:],  # wrong magic
        lambda p: p[:8] + b"AVI " + p[12:],  # not WAVE
        # audio_format 3 (float) instead of PCM
        lambda p: p.replace(b"fmt \x10\x00\x00\x00\x01\x00",
                            b"fmt \x10\x00\x00\x00\x03\x00", 1),
        lambda p: p[:-1],  # truncated data chunk
        lambda p: p[: p.find(b"data")],  # no data chunk at all
    ],
)
def test_wav_rejects_malformed(mutate):
    payload, _ = _wav()
    assert decode_audio(mutate(payload)) is None


def test_decode_features_real_audio(spark):
    payload, sam = _wav(rate=8000, frames=16, channels=1)
    [row] = decode_features(
        _media(spark, [(1, "audio", payload, None, None, 2000)])
    ).collect()
    rate, ch, frames, mn, mx, mean, absmean, clip = row.feature
    assert (rate, ch, frames) == (8000.0, 1.0, 16.0)
    s = sam.astype("int64")
    assert mn == float(s.min()) and mx == float(s.max())
    assert mean == pytest.approx(int(s.sum()) / s.size, abs=1e-2)
    assert absmean == pytest.approx(int(abs(s).sum()) / s.size, abs=1e-2)
    assert clip == 0.0
    # non-WAV audio payload keeps the byte-fold stub
    [stub] = decode_features(
        _media(spark, [(2, "audio", b"\x09\x08\x07", None, None, None)])
    ).collect()
    assert len(stub.feature) == 8 and stub.feature != row.feature


# ---------------------------------------------------- codec properties

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    c=st.sampled_from([1, 3]),
    seed=st.integers(0, 2**31 - 1),
)
def test_image_roundtrip_property(w, h, c, seed):
    """decode(encode(x)) == x for every shape/channel/pixel content —
    the inverse contract the resize path relies on."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    out = decode_image(encode_image(img))
    assert out is not None and out.tolist() == img.tolist()


@settings(max_examples=60, deadline=None)
@given(
    frames=st.integers(0, 32),
    channels=st.integers(1, 4),
    rate=st.integers(1, 192_000),
    seed=st.integers(0, 2**31 - 1),
)
def test_audio_roundtrip_property(frames, channels, rate, seed):
    rng = np.random.default_rng(seed)
    sam = rng.integers(-(2**15), 2**15, size=(frames, channels)).astype(
        np.int16
    )
    r, c, out = decode_audio(encode_audio(rate, sam))
    assert (r, c) == (rate, channels)
    assert out.tolist() == sam.tolist()


@settings(max_examples=120, deadline=None)
@given(blob=st.binary(max_size=256))
def test_decoders_never_crash_on_garbage(blob):
    """Arbitrary bytes must decode to None or to a valid array — never
    raise (the Arrow batch path feeds the decoders raw corpus payloads)."""
    img = decode_image(blob)
    assert img is None or img.dtype == np.uint8
    wav = decode_audio(blob)
    assert wav is None or wav[2].dtype == np.int16


@settings(max_examples=60, deadline=None)
@given(
    blob=st.binary(max_size=64),
    magic=st.sampled_from([b"P5\n", b"P6\n", b"RIFF"]),
)
def test_decoders_never_crash_on_magic_prefixed_garbage(blob, magic):
    """Garbage that passes the magic check exercises the deep parse
    paths (header tokenizer, chunk walk)."""
    payload = magic + blob
    decode_image(payload)
    decode_audio(payload)
