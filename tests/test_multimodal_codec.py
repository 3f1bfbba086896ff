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


# ------------------------------------------------------------ y4m codec

from geospatial_web_scraper_spark.operators.multimodal import (  # noqa: E402
    decode_video,
    decode_video_frames,
    encode_video,
    synth_y4m_payload,
)


def _y4m(frames=2, h=4, w=6, num=30, den=1, chroma=None, seed=3):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, size=(frames, h, w), dtype=np.uint8)
    if chroma == "444":
        u = rng.integers(0, 256, size=(frames, h, w), dtype=np.uint8)
        v = rng.integers(0, 256, size=(frames, h, w), dtype=np.uint8)
    elif chroma == "420":
        u = rng.integers(0, 256, size=(frames, h // 2, w // 2), dtype=np.uint8)
        v = rng.integers(0, 256, size=(frames, h // 2, w // 2), dtype=np.uint8)
    else:
        u = v = None
    return encode_video(num, den, y, u, v), y, u, v


@pytest.mark.parametrize("chroma", [None, "444", "420"])
def test_y4m_roundtrip(chroma):
    payload, y, u, v = _y4m(chroma=chroma)
    dec = decode_video(payload)
    assert dec is not None
    w, h, num, den, cs, y2, u2, v2 = dec
    assert (w, h, num, den) == (6, 4, 30, 1)
    assert y2.tolist() == y.tolist()
    if chroma is None:
        assert cs == "mono" and u2 is None and v2 is None
    else:
        assert cs == ("444" if chroma == "444" else "420jpeg")
        assert u2.tolist() == u.tolist() and v2.tolist() == v.tolist()


def test_y4m_golden_header_and_layout():
    payload, y, _, _ = _y4m(frames=1, h=2, w=3, num=25, den=2)
    assert payload.startswith(b"YUV4MPEG2 W3 H2 F25:2 Ip A1:1 Cmono\nFRAME\n")
    # raster is row-major Y samples immediately after the FRAME marker
    assert payload[-6:] == y[0].tobytes()


def test_y4m_tolerates_frame_params_and_defaults_to_420():
    # no C param -> 420jpeg default; frame-level params are skipped
    raw = (
        b"YUV4MPEG2 W4 H2 F1:1 Xmeta\n"
        + b"FRAME Ix\n"
        + bytes(range(8))  # Y 4x2
        + bytes([1, 2])  # U 2x1
        + bytes([3, 4])  # V 2x1
    )
    dec = decode_video(raw)
    assert dec is not None
    w, h, num, den, cs, y, u, v = dec
    assert (w, h, cs) == (4, 2, "420jpeg")
    assert y[0].tolist() == [[0, 1, 2, 3], [4, 5, 6, 7]]
    assert u[0].tolist() == [[1, 2]] and v[0].tolist() == [[3, 4]]


@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: b"",  # empty
        lambda p: b"JUV" + p[3:],  # wrong magic
        lambda p: p.replace(b" W6", b"", 1),  # missing width
        lambda p: p.replace(b" F30:1", b" F30", 1),  # malformed rate
        lambda p: p.replace(b" F30:1", b" F0:1", 1),  # zero rate
        lambda p: p.replace(b"Cmono", b"C422", 1),  # unsupported cs
        lambda p: p.replace(b"Cmono", b"Qmono", 1),  # unknown param tag
        lambda p: p[:-1],  # truncated raster (strict)
        lambda p: p + b"\x00",  # trailing byte (strict)
        lambda p: p.replace(b"FRAME\n", b"frame\n", 1),  # bad frame magic
        lambda p: p.replace(b"FRAME\n", b"FRAMEx\n", 1),  # params w/o space
        lambda p: p[: p.find(b"\n") + 1],  # zero frames
        lambda p: p.replace(b" W6 H4", b" W5 H3", 1).replace(
            b"Cmono", b"C420", 1
        ),  # odd dims under 4:2:0
        lambda p: p.replace(b" W6", b" W+6", 1),  # non-canonical int (sign)
        lambda p: p.replace(b" F30:1", b" F3_0:1", 1),  # int() '_' separator
    ],
)
def test_y4m_rejects_malformed(mutate):
    payload, _, _, _ = _y4m()
    assert decode_video(mutate(payload)) is None


def test_encode_video_rejects_empty_clip():
    """A frame-less (or zero-dim) clip would encode to a header-only
    stream the strict decoder returns None for — encode must fail loud
    instead of silently breaking the decode(encode(.)) inverse."""
    for shape in [(0, 4, 4), (2, 0, 4), (2, 4, 0)]:
        with pytest.raises(ValueError, match="empty clip"):
            encode_video(30, 1, np.zeros(shape, np.uint8))


def test_synth_y4m_matches_its_oracle_formula():
    """The catalog generator's luma/dims/fps arithmetic IS the
    ORACLES["multimodal_video"] SQL — this re-derives it in python."""
    for did in (2, 5, 8, 11, 14, 17, 20, 23):
        dec = decode_video(synth_y4m_payload(did))
        assert dec is not None
        w, h, num, den, cs, y, u, v = dec
        assert (w, h) == (8 + 4 * (did % 4), 6 + 2 * (did % 5))
        assert (num, den) == (2 + did % 7, 1 + did % 2)
        assert y.shape[0] == 2 + did % 4
        assert cs == ("444" if did % 2 == 0 else "420jpeg")
        f = np.arange(y.shape[0])[:, None, None]
        x = np.arange(w)[None, None, :]
        yy = np.arange(h)[None, :, None]
        exp = (31 * did + 7 * f + x + 2 * yy) % 256
        assert y.tolist() == exp.astype(np.uint8).tolist()


def test_decode_video_frames_real_path(spark):
    """Real decode → fps-exact timestamp sampling → luma mean. At F4:1
    frame timestamps are 0/250/500/750 ms, so every_ms=500 keeps frames
    0 and 2; at F2:1 (0/500 ms) it keeps both. Non-video kinds and
    non-Y4M payloads are dropped."""
    y4 = np.stack([np.full((2, 2), 10 * (f + 1), dtype=np.uint8) for f in range(4)])
    p4 = encode_video(4, 1, y4)
    y2 = np.stack([np.full((2, 2), 7, dtype=np.uint8), np.full((2, 2), 9, dtype=np.uint8)])
    p2 = encode_video(2, 1, y2)
    rows = decode_video_frames(
        _media(
            spark,
            [
                (1, "video", p4, None, None, None),
                (2, "video", p2, None, None, None),
                (3, "video", b"not a stream", None, None, None),
                (4, "image", p4, None, None, None),
            ],
        ),
        every_ms=500,
    ).collect()
    got = sorted((r.asset_id, r.frame_idx, r.ts_ms, r.mean_y_milli) for r in rows)
    assert got == [
        (1, 0, 0, 10_000),
        (1, 2, 500, 30_000),
        (2, 0, 0, 7_000),
        (2, 1, 500, 9_000),
    ]
    assert all(r.width == 2 and r.height == 2 for r in rows)


def test_decode_features_real_video(spark):
    payload, y, _, _ = _y4m(frames=3, h=4, w=6, num=24, den=1)
    [row] = decode_features(
        _media(spark, [(1, "video", payload, None, None, None)])
    ).collect()
    w, h, frames, fps, mn, mx, mean, bright = row.feature
    assert (w, h, frames, fps) == (6.0, 4.0, 3.0, 24.0)
    s = y.astype("int64")
    assert mn == float(s.min()) and mx == float(s.max())
    assert mean == pytest.approx(int(s.sum()) / s.size, abs=1e-2)
    assert bright == pytest.approx(int((s > 127).sum()) / s.size, abs=1e-2)
    # non-Y4M video payload keeps the byte-fold stub
    [stub] = decode_features(
        _media(spark, [(2, "video", b"\x01\x02\x03", None, None, None)])
    ).collect()
    assert len(stub.feature) == 8 and stub.feature != row.feature


@settings(max_examples=60, deadline=None)
@given(
    frames=st.integers(1, 6),
    w=st.integers(1, 5),
    h=st.integers(1, 5),
    num=st.integers(1, 120),
    den=st.integers(1, 4),
    chroma=st.sampled_from(["mono", "444", "420"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_video_roundtrip_property(frames, w, h, num, den, chroma, seed):
    if chroma == "420":
        w, h = 2 * w, 2 * h
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, size=(frames, h, w), dtype=np.uint8)
    u = v = None
    if chroma != "mono":
        cw, ch_ = (w, h) if chroma == "444" else (w // 2, h // 2)
        u = rng.integers(0, 256, size=(frames, ch_, cw), dtype=np.uint8)
        v = rng.integers(0, 256, size=(frames, ch_, cw), dtype=np.uint8)
    dec = decode_video(encode_video(num, den, y, u, v))
    assert dec is not None
    w2, h2, n2, d2, _cs, y2, u2, v2 = dec
    assert (w2, h2, n2, d2) == (w, h, num, den)
    assert y2.tolist() == y.tolist()
    if u is not None:
        assert u2.tolist() == u.tolist() and v2.tolist() == v.tolist()


@settings(max_examples=80, deadline=None)
@given(blob=st.binary(max_size=192), prefix=st.sampled_from(
    [b"", b"YUV4MPEG2 ", b"YUV4MPEG2 W4 H4 F1:1 Cmono\n",
     b"YUV4MPEG2 W4 H4 F1:1 Cmono\nFRAME\n"]))
def test_video_decoder_never_crashes(blob, prefix):
    out = decode_video(prefix + blob)
    assert out is None or out[5].dtype == np.uint8


def test_thumbnail_frames_composed_real_path(spark):
    """decode → sample → letterbox NN luma thumbnail → stats. A 6×4
    source into a 3×2 target is width-limited (3·4 ≤ 2·6) → 3×2 thumb
    picking src cols (0,2,4) × rows (0,2); a 4×8 source is
    height-limited → 1×2."""
    from geospatial_web_scraper_spark.operators.multimodal import (
        thumbnail_frames,
    )

    y1 = np.arange(24, dtype=np.uint8).reshape(1, 4, 6) * 10
    y2 = np.full((2, 8, 4), 100, dtype=np.uint8)  # tall: h=8, w=4
    rows = thumbnail_frames(
        _media(
            spark,
            [
                (1, "video", encode_video(2, 1, y1), None, None, None),
                (2, "video", encode_video(2, 1, y2), None, None, None),
                (3, "video", b"garbage", None, None, None),
                (4, "image", encode_video(2, 1, y1), None, None, None),
            ],
        ),
        every_ms=500,
        width=3,
        height=2,
    ).collect()
    got = {
        (r.asset_id, r.frame_idx): (
            r.out_width,
            r.out_height,
            r.mean_y_milli,
        )
        for r in rows
    }
    # asset 1: thumb = y1[0][[0,2]][:, [0,2,4]] = [[0,20,40],[120,140,160]]
    exp1 = (1000 * (0 + 20 + 40 + 120 + 140 + 160)) // 6
    assert got[(1, 0)] == (3, 2, exp1)
    # asset 2: 3*8=24 > 2*4=8 → height-limited: ow=(4*2)//8=1, oh=2
    assert got[(2, 0)] == (1, 2, 100_000)
    assert got[(2, 1)] == (1, 2, 100_000)
    assert set(got) == {(1, 0), (2, 0), (2, 1)}


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    tw=st.integers(1, 16),
    th=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
)
def test_thumbnail_letterbox_matches_resample_mirror(w, h, tw, th, seed):
    """The operator's thumbnail mean equals a direct python mirror of the
    letterbox fit + floor-mapping resample — the same arithmetic the
    multimodal_thumbs oracle re-derives in SQL."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    if tw * h <= th * w:
        ow, oh = tw, (h * tw) // w
    else:
        ow, oh = (w * th) // h, th
    thumb = nn_resample(y, ow, oh)
    assert thumb.shape == (oh, ow)
    sx = (np.arange(ow) * w) // ow
    sy = (np.arange(oh) * h) // oh
    exp = y[sy][:, sx]
    assert thumb.tolist() == exp.tolist()


def test_thumbnail_degenerate_fit_dropped(spark):
    """A 1×32 source into a 4×4 target floors the fitted width to 0 —
    the asset is dropped instead of dividing by zero."""
    from geospatial_web_scraper_spark.operators.multimodal import (
        thumbnail_frames,
    )

    y = np.zeros((1, 32, 1), dtype=np.uint8)  # h=32, w=1
    rows = thumbnail_frames(
        _media(spark, [(1, "video", encode_video(1, 1, y), None, None, None)]),
        every_ms=1000,
        width=4,
        height=4,
    ).collect()
    assert rows == []


def test_synth_wav_matches_its_oracle_formula():
    """The multimodal_audio generator's sample arithmetic IS the
    ORACLES["multimodal_audio"] SQL — re-derived here in python."""
    from geospatial_web_scraper_spark.operators.multimodal import (
        synth_wav_payload,
    )

    for did in (1, 4, 7, 10, 13, 34):
        dec = decode_audio(synth_wav_payload(did))
        assert dec is not None
        rate, ch, samples = dec
        assert rate == 8000 * (1 + did % 5)
        assert ch == 1 + did % 2
        assert samples.shape == (16 + did % 33, ch)
        i = np.arange(samples.size, dtype=np.int64)
        exp = (13 * did + 5 * i) % 2048 - 1024
        assert samples.reshape(-1).tolist() == exp.tolist()


def test_synth_formulas_vary_over_their_kind_population():
    """r5c review regression guard: every varying term of the payload
    generators must take >1 value over the ids its kind filter actually
    selects (doc_id % 3 == 2 for video, == 1 for audio) — a modulus that
    shares a factor with 3 collapses to a constant there and silently
    un-exercises that leg of the oracle check."""
    from geospatial_web_scraper_spark.operators.multimodal import (
        synth_wav_payload,
        synth_y4m_payload,
    )

    vids = [decode_video(synth_y4m_payload(i)) for i in range(2, 2 + 3 * 12, 3)]
    assert all(v is not None for v in vids)
    ws, hs, nums, dens, nfs = (
        {v[0] for v in vids},
        {v[1] for v in vids},
        {v[2] for v in vids},
        {v[3] for v in vids},
        {v[5].shape[0] for v in vids},
    )
    assert min(len(ws), len(hs), len(nums), len(dens), len(nfs)) > 1, (
        ws, hs, nums, dens, nfs,
    )
    auds = [decode_audio(synth_wav_payload(i)) for i in range(1, 1 + 3 * 12, 3)]
    assert all(a is not None for a in auds)
    rates = {a[0] for a in auds}
    chans = {a[1] for a in auds}
    frames = {a[2].shape[0] for a in auds}
    assert min(len(rates), len(chans), len(frames)) > 1, (rates, chans, frames)
