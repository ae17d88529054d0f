"""Baseline JPEG codec: lossy round-trip bounds, constant-block
exactness, the external color fixture, and format rejections."""

from __future__ import annotations

import numpy as np
import pytest

from getml_community_spark.operators.jpeg import (
    dc_quantum,
    decode_jpeg,
    decode_jpeg_gray,
    encode_jpeg_gray,
)

EXTERNAL_FIXTURES = [
    # CPython test-suite JPEG (externally encoded, color, subsampled)
    "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/python.jpg",
]


def test_lossy_roundtrip_bounds():
    rng = np.random.default_rng(3)
    for h, w in [(8, 8), (16, 24), (13, 9), (1, 1), (7, 30)]:
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        back = decode_jpeg_gray(encode_jpeg_gray(px, quality=90))
        assert back.shape == (h, w)
        err = np.abs(back.astype(int) - px.astype(int))
        # white noise is the worst case for transform coding; q90 keeps
        # it within a small bound and near-zero mean error
        assert err.max() <= 32 and err.mean() < 6


def test_smooth_image_near_lossless():
    g = np.clip(
        np.add.outer(np.arange(64) * 2, np.arange(64)) // 2, 0, 255
    ).astype(np.uint8)
    back = decode_jpeg_gray(encode_jpeg_gray(g, 90))
    assert np.abs(back.astype(int) - g.astype(int)).max() <= 1


def test_constant_blocks_roundtrip_exactly():
    q = dc_quantum(90)
    vals = np.array([128 + k * q for k in range(-3, 4)])
    img = np.repeat(np.repeat(vals[None, :], 8, 0), 8, 1).astype(np.uint8)
    assert (decode_jpeg_gray(encode_jpeg_gray(img, 90)) == img).all()


def test_decodes_external_color_fixture():
    import os

    fixtures = [p for p in EXTERNAL_FIXTURES if os.path.exists(p)]
    if not fixtures:
        pytest.skip("no external JPEG fixture on this host")
    img = decode_jpeg(open(fixtures[0], "rb").read())
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    assert img.shape[0] > 0 and img.shape[1] > 0
    # real photo content: all three channels carry signal
    assert all(img[:, :, c].std() > 1 for c in range(3))


def test_rejections():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"nope")
    q = dc_quantum(90)
    blob = bytearray(
        encode_jpeg_gray(np.full((8, 8), 128, dtype=np.uint8), 90)
    )
    # flip SOF0 to SOF2 (progressive) — must reject explicitly
    i = bytes(blob).find(b"\xff\xc0")
    blob[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(blob))


try:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(min_value=1, max_value=20),
        w=st.integers(min_value=1, max_value=20),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        quality=st.sampled_from([50, 75, 90, 95]),
    )
    def test_jpeg_shape_and_bounds_fuzz(h, w, seed, quality):
        """Arbitrary shapes/contents/qualities: decode∘encode preserves
        shape, stays uint8, and never raises."""
        px = np.random.default_rng(seed).integers(
            0, 256, size=(h, w), dtype=np.uint8
        )
        back = decode_jpeg_gray(encode_jpeg_gray(px, quality=quality))
        assert back.shape == (h, w) and back.dtype == np.uint8
except ImportError:  # pragma: no cover
    pass


def test_fill_bytes_and_standalone_markers_tolerated():
    """T.81 B.1.1.2 allows 0xFF fill bytes before any marker code, and
    standalone length-less markers (TEM 0x01, stray RSTn) between
    segments before SOS — other encoders emit both (round-4 advice)."""
    px = np.clip(
        np.add.outer(np.arange(16) * 4, np.arange(16) * 2), 0, 255
    ).astype(np.uint8)
    clean = encode_jpeg_gray(px, 90)
    want = decode_jpeg_gray(clean)

    # inject fill bytes + a TEM + a stray RST1 right after SOI
    padded = clean[:2] + b"\xff\xff\xff" + b"\xff\x01" + b"\xff\xd1" + clean[2:]
    got = decode_jpeg_gray(padded)
    assert (got == want).all()
