"""MJPEG/AVI codec: container round-trip, rec-LIST nesting, sampling,
rejections, and the Spark frame-stats operator."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from getml_community_spark.operators.jpeg import dc_quantum
from getml_community_spark.operators.mjpeg import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
    mjpeg_frame_stats,
)


def _const_block_frames(n=4, seed=7):
    """Frames of constant 8x8 blocks with DC on the q90 quantization
    grid — the lossy codec round-trips these EXACTLY (test_jpeg.py)."""
    q = dc_quantum(90)
    frames = []
    for f in range(n):
        blocks = np.array(
            [128 + ((seed * (k + 3) + 5 * f) % 7 - 3) * q for k in range(4)],
            dtype=np.int64,
        ).reshape(2, 2)
        frames.append(np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8))
    return frames


def test_container_roundtrip_exact():
    frames = _const_block_frames(5)
    avi = encode_avi_mjpeg(frames, fps=25)
    out = decode_avi_mjpeg(avi)
    assert [i for i, _ in out] == list(range(5))
    for (_, got), want in zip(out, frames):
        assert (got == want).all()


def test_lossy_frames_within_codec_bounds():
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, size=(16, 24), dtype=np.uint8) for _ in range(3)]
    out = decode_avi_mjpeg(encode_avi_mjpeg(frames))
    for (_, got), want in zip(out, frames):
        assert got.shape == want.shape
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 32


def test_every_n_sampling():
    frames = _const_block_frames(7)
    out = decode_avi_mjpeg(encode_avi_mjpeg(frames), every_n=3)
    assert [i for i, _ in out] == [0, 3, 6]


def test_odd_sized_chunks_word_aligned():
    # find a frame whose JPEG is odd-length so a pad byte is exercised
    rng = np.random.default_rng(3)
    for _ in range(32):
        frames = [
            rng.integers(0, 256, size=(8, 8), dtype=np.uint8) for _ in range(3)
        ]
        from getml_community_spark.operators.jpeg import encode_jpeg_gray

        if any(len(encode_jpeg_gray(f, 90)) % 2 for f in frames):
            out = decode_avi_mjpeg(encode_avi_mjpeg(frames))
            assert len(out) == 3
            return
    pytest.skip("no odd-length JPEG found in 32 draws")


def test_rec_list_nesting_and_junk_tolerated():
    """Interleaved writers wrap movi chunks in 'rec ' LISTs and pad
    with JUNK — the index-free walk must descend / skip."""
    frames = _const_block_frames(2)
    avi = bytearray(encode_avi_mjpeg(frames))
    # rebuild: wrap the movi payload chunks into one rec LIST + JUNK
    from getml_community_spark.operators.mjpeg import _chunk, _iter_chunks, _list

    buf = bytes(avi)
    (riff_size,) = struct.unpack_from("<I", buf, 4)
    parts, movi_payload = [], None
    for fourcc, start, size in _iter_chunks(buf, 12, 8 + riff_size):
        data = buf[start : start + size]
        if fourcc == b"LIST" and data[:4] == b"movi":
            movi_payload = data[4:]
            parts.append(None)  # placeholder
        else:
            parts.append(_chunk(fourcc, data))
    assert movi_payload is not None
    wrapped = _list(
        b"movi", _chunk(b"JUNK", b"\x00" * 6) + _list(b"rec ", movi_payload)
    )
    body = b"AVI " + b"".join(wrapped if p is None else p for p in parts)
    rebuilt = _chunk(b"RIFF", body)
    out = decode_avi_mjpeg(rebuilt)
    assert len(out) == 2
    for (_, got), want in zip(out, frames):
        assert (got == want).all()


def test_rejections():
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_avi_mjpeg(b"\x00" * 32)
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi_mjpeg(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    with pytest.raises(ValueError, match="no video frames"):
        decode_avi_mjpeg(b"RIFF" + struct.pack("<I", 4) + b"AVI ")
    with pytest.raises(ValueError):
        encode_avi_mjpeg([])
    with pytest.raises(ValueError, match="share one"):
        encode_avi_mjpeg(
            [np.zeros((8, 8), np.uint8), np.zeros((8, 16), np.uint8)]
        )


def test_spark_frame_stats(spark):
    frames_a = _const_block_frames(3, seed=5)
    frames_b = _const_block_frames(2, seed=9)
    rows = [
        ("vid-a", bytearray(encode_avi_mjpeg(frames_a, fps=20))),
        ("vid-b", bytearray(encode_avi_mjpeg(frames_b, fps=10))),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = mjpeg_frame_stats(df).toPandas().sort_values(
        ["media_id", "frame_idx"]
    )
    assert list(out["frame_idx"]) == [0, 1, 2, 0, 1]
    # 20 fps -> 50 ms cadence; 10 fps -> 100 ms
    assert list(out["frame_ms"]) == [0, 50, 100, 0, 100]
    assert (out["width"] == 16).all() and (out["height"] == 16).all()
    for (_, r), px in zip(out.iterrows(), frames_a + frames_b):
        assert r["mean_luma"] == pytest.approx(px.mean())
        assert r["min_luma"] == px.min() and r["max_luma"] == px.max()

    # decoder router in multimodal
    from getml_community_spark.operators.multimodal import sample_video_frames

    routed = sample_video_frames(df, decoder="mjpeg").toPandas()
    assert len(routed) == 5
