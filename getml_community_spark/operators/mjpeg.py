"""Pure-numpy MJPEG/AVI video codec + frame-sampling operator.

Completes the multimodal family (reference ships Arrow-everything
media ingestion, src/engine/include/engine/handlers/ArrowHandler.hpp:
48-72) without ffmpeg: a Motion-JPEG AVI is a RIFF container whose
``movi`` LIST holds one baseline JPEG per ``00dc`` chunk, so the
round-4 T.81 codec (operators/jpeg.py) is the only decoder needed.

- :func:`encode_avi_mjpeg` / :func:`decode_avi_mjpeg` — single-video
  scalar codec (RIFF/AVI 1.0: ``hdrl`` with avih + strl, ``movi`` with
  word-aligned ``00dc`` chunks, ``idx1`` index; decode tolerates
  ``rec `` sub-LISTs and missing idx1).
- :func:`mjpeg_frame_stats` — the Spark operator: Arrow-batched
  ``mapInPandas`` kernel walks the container and decodes every
  ``every_n``-th frame; one output row per sampled frame. The per-video
  Python loop IS the codec (same stance as jpeg_decode); Spark-side
  shape is the scale-correct one — binary payloads never shuffle, the
  kernel is embarrassingly parallel over input partitions.
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Tuple

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg_gray

__all__ = [
    "encode_avi_mjpeg",
    "decode_avi_mjpeg",
    "mjpeg_frame_stats",
]


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    """One RIFF chunk: fourcc + LE u32 size + data, word-aligned
    (RIFF sizes exclude the pad byte; readers must skip it)."""
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(frames: List[np.ndarray], fps: int = 10) -> bytes:
    """Encode grayscale frames as a Motion-JPEG AVI (RIFF/AVI 1.0).

    Every frame must share one (H, W); each becomes a quality-90
    baseline JPEG in its own ``00dc`` chunk. Writes the standard
    ``hdrl`` (avih MainAVIHeader + one ``vids``/``MJPG`` stream with a
    BITMAPINFOHEADER) and an ``idx1`` keyframe index, so third-party
    players accept the output; our decoder also survives without it.
    """
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share one (H, W)")
    jpegs = [encode_jpeg_gray(np.asarray(f, dtype=np.uint8), quality=90) for f in frames]
    max_bytes = max(len(j) for j in jpegs)
    usec_per_frame = 1_000_000 // fps

    avih = struct.pack(
        "<14I",
        usec_per_frame,          # dwMicroSecPerFrame
        max_bytes * fps,         # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        len(frames),             # dwTotalFrames
        0,                       # dwInitialFrames
        1,                       # dwStreams
        max_bytes,               # dwSuggestedBufferSize
        w, h,                    # dwWidth, dwHeight
        0, 0, 0, 0,              # dwReserved[4]
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<10I",
            0, 0, 0,             # flags, prio+lang, initialFrames
            1, fps,              # dwScale, dwRate (rate/scale = fps)
            0, len(frames),      # dwStart, dwLength (frames)
            max_bytes,           # dwSuggestedBufferSize
            0xFFFFFFFF,          # dwQuality (default)
            0,                   # dwSampleSize (0 = varying)
        )
        + struct.pack("<4h", 0, 0, w, h)  # rcFrame
    )
    # BITMAPINFOHEADER; MJPEG convention: biCompression = 'MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_payload)

    # idx1 offsets are relative to the start of the 'movi' list type
    idx_entries, off = [], 4
    for j in jpegs:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _iter_chunks(buf: bytes, pos: int, end: int) -> Iterator[Tuple[bytes, int, int]]:
    """Yield (fourcc, data_start, data_size) over a RIFF chunk run,
    honoring word alignment."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        data_start = pos + 8
        if data_start + size > end:
            raise ValueError(f"chunk {fourcc!r} overruns container at {pos}")
        yield fourcc, data_start, size
        pos = data_start + size + (size % 2)


def decode_avi_mjpeg(payload: bytes, every_n: int = 1) -> List[Tuple[int, np.ndarray]]:
    """Decode every ``every_n``-th video frame of an MJPEG AVI.

    Returns ``[(frame_idx, pixels), ...]`` where pixels is the (H, W)
    uint8 or (H, W, 3) RGB array from :func:`decode_jpeg`. The walk is
    index-free (streams written without idx1 still decode), skips
    non-video chunks (``01wb`` audio, ``JUNK`` padding) and descends
    into ``rec ``-grouped sub-LISTs, which interleaved writers emit.
    """
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a RIFF payload")
    if payload[8:12] != b"AVI ":
        raise ValueError("RIFF is not an AVI")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(len(payload), 8 + riff_size)

    frames: List[Tuple[int, np.ndarray]] = []
    frame_idx = 0

    def walk_movi(pos: int, stop: int) -> None:
        nonlocal frame_idx
        for fourcc, start, size in _iter_chunks(payload, pos, stop):
            if fourcc == b"LIST" and payload[start : start + 4] == b"rec ":
                walk_movi(start + 4, start + size)
            elif fourcc[2:4] in (b"dc", b"db"):  # compressed / raw video
                if frame_idx % every_n == 0:
                    frames.append(
                        (frame_idx, decode_jpeg(payload[start : start + size]))
                    )
                frame_idx += 1

    for fourcc, start, size in _iter_chunks(payload, 12, end):
        if fourcc == b"LIST" and payload[start : start + 4] == b"movi":
            walk_movi(start + 4, start + size)
    if frame_idx == 0:
        raise ValueError("no video frames ('movi' LIST missing or empty)")
    return frames


def mjpeg_frame_stats(
    df,
    every_n: int = 1,
    payload_col: str = "payload",
    id_col: str = "media_id",
):
    """Spark operator: decode every ``every_n``-th MJPEG frame of each
    AVI payload and emit one row per sampled frame with luma stats.

    Output: (id, frame_idx, frame_ms, width, height, mean_luma,
    min_luma, max_luma). frame_ms comes from the container's avih
    dwMicroSecPerFrame. Arrow-batched mapInPandas; payloads stay inside
    their input partitions (no shuffle; the plan is scan -> project).
    """
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, fms, ws, hs, means, mins, maxs = ([] for _ in range(8))
            for mid, raw in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(raw or b"")
                usec = _avih_usec_per_frame(buf)
                for k, px in decode_avi_mjpeg(buf, every_n=every_n):
                    if px.ndim == 3:  # BT.601 luma for color frames
                        px = np.clip(
                            np.round(
                                0.299 * px[:, :, 0]
                                + 0.587 * px[:, :, 1]
                                + 0.114 * px[:, :, 2]
                            ),
                            0,
                            255,
                        ).astype(np.uint8)
                    ids.append(mid)
                    fidx.append(k)
                    fms.append(k * usec // 1000)
                    hs.append(px.shape[0])
                    ws.append(px.shape[1])
                    means.append(float(px.mean()))
                    mins.append(int(px.min()))
                    maxs.append(int(px.max()))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="object"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "frame_ms": pd.Series(fms, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "mean_luma": pd.Series(means, dtype="float64"),
                    "min_luma": pd.Series(mins, dtype="int64"),
                    "max_luma": pd.Series(maxs, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel,
        f"{id_col} string, frame_idx int, frame_ms long, width int, "
        "height int, mean_luma double, min_luma long, max_luma long",
    )


def _avih_usec_per_frame(payload: bytes) -> int:
    """Pull dwMicroSecPerFrame out of the avih header (100_000 — 10 fps
    — when the hdrl LIST is absent)."""
    try:
        (riff_size,) = struct.unpack_from("<I", payload, 4)
        end = min(len(payload), 8 + riff_size)
        for fourcc, start, size in _iter_chunks(payload, 12, end):
            if fourcc == b"LIST" and payload[start : start + 4] == b"hdrl":
                for fc2, s2, sz2 in _iter_chunks(payload, start + 4, start + size):
                    if fc2 == b"avih" and sz2 >= 4:
                        (usec,) = struct.unpack_from("<I", payload, s2)
                        return usec or 100_000
    except (struct.error, ValueError):
        pass
    return 100_000
