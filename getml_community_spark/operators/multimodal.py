"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery (schemas, batch shapes, partition-aware UDF
plumbing) is real and tested. Decoding:

- ``decoder="bmp"`` — a REAL pure-numpy 24-bit BMP decoder
  (:func:`decode_bmp`; header parse, row padding, bottom-up/BGR
  handling) so one image format is end-to-end real with no external
  codec. :func:`encode_bmp` is its inverse (used to generate payloads
  deterministically in tests and the driver-gated contract query).
- ``decoder="png"`` — a REAL pure-numpy PNG decoder
  (:func:`decode_png`; chunk walk + CRC, stdlib-zlib inflate,
  all-five-filter scanline unfilter), so a *compressed* format is
  end-to-end real too. :func:`encode_png` is its inverse.
- ``decoder="jpeg"`` — a REAL pure-numpy baseline JPEG path
  (:mod:`.jpeg`: Huffman decode, dequant, IDCT; gray and color with
  subsampling/restart markers, validated on an external fixture).
- :func:`extract_audio_features` with ``decoder="wav"`` — a real
  pure-numpy PCM16 WAV decoder (:func:`decode_wav`; RIFF chunk walk).
- ``decoder="fake"`` — deterministic bytes-derived features for
  formats whose codecs aren't in this container (mp4/video).
- ``decoder="pil"``/``"ffmpeg"`` raise ``NotImplementedError`` with
  install guidance. Swapping a stub for a real decoder changes ONE
  numpy function, not the Spark plan.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "extract_image_features",
    "extract_audio_features",
    "sample_video_frames",
    "encode_bmp",
    "decode_bmp",
    "encode_png",
    "decode_png",
    "encode_wav",
    "decode_wav",
]

# canonical multimodal row: payload + typed metadata
MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int, sample_rate int"
)

FEATURE_DIM = 16


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata derivable without decoding: byte length + magic-
    number sniffing (pure JVM; hex() on the first bytes)."""
    p = F.col(payload_col)
    head = F.hex(F.substring(p, 1, 4))
    return df.withColumn("n_bytes", F.length(p)).withColumn(
        "sniffed_mime",
        F.when(head.startswith("89504E47"), "image/png")
        .when(head.startswith("FFD8"), "image/jpeg")
        .when(head.startswith("52494646"), "audio/wav")
        .when(head.startswith("00000018") | head.startswith("00000020"), "video/mp4")
        .otherwise("application/octet-stream"),
    )


# --------------------------------------------------------------------------
# Pure-numpy codecs (public format specs; no external libraries)
# --------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER, rows bottom-up, BGR, 4-byte
    row padding — the standard Windows BMP v3 layout)."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp expects (H, W, 3) uint8 RGB")
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP into an (H, W, 3) uint8 RGB
    array — header parse, row-padding stride, bottom-up/top-down and
    BGR→RGB handling, all numpy slicing (no per-pixel Python)."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    px = buf[data_off : data_off + row_size * h].reshape(h, row_size)
    img = px[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return img[::-1] if bottom_up else img


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (bit depth 8, non-interlaced supported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_filter_row(ftype: int, raw: np.ndarray, prior: np.ndarray, bpp: int) -> np.ndarray:
    """Forward-filter one scanline (encoder side, PNG spec §6): raw and
    prior are the RECONSTRUCTED current/previous rows (int32)."""
    left = np.zeros_like(raw)
    left[bpp:] = raw[:-bpp]
    ul = np.zeros_like(prior)
    ul[bpp:] = prior[:-bpp]
    if ftype == 0:
        return raw
    if ftype == 1:
        return (raw - left) % 256
    if ftype == 2:
        return (raw - prior) % 256
    if ftype == 3:
        return (raw - (left + prior) // 2) % 256
    if ftype == 4:
        return (raw - _paeth(left, prior, ul)) % 256
    raise ValueError(f"bad PNG filter type {ftype}")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §6.6), vectorized over a scanline."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(pixels: np.ndarray, filter_mode: str = "cycle") -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an 8-bit truecolor PNG
    (public W3C spec / RFC 2083: signature, IHDR, one zlib IDAT, IEND).

    filter_mode="none" writes filter 0 on every scanline;
    filter_mode="cycle" cycles filters 0..4 by row index so a decode
    round-trip exercises every unfilter path (Sub/Up/Average/Paeth).
    """
    import zlib

    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png expects (H, W, 3) uint8 RGB")
    bpp = 3
    rows = pixels.reshape(h, w * bpp).astype(np.int32)
    prior = np.zeros(w * bpp, dtype=np.int32)
    scanlines = bytearray()
    for y in range(h):
        ftype = 0 if filter_mode == "none" else y % 5
        filt = _png_filter_row(ftype, rows[y], prior, bpp)
        scanlines.append(ftype)
        scanlines += filt.astype(np.uint8).tobytes()
        prior = rows[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(scanlines), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes, check_crc: bool = True) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (grayscale / RGB / gray+alpha /
    RGBA) into an (H, W, C) uint8 array: chunk walk with CRC verify,
    zlib inflate of the concatenated IDAT stream, and scanline unfilter
    for all five PNG filter types. Filters None/Sub/Up are fully
    vectorized (Sub via per-lane cumsum); Average/Paeth carry a true
    left-pixel data dependency, so they walk pixels with per-channel
    vector ops — rows stay numpy throughout, no per-byte Python."""
    import zlib

    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + size > len(payload):
            raise ValueError("truncated PNG chunk")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + size]
        if check_crc:
            (crc,) = struct.unpack_from(">I", payload, pos + 8 + size)
            if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
                raise ValueError(f"PNG CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            "only 8-bit non-interlaced PNG supported "
            f"(depth={depth}, interlace={interlace})"
        )
    if color not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color}")
    ch = _PNG_CHANNELS[color]
    bpp = ch  # bytes per pixel at depth 8
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    raw = raw.reshape(h, stride + 1)
    ftypes = raw[:, 0]
    data = raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, row = int(ftypes[y]), data[y]
        if f == 0:
            rec = row
        elif f == 1:  # Sub: prefix sum per byte lane, mod 256
            rec = np.cumsum(row.reshape(w, bpp), axis=0).reshape(stride) % 256
        elif f == 2:  # Up
            rec = (row + prior) % 256
        elif f in (3, 4):  # Average / Paeth: left dependency → pixel walk
            rec = np.empty(stride, dtype=np.int32)
            px = row.reshape(w, bpp)
            up = prior.reshape(w, bpp)
            ulp = np.zeros((w, bpp), dtype=np.int32)
            ulp[1:] = up[:-1]
            left = np.zeros(bpp, dtype=np.int32)
            rv = rec.reshape(w, bpp)
            for x in range(w):
                pred = (
                    (left + up[x]) // 2 if f == 3 else _paeth(left, up[x], ulp[x])
                )
                left = (px[x] + pred) % 256
                rv[x] = left
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
        prior = out[y]
    return out.astype(np.uint8).reshape(h, w, ch)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode mono int16 samples as a PCM16 WAV (RIFF/WAVE: fmt + data
    chunks)."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM16 mono WAV → (sample_rate, int16 array). Walks RIFF
    chunks (fmt may not be first; chunks are word-aligned)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)[:3]
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM16 mono WAV supported")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, data


def _bmp_decode_features(payloads: pd.Series) -> np.ndarray:
    """REAL decode path: parse each BMP, emit
    [width, height, mean_r, mean_g, mean_b, std_r, std_g, std_b,
    min_luma, max_luma, 0...] (FEATURE_DIM floats). Per-item decode is
    inherent (each payload is one image); the pixel math is numpy."""
    out = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float64)
    for i, b in enumerate(payloads):
        img = decode_bmp(bytes(b)).astype(np.float64)
        luma = img.mean(axis=2)
        out[i, :10] = [
            img.shape[1],
            img.shape[0],
            *img.mean(axis=(0, 1)),
            *img.std(axis=(0, 1)),
            luma.min(),
            luma.max(),
        ]
    return out


def _png_decode_features(payloads: pd.Series) -> np.ndarray:
    """REAL compressed decode path: inflate + unfilter each PNG, emit
    the same feature layout as :func:`_bmp_decode_features`. Alpha (if
    any) is dropped; grayscale broadcasts to 3 channels."""
    out = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float64)
    for i, b in enumerate(payloads):
        img = decode_png(bytes(b))
        if img.shape[2] == 4:
            img = img[:, :, :3]
        elif img.shape[2] == 2:
            img = np.repeat(img[:, :, :1], 3, axis=2)
        elif img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        img = img.astype(np.float64)
        luma = img.mean(axis=2)
        out[i, :10] = [
            img.shape[1],
            img.shape[0],
            *img.mean(axis=(0, 1)),
            *img.std(axis=(0, 1)),
            luma.min(),
            luma.max(),
        ]
    return out


def _jpeg_decode_features(payloads: pd.Series) -> np.ndarray:
    """REAL transform-coding decode path: Huffman-decode + dequant +
    IDCT each JPEG (gray or color, .jpeg module), emit the same feature
    layout as :func:`_bmp_decode_features` (grayscale broadcasts its
    plane to the three channel slots)."""
    from .jpeg import decode_jpeg

    out = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float64)
    for i, b in enumerate(payloads):
        img = decode_jpeg(bytes(b))
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        img = img.astype(np.float64)
        luma = img.mean(axis=2)
        out[i, :10] = [
            img.shape[1],
            img.shape[0],
            *img.mean(axis=(0, 1)),
            *img.std(axis=(0, 1)),
            luma.min(),
            luma.max(),
        ]
    return out


def _fake_decode_features(payloads: pd.Series) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features are stable
    functions of the payload bytes (so tests are exact and the Arrow
    batch shape matches what a real embedding/stat extractor returns).
    Replace with PIL/torchvision decode when available."""
    out = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float64)
    for i, b in enumerate(payloads):
        arr = np.frombuffer(bytes(b or b""), dtype=np.uint8)
        if len(arr) == 0:
            continue
        chunks = np.array_split(arr.astype(np.float64), FEATURE_DIM)
        out[i] = [c.mean() if len(c) else 0.0 for c in chunks]
    return out


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decoder: str = "fake",
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the real-scale pattern: decode+featurize each
    Arrow batch vectorized, emit (id, features array<double>). The
    partitioning of the input (by whatever key the table carries) is
    preserved; no shuffle is introduced."""
    if decoder == "pil":
        raise NotImplementedError(
            "pillow/torchvision are not in this container; decoder='bmp', "
            "'png' and 'jpeg' are REAL pure-numpy paths"
        )
    if decoder == "ffmpeg":
        raise NotImplementedError("ffmpeg decode not available in this container")
    decoders = {
        "bmp": _bmp_decode_features,
        "png": _png_decode_features,
        "jpeg": _jpeg_decode_features,
        "fake": _fake_decode_features,
    }
    if decoder not in decoders:
        raise ValueError(f"unknown decoder {decoder!r}")
    decode = decoders[decoder]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = decode(pdf[payload_col])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "features": list(feats),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} string, features array<double>"
    )


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decoder: str = "wav",
) -> DataFrame:
    """Audio analogue of :func:`extract_image_features`: Arrow-batched
    ``mapInPandas``, one output row per payload with
    (sample_rate, n_samples, duration_s, mean, rms, peak). decoder="wav"
    is a REAL pure-numpy PCM16 decode (:func:`decode_wav`)."""
    if decoder != "wav":
        raise NotImplementedError(
            "only the pure-numpy PCM16 'wav' decoder ships in this container"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            cols = np.zeros((n, 6), dtype=np.float64)
            for i, b in enumerate(pdf[payload_col]):
                rate, s = decode_wav(bytes(b))
                x = s.astype(np.float64)
                cols[i] = [
                    rate,
                    len(s),
                    len(s) / rate if rate else 0.0,
                    x.mean() if len(x) else 0.0,
                    float(np.sqrt((x * x).mean())) if len(x) else 0.0,
                    float(np.abs(x).max()) if len(x) else 0.0,
                ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "sample_rate": cols[:, 0].astype(np.int64),
                    "n_samples": cols[:, 1].astype(np.int64),
                    "duration_s": cols[:, 2],
                    "mean": cols[:, 3],
                    "rms": cols[:, 4],
                    "peak": cols[:, 5],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel,
        f"{id_col} string, sample_rate long, n_samples long, "
        "duration_s double, mean double, rms double, peak double",
    )


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
    decoder: str = "fake",
    every_n: int = 1,
) -> DataFrame:
    """Frame sampling over video payloads.

    decoder='mjpeg' is a REAL path: the payload is walked as a RIFF
    MJPEG AVI and every ``every_n``-th frame is decoded through the
    pure-numpy T.81 codec (operators/mjpeg.py — no ffmpeg needed);
    output is one luma-stats row per sampled frame (``every_ms`` /
    ``duration_col`` are ignored — frame timing comes from the
    container's avih header).

    decoder='fake' (default) keeps the plumbing-only shape: one output
    row per sampled frame offset (sequence() explode — JVM-side) with
    the frame payload extraction stubbed as a deterministic byte-slice.
    An ffmpeg-based general-codec path would use the same
    explode-then-decode shape but is env-blocked in this container."""
    if decoder == "mjpeg":
        from .mjpeg import mjpeg_frame_stats

        return mjpeg_frame_stats(
            df, every_n=every_n, payload_col=payload_col, id_col=id_col
        )
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: only 'mjpeg' (pure-numpy) and 'fake' are "
            "available in this container; a general path needs ffmpeg"
        )
    frames = df.select(
        F.col(id_col),
        F.col(payload_col),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(duration_col) - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ms"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            sizes = np.empty(n, dtype=np.int64)
            for i, (b, off) in enumerate(zip(pdf[payload_col], pdf["frame_ms"])):
                raw = bytes(b or b"")
                sizes[i] = len(raw[int(off) % max(len(raw), 1) :][:256])
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "frame_ms": pdf["frame_ms"].to_numpy(),
                    "frame_bytes": sizes,
                }
            )
            yield out

    return frames.mapInPandas(
        kernel, f"{id_col} string, frame_ms int, frame_bytes long"
    )
