"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery (schemas, batch shapes, partition-aware UDF
plumbing) is real and tested; the actual media DECODING is stubbed —
this container has no image/audio libraries — behind
``decoder="fake"`` (deterministic bytes-derived features, used by
tests) or ``decoder="pil"``/``"ffmpeg"`` which raise
``NotImplementedError`` with install guidance. Swapping the stub for a
real decoder changes ONE numpy function, not the Spark plan.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "extract_image_features",
    "sample_video_frames",
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
            "real image decode needs pillow/torchvision (not in this "
            "container); use decoder='fake' for plumbing tests"
        )
    if decoder == "ffmpeg":
        raise NotImplementedError("ffmpeg decode not available in this container")
    if decoder != "fake":
        raise ValueError(f"unknown decoder {decoder!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _fake_decode_features(pdf[payload_col])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "features": list(feats),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} string, features array<double>"
    )


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame offset
    (sequence() explode — JVM-side), with the frame payload extraction
    stubbed (deterministic byte-slice in 'fake' mode). Shows the
    explode-then-decode shape a real ffmpeg-based sampler uses."""
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
