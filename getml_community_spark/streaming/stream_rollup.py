"""Structured-Streaming variant of the base rollup tier.

The reference is batch-only (SURVEY.md §2.10 — no watermarks or
streaming state anywhere in src/engine/); our north rule requires
resumable batch. This module exists because the tier computation maps
1:1 onto streaming tumbling windows, so an engine user can maintain the
1m tier continuously and let the batch cascade (RollupJob) roll 1h/1d:

    raw stream → withWatermark(event_time, delay)
               → groupBy(source, window(event_time, '1 minute'))
               → core aggs → append sink

Late rows inside the watermark update their bucket before emission;
rows later than that land in the batch re-roll path (gap-fill +
recompute affected day partitions), same as the reference's
fingerprint-invalidation story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.rollup import (
    CORE_AGG_COLS,
    TIER_SECONDS,
    _TIER_INTERVAL,
    _core_aggs,
    _is_integral,
)

__all__ = ["stream_rollup", "stream_corpus_reader"]


def stream_rollup(
    stream: DataFrame,
    tier: str = "1m",
    watermark: str = "2 minutes",
    source_col: str = "source",
    ts_col: str = "event_time",
    value_col: str = "n_tok",
) -> DataFrame:
    """Streaming continuous aggregate; same output schema as
    rollup_from_raw so golden tests compare the two directly."""
    sec = TIER_SECONDS[tier]
    w = F.window(F.col(ts_col), _TIER_INTERVAL[tier])
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(source_col).alias("source"), w.alias("w"))
        .agg(*_core_aggs(value_col, sec, _is_integral(stream, value_col)))
        .select("source", F.col("w.start").alias("bucket_start"), *CORE_AGG_COLS)
    )


def stream_corpus_reader(spark, path: str) -> DataFrame:
    """File-source stream over a corpus parquet directory (the
    readStream analogue of the batch reader; availableNow triggers give
    exactly-once batch parity for tests)."""
    from ..datagen import CORPUS_SCHEMA

    return (
        spark.readStream.schema(CORPUS_SCHEMA + ", event_date date")
        .option("maxFilesPerTrigger", 64)
        .parquet(path)
    )
