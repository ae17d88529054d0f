"""Gap-based sessionization of event streams.

The standard event-analytics primitive: a new session starts whenever a
key's inter-event gap exceeds ``gap_seconds``. Session ids are built
with the classic two-window trick — flag session starts with lag(),
then a running sum of flags numbers the sessions — so the whole
operator is two ordered-window passes plus one aggregation, no UDFs,
and every intermediate is integer arithmetic (bit-identical across
engines).

Scale shape: one shuffle (both windows and the final groupBy share the
per-key hash partitioning); per-key window state is one previous
timestamp plus a running counter. Skewed keys behave like any windowed
op — a single key's events serialize within its partition, which is
inherent to ordered sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["sessionize", "session_summary"]


def sessionize(
    df: DataFrame,
    gap_seconds: int,
    key_col: str = "source",
    ts_col: str = "ts",
) -> DataFrame:
    """Append ``session_id`` (1-based per key, in time order) to every
    event. Events exactly ``gap_seconds`` apart stay in one session
    (the split is strictly-greater). Ties on ts order by ts only —
    same-instant events always share a session, so the numbering is
    deterministic regardless of their relative order."""
    if gap_seconds <= 0:
        raise ValueError("gap_seconds must be > 0")
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    w = Window.partitionBy(key_col).orderBy(epoch)
    prev = F.lag(epoch).over(w)
    new_session = F.when(
        prev.isNull() | (epoch - prev > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    # RANGE frame, not ROWS: with tied timestamps a ROWS running sum
    # places ties on either side of the session-start flag depending on
    # their arbitrary order — RANGE includes every tied row in the same
    # prefix, so the numbering is deterministic
    run = Window.partitionBy(key_col).orderBy(epoch).rangeBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("session_id", F.sum(new_session).over(run))


def session_summary(
    df: DataFrame,
    gap_seconds: int,
    key_col: str = "source",
    ts_col: str = "ts",
    value_col: str | None = None,
) -> DataFrame:
    """One row per (key, session): (key, session_id, t_start, t_end,
    duration_s, n_events[, sum_value])."""
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    tagged = sessionize(df, gap_seconds, key_col, ts_col).withColumn(
        "__e", epoch
    )
    aggs = [
        F.min("__e").alias("t_start"),
        F.max("__e").alias("t_end"),
        (F.max("__e") - F.min("__e")).alias("duration_s"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col)).alias("sum_value"))
    return tagged.groupBy(F.col(key_col).alias("key"), "session_id").agg(*aggs)
