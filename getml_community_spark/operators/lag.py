"""Lag banks + rolling windows over dense rollup tiers.

The reference's lag conditions build a bank of sliding sub-windows per
feature: ``ts_peri + (i+1)·Δt > ts_pop AND ts_peri + i·Δt <= ts_pop``
for i in 0..max_lag (FastProp.cpp:1255-1287; runtime check
ConditionParser.cpp:68-90; SQL form SQLMaker.cpp:40-51). Over a DENSE
regular tier, sub-window i is exactly the bucket i steps back — so the
whole bank is ``lag(col, i)`` over the bucket sequence, and rolling
aggregates are ``rowsBetween`` windows. This is the downsampled-rollup
reuse the survey calls out (SURVEY.md §2.6 "lag windows").

Scale: one sort-based window exec per (source) partition — state is a
bounded frame, partitions are independent; the input is the tiny
aggregate tier, never raw rows. Run :func:`gapfill` first: lag over a
SPARSE tier would look at the previous existing row, not the previous
time bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["lag_features", "rolling_features", "sliding_window_agg"]


def lag_features(
    dense: DataFrame,
    value_cols: list[str],
    lags: list[int] = [1, 2, 3],
    key_cols: list[str] = ["source"],
    order_col: str = "bucket_start",
) -> DataFrame:
    """Add ``<col>_lag<i>`` columns — the reference's lag bank."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    out = dense
    for c in value_cols:
        for i in lags:
            out = out.withColumn(f"{c}_lag{i}", F.lag(c, i).over(w))
    return out


def rolling_features(
    dense: DataFrame,
    value_cols: list[str],
    window_buckets: int,
    aggs: list[str] = ["sum", "avg", "min", "max"],
    key_cols: list[str] = ["source"],
    order_col: str = "bucket_start",
    include_current: bool = True,
) -> DataFrame:
    """Rolling aggregates over the previous ``window_buckets`` buckets
    (inclusive of current when include_current). Equivalent to the
    reference's memory-window aggregation at bucket granularity."""
    hi = 0 if include_current else -1
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(-(window_buckets - (1 if include_current else 0)), hi)
    )
    out = dense
    fns = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
           "count": F.count, "stddev_pop": F.stddev_pop}
    for c in value_cols:
        for a in aggs:
            out = out.withColumn(f"{c}_roll{window_buckets}_{a}", fns[a](c).over(w))
    return out


def sliding_window_agg(
    df: DataFrame,
    value_col: str,
    horizon_seconds: float,
    memory_seconds: float,
    key_cols: list[str] = ["source"],
    ts_col: str = "event_time",
) -> DataFrame:
    """Per-ROW sliding window over raw events: for each row, aggregate
    peers of the same key with ts ∈ (t − horizon − memory, t − horizon]
    — the reference's self-join time series (time_series.py:26-147) as a
    rangeBetween window (sort-based, no join).

    Returns count/sum/avg/min/max of the window per input row. Use the
    bucketed as-of join instead when the population is a different table.
    """
    # Range frames take integral offsets; boundary semantics are
    # [t−h−m, t−h] (inclusive lower) vs the reference's exclusive lower —
    # identical except on the measure-zero set of rows exactly h+m apart.
    t = F.col(ts_col).cast("timestamp").cast("double")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(t)
        .rangeBetween(-int(horizon_seconds + memory_seconds), -int(horizon_seconds))
    )
    v = F.col(value_col)
    return (
        df.withColumn("w_count", F.count(v).over(w))
        .withColumn("w_sum", F.sum(v).over(w))
        .withColumn("w_avg", F.avg(v).over(w))
        .withColumn("w_min", F.min(v).over(w))
        .withColumn("w_max", F.max(v).over(w))
    )
