"""Rolling z-score anomaly flags over rollup tiers.

The continuous-aggregate consumer's standard alert: flag a bucket whose
value deviates more than ``k`` sigma from the trailing ``window``
buckets of the same source. Detection runs on the TIER table (already
1/60th–1/86400th of raw), so the window state per source is a handful
of numbers — this is what makes tiered rollups the right substrate for
monitoring at 100 TB ingest.

Numerical shape: the rolling mean/variance are computed from explicit
Σv and Σv² window sums, not the built-in stddev aggregate — on integer
inputs (e.g. the ``cnt`` column) those sums are EXACT in float64, so
the derived z-score is a deterministic function of exact inputs and
reproduces bit-for-bit across engines (the built-in Welford-style
accumulators are order-sensitive in the last ulp). Trailing frame
``[-window, -1]`` excludes the current bucket: an anomalous value must
not contaminate its own baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["rolling_zscore"]


def rolling_zscore(
    df: DataFrame,
    value_col: str,
    window: int,
    k: float = 3.0,
    min_periods: int | None = None,
    source_col: str = "source",
    ts_col: str = "bucket_start",
) -> DataFrame:
    """Append ``zscore`` and ``is_anomaly`` columns.

    zscore = (v − mean(trailing window)) / stddev_pop(trailing window);
    NULL when fewer than ``min_periods`` (default: ``window``) trailing
    buckets exist or the trailing window is constant (sd == 0).
    is_anomaly = |zscore| > k (false when zscore is NULL).
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    minp = window if min_periods is None else min_periods
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    v = F.col(value_col).cast("double")
    # Prefix-sum formulation (one O(1)-per-row running pass + lags)
    # instead of sliding [-window, -1] frames, which Spark re-aggregates
    # from scratch per row (O(window) per row). On integer-valued
    # inputs — the operator's documented exactness precondition — the
    # running sums are exact integers in float64, so the lag difference
    # equals the frame sum bit-for-bit and every derived value
    # (mu/var/sd/z) is unchanged. Rows whose trailing window is empty
    # get NaN intermediates instead of NULL, which the n >= min_periods
    # guard hides identically.
    w_run = (
        Window.partitionBy(source_col)
        .orderBy(epoch)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lag = Window.partitionBy(source_col).orderBy(epoch)
    base = df.select(
        "*",
        F.count(v).over(w_run).alias("__rc"),
        F.sum(v).over(w_run).alias("__rs1"),
        F.sum(v * v).over(w_run).alias("__rs2"),
    )

    def _trail(col, zero):
        prev = F.coalesce(F.lag(col, 1).over(w_lag), zero)
        old = F.coalesce(F.lag(col, window + 1).over(w_lag), zero)
        return prev - old

    n = _trail(F.col("__rc"), F.lit(0)).cast("double")
    s1 = _trail(F.col("__rs1"), F.lit(0.0))
    s2 = _trail(F.col("__rs2"), F.lit(0.0))
    mu = s1 / n
    var = F.greatest(s2 / n - mu * mu, F.lit(0.0))  # cancellation guard
    sd = F.sqrt(var)
    z = F.when((n >= minp) & (sd > 0), (v - mu) / sd)
    return base.select(
        *[c for c in df.columns],
        z.alias("zscore"),
        F.coalesce(F.abs(z) > F.lit(float(k)), F.lit(False)).alias("is_anomaly"),
    )
