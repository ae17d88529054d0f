"""CUSUM change-point detection over rollup tiers (Page 1954, public).

Flags sustained LEVEL SHIFTS that a rolling z-score misses: a z-score
needs a single bucket to deviate k·σ; CUSUM accumulates small drifts
(e.g. a source whose token rate creeps +10% after a deploy) until the
cumulative evidence crosses ``h``.

The textbook form is recursive — s⁺_i = max(0, s⁺_{i-1} + x_i − μ − κ)
— which doesn't map to window aggregates. This implementation uses the
equivalent prefix-sum identity:

    s⁺_i = cum_i − min_{j ≤ i}(cum_j),   cum_i = Σ_{t ≤ i}(x_t − μ − κ)

(the running sum minus its running minimum; symmetrically s⁻ from the
running maximum of the κ-flipped series) — two unbounded-preceding
window aggregates per direction, no recursion, no UDFs.

Cross-engine determinism: all accumulation happens in MICRO-UNIT
INTEGERS (x, μ and κ scaled by 1e6 and floored) — prefix sums of longs
are exact, so alarms reproduce bit-for-bit on any engine and any
partitioning (same discipline as decompose/anomaly).

μ defaults to the per-key series mean (quantized); pass ``target`` to
monitor against a known reference level instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["cusum"]

_M = 1_000_000


def cusum(
    df: DataFrame,
    value_col: str,
    key_col: str = "source",
    ts_col: str = "bucket_start",
    k: float = 0.5,
    h: float = 5.0,
    target: float | None = None,
) -> DataFrame:
    """Append CUSUM statistics per (key, bucket): (key, bucket_epoch,
    value, s_pos, s_neg, alarm). ``k`` (slack) and ``h`` (decision
    threshold) are in VALUE units — multiply a σ estimate in if you
    want the usual 0.5σ/5σ tuning.

    s_pos accumulates upward drift (x − μ − k above zero), s_neg
    downward; alarm = s_pos > h OR s_neg > h.
    """
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    base = df.select(
        F.col(key_col).alias("key"),
        epoch.alias("bucket_epoch"),
        F.col(value_col).cast("double").alias("v"),
    )
    k_u = int(round(k * _M))
    h_u = int(round(h * _M))
    v_u = F.floor(F.col("v") * _M + F.lit(0.5)).cast("long")
    if target is None:
        wk = Window.partitionBy("key")
        # per-key mean, micro-quantized: Σv_u and n are exact integers
        mu_u = F.floor(
            F.sum(v_u).over(wk) / F.count(v_u).over(wk) + F.lit(0.5)
        ).cast("long")
    else:
        mu_u = F.lit(int(round(target * _M)))
    t = base.select(
        "key",
        "bucket_epoch",
        "v",
        (v_u - mu_u - F.lit(k_u)).alias("__d_pos"),
        (v_u - mu_u + F.lit(k_u)).alias("__d_neg"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_epoch")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # two window stages (analytic functions can't nest): prefix sums,
    # then their running extrema
    c = t.select(
        "key",
        "bucket_epoch",
        "v",
        F.sum("__d_pos").over(w).alias("__cp"),
        F.sum("__d_neg").over(w).alias("__cn"),
    )
    # running sum minus its running min ≡ max(0, recursive CUSUM); the
    # empty prefix (value 0) is included via least/greatest with 0, so
    # s_pos >= 0 by construction (and 0 exactly where the recursion
    # would reset)
    s_pos = F.col("__cp") - F.least(F.min("__cp").over(w), F.lit(0))
    s_neg = F.greatest(F.max("__cn").over(w), F.lit(0)) - F.col("__cn")
    return c.select(
        "key",
        "bucket_epoch",
        F.col("v").alias("value"),
        (s_pos / F.lit(float(_M))).alias("s_pos"),
        (s_neg / F.lit(float(_M))).alias("s_neg"),
        ((s_pos > F.lit(h_u)) | (s_neg > F.lit(h_u))).alias("alarm"),
    )
