"""Perceptual downsampling: LTTB (largest-triangle-three-buckets) in
its parallel bucket-average form.

Classic LTTB (Steinarsson 2013, public thesis; the downsampler Grafana
ships) walks buckets sequentially, choosing in each bucket the point
forming the largest triangle with the PREVIOUSLY CHOSEN point and the
next bucket's average. The previously-chosen dependency serializes the
whole series, so the distributed variant here scores every point
against its NEIGHBOR BUCKETS' AVERAGES instead (the thesis' own
"largest triangle three buckets, fixed reference" simplification):
identical bucket partitioning, one deterministic representative per
bucket, fully parallel — two shuffles (bucket aggregate + per-bucket
argmax window), no UDFs, SQL-oracle-able.

This complements the tier cascade: tiers preserve additive aggregates
exactly; LTTB preserves SHAPE (extrema, slopes) for plotting at a fixed
point budget. The reference engine has no downsampler; this fills the
visualization half of the north rule's "downsample" verb.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["lttb_downsample"]


def lttb_downsample(
    df: DataFrame,
    bucket_seconds: int,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One representative (ts, value) point per (source, time bucket).

    Selection rule, per source ordered by bucket:
    - interior buckets: the point maximizing twice-the-triangle-area
      |(t_prev - t_next)·(v - v_prev) - (t_prev - t)·(v_next - v_prev)|
      against the previous and next buckets' (avg ts, avg value);
      ties break on earliest ts (deterministic).
    - the first bucket keeps its earliest point, the last bucket its
      latest (LTTB pins the series endpoints).

    Returns (source, bucket_epoch, ts, value) with ts as epoch seconds.
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    t = F.col(ts_col).cast("timestamp").cast("double")
    pts = df.select(
        F.col(source_col).alias("source"),
        t.alias("__t"),
        F.col(value_col).cast("double").alias("__v"),
        (F.floor(t / F.lit(bucket_seconds)) * F.lit(bucket_seconds))
        .cast("long")
        .alias("bucket_epoch"),
    )

    avgs = pts.groupBy("source", "bucket_epoch").agg(
        F.avg("__t").alias("__at"), F.avg("__v").alias("__av")
    )
    wb = Window.partitionBy("source").orderBy("bucket_epoch")
    nbr = avgs.select(
        "source",
        "bucket_epoch",
        F.lag("__at").over(wb).alias("__pt"),
        F.lag("__av").over(wb).alias("__pv"),
        F.lead("__at").over(wb).alias("__nt"),
        F.lead("__av").over(wb).alias("__nv"),
    )

    scored = pts.join(nbr, ["source", "bucket_epoch"])
    area2 = F.abs(
        (F.col("__pt") - F.col("__nt")) * (F.col("__v") - F.col("__pv"))
        - (F.col("__pt") - F.col("__t")) * (F.col("__nv") - F.col("__pv"))
    )
    # endpoint buckets: no prev → keep earliest point; no next → keep
    # latest. Encoded as an ordering key so ONE window handles all cases.
    order_key = F.when(F.col("__pt").isNull(), F.col("__t")).when(
        F.col("__nt").isNull(), -F.col("__t")
    ).otherwise(-area2)
    wp = Window.partitionBy("source", "bucket_epoch").orderBy(
        order_key.asc(), F.col("__t").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(wp))
        .where(F.col("__rn") == 1)
        .select(
            "source",
            "bucket_epoch",
            F.col("__t").alias("ts"),
            F.col("__v").alias("value"),
        )
    )
