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

__all__ = ["lttb_downsample", "m4_downsample"]


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


def m4_downsample(
    df: DataFrame,
    bucket_seconds: int,
    ts_col: str = "ts",
    value_col: str = "value",
    source_col: str = "source",
) -> DataFrame:
    """M4 visual downsampling (Jugel et al., VLDB 2014, public): per
    (source, pixel-column bucket), keep the min, max, first and last
    values — the four points that make a width-w line rendering
    PIXEL-PERFECT (the paper's error-free guarantee for line charts).

    Cheaper than LTTB (ONE groupBy, no windows, no joins — pure
    hash-aggregate with constant per-group state) and the right default
    when the consumer is a dashboard at known resolution; LTTB remains
    the choice for a fixed point budget independent of rendering width.

    Output: one row per (source, bucket) with (t_first, v_first, t_min,
    v_min, t_max, v_max, t_last, v_last, n_points). Ties resolve
    lexicographically on the (value, ts) pair — min side to the
    earliest ts, max side to the latest — deterministic on both
    engines (oracle mirrors with ORDER BY v, t row_number picks).
    """
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    pts = df.select(
        F.col(source_col).alias("source"),
        epoch.alias("__t"),
        F.col(value_col).cast("double").alias("__v"),
        (F.floor(epoch / bucket_seconds) * bucket_seconds)
        .cast("long")
        .alias("bucket_epoch"),
    )
    # struct-ordered extrema: min_by/max_by tie arbitrarily on equal v;
    # lexicographic struct ordering pins ties deterministically
    v_t = F.struct(F.col("__v").alias("v"), F.col("__t").alias("t"))
    t_v = F.struct(F.col("__t").alias("t"), F.col("__v").alias("v"))
    return pts.groupBy("source", "bucket_epoch").agg(
        F.min(t_v)["t"].alias("t_first"),
        F.min(t_v)["v"].alias("v_first"),
        F.min(v_t)["t"].alias("t_min"),
        F.min(v_t)["v"].alias("v_min"),
        F.max(v_t)["t"].alias("t_max"),
        F.max(v_t)["v"].alias("v_max"),
        F.max(t_v)["t"].alias("t_last"),
        F.max(t_v)["v"].alias("v_last"),
        F.count(F.lit(1)).alias("n_points"),
    )
