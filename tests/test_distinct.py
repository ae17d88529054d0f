"""HLL distinct-count tiers: cascade losslessness, coupon-range
exactness, and job integration (maintain / resume / read)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from getml_community_spark.datagen import write_corpus_parquet
from getml_community_spark.operators.distinct import (
    hll_cascade,
    hll_estimates,
    hll_rollup_from_raw,
)
from getml_community_spark.plans import RollupJob, RollupSpec

from .conftest import assert_frames_equal_unordered


def test_cascade_estimates_equal_direct_sketch(spark, corpus_df):
    """estimate(union of per-1m sketches at 1h) == estimate(one-pass 1h
    sketch) — the cascade adds no error beyond the sketch itself."""
    m1 = hll_rollup_from_raw(corpus_df, "1m")
    via_cascade = hll_estimates(hll_cascade(m1, "1h")).toPandas()
    direct = hll_estimates(hll_rollup_from_raw(corpus_df, "1h")).toPandas()
    assert_frames_equal_unordered(
        via_cascade, direct, ["source", "bucket_start"]
    )


def test_estimates_exact_in_coupon_range(spark, corpus_df):
    """At corpus bucket cardinalities the sketch is in coupon (exact)
    mode: estimates equal true COUNT(DISTINCT doc_id) per bucket."""
    est = hll_estimates(hll_rollup_from_raw(corpus_df, "1h")).toPandas()
    b = (F.floor(F.col("event_time").cast("timestamp").cast("long") / 3600) * 3600)
    exact = (
        corpus_df.groupBy("source", F.timestamp_seconds(b).alias("bucket_start"))
        .agg(
            F.countDistinct("doc_id").alias("n_distinct"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .toPandas()
    )
    assert_frames_equal_unordered(est, exact, ["source", "bucket_start"])


def test_estimate_accuracy_at_scale(spark):
    """Past coupon range the estimate stays within ±3% (lgK=12)."""
    df = spark.range(200_000).select(
        F.lit("s").alias("source"),
        F.timestamp_seconds(F.lit(1735689600) + F.col("id") % 60).alias(
            "event_time"
        ),
        (F.col("id") % 150_000).cast("string").alias("doc_id"),
    )
    est = hll_estimates(hll_rollup_from_raw(df, "1h")).toPandas()
    assert len(est) == 1
    n = int(est.iloc[0]["n_distinct"])
    assert abs(n - 150_000) / 150_000 < 0.03


@pytest.fixture(scope="module")
def dcorpus_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("dcorpus") / "corpus")
    write_corpus_parquet(spark, 3000, p, with_tokens=False)
    return p


def test_job_maintains_distinct_tiers_resumably(spark, dcorpus_path, tmp_path):
    spec = RollupSpec(distinct_col="doc_id")
    single = RollupJob(spark, spec, dcorpus_path, str(tmp_path / "a"))
    single.run()

    resumed = RollupJob(spark, spec, dcorpus_path, str(tmp_path / "b"))
    resumed.run(max_partitions=5)
    RollupJob(spark, spec, dcorpus_path, str(tmp_path / "b")).run()

    raw = spark.read.parquet(dcorpus_path)
    for tier in ("1m", "1h", "1d"):
        want = hll_estimates(hll_rollup_from_raw(raw, tier)).toPandas()
        a = single.read_distinct(tier).toPandas()
        b = RollupJob(spark, spec, dcorpus_path, str(tmp_path / "b")).read_distinct(
            tier
        ).toPandas()
        assert_frames_equal_unordered(a, want, ["source", "bucket_start"])
        assert_frames_equal_unordered(b, want, ["source", "bucket_start"])

    # lineage rows exist for the dist family
    lin = single.lineage.read_pandas()
    assert (lin["tier"] == "dist_1h").sum() == 14

    # compaction covers the dist tables too
    rep = single.compact()
    assert rep["dist_1m"]["partitions"] > 0
    again = single.read_distinct("1m").toPandas()
    want_1m = hll_estimates(hll_rollup_from_raw(raw, "1m")).toPandas()
    assert_frames_equal_unordered(again, want_1m, ["source", "bucket_start"])
