"""Mergeable histogram quantiles: binning vs a numpy oracle, EXACT
cascade mergeability (1m→1h == raw→1h), quantile-rule determinism,
and the plan shape (hash agg, no UDFs)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from getml_community_spark.operators.histquantile import (
    hist_cascade,
    hist_quantiles,
    hist_rollup_from_raw,
)


@pytest.fixture(scope="module")
def raw(spark):
    rng = np.random.default_rng(42)
    n = 20_000
    epochs = 1_700_000_000 + rng.integers(0, 6 * 3600, size=n)
    rows = [
        (
            f"src-{int(s):03d}",
            int(e),
            float(v),
        )
        for s, e, v in zip(
            rng.integers(0, 4, size=n),
            epochs,
            np.round(rng.gamma(2.0, 50.0, size=n), 2),
        )
    ]
    df = spark.createDataFrame(rows, "source string, epoch long, value double")
    return df.select(
        "source", F.timestamp_seconds("epoch").alias("event_time"), "value"
    )


def _np_hist_quantile(values, q, w):
    """The module's exact rule in numpy: bin floor(v/w); smallest bin
    with cumulative count >= ceil(q * n); return bin * w."""
    bins = np.floor(np.asarray(values, dtype=np.float64) / w).astype(np.int64)
    uniq, cnt = np.unique(bins, return_counts=True)
    cum = np.cumsum(cnt)
    target = math.ceil(q * len(bins))
    return float(uniq[np.searchsorted(cum, target)] * w)


def test_quantiles_match_numpy_oracle(raw):
    w = 0.25
    hist = hist_rollup_from_raw(raw, "1h", value_col="value", bin_width=w)
    out = hist_quantiles(hist, qs=(0.5, 0.95), bin_width=w).toPandas()
    pdf = raw.select(
        "source",
        (F.floor(F.col("event_time").cast("long") / 3600) * 3600).alias("be"),
        "value",
    ).toPandas()
    assert len(out) > 10
    for _, r in out.iterrows():
        be = int(r["bucket_start"].timestamp())
        vals = pdf[(pdf["source"] == r["source"]) & (pdf["be"] == be)]["value"]
        assert len(vals) == r["cnt"]
        assert r["p50"] == _np_hist_quantile(vals, 0.5, w)
        assert r["p95"] == _np_hist_quantile(vals, 0.95, w)


def test_cascade_is_exactly_mergeable(raw):
    """THE property that exact quantiles lack: cascading 1m histograms
    to 1h must be bucket-for-bucket IDENTICAL to histogramming the raw
    events straight at 1h — counts and every extracted quantile."""
    w = 0.25
    h1m = hist_rollup_from_raw(raw, "1m", value_col="value", bin_width=w)
    via_cascade = hist_quantiles(hist_cascade(h1m, "1h"), qs=(0.5, 0.9, 0.99), bin_width=w)
    direct = hist_quantiles(
        hist_rollup_from_raw(raw, "1h", value_col="value", bin_width=w),
        qs=(0.5, 0.9, 0.99),
        bin_width=w,
    )
    a = via_cascade.toPandas().sort_values(["source", "bucket_start"]).reset_index(drop=True)
    b = direct.toPandas().sort_values(["source", "bucket_start"]).reset_index(drop=True)
    assert a.equals(b)
    # and the raw tall histograms are identical too, not just quantiles
    ha = hist_cascade(h1m, "1h").toPandas().sort_values(["source", "bucket_start", "bin"]).reset_index(drop=True)
    hb = hist_rollup_from_raw(raw, "1h", value_col="value", bin_width=w).toPandas().sort_values(["source", "bucket_start", "bin"]).reset_index(drop=True)
    assert ha.equals(hb)


def test_error_bounded_by_bin_width(raw):
    w = 2.0
    hist = hist_rollup_from_raw(raw, "1d", value_col="value", bin_width=w)
    out = hist_quantiles(hist, qs=(0.5,), bin_width=w).toPandas()
    pdf = raw.select(
        "source",
        (F.floor(F.col("event_time").cast("long") / 86400) * 86400).alias("be"),
        "value",
    ).toPandas()
    for _, r in out.iterrows():
        be = int(r["bucket_start"].timestamp())
        vals = pdf[(pdf["source"] == r["source"]) & (pdf["be"] == be)]["value"].to_numpy()
        true_q = np.quantile(vals, 0.5, method="inverted_cdf")
        assert abs(r["p50"] - true_q) <= w


def test_edge_cases(spark):
    # single value, q=1.0, negative values, NULLs dropped
    rows = [
        ("a", 1_700_000_000, -3.7),
        ("a", 1_700_000_001, -3.7),
        ("a", 1_700_000_002, 10.0),
        ("a", 1_700_000_003, None),
    ]
    df = spark.createDataFrame(rows, "source string, epoch long, value double").select(
        "source", F.timestamp_seconds("epoch").alias("event_time"), "value"
    )
    hist = hist_rollup_from_raw(df, "1h", value_col="value", bin_width=1.0)
    out = hist_quantiles(hist, qs=(0.5, 1.0), bin_width=1.0).collect()[0]
    assert out["cnt"] == 3  # NULL dropped
    assert out["p50"] == -4.0  # floor(-3.7) = -4
    assert out["p100"] == 10.0

    with pytest.raises(ValueError):
        hist_rollup_from_raw(df, "1h", bin_width=0)
    with pytest.raises(ValueError):
        hist_quantiles(hist, qs=(0.0,))
    with pytest.raises(ValueError):
        hist_rollup_from_raw(df, "5s")


def test_plan_is_all_jvm(raw):
    hist = hist_rollup_from_raw(raw, "1h", value_col="value", bin_width=0.5)
    q = hist_quantiles(hist, qs=(0.95,), bin_width=0.5)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas"):
        assert bad not in plan


def test_weighted_quantiles(spark):
    """weight_col turns counts into weight sums: the weighted p50 sits
    where the WEIGHT mass sits, not where the rows sit."""
    # 9 rows of value 10 (weight 1 each) + 1 row of value 100 (weight 91):
    # row-p50 = 10, but weight-p50 = 100 (91 of 100 mass at 100)
    rows = [("a", 1_700_000_000 + i, 10.0, 1) for i in range(9)]
    rows.append(("a", 1_700_000_009, 100.0, 91))
    df = spark.createDataFrame(
        rows, "source string, epoch long, value double, w long"
    ).select(
        "source",
        F.timestamp_seconds("epoch").alias("event_time"),
        "value",
        "w",
    )
    unweighted = hist_quantiles(
        hist_rollup_from_raw(df, "1h", value_col="value", bin_width=1.0),
        qs=(0.5,),
        bin_width=1.0,
    ).collect()[0]
    weighted = hist_quantiles(
        hist_rollup_from_raw(
            df, "1h", value_col="value", bin_width=1.0, weight_col="w"
        ),
        qs=(0.5,),
        bin_width=1.0,
    ).collect()[0]
    assert unweighted["p50"] == 10.0 and unweighted["cnt"] == 10
    assert weighted["p50"] == 100.0 and weighted["cnt"] == 100
