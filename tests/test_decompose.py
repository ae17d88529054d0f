"""seasonal_decompose: reconstruction identity, zero-sum seasonal,
recovery of a planted cycle, odd/even periods, numpy cross-check."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from getml_community_spark.operators.decompose import seasonal_decompose


def _series(spark, values, key="k", bucket=3600):
    rows = [(key, i * bucket, float(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "source string, e long, cnt double")
    return df.select(
        "source", F.timestamp_seconds("e").alias("bucket_start"), "cnt"
    )


def test_reconstruction_and_zero_sum_seasonal(spark):
    rng = np.random.default_rng(3)
    n, p = 24 * 10, 24
    v = (
        50
        + 0.1 * np.arange(n)                      # trend
        + 10 * np.sin(2 * np.pi * np.arange(n) / p)  # daily cycle
        + rng.normal(0, 0.5, n)                   # noise
    )
    out = seasonal_decompose(
        _series(spark, v), value_col="cnt", key_col="source", period=p
    ).toPandas().sort_values("bucket_epoch")
    # identity: value == trend + seasonal + resid wherever trend defined
    m = out["trend"].notna()
    rec = out.loc[m, "trend"] + out.loc[m, "seasonal"] + out.loc[m, "resid"]
    assert np.allclose(rec, out.loc[m, "value"], atol=1e-9)
    # seasonal sums to ~0 across the 24 phases
    phases = out.drop_duplicates(subset=out.columns[:2]).groupby(
        out["bucket_epoch"] // 3600 % p
    )["seasonal"].first()
    assert abs(phases.sum()) < 1e-9
    # the planted 10*sin cycle is recovered (phase means within noise)
    expect = 10 * np.sin(2 * np.pi * np.arange(p) / p)
    got = np.array([phases[j] for j in range(p)])
    assert np.abs(got - expect).max() < 0.5
    # trend null exactly at the edges the 2x24 MA cannot cover
    assert out["trend"].isna().sum() == p  # 12 head + 12 tail


def test_matches_numpy_ma_decomposition(spark):
    rng = np.random.default_rng(9)
    n, p = 100, 24
    v = rng.integers(0, 50, n).astype(float)
    out = (
        seasonal_decompose(_series(spark, v), period=p, value_col="cnt",
                           key_col="source")
        .toPandas()
        .sort_values("bucket_epoch")
        .reset_index(drop=True)
    )
    # numpy oracle: 2x24 centered MA
    trend = np.full(n, np.nan)
    for i in range(12, n - 12):
        trend[i] = (v[i - 12 : i + 12].sum() + v[i - 11 : i + 13].sum()) / 48.0
    detr = v - trend
    phases = np.arange(n) % p
    s_raw = np.array([np.nanmean(detr[phases == j]) for j in range(p)])
    # the engine quantizes phase means to micro-units before centering
    # (cross-engine determinism) — mirror that
    s_u = np.floor(s_raw * 1e6 + 0.5)
    seasonal = (s_u - s_u.mean()) / 1e6
    got_t = out["trend"].to_numpy()
    assert np.allclose(got_t, trend, equal_nan=True, atol=1e-9)
    assert np.allclose(out["seasonal"].to_numpy(), seasonal[phases], atol=1e-9)


def test_odd_period(spark):
    v = [float((i % 5) * 2 + 10) for i in range(30)]
    out = (
        seasonal_decompose(
            _series(spark, v, bucket=60), period=5, bucket_seconds=60,
            value_col="cnt", key_col="source",
        )
        .toPandas()
        .sort_values("bucket_epoch")
    )
    m = out["trend"].notna()
    # periodic series with no trend/noise: flat trend, exact seasonal,
    # zero residual
    assert np.allclose(out.loc[m, "trend"], 14.0, atol=1e-9)
    assert np.allclose(out.loc[m, "resid"], 0.0, atol=1e-9)


def test_period_validation(spark):
    with pytest.raises(ValueError, match="period"):
        seasonal_decompose(_series(spark, [1.0, 2.0]), period=1)
