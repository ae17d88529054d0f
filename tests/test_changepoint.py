"""CUSUM vs the textbook recursive oracle, planted-shift detection, and
the z-score-misses/CUSUM-catches contrast."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from getml_community_spark.operators.changepoint import cusum


def _recursive_cusum(v, k, target=None):
    """Textbook recursion in micro-unit ints (the engine's arithmetic)."""
    v_u = np.floor(np.asarray(v, float) * 1e6 + 0.5).astype(np.int64)
    mu = (
        int(np.floor(v_u.sum() / len(v_u) + 0.5))
        if target is None
        else int(round(target * 1e6))
    )
    k_u = int(round(k * 1e6))
    sp, sn = 0, 0
    out = []
    for x in v_u:
        sp = max(0, sp + int(x) - mu - k_u)
        sn = max(0, sn - (int(x) - mu + k_u))
        out.append((sp / 1e6, sn / 1e6))
    return out


def _run(spark, values, **kw):
    rows = [("k", i * 3600, float(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "source string, e long, cnt double").select(
        "source", F.timestamp_seconds("e").alias("bucket_start"), "cnt"
    )
    out = (
        cusum(df, "cnt", **kw)
        .toPandas()
        .sort_values("bucket_epoch")
        .reset_index(drop=True)
    )
    return out


def test_matches_recursive_oracle(spark):
    rng = np.random.default_rng(17)
    v = rng.integers(0, 40, 200).astype(float)
    got = _run(spark, v, k=0.5, h=5.0)
    want = _recursive_cusum(v, k=0.5)
    assert np.allclose(got["s_pos"], [w[0] for w in want], atol=0)
    assert np.allclose(got["s_neg"], [w[1] for w in want], atol=0)


def test_planted_level_shift_alarms_and_zscore_contrast(spark):
    rng = np.random.default_rng(11)
    # mean 20, then a +2.5 (1.25 sigma) creep from bucket 100 — no
    # single bucket ever deviates 3 sigma from its trailing window
    v = rng.normal(20, 2, 200)
    v[100:] += 2.5
    got = _run(spark, v, k=1.0, h=10.0, target=20.0)
    alarms = got.index[got["alarm"]].tolist()
    assert alarms, "sustained shift must alarm"
    assert min(alarms) >= 100  # no false alarm before the shift
    assert min(alarms) <= 120  # caught within ~20 buckets
    # the rolling z-score on the same series never fires: each bucket is
    # within ~2 sigma of the trailing window
    from getml_community_spark.operators.anomaly import rolling_zscore

    rows = [("k", i * 3600, float(x)) for i, x in enumerate(v)]
    df = spark.createDataFrame(
        rows, "source string, e long, cnt double"
    ).select("source", F.timestamp_seconds("e").alias("bucket_start"), "cnt")
    z = rolling_zscore(df, "cnt", window=24, k=3.0)
    assert z.where("is_anomaly").count() == 0


def test_target_reference_mode(spark):
    v = [10.0] * 50
    got = _run(spark, v, k=0.0, h=5.0, target=9.0)
    # constant 1-above-target drift: s_pos ramps 1, 2, 3, ...
    assert np.allclose(got["s_pos"], np.arange(1, 51, dtype=float))
    # alarm is strict: s_pos = 5 does NOT fire, 6 does
    assert bool(got["alarm"].iloc[4]) is False and bool(got["alarm"].iloc[5])
