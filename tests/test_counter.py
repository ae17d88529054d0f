"""Counter-reset-aware increase/rate vs a hand-walked python oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from getml_community_spark.operators.counter import counter_increase


def _oracle(samples, sec):
    """samples: [(source, epoch, value)] -> {(source, bucket): (n, resets, inc)}"""
    out = {}
    by_src = {}
    for s, e, v in sorted(samples, key=lambda r: (r[0], r[1], r[2])):
        by_src.setdefault(s, []).append((e, v))
    for s, rows in by_src.items():
        prev = None
        for e, v in rows:
            b = e // sec * sec
            n, rst, inc = out.get((s, b), (0, 0, 0.0))
            if prev is None:
                out[(s, b)] = (n + 1, rst, inc)
            elif v >= prev:
                out[(s, b)] = (n + 1, rst, inc + (v - prev))
            else:
                out[(s, b)] = (n + 1, rst + 1, inc + v)
            prev = v
    return out


def test_matches_oracle_with_resets(spark):
    rng = np.random.default_rng(9)
    samples = []
    for si in range(5):
        t = 1_700_000_000
        c = 0.0
        for _ in range(400):
            t += int(rng.integers(5, 120))
            c += float(rng.integers(0, 50))
            if rng.random() < 0.03:  # process restart
                c = float(rng.integers(0, 10))
            samples.append((f"src-{si}", t, c))
    df = spark.createDataFrame(
        samples, "source string, epoch long, value double"
    ).select("source", F.timestamp_seconds("epoch").alias("event_time"), "value")
    got = {
        (r["source"], int(r["bucket_start"].timestamp())): (
            r["n_samples"],
            r["n_resets"],
            r["increase"],
        )
        for r in counter_increase(df, "1h", value_col="value").collect()
    }
    want = _oracle(samples, 3600)
    assert set(got) == set(want)
    total_resets = 0
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == want[k][1]
        assert got[k][2] == pytest.approx(want[k][2], abs=1e-9)
        total_resets += want[k][1]
    assert total_resets > 0  # the scenario actually exercised resets


def test_semantics_pinned(spark):
    # source A: 10 -> 25 -> 5 (reset) -> 7; source B: single sample
    rows = [
        ("a", 0, 10.0),
        ("a", 60, 25.0),
        ("a", 120, 5.0),
        ("a", 180, 7.0),
        ("b", 0, 99.0),
    ]
    df = spark.createDataFrame(rows, "source string, epoch long, value double").select(
        "source", F.timestamp_seconds("epoch").alias("event_time"), "value"
    )
    out = {r["source"]: r for r in counter_increase(df, "1h", value_col="value").collect()}
    # a: +15 (10->25), reset contributes 5, +2 (5->7) = 22; first sample free
    assert out["a"]["increase"] == 22.0
    assert out["a"]["n_resets"] == 1
    assert out["a"]["rate"] == 22.0 / 3600
    # b: lone sample -> baseline unknown -> zero increase, zero resets
    assert out["b"]["increase"] == 0.0 and out["b"]["n_resets"] == 0

    with pytest.raises(ValueError):
        counter_increase(df, "2h")


def test_cross_bucket_delta_credited_to_later_bucket(spark):
    # samples straddle the hour boundary: the 3595->3605 delta belongs
    # to the SECOND bucket (Prometheus credits the later sample)
    rows = [("a", 3595, 100.0), ("a", 3605, 130.0)]
    df = spark.createDataFrame(rows, "source string, epoch long, value double").select(
        "source", F.timestamp_seconds("epoch").alias("event_time"), "value"
    )
    out = {
        int(r["bucket_start"].timestamp()): r["increase"]
        for r in counter_increase(df, "1h", value_col="value").collect()
    }
    assert out[0] == 0.0
    assert out[3600] == 30.0


def test_same_second_ties_order_by_value(spark):
    """Two samples in the same (truncated) second: the walk orders them
    by value — deterministic cross-engine; for a monotone counter the
    value order IS the time order, so the increase is the plain delta
    chain."""
    rows = [
        ("a", 100, 10.0),
        ("a", 100, 14.0),  # same second, larger value -> walks second
        ("a", 160, 20.0),
    ]
    df = spark.createDataFrame(rows, "source string, epoch long, value double").select(
        "source", F.timestamp_seconds("epoch").alias("event_time"), "value"
    )
    out = counter_increase(df, "1h", value_col="value").collect()[0]
    # 10 -> 14 (+4) -> 20 (+6); first sample free
    assert out["increase"] == 10.0 and out["n_resets"] == 0
