"""rollup_battery: the full per-bucket aggregation battery over the
corpus — spot-checked against the numpy oracle per (source, bucket)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from getml_community_spark.operators.rollup import rollup_battery
from getml_community_spark.oracle import Oracle


def test_rollup_battery_vs_oracle(spark, corpus_df, corpus_pdf):
    got = rollup_battery(
        corpus_df,
        "1h",
        include={
            "count", "sum", "avg", "min", "max", "median", "q25", "q75",
            "stddev_pop", "first", "last", "trend", "ewma_1h",
            "avg_time_between",
        },
    ).toPandas()
    o = Oracle()
    # µs int64 (< 2^53, exact in float64) — matches Spark's µs/1e6 cast;
    # ns int64 would exceed 2^53 and round differently
    epoch = (
        corpus_pdf["event_time"].astype("datetime64[us]").astype("int64").to_numpy()
        / 1e6
    )
    n_checked = 0
    for _, r in got.sample(min(len(got), 60), random_state=3).iterrows():
        b0 = r["bucket_start"].tz_localize(None) if r["bucket_start"].tzinfo else r["bucket_start"]
        t0 = b0.value / 1e9
        t_ref = t0 + 3600.0
        m = (
            (corpus_pdf["source"] == r["source"]).to_numpy()
            & (epoch >= t0)
            & (epoch < t_ref)
        )
        v = corpus_pdf.loc[m, "n_tok"].to_numpy(float)
        t = epoch[m]
        checks = {
            "count": o.count(v),
            "sum": o.sum(v),
            "avg": o.avg(v),
            "min": o.minimum(v),
            "max": o.maximum(v),
            "median": o.median(v),
            "q25": o.quantile(v, 0.25),
            "q75": o.quantile(v, 0.75),
            "stddev_pop": o.stddev_pop(v),
            "first": o.first(v, t),
            "last": o.last(v, t),
            "trend": o.trend(v, t, t_ref),
            "ewma_1h": o.ewma(v, t, t_ref, 3600.0),
            "avg_time_between": o.avg_time_between(t),
        }
        for name, exp in checks.items():
            act = r[name]
            act = float("nan") if act is None else float(act)
            if isinstance(exp, float) and math.isnan(exp):
                assert math.isnan(act), (name, r["source"], b0)
            else:
                # trend = avg(y) − avg(Δt)·β cancels ~2 orders of
                # magnitude on this data (Δt~1e3, y~1e3, result ~1e0),
                # amplifying the fp-order difference between Spark's
                # streaming covariance and numpy's two-pass one.
                tol = 1e-6 if name == "trend" else 1e-9
                assert act == pytest.approx(exp, rel=tol, abs=tol), (
                    name, r["source"], b0,
                )
        n_checked += 1
    assert n_checked >= 50
