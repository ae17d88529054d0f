"""LTTB fixed-reference downsampling vs a pure-pandas oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from getml_community_spark.operators.downsample import lttb_downsample

BUCKET = 60


def _pandas_lttb(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for src, g in pdf.groupby("source"):
        g = g.sort_values("ts").reset_index(drop=True)
        g["bucket"] = (g["ts"] // BUCKET) * BUCKET
        av = g.groupby("bucket").agg(at=("ts", "mean"), avv=("value", "mean"))
        buckets = list(av.index)
        for i, b in enumerate(buckets):
            sub = g[g["bucket"] == b]
            if i == 0:
                row = sub.loc[sub["ts"].idxmin()]
            elif i == len(buckets) - 1:
                row = sub.loc[sub["ts"].idxmax()]
            else:
                pt, pv = av.iloc[i - 1]["at"], av.iloc[i - 1]["avv"]
                nt, nv = av.iloc[i + 1]["at"], av.iloc[i + 1]["avv"]
                area = np.abs(
                    (pt - nt) * (sub["value"] - pv) - (pt - sub["ts"]) * (nv - pv)
                )
                # argmax with earliest-ts tiebreak
                best = area.max()
                row = sub[np.isclose(area, best)].loc[
                    lambda d: d["ts"].idxmin()
                ]
            out.append((src, int(b), int(row["ts"]), float(row["value"])))
    return pd.DataFrame(out, columns=["source", "bucket_epoch", "ts", "value"])


@pytest.fixture(scope="module")
def series(spark):
    rng = np.random.default_rng(5)
    rows = []
    for src in ("x", "y"):
        ts = np.sort(rng.choice(np.arange(0, 600), size=120, replace=False))
        # dyadic values → exact averages in both engines
        vals = np.floor(rng.normal(0, 50, 120) * 16 + 0.5) / 16
        rows += [(src, int(t), float(v)) for t, v in zip(ts, vals)]
    pdf = pd.DataFrame(rows, columns=["source", "ts", "value"])
    return pdf, spark.createDataFrame(pdf, "source string, ts long, value double")


def test_lttb_matches_pandas_oracle(spark, series):
    pdf, sdf = series
    got = (
        lttb_downsample(sdf, BUCKET)
        .orderBy("source", "bucket_epoch")
        .toPandas()
    )
    got["ts"] = got["ts"].astype(int)
    want = _pandas_lttb(pdf).sort_values(["source", "bucket_epoch"]).reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want, check_dtype=False)


def test_lttb_one_point_per_bucket_and_endpoints(spark, series):
    pdf, sdf = series
    got = lttb_downsample(sdf, BUCKET).toPandas()
    # exactly one representative per populated (source, bucket)
    pdf2 = pdf.assign(bucket=(pdf["ts"] // BUCKET) * BUCKET)
    n_buckets = pdf2.groupby(["source", "bucket"]).ngroups
    assert len(got) == n_buckets
    for src, g in pdf2.groupby("source"):
        mine = got[got.source == src]
        first_b = g["bucket"].min()
        last_b = g["bucket"].max()
        # endpoint pinning: earliest point of first bucket, latest of last
        assert (
            mine[mine.bucket_epoch == first_b]["ts"].iloc[0]
            == g[g.bucket == first_b]["ts"].min()
        )
        assert (
            mine[mine.bucket_epoch == last_b]["ts"].iloc[0]
            == g[g.bucket == last_b]["ts"].max()
        )


def test_lttb_rejects_bad_bucket(spark, series):
    _, sdf = series
    with pytest.raises(ValueError):
        lttb_downsample(sdf, 0)


def test_m4_semantics_and_pixel_perfection(spark):
    """M4 keeps exactly first/min/max/last per bucket with deterministic
    tie handling, and reproduces the exact extrema a full scan finds."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from getml_community_spark.operators.downsample import m4_downsample

    rng = np.random.default_rng(13)
    rows = []
    for src in ("a", "b"):
        for i in range(500):
            rows.append((src, 1_700_000_000 + i * 37, float(rng.integers(0, 100))))
    # a tie: same min value twice in one bucket — earliest ts must win
    rows.append(("a", 1_700_000_001, -5.0))
    rows.append(("a", 1_700_000_002, -5.0))
    pdf = pd.DataFrame(rows, columns=["source", "e", "value"])
    df = spark.createDataFrame(pdf).select(
        "source", F.timestamp_seconds("e").alias("ts"), "value"
    )
    out = m4_downsample(df, 3600, ts_col="ts").toPandas()
    pdf["bucket"] = pdf.e // 3600 * 3600
    for (src, b), g in pdf.groupby(["source", "bucket"]):
        row = out[(out.source == src) & (out.bucket_epoch == b)].iloc[0]
        assert row["n_points"] == len(g)
        assert row["v_min"] == g.value.min() and row["v_max"] == g.value.max()
        g = g.sort_values(["e", "value"])
        assert row["t_first"] == g.e.iloc[0] and row["t_last"] == g.e.iloc[-1]
        # min tie pinned to earliest ts
        mins = g[g.value == g.value.min()]
        assert row["t_min"] == mins.e.min()


def test_m4_is_single_aggregate(spark):
    from pyspark.sql import functions as F

    from getml_community_spark.operators.downsample import m4_downsample

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        F.col("user_id").alias("source"), "ts", "value"
    )
    plan = (
        m4_downsample(ev, 21600, ts_col="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Window" not in plan and "Python" not in plan
