"""rolling_zscore vs a pandas oracle; edge semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from getml_community_spark.operators.anomaly import rolling_zscore

W = 6


@pytest.fixture(scope="module")
def tier(spark):
    rng = np.random.default_rng(3)
    rows = []
    for src in ("a", "b"):
        vals = rng.integers(40, 60, 60)
        vals[25] = 500  # a spike
        vals[40:50] = 50  # a constant run (sd == 0 windows)
        for i, v in enumerate(vals):
            rows.append((src, pd.Timestamp("2024-01-01") + pd.Timedelta(hours=i), int(v)))
    pdf = pd.DataFrame(rows, columns=["source", "bucket_start", "cnt"])
    return pdf, spark.createDataFrame(pdf)


def test_zscore_matches_pandas(spark, tier):
    pdf, sdf = tier
    got = (
        rolling_zscore(sdf, "cnt", window=W, k=3.0)
        .orderBy("source", "bucket_start")
        .toPandas()
    )
    for src, g in pdf.groupby("source"):
        g = g.sort_values("bucket_start").reset_index(drop=True)
        mine = got[got.source == src].reset_index(drop=True)
        for i in range(len(g)):
            trail = g["cnt"].iloc[max(0, i - W) : i].to_numpy(dtype=float)
            z = mine.loc[i, "zscore"]
            if len(trail) < W or trail.std() == 0:
                assert pd.isna(z)
                assert not mine.loc[i, "is_anomaly"]
            else:
                want = (g["cnt"].iloc[i] - trail.mean()) / trail.std()
                assert abs(z - want) < 1e-9
                assert mine.loc[i, "is_anomaly"] == (abs(want) > 3.0)


def test_spike_is_flagged_and_baseline_untouched(spark, tier):
    _, sdf = tier
    got = rolling_zscore(sdf, "cnt", window=W, k=3.0).toPandas()
    flagged = got[got.is_anomaly]
    # the injected spike flags in both sources (other legitimate flags —
    # e.g. right after the constant run, where the baseline tightens —
    # may appear; the pandas-oracle test pins exact semantics)
    assert len(flagged[flagged.cnt == 500]) == 2
    # nothing inside the constant run itself is flagged (sd == 0 → NULL z)
    run = got[(got.cnt == 50)]
    assert not run.is_anomaly.any()


def test_window_validation(spark, tier):
    _, sdf = tier
    with pytest.raises(ValueError):
        rolling_zscore(sdf, "cnt", window=1)
