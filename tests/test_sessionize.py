"""Sessionization: gap semantics, tie determinism, summaries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from getml_community_spark.operators.sessionize import (
    session_summary,
    sessionize,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "source string, e long").select(
        "source", F.timestamp_seconds("e").alias("ts")
    )


def test_gap_semantics(spark):
    rows = [
        ("u", 0), ("u", 100), ("u", 1900),       # 1800 split: 1900-100 = 1800 NOT > gap
        ("u", 3701),                              # 3701-1900 = 1801 > 1800 → new
        ("v", 50),
    ]
    out = sessionize(_df(spark, rows), 1800, key_col="source").collect()
    sid = {(r["source"], r["ts"].timestamp()): r["session_id"] for r in out}
    assert sid[("u", 0)] == sid[("u", 100)] == sid[("u", 1900)] == 1
    assert sid[("u", 3701)] == 2
    assert sid[("v", 50)] == 1


def test_tied_timestamps_share_session(spark):
    # ties right at a session boundary: all three same-instant events
    # must land in the SAME (new) session regardless of internal order
    rows = [("u", 0), ("u", 5000), ("u", 5000), ("u", 5000)]
    for perm in (rows, list(reversed(rows))):
        out = sessionize(_df(spark, perm), 1800, key_col="source").collect()
        sids = sorted(
            (r["ts"].timestamp(), r["session_id"]) for r in out
        )
        assert [s for _, s in sids] == [1, 2, 2, 2]


def test_summary(spark):
    rows = [("u", 0), ("u", 60), ("u", 10_000), ("u", 10_030), ("u", 10_090)]
    out = {
        r["session_id"]: r
        for r in session_summary(
            _df(spark, rows), 1800, key_col="source"
        ).collect()
    }
    assert out[1]["n_events"] == 2 and out[1]["duration_s"] == 60
    assert out[2]["n_events"] == 3 and out[2]["duration_s"] == 90
    assert out[2]["t_start"] == 10_000 and out[2]["t_end"] == 10_090


def test_bad_gap_raises(spark):
    with pytest.raises(ValueError):
        sessionize(_df(spark, [("u", 0)]), 0)
