"""Deterministic sampling: reproducibility, rate accuracy, strata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from getml_community_spark.operators.sampling import hash_sample, stratified_sample


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 20000).withColumn(
        "stratum", (F.col("id") % 4).cast("string")
    )


def test_hash_sample_rate_and_determinism(spark, ids):
    a = hash_sample(ids, "id", 0.3, seed="s")
    b = hash_sample(ids, "id", 0.3, seed="s")
    na = a.count()
    assert abs(na / 20000 - 0.3) < 0.02  # binomial 3-sigma ~ 0.01
    # identical decision set, not just identical count
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # different seed → different (but same-rate) sample
    c = hash_sample(ids, "id", 0.3, seed="t")
    assert c.exceptAll(a).count() > 0


def test_hash_sample_is_nested(spark, ids):
    # rate r1 < r2 → the r1 sample is a SUBSET of the r2 sample (same
    # seed): the property that makes down-scaling ablations coherent
    small = hash_sample(ids, "id", 0.1, seed="s")
    big = hash_sample(ids, "id", 0.4, seed="s")
    assert small.exceptAll(big).count() == 0


def test_stratified_rates(spark, ids):
    out = stratified_sample(
        ids, "id", "stratum", {"0": 0.8, "1": 0.1, "2": 0.0}, default_rate=0.5
    )
    got = {
        r["stratum"]: r["n"]
        for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    assert abs(got["0"] / 5000 - 0.8) < 0.03
    assert abs(got["1"] / 5000 - 0.1) < 0.03
    assert "2" not in got  # rate 0 → empty stratum
    assert abs(got["3"] / 5000 - 0.5) < 0.03  # default rate


def test_bad_rates_raise(spark, ids):
    with pytest.raises(ValueError):
        hash_sample(ids, "id", 1.5)
    with pytest.raises(ValueError):
        stratified_sample(ids, "id", "stratum", {"0": -0.1})
