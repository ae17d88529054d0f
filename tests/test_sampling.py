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


@pytest.fixture(scope="module")
def toked(spark, ids):
    return ids.withColumn("n_tok", (F.col("id") % 97 + 3).cast("long"))


def test_token_budget_semantics(spark, toked):
    from getml_community_spark.operators.sampling import (
        sample_bucket,
        token_budget_sample,
    )

    out = token_budget_sample(
        toked, "id", "stratum", "n_tok",
        {"0": 5000, "1": 300, "2": 0}, default_budget=1000, seed="b",
        audit_cols=True,
    ).toPandas()
    by = dict(tuple(out.groupby("stratum")))
    assert "2" not in by  # zero budget → empty stratum
    for s, budget in [("0", 5000), ("1", 300), ("3", 1000)]:
        g = by[s].sort_values("cum_tok")
        # every kept doc but the last starts under budget; the crossing
        # doc is included, so the final cumsum is >= budget
        assert (g["cum_tok"].iloc[:-1] < budget + g["n_tok"].iloc[:-1].max()).all()
        assert g["cum_tok"].iloc[-1] >= budget
        assert (g["cum_tok"] - g["n_tok"] < budget).all()
    # determinism: same call → same membership and same cumsums
    again = token_budget_sample(
        toked, "id", "stratum", "n_tok",
        {"0": 5000, "1": 300, "2": 0}, default_budget=1000, seed="b",
        audit_cols=True,
    ).toPandas()
    a = out.sort_values("id").reset_index(drop=True)
    b = again.sort_values("id").reset_index(drop=True)
    assert (a["id"] == b["id"]).all() and (a["cum_tok"] == b["cum_tok"]).all()
    # audit_cols=False drops the audit columns but keeps membership
    slim = token_budget_sample(
        toked, "id", "stratum", "n_tok",
        {"0": 5000, "1": 300, "2": 0}, default_budget=1000, seed="b",
    )
    assert "cum_tok" not in slim.columns
    assert slim.count() == len(out)


def test_token_budget_negative_raises(spark, toked):
    from getml_community_spark.operators.sampling import token_budget_sample

    with pytest.raises(ValueError):
        token_budget_sample(toked, "id", "stratum", "n_tok", {"0": -5})


def test_token_budget_sample_preserves_caller_columns(spark):
    """Round-4 advice: a caller whose frame already has cum_tok /
    sample_bucket must not lose them (audit_cols=False), and
    audit_cols=True must refuse the collision loudly."""
    from getml_community_spark.operators.sampling import token_budget_sample

    rows = [(i, "web", 10, 777 + i, 888) for i in range(20)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_tok long, cum_tok long, sample_bucket long"
    )
    out = token_budget_sample(
        df, "doc_id", "source", "n_tok", {"web": 50}, audit_cols=False
    )
    pdf = out.toPandas()
    assert "cum_tok" in pdf.columns and "sample_bucket" in pdf.columns
    # caller values survive untouched
    assert (pdf["cum_tok"] == 777 + pdf["doc_id"]).all()
    assert (pdf["sample_bucket"] == 888).all()

    import pytest as _pytest

    with _pytest.raises(ValueError, match="would overwrite"):
        token_budget_sample(
            df, "doc_id", "source", "n_tok", {"web": 50}, audit_cols=True
        )
