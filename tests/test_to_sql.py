"""Transpiled SQL (the reference's to_sql surface) runs on DuckDB and
matches the Spark operators — the cross-dialect oracle pattern the
reference implements with its sqlite3 UDAF pack."""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ("orders", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_rollup_sql_matches_operator(spark, ddb):
    from getml_community_spark.operators.rollup import rollup_from_raw
    from getml_community_spark.plans.to_sql import rollup_sql

    sql = rollup_sql("events", 3600, source_col="user_id", ts_col="ts", value_col="value")
    want = ddb.execute(sql).df().sort_values(["source", "bucket_start"]).reset_index(drop=True)
    got = (
        rollup_from_raw(
            spark.read.parquet(f"{SF}/events.parquet"),
            "1h", source_col="user_id", ts_col="ts", value_col="value",
        )
        .toPandas()
        .sort_values(["source", "bucket_start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["cnt"].to_numpy() == want["cnt"].to_numpy()).all()
    import numpy as np

    np.testing.assert_allclose(got["sum_n_tok"], want["sum_n_tok"], rtol=1e-12)
    np.testing.assert_allclose(got["rate"], want["rate"], rtol=1e-12)


def test_asof_feature_sql_matches_operator(spark, ddb):
    import math

    from getml_community_spark.operators.asof_join import asof_features
    from getml_community_spark.plans.to_sql import asof_feature_sql

    aggs = ["count", "sum", "avg", "min", "max", "median", "stddev_pop",
            "first", "last", "trend", "ewma_1h"]
    sql = asof_feature_sql(
        "orders", "events", on=("o_custkey", "user_id"),
        population_id="o_orderkey", pop_ts="o_orderdate", peri_ts="ts",
        value_col="value", horizon=3600, memory=6 * 86400, aggs=aggs,
    )
    want = ddb.execute(sql).df().set_index("o_orderkey").sort_index()
    got = (
        asof_features(
            spark.read.parquet(f"{SF}/orders.parquet"),
            spark.read.parquet(f"{SF}/events.parquet").withColumnRenamed(
                "user_id", "o_custkey"
            ),
            on="o_custkey", population_id="o_orderkey",
            pop_ts="o_orderdate", peri_ts="ts", value_col="value",
            horizon=3600, memory=6 * 86400, include=set(aggs),
        )
        .select("o_orderkey", *aggs)
        .toPandas()
        .set_index("o_orderkey")
        .sort_index()
    )
    assert len(got) == len(want)
    for c in aggs:
        for k in want.index:
            e, a = want.loc[k, c], got.loc[k, c]
            e = float("nan") if e is None else float(e)
            a = float("nan") if a is None else float(a)
            if math.isnan(e):
                assert math.isnan(a), (c, k)
            else:
                assert a == pytest.approx(e, rel=1e-9, abs=1e-9), (c, k)
