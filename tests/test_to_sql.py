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

    from pyspark.sql import functions as F

    aggs = ["count", "sum", "avg", "min", "max", "median", "stddev_pop",
            "first", "last", "trend", "ewma_1h"]
    # remap population timestamps into the events span (o_orderdate never
    # overlaps events; a vacuous window verifies nothing)
    ddb.execute(
        "CREATE OR REPLACE VIEW orders_pop AS SELECT *, "
        "to_timestamp(1704672000 + (o_orderkey % 480) * 3600) AS pop_ts "
        "FROM orders"
    )
    sql = asof_feature_sql(
        "orders_pop", "events", on=("o_custkey", "user_id"),
        population_id="o_orderkey", pop_ts="pop_ts", peri_ts="ts",
        value_col="value", horizon=3600, memory=6 * 86400, aggs=aggs,
    )
    want = ddb.execute(sql).df().set_index("o_orderkey").sort_index()
    assert want["count"].sum() > 0, "vacuous as-of window in to_sql test"
    got = (
        asof_features(
            spark.read.parquet(f"{SF}/orders.parquet").withColumn(
                "pop_ts",
                F.timestamp_seconds(
                    F.lit(1704672000) + (F.col("o_orderkey") % 480) * F.lit(3600)
                ),
            ),
            spark.read.parquet(f"{SF}/events.parquet").withColumnRenamed(
                "user_id", "o_custkey"
            ),
            on="o_custkey", population_id="o_orderkey",
            pop_ts="pop_ts", peri_ts="ts", value_col="value",
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


def test_full_battery_transpiles(spark, ddb):
    """Every aggregation the engine computes (the reference's full
    49-metric battery incl. mode, two-pass, EWMA/EWMA_TREND families)
    has a portable AGG_SQL rendering that matches the Spark operator on
    real data (round-1 verdict #8)."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from getml_community_spark.operators.aggregates import (
        battery,
        ewma_trend_agg,
        mode_agg,
        two_pass_battery,
    )
    from getml_community_spark.plans.to_sql import AGG_SQL

    ev = spark.read.parquet(f"{SF}/events.parquet")
    epoch = F.col("ts").cast("timestamp").cast("long")
    bucket = (F.floor(epoch / 3600) * 3600).cast("long")
    t = F.col("ts").cast("timestamp").cast("double")
    tref = (bucket + 3600).cast("double")

    base = ev.withColumn("__b", bucket).withColumn("__t", t).withColumn("__tr", tref)
    keys = ["user_id", "__b"]
    spark_pdf = (
        base.groupBy(*keys)
        .agg(*battery(F.col("value"), ts=F.col("__t"), t_ref=F.col("__tr"),
                      tiebreak=F.col("event_id")))
        .toPandas()
    )
    extra = (
        mode_agg(base, keys, "value")
        .join(two_pass_battery(base, keys, "value"), keys)
        .join(
            ewma_trend_agg(base, keys, "value", "__t", "__tr"),
            keys,
        )
        .toPandas()
    )
    spark_pdf = spark_pdf.merge(extra, on=keys).set_index(keys).sort_index()

    metrics = [c for c in spark_pdf.columns if c not in keys]
    missing = [m for m in metrics if m not in AGG_SQL]
    assert not missing, f"AGG_SQL missing renderings: {missing}"

    v, tt = "value", "epoch(ts)"
    tr = "(floor(epoch(ts) / 3600) * 3600 + 3600)"
    cols = ",\n  ".join(
        AGG_SQL[m].format(v=v, t=tt, tr=tr) + f' AS "{m}"' for m in metrics
    )
    sql = f"""
      SELECT user_id, cast(floor(epoch(ts) / 3600) * 3600 AS bigint) AS __b,
             {cols}
      FROM events GROUP BY 1, 2
    """
    want = ddb.execute(sql).df().set_index(["user_id", "__b"]).sort_index()
    assert len(want) == len(spark_pdf)

    for m in metrics:
        g = spark_pdf[m].astype(float).to_numpy()
        w = want[m].astype(float).to_numpy()
        both_nan = np.isnan(g) & np.isnan(w)
        close = np.isclose(g, w, rtol=1e-7, atol=1e-9, equal_nan=True)
        ok = both_nan | close
        assert ok.all(), (m, g[~ok][:4], w[~ok][:4])


def test_oracle_metric_sql_normalizes_signed_zero(ddb):
    """Round-4 driver-gate byte class: DuckDB round keeps IEEE -0.0 on
    tiny negatives while Spark's F.round (BigDecimal) has no signed
    zero. oracle_metric_sql's trailing + 0.0 must normalize, and must
    be a bit-exact no-op everywhere else (incl. NULL)."""
    import numpy as np

    from getml_community_spark.plans.to_sql import oracle_metric_sql

    neg, pos, null = ddb.execute(
        "SELECT round(-1e-12, 6) + 0.0, round(3.7e-6, 6) + 0.0,"
        " round(NULL, 6) + 0.0"
    ).fetchone()
    assert not np.signbit(neg) and neg == 0.0
    assert pos == 4e-6
    assert null is None

    # the rendered battery metric itself: skew of a tiny-negative-skew
    # group rounds to zero and must come out +0.0
    sql = oracle_metric_sql("skew", "v", "epoch(ts)", "0")
    got = ddb.execute(
        f"SELECT {sql} AS skew FROM (VALUES (-1.0000001, TIMESTAMP '2024-01-01'),"
        f" (0.0, TIMESTAMP '2024-01-01'), (1.0, TIMESTAMP '2024-01-01')) t(v, ts)"
    ).fetchone()[0]
    assert got == 0.0 and not np.signbit(got)
