"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an operator from SURVEY.md §2 (or a
training-data-pipeline extension) implemented by getml_community_spark;
``oracle_sql()`` carries the DuckDB-equivalent SQL. Float outputs are
rounded to 6 decimals ON BOTH SIDES so the driver's value-hash compares
deterministic digits, not fp summation order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"

_PYFILES_SENT: set[int] = set()


def _ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship the engine package to executor Python workers via addPyFile.

    The driver harness may build its own SparkSession without
    PYTHONPATH=/root/repo; pandas-UDF queries (Gorilla, MinHash) would
    then fail on workers. addPyFile works post-session-start and is the
    local-mode analogue of spark-submit --py-files."""
    key = id(spark)
    if key in _PYFILES_SENT:
        return
    import os
    import zipfile

    repo = os.path.dirname(os.path.abspath(__file__))
    pkg = os.path.join(repo, "getml_community_spark")
    stamp = int(
        max(
            os.path.getmtime(os.path.join(r, f))
            for r, _, fs in os.walk(pkg)
            for f in fs
            if f.endswith(".py")
        )
    )
    zpath = f"/tmp/getml_community_spark_pyfiles_{stamp}.zip"
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _, files in os.walk(pkg):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, repo))
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        pass  # already added or non-local master without file access
    _PYFILES_SENT.add(key)


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_workers_can_import(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _r(col, n=6):
    return F.round(col, n)


def _spread(df: DataFrame) -> DataFrame:
    """Spread a narrow (few-partition) input across the cluster before
    heavy per-row/per-group compute (optimization guide §2.5 input skew
    / §6 small files): the driver testdata ships ONE parquet file with
    ONE row group per table, so split-size configs cannot parallelize
    the scan and the whole first stage (codec UDFs, percentile partial
    aggs, shingle pipelines) runs on a single core of local[32].
    Round-robin repartition to defaultParallelism; metadata no-op when
    the input already has enough partitions (the normal case at scale,
    where tables are many files). Results are order-independent: every
    contract query aggregates with order-insensitive exact arithmetic
    (integer sums / quantized micro-units), and the driver gate sorts
    rows before hashing."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# Orders span 1995-2001 while events span 2024-01, so a window keyed on
# o_orderdate matches ZERO events (round-1 verdict: vacuous as-of gate).
# Testdata is read-only, so the as-of contract queries derive a
# deterministic population timestamp INSIDE the events span — the same
# arithmetic is written verbatim into the DuckDB oracle SQL:
# pop_epoch = 2024-01-08T00:00Z + (o_orderkey % 480) hours, covering
# 2024-01-08 .. 2024-01-27 in hour steps.
_POP_EPOCH_LIT = 1704672000  # epoch of 2024-01-08T00:00:00Z
_POP_EPOCH_SQL = f"({_POP_EPOCH_LIT} + (o.o_orderkey % 480) * 3600)"


def _with_pop_ts(orders: DataFrame) -> DataFrame:
    return orders.withColumn(
        "pop_ts",
        F.timestamp_seconds(
            F.lit(_POP_EPOCH_LIT) + (F.col("o_orderkey") % 480) * F.lit(3600)
        ),
    )


def _hour_bucket(ts_col: str = "ts"):
    """Hour bucket via epoch-long arithmetic (whole-stage-codegen path;
    date_trunc runs interpreted in Spark 4.1 — measured ~9x slower)."""
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    return F.timestamp_seconds((F.floor(epoch / 3600) * 3600).cast("long"))


# --------------------------------------------------------------------- #
# rollup family (events: user_id plays `source`, value plays the metric)
# --------------------------------------------------------------------- #
def q_rollup_1m(spark, sf):
    from getml_community_spark.operators.rollup import rollup_from_raw

    ev = _load(spark, sf, "events")
    agg = rollup_from_raw(ev, "1m", source_col="user_id", ts_col="ts", value_col="value")
    return agg.select(
        F.col("source").alias("user_id"),
        "bucket_start",
        "cnt",
        _r(F.col("sum_n_tok")).alias("sum_value"),
        _r(F.col("min_n_tok")).alias("min_value"),
        _r(F.col("max_n_tok")).alias("max_value"),
        _r(F.col("rate")).alias("rate"),
    )


def q_rollup_1h_cascade(spark, sf):
    from getml_community_spark.operators.rollup import rollup_cascade, rollup_from_raw

    ev = _load(spark, sf, "events")
    agg1m = rollup_from_raw(ev, "1m", source_col="user_id", ts_col="ts", value_col="value")
    agg1h = rollup_cascade(agg1m, "1h")
    return agg1h.select(
        F.col("source").alias("user_id"),
        "bucket_start",
        "cnt",
        _r(F.col("sum_n_tok")).alias("sum_value"),
        _r(F.col("min_n_tok")).alias("min_value"),
        _r(F.col("max_n_tok")).alias("max_value"),
        _r(F.col("rate")).alias("rate"),
    )


_RANGE_T0 = 1704067200 + 2 * 86400  # 2024-01-03T00Z, 2h-aligned
_RANGE_T1 = 1704067200 + 9 * 86400  # 2024-01-10T00Z


def q_range_rebucket_2h(spark, sf):
    """Range-query router core (plans/job.py::query_range): serve a
    2h-resolution range from the 1h tier — cascade 1m→1h, range-filter,
    re-bucket with rollup_to_step(7200). The oracle aggregates raw rows
    in the same epoch range directly at 7200s, proving tier choice +
    re-bucketing loses nothing."""
    from getml_community_spark.operators.rollup import (
        rollup_cascade,
        rollup_from_raw,
        rollup_to_step,
    )

    ev = _load(spark, sf, "events")
    h1 = rollup_cascade(
        rollup_from_raw(ev, "1m", source_col="user_id", ts_col="ts", value_col="value"),
        "1h",
    )
    ep = F.col("bucket_start").cast("timestamp").cast("long")
    r = rollup_to_step(h1.where((ep >= _RANGE_T0) & (ep < _RANGE_T1)), 7200)
    return r.select(
        F.col("source").alias("user_id"),
        "bucket_start",
        "cnt",
        _r(F.col("sum_n_tok")).alias("sum_value"),
        _r(F.col("min_n_tok")).alias("min_value"),
        _r(F.col("max_n_tok")).alias("max_value"),
        (F.floor(F.col("rate") * 1e6 + F.lit(0.5)) / 1e6).alias("rate"),
    )


def q_distinct_hll_1h(spark, sf):
    """Mergeable HLL distinct-count tier (operators/distinct.py):
    distinct event_type per (user_id, 1h), cascaded 1m→1h through
    hll_union_agg. Per-bucket cardinality (≤5 types) keeps the sketch
    in coupon (exact) mode, so the estimate equals the oracle's exact
    COUNT(DISTINCT ...)."""
    from getml_community_spark.operators.distinct import (
        hll_cascade,
        hll_estimates,
        hll_rollup_from_raw,
    )

    ev = _load(spark, sf, "events")
    m1 = hll_rollup_from_raw(
        ev, "1m", distinct_col="event_type", source_col="user_id", ts_col="ts"
    )
    est = hll_estimates(hll_cascade(m1, "1h"))
    return est.select(
        F.col("source").alias("user_id"),
        "bucket_start",
        F.col("n_distinct").cast("long").alias("n_types"),
        "cnt",
    )


def q_exactsubstr_spans(spark, sf):
    """ExactSubstr duplicated-span detection (Lee et al. 2021,
    operators/dedup.duplicated_token_spans) over the documents table:
    word-tokenize with the shared [^a-z0-9]+ split, flag maximal token
    ranges whose every 10-gram occurs >= 2 times corpus-wide. The
    oracle replays window-hash counting + gaps-and-islands in DuckDB
    over the same gram strings."""
    from getml_community_spark.operators.dedup import duplicated_token_spans
    from getml_community_spark.operators.textstats import word_tokens_arrow

    docs = _spread(_load(spark, sf, "documents"))
    # Arrow tokenizer (guide §4.2) — same [^a-z0-9]+ split class as the
    # oracle, C-regex instead of the interpreted JVM split+filter
    toks = word_tokens_arrow(F.col("text"), r"[^a-z0-9]+")
    df = docs.select("doc_id", toks.alias("tokens"))
    spans = duplicated_token_spans(df, k=10)
    return spans.select(
        "doc_id",
        F.col("start").cast("long").alias("span_start"),
        F.col("end").cast("long").alias("span_end"),
    )


def q_rollup_1d_cascade(spark, sf):
    from getml_community_spark.operators.rollup import rollup_cascade, rollup_from_raw

    ev = _load(spark, sf, "events")
    agg = rollup_cascade(
        rollup_cascade(
            rollup_from_raw(ev, "1m", source_col="user_id", ts_col="ts", value_col="value"),
            "1h",
        ),
        "1d",
    )
    # rate is derived from the ALREADY-ROUNDED sum on both sides: the
    # cascaded double sum differs from the oracle's direct sum in the
    # last ulps, and sum/86400 flipped the 6th decimal on 2/4006 rows
    # (round-1 verdict #2). The final rounding uses floor(x*1e6+0.5)/1e6
    # — pure IEEE ops that both engines evaluate bit-identically —
    # because sum/86400 lands on exact .5 ties (169.56/86400=0.0019625)
    # where Spark's HALF_UP-on-shortest-decimal disagrees with DuckDB's
    # round-on-binary-value.
    rate6 = (
        F.floor(_r(F.col("sum_n_tok")) / F.lit(86400.0) * F.lit(1e6) + F.lit(0.5))
        / F.lit(1e6)
    )
    return agg.select(
        F.col("source").alias("user_id"),
        "bucket_start",
        "cnt",
        _r(F.col("sum_n_tok")).alias("sum_value"),
        rate6.alias("rate"),
    )


def q_salted_rollup_1h(spark, sf):
    """Salted two-stage aggregation — must equal the plain rollup."""
    from getml_community_spark.operators.rollup import salted_rollup

    ev = _load(spark, sf, "events").withColumn("doc_id", F.col("event_id").cast("string"))
    agg = salted_rollup(ev, "1h", salt_buckets=8, source_col="user_id", ts_col="ts", value_col="value")
    return agg.select(
        F.col("source").alias("user_id"),
        "bucket_start",
        "cnt",
        _r(F.col("sum_n_tok")).alias("sum_value"),
    )


def q_gapfill_1h(spark, sf):
    from getml_community_spark.operators.gapfill import gapfill
    from getml_community_spark.operators.rollup import rollup_from_raw

    ev = _spread(_load(spark, sf, "events"))
    agg = rollup_from_raw(ev, "1h", source_col="user_id", ts_col="ts", value_col="value")
    # windowed gap generation: the dense output feeds the sink directly
    # (no further window stages), the regime where the lag-window form
    # measures ~30% faster than the spine join (gapfill docstring)
    dense = gapfill(agg, 3600, windowed=True)
    return dense.select(
        F.col("source").alias("user_id"),
        "bucket_start",
        "cnt",
        _r(F.col("sum_n_tok")).alias("sum_value"),
        _r(F.col("rate")).alias("rate"),
    )


def q_gapfill_interp_1h(spark, sf):
    """Gap-fill with per-source LINEAR INTERPOLATION of the rate across
    gap buckets (applyInPandas path) — oracle: window-function
    interpolation (prev/next known value + linear blend) in DuckDB."""
    from getml_community_spark.operators.gapfill import gapfill_interpolated
    from getml_community_spark.operators.rollup import rollup_from_raw

    ev = _spread(_load(spark, sf, "events"))
    agg = rollup_from_raw(ev, "1h", source_col="user_id", ts_col="ts", value_col="value")
    dense = gapfill_interpolated(agg, 3600, value_cols=("rate",))
    # midpoint interpolation lands EXACTLY on .5e-6 quantization
    # boundaries (measured: engines agree to 1 ulp, but 45/105k values
    # sit on the boundary, so floor(x*1e6+0.5) flips). Shift the
    # boundary off the data's grid by 1e-4 grid units on BOTH sides —
    # a hash canonicalization, not a numeric claim.
    rate6 = F.floor(F.col("rate") * F.lit(1e6) + F.lit(0.5001)) / F.lit(1e6)
    return dense.select(
        F.col("source").alias("user_id"),
        "bucket_start",
        F.col("cnt").cast("long").alias("cnt"),
        rate6.alias("rate"),
    )


def q_json_extract(spark, sf):
    """JSON column surface (§2.1 from_json/get_json_object): extract
    props.$.k per event, aggregate per event_type."""
    ev = _load(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(k).alias("n"),
            F.sum(k).cast("long").alias("sum_k"),
            _r(F.avg(k)).alias("avg_k"),
            F.min(k).cast("int").alias("min_k"),
            F.max(k).cast("int").alias("max_k"),
        )
        .orderBy("event_type")
    )


def q_battery_1h(spark, sf):
    """Extended aggregation battery per (user_id, hour bucket)
    (SURVEY.md §2.6).

    count_distinct is computed in a SEPARATE co-partitioned aggregation
    and joined back (optimization guide §2.3 "aggregate before you
    shuffle"): mixing a distinct aggregate with the buffer-heavy battery
    makes Catalyst rewrite the whole agg to group by
    (keys, value) first, building and exchanging one percentile/min_by
    buffer PER DISTINCT VALUE (≈ per event on continuous doubles —
    measured 4.9 s vs 2.9 s without the distinct at sf1-shape). The
    standalone distinct branch plans as two cheap codegen hash
    aggregates; the join keys equal both aggs' grouping keys, so no
    extra exchange. Values are identical: same clean() input, same
    count_distinct arithmetic, inner join on the identical group set."""
    from getml_community_spark.operators.aggregates import battery, clean

    ev = _spread(_load(spark, sf, "events"))
    t = F.col("ts").cast("timestamp").cast("double")
    bucket = _hour_bucket("ts")
    t_ref = bucket.cast("double") + F.lit(3600.0)
    aggs = battery(
        F.col("value"),
        ts=t,
        t_ref=t_ref,
        tiebreak=F.col("event_id"),
        include={
            "count", "sum", "avg", "min", "max", "median", "q25", "q75",
            "q90", "stddev_pop", "var_pop", "first",
            "last", "avg_time_between", "trend", "ewma_1h",
            "variation_coefficient",
        },
    )
    main = ev.groupBy(F.col("user_id"), bucket.alias("bucket_start")).agg(*aggs)
    cd = ev.groupBy(F.col("user_id"), bucket.alias("bucket_start")).agg(
        F.count_distinct(clean(F.col("value"))).cast("double").alias(
            "count_distinct"
        )
    )
    out = main.join(cd, ["user_id", "bucket_start"])
    # column order must stay byte-identical to the single-agg battery's
    # emission order (driver gate is column-order sensitive):
    # count_distinct sits between stddev_pop and first
    order = [
        "count", "sum", "avg", "min", "max", "median", "q25", "q75",
        "q90", "var_pop", "stddev_pop", "count_distinct", "first",
        "last", "avg_time_between", "ewma_1h", "trend",
        "variation_coefficient",
    ]
    return out.select(
        "user_id",
        "bucket_start",
        F.col("count").cast("long").alias("cnt"),
        *[_r(F.col(c)).alias(c) for c in order if c != "count"],
    )


def q_battery_full_1h(spark, sf):
    """The REMAINDER of the 49-agg battery (everything battery_1h does
    not cover): extra quantiles, skew/kurtosis, count_distinct ratios,
    the TIME SINCE FIRST/LAST MAX/MIN family, and more EWMA half-lives —
    oracle-rendered from the same AGG_SQL templates pytest validates.

    skew/kurtosis use the raw-moment form here (identical expression on
    both engines → hash-stable); the ENGINE battery uses Spark's
    numerically-stable builtins, cross-checked in pytest with rtol."""
    from getml_community_spark.operators.aggregates import battery

    ev = _spread(_load(spark, sf, "events"))
    t = F.col("ts").cast("timestamp").cast("double")
    bucket = _hour_bucket("ts")
    t_ref = bucket.cast("double") + F.lit(3600.0)
    aggs = battery(
        F.col("value"), ts=t, t_ref=t_ref, tiebreak=F.col("event_id"),
        include={
            "q05", "q95", "var_pop", "count_distinct_over_count",
            "count_minus_count_distinct", "avg_time_between",
            "time_since_last_maximum", "time_since_first_maximum",
            "time_since_first_minimum", "time_since_last_minimum",
            "ewma_1d", "ewma_7d",
        },
    )
    v = F.col("value")
    mu = F.avg(v)
    m2 = F.var_pop(v)
    raw_skew = F.when(m2 == 0.0, 0.0).otherwise(
        (F.avg(F.pow(v, 3)) - 3 * mu * F.avg(F.pow(v, 2)) + 2 * F.pow(mu, 3))
        / F.pow(m2, 1.5)
    )
    raw_kurt = F.when(m2 == 0.0, 0.0).otherwise(
        (
            F.avg(F.pow(v, 4))
            - 4 * mu * F.avg(F.pow(v, 3))
            + 6 * F.pow(mu, 2) * F.avg(F.pow(v, 2))
            - 3 * F.pow(mu, 4)
        )
        / F.pow(m2, 2)
    )
    out = ev.groupBy(F.col("user_id"), bucket.alias("bucket_start")).agg(
        *aggs, raw_skew.alias("skew"), raw_kurt.alias("kurtosis")
    )
    keep = [c for c in out.columns if c not in ("user_id", "bucket_start")]
    return out.select(
        "user_id", "bucket_start", *[_r(F.col(c)).alias(c) for c in keep]
    )


def q_ewma_trend_1h(spark, sf):
    from getml_community_spark.operators.aggregates import ewma_trend_agg

    ev = (
        _load(spark, sf, "events")
        .withColumn("bucket_start", _hour_bucket("ts"))
        .withColumn("t", F.col("ts").cast("timestamp").cast("double"))
        .withColumn("tref", F.col("bucket_start").cast("double") + 3600.0)
    )
    out = ewma_trend_agg(
        ev, ["user_id", "bucket_start"], "value", "t", "tref",
        half_lives={"1h": 3600.0},
    )
    return out.select(
        "user_id", "bucket_start", _r(F.col("ewma_trend_1h")).alias("ewma_trend_1h")
    )


def q_two_pass_1h(spark, sf):
    from getml_community_spark.operators.aggregates import two_pass_battery

    ev = _load(spark, sf, "events").withColumn("bucket_start", _hour_bucket("ts"))
    return two_pass_battery(ev, ["user_id", "bucket_start"], "value").select(
        "user_id",
        "bucket_start",
        F.col("num_max").cast("long").alias("num_max"),
        F.col("num_min").cast("long").alias("num_min"),
        F.col("count_above_mean").cast("long").alias("count_above_mean"),
        F.col("count_below_mean").cast("long").alias("count_below_mean"),
    )


def q_mode_1h(spark, sf):
    from getml_community_spark.operators.aggregates import mode_agg

    ev = _load(spark, sf, "events").withColumn("bucket_start", _hour_bucket("ts"))
    out = mode_agg(ev, ["user_id", "bucket_start"], "value")
    return out.select("user_id", "bucket_start", _r(F.col("mode")).alias("mode"))


def q_gorilla_roundtrip_1m(spark, sf):
    """End-to-end: 1m rollup → Gorilla encode (pandas UDF) → decode →
    points; must equal the rollup computed directly in SQL."""
    from getml_community_spark.functions.gorilla import (
        compress_rollup,
        decompress_segments,
    )
    from getml_community_spark.operators.rollup import rollup_from_raw

    # NO _spread here (measured 3.5 s -> 10.9 s with it): the first
    # stage is a cheap codegen partial agg, and the extra round-robin
    # exchange ahead of the (source, minute) group shuffle only adds
    # volume. The heavy stages (encode/decode UDFs) sit AFTER the
    # group exchange and are already parallel.
    ev = _load(spark, sf, "events")
    agg = rollup_from_raw(ev, "1m", source_col="user_id", ts_col="ts", value_col="value")
    segs = compress_rollup(agg, ts_col="bucket_start", value_col="rate", source_col="source")
    back = decompress_segments(segs)
    return back.select(
        F.col("source").alias("user_id"),
        F.col("ts").alias("bucket_epoch"),
        _r(F.col("value")).alias("rate"),
    )


def q_lag_rolling_1h(spark, sf):
    """Lag bank + rolling windows over the dense 1h tier (the
    reference's lag conditions, FastProp.cpp:1255-1287)."""
    from getml_community_spark.operators.gapfill import gapfill
    from getml_community_spark.operators.lag import lag_features, rolling_features
    from getml_community_spark.operators.rollup import rollup_from_raw

    ev = _spread(_load(spark, sf, "events"))
    # windowed gap generation: measured faster here even though lag/
    # rolling windows follow (one flat lag bank, unlike the decompose
    # chain's window-over-window, which keeps the spine-join default)
    dense = gapfill(
        rollup_from_raw(ev, "1h", source_col="user_id", ts_col="ts", value_col="value"),
        3600,
        windowed=True,
    )
    out = rolling_features(
        lag_features(dense, ["cnt"], lags=[1, 2]),
        ["cnt"],
        window_buckets=3,
        aggs=["sum", "avg"],
    )
    return out.select(
        F.col("source").alias("user_id"),
        "bucket_start",
        "cnt",
        "cnt_lag1",
        "cnt_lag2",
        F.col("cnt_roll3_sum").cast("long").alias("roll3_sum"),
        _r(F.col("cnt_roll3_avg")).alias("roll3_avg"),
    )


def q_sliding_window(spark, sf):
    """Per-event sliding self-join window (time_series.py semantics):
    1-day trailing window per user."""
    from getml_community_spark.operators.lag import sliding_window_agg

    ev = _load(spark, sf, "events")
    out = sliding_window_agg(
        ev, "value", horizon_seconds=0, memory_seconds=86400,
        key_cols=["user_id"], ts_col="ts",
    )
    return out.select(
        "event_id",
        F.col("w_count").cast("long").alias("w_count"),
        _r(F.col("w_sum")).alias("w_sum"),
        _r(F.col("w_avg")).alias("w_avg"),
        _r(F.col("w_min")).alias("w_min"),
        _r(F.col("w_max")).alias("w_max"),
    )


# --------------------------------------------------------------------- #
# joins / staging
# --------------------------------------------------------------------- #
def q_asof_upper_ts(spark, sf):
    """As-of join with an explicit validity-end column instead of memory
    (reference upper_time_stamp, Placeholder.hpp:91-94; NULL upper =>
    open-ended, Matchmaker.hpp:126-131). Peripheral rows are valid for
    3 days; every 7th row open-ended. Population timestamps are remapped
    into the events span (see _with_pop_ts) so the gate is non-vacuous."""
    from getml_community_spark.operators.asof_join import asof_match

    orders = _with_pop_ts(_spread(_load(spark, sf, "orders")))
    events = (
        _spread(_load(spark, sf, "events"))
        .withColumnRenamed("user_id", "o_custkey")
        .withColumn(
            "valid_until",
            F.when(
                F.col("event_id") % 7 != 0,
                F.col("ts") + F.expr("INTERVAL 3 DAYS"),
            ),
        )
    )
    m = asof_match(
        orders, events, on="o_custkey", population_id="o_orderkey",
        pop_ts="pop_ts", peri_ts="ts", horizon=0.0, memory=None,
        upper_ts="valid_until", strategy="range",
        peri_cols=["value", "ts", "valid_until"],
    )
    return (
        m.groupBy(F.col("__pop_id").alias("o_orderkey"))
        .agg(
            F.count("value").cast("long").alias("cnt"),
            _r(F.sum("value")).alias("sum_value"),
        )
    )


def q_asof_categorical_dummy(spark, sf):
    """Value-extraction variants (fastprop/Aggregator.cpp): categorical
    dummy (AVG of CASE WHEN event_type='click') and same-units difference
    (o_totalprice − 1000·value per match) aggregated over the window."""
    from getml_community_spark.operators.asof_join import asof_features

    orders = _with_pop_ts(_spread(_load(spark, sf, "orders")))
    events = _spread(_load(spark, sf, "events")).withColumnRenamed("user_id", "o_custkey")
    dummy = asof_features(
        orders, events, on="o_custkey", population_id="o_orderkey",
        pop_ts="pop_ts", peri_ts="ts",
        value_expr=F.when(F.col("event_type") == "click", 1.0).otherwise(0.0),
        peri_cols=["event_type", "ts"],
        horizon=3600.0, memory=7 * 86400.0 - 3600.0,
        include={"count", "sum", "avg"}, prefix="click_",
    ).select("o_orderkey", "click_count", "click_sum", "click_avg")
    diff = asof_features(
        orders, events, on="o_custkey", population_id="o_orderkey",
        pop_ts="pop_ts", peri_ts="ts",
        value_expr=F.col("__pop_o_totalprice") - F.lit(1000.0) * F.col("value"),
        peri_cols=["value", "ts"], pop_cols=["o_totalprice"],
        horizon=3600.0, memory=7 * 86400.0 - 3600.0,
        include={"avg", "min", "max"}, prefix="du_",
    ).select("o_orderkey", "du_avg", "du_min", "du_max")
    out = dummy.join(diff, "o_orderkey")
    return out.select(
        "o_orderkey",
        F.col("click_count").cast("long").alias("click_count"),
        _r(F.col("click_sum")).alias("click_sum"),
        _r(F.col("click_avg")).alias("click_avg"),
        _r(F.col("du_avg")).alias("du_avg"),
        _r(F.col("du_min")).alias("du_min"),
        _r(F.col("du_max")).alias("du_max"),
    )


def q_word_features(spark, sf):
    """Word-occurrence features (the reference's text DataUsed +
    WordIndex, fastprop/Aggregator.cpp:371-414): for the top-10
    vocabulary words, per source: number of documents containing the
    word."""
    from getml_community_spark.operators.textstats import (
        vocabulary,
        word_tokens_arrow,
    )

    docs = _load(spark, sf, "documents")
    top = [r["word"] for r in vocabulary(docs, "text", min_df=1, max_size=10).collect()]
    tokens = _spread(docs).select(
        "source",
        F.explode(F.array_distinct(word_tokens_arrow(F.col("text")))).alias("word"),
    )
    return (
        tokens.where(F.col("word").isin(top))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "word")
    )


def q_asof_orders_events(spark, sf):
    """The representative reference-shaped query (FIXTURES.md §3):
    as-of window join orders←events + battery. Population timestamps are
    remapped into the events span (round-1 verdict #1: o_orderdate never
    overlaps events, making the old gate vacuous)."""
    from getml_community_spark.operators.asof_join import asof_features

    orders = _with_pop_ts(_spread(_load(spark, sf, "orders")))
    events = _spread(_load(spark, sf, "events")).withColumnRenamed("user_id", "o_custkey")
    feats = asof_features(
        orders,
        events,
        on="o_custkey",
        population_id="o_orderkey",
        pop_ts="pop_ts",
        peri_ts="ts",
        value_col="value",
        horizon=3600.0,
        memory=7 * 86400.0 - 3600.0,
        include={"count", "sum", "avg", "min", "max", "median", "q90",
                 "stddev_pop", "first", "last"},
    )
    return feats.select(
        "o_orderkey",
        F.col("count").cast("long").alias("cnt"),
        _r(F.col("sum")).alias("sum"),
        _r(F.col("avg")).alias("avg"),
        _r(F.col("min")).alias("min"),
        _r(F.col("max")).alias("max"),
        _r(F.col("median")).alias("median"),
        _r(F.col("q90")).alias("q90"),
        _r(F.col("stddev_pop")).alias("stddev_pop"),
        _r(F.col("first")).alias("first"),
        _r(F.col("last")).alias("last"),
    )


def q_asof_multikey(spark, sf):
    """Multi-key as-of join (reference composite join keys,
    modify_data_frames.cpp multi-jk): window match on BOTH
    (custkey, synthetic key2) with the usual battery."""
    from getml_community_spark.operators.asof_join import asof_features

    orders = _with_pop_ts(_spread(_load(spark, sf, "orders"))).withColumn(
        "k2", F.col("o_orderkey") % 3
    )
    events = (
        _spread(_load(spark, sf, "events"))
        .withColumnRenamed("user_id", "o_custkey")
        .withColumn("k2", F.col("event_id") % 3)
    )
    feats = asof_features(
        orders, events, on=["o_custkey", "k2"], population_id="o_orderkey",
        pop_ts="pop_ts", peri_ts="ts", value_col="value",
        horizon=3600.0, memory=7 * 86400.0 - 3600.0,
        include={"count", "sum", "avg"},
    )
    return feats.select(
        "o_orderkey",
        F.col("count").cast("long").alias("cnt"),
        _r(F.col("sum")).alias("sum_value"),
        _r(F.col("avg")).alias("avg_value"),
    )


def q_string_ops(spark, sf):
    """§2.3 string surface + as_str/as_num/as_ts casts (scalar.py),
    driver-gated (round-1 verdict: untested edges)."""
    from getml_community_spark.functions.scalar import as_num, as_str, as_ts

    o = _load(spark, sf, "orders")
    fmt = "yyyy-MM-dd HH:mm:ss"
    s = F.date_format(F.col("o_orderdate"), fmt)
    return o.select(
        "o_orderkey",
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("cat"),
        F.upper("o_orderpriority").alias("up"),
        F.lower("o_orderstatus").alias("lo"),
        F.substring("o_orderpriority", 1, 3).alias("sub3"),
        F.col("o_orderpriority").contains("URGENT").cast("int").alias("has_urgent"),
        F.length("o_orderpriority").cast("int").alias("len_p"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")).alias("rep"),
        as_str(F.col("o_orderkey")).alias("key_str"),
        _r(as_num(as_str(F.col("o_custkey")))).alias("cust_num"),
        as_ts(s, [fmt]).cast("long").alias("ts_rt"),
    )


def q_csv_roundtrip(spark, sf):
    """CSV sink + sniffing reader round-trip (§2.1 read_csv/to_csv,
    reference CSVSniffer.hpp): write orders to CSV, read back with
    schema inference, values must survive."""
    import hashlib

    from getml_community_spark.sources.io import read_csv, to_csv

    o = _load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        _r(F.col("o_totalprice"), 2).alias("price2"),
    )
    tag = hashlib.sha1(sf.encode()).hexdigest()[:10]
    path = f"/tmp/spark_graft_csv_roundtrip_{tag}"
    to_csv(o, path)
    back = read_csv(spark, path, header=True, sniff=True)
    return back.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        "o_orderstatus",
        _r(F.col("price2").cast("double"), 2).alias("price2"),
    )


_FP_H = 3600.0
_FP_MEM = 7 * 86400.0 - 3600.0
_FP_AGGS = ("count", "sum", "avg", "min", "max")
_FP_CONDS = ("all", "event_type_top1", "event_type_top2", "event_type_top3",
             "lag0", "lag1")


def q_fastprop_features(spark, sf):
    """FastProp-lite (reference FastProp.cpp:534-870): auto-enumerated
    conditions x aggregations grid — plain window, top-3 categorical
    conditions, 2-way lag bank — 30 features in ONE groupBy, oracle-
    checked against the equivalent CASE-WHEN battery in DuckDB."""
    from getml_community_spark.operators.fastprop import fastprop_features

    orders = _with_pop_ts(_spread(_load(spark, sf, "orders")))
    events = _spread(_load(spark, sf, "events")).withColumnRenamed("user_id", "o_custkey")
    out = fastprop_features(
        orders, events, on="o_custkey", population_id="o_orderkey",
        pop_ts="pop_ts", peri_ts="ts", value_cols=["value"],
        aggs=_FP_AGGS, categorical_cols=("event_type",), n_most_frequent=3,
        n_lag_splits=2, horizon=_FP_H, memory=_FP_MEM,
    )
    sel = [F.col("o_orderkey")]
    for cond in _FP_CONDS:
        for a in _FP_AGGS:
            name = f"{a}__value__{cond}"
            sel.append(F.col(name) if a == "count" else _r(F.col(name)).alias(name))
    return out.select(*sel)


def _battery_full_oracle_sql() -> str:
    """Render the battery_full_1h oracle from the SAME AGG_SQL templates
    the to_sql transpiler ships (plans/to_sql.py) — one source of truth
    for every aggregation's portable SQL. Rendering goes through
    oracle_metric_sql, whose ``+ 0.0`` normalizes DuckDB's signed zero
    (round(-1e-12, 6) = -0.0) to Spark's BigDecimal +0.0 — the r4
    driver-gate byte mismatch (146 skew cells at sf0.01)."""
    from getml_community_spark.plans.to_sql import oracle_metric_sql

    metrics = [
        # NOTE: order must match battery()'s emission order (the driver's
        # correctness gate is column-ORDER sensitive): ewma_* comes before
        # the time_since_* family in operators/aggregates.py:battery.
        "q05", "q95", "var_pop", "count_distinct_over_count",
        "count_minus_count_distinct", "avg_time_between",
        "ewma_1d", "ewma_7d",
        "time_since_last_maximum", "time_since_first_maximum",
        "time_since_first_minimum", "time_since_last_minimum",
        "skew", "kurtosis",
    ]
    v, t = "value", "epoch(ts)"
    tr = "(floor(epoch(ts) / 3600) * 3600 + 3600)"
    cols = ",\n               ".join(
        f"{oracle_metric_sql(m, v, t, tr)} AS {m}" for m in metrics
    )
    return f"""
        SELECT user_id,
               date_trunc('hour', ts) AS bucket_start,
               {cols}
        FROM events GROUP BY 1, 2
    """


def _fastprop_oracle_sql() -> str:
    pop = _POP_EPOCH_SQL
    h, mem = _FP_H, _FP_MEM
    step = mem / 2
    delta = f"({pop} - epoch(e.ts))"
    conds = {
        "all": None,
        **{
            f"event_type_top{r}": (
                f"e.event_type = (SELECT catv FROM cats WHERE rk = {r})"
            )
            for r in (1, 2, 3)
        },
        "lag0": f"{delta} >= {h} AND {delta} < {h + step}",
        "lag1": f"{delta} >= {h + step} AND {delta} < {h + mem}",
    }
    agg_tpl = {
        "count": "count({x})",
        "sum": "round(coalesce(sum({x}), 0.0), 6)",
        "avg": "round(avg({x}), 6)",
        "min": "round(min({x}), 6)",
        "max": "round(max({x}), 6)",
    }
    cols = []
    for cname in _FP_CONDS:
        cexpr = conds[cname]
        x = "e.value" if cexpr is None else f"CASE WHEN {cexpr} THEN e.value END"
        for a in _FP_AGGS:
            cols.append(agg_tpl[a].format(x=x) + f' AS "{a}__value__{cname}"')
    collist = ",\n               ".join(cols)
    return f"""
        WITH cats AS (
          SELECT event_type AS catv,
                 row_number() OVER (ORDER BY count(*) DESC, event_type ASC) AS rk
          FROM events GROUP BY event_type
        )
        SELECT o.o_orderkey,
               {collist}
        FROM orders o LEFT JOIN events e
          ON e.user_id = o.o_custkey
         AND epoch(e.ts) <= {pop} - {h}
         AND epoch(e.ts) >  {pop} - {h} - {mem}
        GROUP BY o.o_orderkey
    """


def q_staging_join(spark, sf):
    """Many-to-one staging join (reference staging.cpp:146-229):
    orders ← customer dim (broadcast), revenue per market segment."""
    orders = _load(spark, sf, "orders")
    cust = _load(spark, sf, "customer")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left")
    # revenue ~7.4e8 needs 16 significant digits at 6 dp — beyond double's
    # association-stable range (round-1 verdict #4). Summing as
    # decimal(18,2) is exact regardless of partial-agg order; one cast to
    # double at the end is deterministic.
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _r(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            ).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


def q_pricing_summary(spark, sf):
    """TPC-H Q1-shaped pricing summary over lineitem (classic multi-agg
    single-shuffle groupBy)."""
    li = _load(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.sum("l_quantity")).alias("sum_qty"),
            _r(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_price"),
            _r(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
            ).alias("sum_charge"),
            _r(F.avg("l_quantity")).alias("avg_qty"),
            _r(F.avg("l_extendedprice")).alias("avg_price"),
            _r(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_concat_union(spark, sf):
    """concat/append (§2.2, union by name — concat.py:24-36)."""
    ev = _spread(_load(spark, sf, "events"))
    a = ev.where(F.col("value") > 0)
    b = ev.where(F.col("value") <= 0)
    return (
        a.unionByName(b)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), _r(F.sum("value")).alias("sum_value"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------- #
# view ops / scalar expressions / preprocessors
# --------------------------------------------------------------------- #
def q_scalar_expressions(spark, sf):
    """§2.3 expression surface: arithmetic/rounding/transcendental/
    timestamp extraction/casts/boolean, per orders row."""
    from getml_community_spark.functions.scalar import weekday, yearday

    o = _load(spark, sf, "orders")
    p = F.col("o_totalprice")
    t = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        _r(F.abs(-p)).alias("abs_p"),
        F.ceil(p).cast("double").alias("ceil_p"),
        F.floor(p).cast("double").alias("floor_p"),
        _r(F.pow(p, F.lit(0.5))).alias("pow_half"),
        _r(F.sqrt(p)).alias("sqrt_p"),
        _r(F.log(p)).alias("ln_p"),
        _r(F.exp(p / F.lit(100000.0))).alias("exp_scaled"),
        _r(F.sin(p / F.lit(1000.0))).alias("sin_p"),
        _r(p % F.lit(7.0)).alias("fmod7"),
        F.year(t).alias("yr"),
        F.month(t).alias("mon"),
        F.dayofmonth(t).alias("dom"),
        F.hour(t).alias("hr"),
        weekday(t).cast("int").alias("dow"),
        yearday(t).cast("int").alias("doy"),
        (p > 100000.0).cast("int").alias("gt_100k"),
        F.when(p > 100000.0, F.lit("big")).otherwise(F.lit("small")).alias("bucketed"),
    )


def q_subselection_slice(spark, sf):
    """Positional subselection (§2.2 slicing, columns.py:1673-1732):
    rows 100..199 in o_orderkey order."""
    from pyspark.sql import Window

    o = _load(spark, sf, "orders")
    w = Window.orderBy("o_orderkey")
    return (
        o.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") > 100) & (F.col("__rn") <= 200))
        .select("o_orderkey", "o_custkey", _r(F.col("o_totalprice")).alias("o_totalprice"))
    )


def q_seasonal(spark, sf):
    """Seasonal preprocessor (§2.8): event counts by hour-of-day ×
    weekday."""
    from getml_community_spark.functions.preprocessors import seasonal

    ev = seasonal(_load(spark, sf, "events"), "ts", prefix="s_")
    return (
        ev.groupBy("s_hour", "s_weekday")
        .agg(F.count(F.lit(1)).alias("n"), _r(F.avg("value")).alias("avg_value"))
        .orderBy("s_hour", "s_weekday")
    )


def q_imputation(spark, sf):
    """Imputation preprocessor: null-out a band of values, mean-impute,
    emit dummies (§2.8 Imputation.cpp)."""
    from getml_community_spark.functions.preprocessors import impute

    ev = _load(spark, sf, "events").withColumn(
        "v", F.when(F.col("value") > 1.5, None).otherwise(F.col("value"))
    )
    out, _ = impute(ev, ["v"], add_dummies=True)
    return out.select(
        "event_id", _r(F.col("v")).alias("v_imputed"), F.col("v__imputed").cast("int").alias("was_null")
    )


def q_category_trim(spark, sf):
    """CategoryTrimmer (§2.8): keep top-2 event types, rest → 'trimmed'."""
    from getml_community_spark.functions.preprocessors import category_trim

    ev = _spread(_load(spark, sf, "events"))
    out, _ = category_trim(ev, "event_type", top_k=2)
    return (
        out.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------- #
# training-data pipeline: dedup / similarity / text
# --------------------------------------------------------------------- #
def q_exact_dedup(spark, sf):
    from getml_community_spark.operators.dedup import exact_dedup

    docs = _load(spark, sf, "documents")
    return exact_dedup(docs, "text", "doc_id").select("doc_id", "dup_count")


def q_text_stats(spark, sf):
    from getml_community_spark.operators.textstats import text_stats

    docs = _load(spark, sf, "documents")
    return text_stats(docs, "text", "doc_id").select(
        "doc_id", "n_words", "n_chars"
    )


def q_vocabulary(spark, sf):
    from getml_community_spark.operators.textstats import vocabulary

    docs = _load(spark, sf, "documents")
    return vocabulary(docs, "text", min_df=5, max_size=200)


def q_brute_topk(spark, sf):
    from getml_community_spark.operators.similarity import brute_force_topk

    # float64 on BOTH sides: DuckDB list_cosine_similarity on FLOAT[]
    # computes float32, so the oracle casts embedding::DOUBLE[] and the
    # Spark side casts to array<double> (round-1 verdict #5).
    embs = _load(spark, sf, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = embs.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(embs, queries, k=5)
    return out.select(
        "query_id", "vec_id", _r(F.col("score"), 5).alias("score"), "rank"
    )


def q_embedding_near_dups(spark, sf):
    """Embedding-cosine near-duplicate pairs (exact baseline; the LSH
    variant is the scale path, rows-only below)."""
    from getml_community_spark.operators.dedup import embedding_near_dups

    embs = _load(spark, sf, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    out = embedding_near_dups(embs, "vec_id", "embedding", threshold=0.35, method="exact")
    return out.select("id_a", "id_b", _r(F.col("cosine"), 5).alias("cosine"))


def _ivf_fixed_centroids():
    """Seeded unit centroids for the IVF contract query — fixed (not
    k-means-trained) so the exact same coarse quantizer can be embedded
    as literals in the DuckDB oracle. The k-means training path is
    pytest-gated (recall vs brute force) instead."""
    import numpy as np

    rng = np.random.default_rng(7)
    c = rng.standard_normal((8, 64))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    return c.tolist()


def q_ivf_topk(spark, sf):
    """IVF approximate top-k over a FIXED seeded coarse quantizer: the
    full assign → probe → re-rank plan is deterministic and reproduced
    verbatim (centroid literals) in the DuckDB oracle."""
    from getml_community_spark.operators.similarity import ivf_topk

    embs = _load(spark, sf, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = embs.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(
        embs, queries, k=5, n_probe=4, centroids=_ivf_fixed_centroids()
    )
    return out.select(
        "query_id", "vec_id", _r(F.col("score"), 5).alias("score"),
        F.col("rank").cast("int").alias("rank"),
    )


def q_semdedup(spark, sf):
    """SemDeDup (Abbas et al. 2023) over the embeddings table with the
    same fixed seeded coarse quantizer as ivf_topk: cluster assignment,
    within-cluster near-dup detection (cosine >= 1-eps) and the
    keep-farthest-from-centroid priority rule are all replayed verbatim
    in the DuckDB oracle. eps=0.65 matches the testdata's planted
    near-dup separation (embedding_near_dups threshold 0.35)."""
    from getml_community_spark.operators.dedup import semdedup

    embs = _load(spark, sf, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    out = semdedup(embs, _ivf_fixed_centroids(), eps=0.65)
    return out.select(
        "vec_id", F.col("cell").cast("int").alias("cell"), "label"
    )


def q_multimodal_features(spark, sf):
    """Multimodal binary-column plumbing, driver-gated: documents' text
    bytes play opaque payloads; JVM metadata (byte length, magic-number
    sniff) + the Arrow-batched mapInPandas feature extractor (fake
    decoder: per-chunk byte means — deterministic, so the whole path is
    exactly reproducible in SQL; byte sums are integers → exact in
    float64 on both engines)."""
    from getml_community_spark.operators.multimodal import (
        attach_media_metadata,
        extract_image_features,
    )

    docs = _spread(
        _load(spark, sf, "documents").select(
            F.col("doc_id").cast("string").alias("media_id"),
            F.col("text").cast("binary").alias("payload"),
        )
    )
    meta = attach_media_metadata(docs).select("media_id", "n_bytes", "sniffed_mime")
    feats = extract_image_features(docs)
    out = feats.select(
        "media_id", F.posexplode("features").alias("idx", "fval")
    ).join(meta, "media_id")
    return out.select(
        F.col("media_id").cast("long").alias("doc_id"),
        F.col("idx").cast("int").alias("idx"),
        _r(F.col("fval")).alias("fval"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "sniffed_mime",
    )


def q_bmp_decode(spark, sf):
    """REAL image decode end-to-end, no external codecs: each document
    deterministically renders an 8x8 RGB BMP — pixel (i, k) =
    (n_chars + 3*i + 37*k) % 256 — through the pure-numpy encode_bmp,
    and extract_image_features(decoder='bmp') decodes it BACK through a
    true BMP parse (file/info headers, 4-byte row padding, bottom-up
    rows, BGR order). The oracle recomputes the channel means from the
    generating formula; means are i/64 rationals (2^6 denominator →
    exact 6-decimal representation, no rounding ties)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from getml_community_spark.operators.multimodal import (
        encode_bmp,
        extract_image_features,
    )

    @pandas_udf("binary")
    def _render(seed):  # pd.Series[int] -> pd.Series[bytes]
        i = np.arange(64, dtype=np.int64)[:, None]
        k = np.arange(3, dtype=np.int64)[None, :]
        out = []
        for s in seed:
            px = ((int(s) + 3 * i + 37 * k) % 256).astype(np.uint8)
            out.append(encode_bmp(px.reshape(8, 8, 3)))
        return pd.Series(out)

    docs = _spread(
        _load(spark, sf, "documents").select(
            F.col("doc_id").cast("string").alias("media_id"),
            F.col("n_chars").cast("long").alias("__seed"),
        )
    )
    payloads = docs.select("media_id", _render("__seed").alias("payload"))
    feats = extract_image_features(payloads, decoder="bmp")
    return feats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        F.element_at("features", 1).cast("int").alias("width"),
        F.element_at("features", 2).cast("int").alias("height"),
        _r(F.element_at("features", 3)).alias("mean_r"),
        _r(F.element_at("features", 4)).alias("mean_g"),
        _r(F.element_at("features", 5)).alias("mean_b"),
    )


def q_png_decode(spark, sf):
    """REAL *compressed* image decode end-to-end, no external codecs:
    each document deterministically renders an 8x8 RGB image — pixel
    (i, k) = (n_chars*7 + 5*i + 29*k) % 256 — through the pure-numpy
    encode_png with filter_mode='cycle' (rows use PNG filters
    0,1,2,3,4,0,1,2), and extract_image_features(decoder='png') decodes
    it BACK through a true PNG parse: chunk walk + CRC verify, zlib
    inflate, all-five-filter scanline unfilter. The oracle recomputes
    the channel means from the generating formula; means are x/64
    rationals (2^6 denominator → exact at 6 decimals, no rounding
    ties)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from getml_community_spark.operators.multimodal import (
        encode_png,
        extract_image_features,
    )

    @pandas_udf("binary")
    def _render(seed):  # pd.Series[int] -> pd.Series[bytes]
        i = np.arange(64, dtype=np.int64)[:, None]
        k = np.arange(3, dtype=np.int64)[None, :]
        out = []
        for s in seed:
            px = ((int(s) * 7 + 5 * i + 29 * k) % 256).astype(np.uint8)
            out.append(encode_png(px.reshape(8, 8, 3), filter_mode="cycle"))
        return pd.Series(out)

    docs = _spread(
        _load(spark, sf, "documents").select(
            F.col("doc_id").cast("string").alias("media_id"),
            F.col("n_chars").cast("long").alias("__seed"),
        )
    )
    payloads = docs.select("media_id", _render("__seed").alias("payload"))
    feats = extract_image_features(payloads, decoder="png")
    return feats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        F.element_at("features", 1).cast("int").alias("width"),
        F.element_at("features", 2).cast("int").alias("height"),
        _r(F.element_at("features", 3)).alias("mean_r"),
        _r(F.element_at("features", 4)).alias("mean_g"),
        _r(F.element_at("features", 5)).alias("mean_b"),
    )


def q_jpeg_decode(spark, sf):
    """REAL transform-coding decode end-to-end: each document renders a
    16x16 grayscale image of four constant 8x8 blocks — block k value =
    128 + ((n_chars*(k+3)) % 7 - 3) * dc_quantum — through the
    pure-numpy baseline JPEG encoder, and extract_image_features
    (decoder='jpeg') decodes it BACK through a true Huffman + dequant +
    IDCT pipeline. Constant blocks have zero AC energy and DC snapped
    to the quantization grid, so the lossy codec round-trips EXACTLY
    and the oracle recomputes the block statistics from the formula."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from getml_community_spark.operators.jpeg import dc_quantum, encode_jpeg_gray
    from getml_community_spark.operators.multimodal import extract_image_features

    q = dc_quantum(90)  # 3 at quality 90

    @pandas_udf("binary")
    def _render(seed):  # pd.Series[int] -> pd.Series[bytes]
        out = []
        for s in seed:
            blocks = np.array(
                [128 + (int(s) * (k + 3) % 7 - 3) * q for k in range(4)],
                dtype=np.int64,
            ).reshape(2, 2)
            px = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
            out.append(encode_jpeg_gray(px, quality=90))
        return pd.Series(out)

    docs = _spread(
        _load(spark, sf, "documents").select(
            F.col("doc_id").cast("string").alias("media_id"),
            F.col("n_chars").cast("long").alias("__seed"),
        )
    )
    payloads = docs.select("media_id", _render("__seed").alias("payload"))
    feats = extract_image_features(payloads, decoder="jpeg")
    return feats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        F.element_at("features", 1).cast("int").alias("width"),
        F.element_at("features", 2).cast("int").alias("height"),
        _r(F.element_at("features", 3)).alias("mean_luma"),
        F.element_at("features", 9).cast("long").alias("min_luma"),
        F.element_at("features", 10).cast("long").alias("max_luma"),
    )


def q_counter_rate_1h(spark, sf):
    """Counter-reset-aware increase/rate (PromQL semantics,
    operators/counter.py): a CUMULATIVE counter is synthesized
    deterministically from events — per user, the running sum of
    integer cents (RANGE frame so full-timestamp ties share one value)
    mod 500000, which forces resets — then counter_increase walks it
    with reset detection. All integer-valued doubles; the oracle
    replays the identical construction. Ordering discipline: the
    running sum orders by FULL-precision ts (RANGE ties exact); the
    operator's lag orders by (truncated epoch, value) — the oracle
    mirrors with floor(epoch) + counter."""
    from pyspark.sql import Window

    from getml_community_spark.operators.counter import counter_increase

    ev = _load(spark, sf, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    counter = (F.sum(cents).over(w) % F.lit(500000)).cast("double")
    staged = ev.select(
        F.col("user_id").alias("source"), "ts", counter.alias("counter")
    )
    out = counter_increase(
        staged, "1h", value_col="counter", source_col="source", ts_col="ts"
    )
    return out.select(
        F.col("source").alias("user_id"),
        "bucket_start",
        "n_samples",
        "n_resets",
        _r(F.col("increase")).alias("increase"),
        (F.floor(F.col("rate") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
            "rate"
        ),
    )


def q_hist_quantile_1h(spark, sf):
    """Mergeable histogram quantiles THROUGH the cascade: events are
    histogrammed at the 1m tier (bin = floor(value/0.25)), cascaded to
    1h by adding counts, and p50/p90/p99 extracted with the type-1
    inverted-CDF rule (smallest bin with cum >= ceil(q*total)). The
    oracle computes the same quantiles DIRECTLY from raw at 1h — green
    means the merge is exact, the property plain quantiles lack
    (operators/histquantile.py)."""
    from getml_community_spark.operators.histquantile import (
        hist_cascade,
        hist_quantiles,
        hist_rollup_from_raw,
    )

    w = 0.25
    ev = _load(spark, sf, "events")
    h1m = hist_rollup_from_raw(
        ev, "1m", value_col="value", bin_width=w,
        source_col="user_id", ts_col="ts",
    )
    out = hist_quantiles(hist_cascade(h1m, "1h"), qs=(0.5, 0.9, 0.99), bin_width=w)
    return out.select(
        F.col("source").alias("user_id"),
        "bucket_start",
        "cnt",
        _r(F.col("p50")).alias("p50"),
        _r(F.col("p90")).alias("p90"),
        _r(F.col("p99")).alias("p99"),
    )


def q_mjpeg_frames(spark, sf):
    """REAL video decode end-to-end, no ffmpeg: each document renders a
    3-frame 16x16 MJPEG AVI (RIFF container, one baseline JPEG per
    00dc chunk at 10 fps) with constant 8x8 blocks — block k of frame f
    = 128 + ((n_chars*(k+3) + 5*f) % 7 - 3) * dc_quantum — and
    sample_video_frames(decoder='mjpeg') walks the container + decodes
    every frame through the pure-numpy T.81 pipeline. Constant blocks
    round-trip EXACTLY (zero AC energy, DC on the quantization grid),
    so the oracle recomputes per-frame stats from the formula."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from getml_community_spark.operators.jpeg import dc_quantum
    from getml_community_spark.operators.mjpeg import encode_avi_mjpeg
    from getml_community_spark.operators.multimodal import sample_video_frames

    q = dc_quantum(90)  # 3 at quality 90

    @pandas_udf("binary")
    def _render(seed):  # pd.Series[int] -> pd.Series[bytes]
        out = []
        for s in seed:
            frames = []
            for f in range(3):
                blocks = np.array(
                    [
                        128 + ((int(s) * (k + 3) + 5 * f) % 7 - 3) * q
                        for k in range(4)
                    ],
                    dtype=np.int64,
                ).reshape(2, 2)
                frames.append(
                    np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
                )
            out.append(encode_avi_mjpeg(frames, fps=10))
        return pd.Series(out)

    docs = _spread(
        _load(spark, sf, "documents").select(
            F.col("doc_id").cast("string").alias("media_id"),
            F.col("n_chars").cast("long").alias("__seed"),
        )
    )
    payloads = docs.select("media_id", _render("__seed").alias("payload"))
    stats = sample_video_frames(payloads, decoder="mjpeg")
    return stats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        F.col("frame_idx"),
        F.col("frame_ms"),
        F.col("width"),
        F.col("height"),
        _r(F.col("mean_luma")).alias("mean_luma"),
        F.col("min_luma"),
        F.col("max_luma"),
    )


def q_wav_features(spark, sf):
    """REAL audio decode end-to-end, no external codecs: each document
    deterministically renders 64 PCM16 samples — s_k =
    ((n_chars*31 + 17*k) % 65536) - 32768 — through the pure-numpy
    encode_wav, and extract_audio_features(decoder='wav') decodes them
    back through a true RIFF/WAVE chunk walk. The oracle recomputes
    mean (x/64 rationals — exact at 6 decimals) and peak from the
    generating formula; rms uses the IEEE-pure floor(x*1e6+0.5)/1e6
    rounding on both sides."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from getml_community_spark.operators.multimodal import (
        encode_wav,
        extract_audio_features,
    )

    @pandas_udf("binary")
    def _render(seed):  # pd.Series[int] -> pd.Series[bytes]
        k = np.arange(64, dtype=np.int64)
        out = []
        for s in seed:
            samples = ((int(s) * 31 + 17 * k) % 65536 - 32768).astype(np.int16)
            out.append(encode_wav(samples, sample_rate=16000))
        return pd.Series(out)

    docs = _spread(
        _load(spark, sf, "documents").select(
            F.col("doc_id").cast("string").alias("media_id"),
            F.col("n_chars").cast("long").alias("__seed"),
        )
    )
    payloads = docs.select("media_id", _render("__seed").alias("payload"))
    feats = extract_audio_features(payloads, decoder="wav")
    return feats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        F.col("sample_rate").cast("int").alias("sample_rate"),
        F.col("n_samples").cast("int").alias("n_samples"),
        _r(F.col("mean")).alias("mean_sample"),
        (F.floor(F.col("rms") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("rms"),
        F.col("peak").cast("long").alias("peak"),
    )


def q_pack_stats(spark, sf):
    """Sequence packing (concat-and-chunk into 128-token training
    windows) over deterministically synthesized tokens (token k = length
    of word k — reproducible in SQL, where a piece's token-sum falls out
    of prefix string lengths). Stats are read from the REAL assembled
    chunk arrays, and ``ord_sum`` (Σ position_in_chunk × token, 1-based)
    is ORDER-SENSITIVE: a within-chunk ordering or slicing bug changes
    it even when the token multiset survives. The oracle recomputes it
    from span algebra: a piece starting 0-based at p0 in its chunk
    contributes p0·Σlen + Σ j·len(w_j)."""
    from getml_community_spark.operators.packing import pack_sequences
    from getml_community_spark.operators.textstats import word_tokens_arrow

    docs = _spread(_load(spark, sf, "documents"))
    toks = docs.select(
        "doc_id",
        "source",
        F.transform(
            word_tokens_arrow(F.col("text")), lambda w: F.length(w).cast("int")
        ).alias("tokens"),
    )
    packed = pack_sequences(toks, 128)
    zero = F.lit(0).cast("long")
    return packed.select(
        "source",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "n_docs",
        "n_tok",
        F.aggregate("tokens", zero, lambda a, x: a + x.cast("long")).alias(
            "sum_tok"
        ),
        F.aggregate(
            F.transform("tokens", lambda x, i: ((i + 1) * x).cast("long")),
            zero,
            lambda a, x: a + x,
        ).alias("ord_sum"),
    )


def q_gopher_quality(spark, sf):
    """Gopher/MassiveText document-filter rules (Rae et al. 2021 §A1.1)
    as pure JVM expressions; min_words/min_stop_hits tuned so the
    synthetic corpus actually splits into keep/drop (the paper's
    stopword floor of 2 rejects ~everything in random-word text)."""
    from getml_community_spark.operators.textstats import gopher_quality

    docs = _load(spark, sf, "documents")
    g = gopher_quality(docs, "text", "doc_id", min_words=20, min_stop_hits=1)
    return g.select(
        "doc_id",
        "n_words",
        _r(F.col("mean_word_len")).alias("mean_word_len"),
        _r(F.col("symbol_ratio")).alias("symbol_ratio"),
        _r(F.col("alpha_frac")).alias("alpha_frac"),
        "stop_hits",
        "n_lines",
        _r(F.col("bullet_frac")).alias("bullet_frac"),
        _r(F.col("ellipsis_frac")).alias("ellipsis_frac"),
        _r(F.col("dup_line_frac")).alias("dup_line_frac"),
        "keep",
    )


def q_decontamination(spark, sf):
    """Benchmark n-gram decontamination: docs with doc_id % 19 == 0 act
    as the held-out benchmark; every other doc is flagged if it shares
    any distinct word 5-gram. The benchmark shingle set is broadcast —
    corpus rows never shuffle for the membership test."""
    from getml_community_spark.operators.textstats import ngram_contamination

    docs = _load(spark, sf, "documents")
    bench = docs.where(F.col("doc_id") % 19 == 0)
    corpus = docs.where(F.col("doc_id") % 19 != 0)
    return ngram_contamination(corpus, bench, "text", "doc_id", n=5)


def q_anomaly_1h(spark, sf):
    """Rolling 24-bucket z-score anomaly flags on the hourly event-count
    tier. cnt is integer, so the explicit Σv/Σv² window sums are exact
    doubles in both engines and the z-score matches bitwise (after the
    contract's rounding)."""
    from getml_community_spark.operators.anomaly import rolling_zscore
    from getml_community_spark.operators.rollup import rollup_from_raw

    ev = _load(spark, sf, "events")
    agg = rollup_from_raw(
        ev, "1h", source_col="user_id", ts_col="ts", value_col="value"
    ).select("source", "bucket_start", "cnt")
    out = rolling_zscore(agg, "cnt", window=24, k=3.0)
    return out.select(
        F.col("source").cast("long").alias("user_id"),
        F.col("bucket_start").cast("timestamp").cast("long").alias("bucket_epoch"),
        F.col("cnt").cast("long").alias("cnt"),
        _r(F.col("zscore")).alias("zscore"),
        "is_anomaly",
    )


def q_sax_daily(spark, sf):
    """SAX symbolic words (PAA-8, alphabet-4) for each user's daily raw
    event series — Lin/Keogh symbolic representation over the tier
    engine's input. z-scores and PAA means use the IEEE-pure
    floor(x*1e6+0.5)/1e6 rounding in BOTH engines so letter assignment
    is reproducible; series order is (ts, value) so duplicate
    timestamps symbolize deterministically."""
    from getml_community_spark.operators.sax import sax_symbolize

    ev = _load(spark, sf, "events")
    out = sax_symbolize(
        ev,
        ts_col="ts",
        value_col="value",
        key_col="user_id",
        window_seconds=86400,
        n_segments=8,
        alphabet=4,
    )
    return out.select(
        F.col("key").alias("user_id"),
        "window_epoch",
        "n_points",
        "sax_word",
    )


def q_seasonal_decompose(spark, sf):
    """Classical additive decomposition (2x24 centered MA trend,
    centered per-phase seasonal, residual) of the gap-filled hourly
    count tier — the rollup -> gapfill -> decompose composition. Trend
    quotients come from integer window sums (bit-identical across
    engines); seasonal/resid round with the IEEE-pure floor idiom."""
    from getml_community_spark.operators.decompose import seasonal_decompose
    from getml_community_spark.operators.gapfill import gapfill
    from getml_community_spark.operators.rollup import rollup_from_raw

    ev = _spread(_load(spark, sf, "events"))
    agg = rollup_from_raw(
        ev, "1h", source_col="user_id", ts_col="ts", value_col="value"
    )
    # windowed=False: the decompose chain's window-over-window consumers
    # compose badly with the lag-window gap generator (gapfill docstring)
    dense = gapfill(agg, 3600, windowed=False).select("source", "bucket_start", "cnt")
    out = seasonal_decompose(
        dense,
        ts_col="bucket_start",
        value_col="cnt",
        key_col="source",
        period=24,
        bucket_seconds=3600,
    )
    f6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return out.select(
        F.col("key").cast("long").alias("user_id"),
        "bucket_epoch",
        F.col("value").cast("long").alias("cnt"),
        f6(F.col("trend")).alias("trend"),
        f6(F.col("seasonal")).alias("seasonal"),
        f6(F.col("resid")).alias("resid"),
    )


def q_line_dedup(spark, sf):
    """C4-style GLOBAL line dedup (Raffel et al. 2020: drop any line
    occurring more than once in the corpus, keep the first occurrence,
    reassemble). Each document becomes three lines — its own text, a
    per-source footer, a corpus-wide footer — so the query exercises
    cross-document winners at several granularities plus ordered
    reassembly (md5-compared)."""
    from getml_community_spark.operators.dedup import line_dedup

    docs = _load(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nsource footer "),
            F.col("source"),
            F.lit("\nshared corpus footer line"),
        ).alias("text"),
    )
    out = line_dedup(docs, "text", "doc_id", key="norm")
    return out.select(
        "doc_id", F.md5("text").alias("text_md5"), "n_lines", "n_kept"
    )


from getml_community_spark.operators.textstats import (  # noqa: E402
    REPETITION_THRESHOLDS as _REP_THRESHOLDS,
)


def q_repetition_stats(spark, sf):
    """The Gopher repetition sub-table (Rae et al. 2021 Table A1): top
    2-4-gram and duplicated 5-10-gram character fractions per document
    plus the nine-threshold keep verdict. Exact-integer quotients
    quantized at 6 decimals on both engines."""
    from getml_community_spark.operators.textstats import repetition_stats

    docs = _load(spark, sf, "documents")
    return repetition_stats(docs, "text", "doc_id")


def _repetition_oracle_sql() -> str:
    frac = (
        "floor(CASE WHEN chars > 0 THEN CAST({src} AS DOUBLE)/chars "
        "ELSE 0 END * 1e6 + 0.5)/1e6"
    )
    piv_cols = []
    sel_cols = []
    keeps = []
    for n, thr in _REP_THRESHOLDS.items():
        name = f"top_{n}gram_frac" if n <= 4 else f"dup_{n}gram_frac"
        src = "top" if n <= 4 else "dup"
        piv_cols.append(
            f"max(CASE WHEN n = {n} THEN {frac.format(src=src)} END) AS {name}"
        )
        sel_cols.append(f"coalesce({name}, 0.0) AS {name}")
        keeps.append(f"coalesce({name}, 0.0) <= {thr}")
    ns = ",".join(f"({n})" for n in _REP_THRESHOLDS)
    return f"""
        WITH base AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text),
                   '[^a-z0-9'']+'), x -> x <> '') AS ws
          FROM documents
        ), base2 AS (
          SELECT doc_id, ws,
                 length(array_to_string(ws, ' ')) AS chars
          FROM base
        ), grams AS (
          SELECT doc_id, chars, nn.n AS n,
                 array_to_string(list_slice(ws, i, i + nn.n - 1), ' ') AS gram
          FROM base2
          CROSS JOIN (VALUES {ns}) AS nn(n),
               unnest(range(1, len(ws) - nn.n + 2)) AS t(i)
          WHERE len(ws) >= nn.n
        ), counts AS (
          SELECT doc_id, chars, n, gram, count(*) AS c
          FROM grams GROUP BY 1, 2, 3, 4
        ), per_n AS (
          -- count>=2 guard on BOTH: a once-occurring n-gram is not
          -- repetition (mirrors the engine / DataTrove semantics).
          -- top gram = argmax by COUNT with the engine's deterministic
          -- (count, covered, gram) tie-break — DuckDB struct max is
          -- field-order lexicographic, same as Spark's
          SELECT doc_id, chars, n,
                 CAST(coalesce(
                   (max(CASE WHEN c >= 2 THEN struct_pack(
                        c := c, cov := c * length(gram), g := gram)
                      END)).cov, 0) AS BIGINT) AS top,
                 CAST(sum(CASE WHEN c >= 2 THEN c * length(gram)
                          ELSE 0 END) AS BIGINT) AS dup
          FROM counts GROUP BY 1, 2, 3
        ), piv AS (
          SELECT doc_id, {", ".join(piv_cols)}
          FROM per_n GROUP BY 1
        )
        SELECT d.doc_id, {", ".join(sel_cols)},
               ({" AND ".join(keeps)}) AS keep_repetition
        FROM documents d LEFT JOIN piv ON d.doc_id = piv.doc_id
    """


def q_lm_perplexity(spark, sf):
    """CCNet-style LM quality scoring (Wenzek et al. 2020): an add-0.1
    smoothed bigram model trained on the corpus itself scores each doc
    by average negative log-probability (monotone in perplexity).
    Counts are exact ints; per-bigram ln-probs quantize to micro-unit
    longs so document sums are order-independent and the result is
    reproducible cross-engine."""
    from getml_community_spark.operators.lm import bigram_lm_score

    docs = _load(spark, sf, "documents")
    # broadcast_model=True (not "auto"): a natural-language corpus's
    # bigram TYPE count is Heaps-bounded (operator docstring), and the
    # auto probe costs one extra full tokenize+aggregate job at
    # construction just to decide what is already known here. Join
    # strategy only — values unchanged (oracle-gated).
    return bigram_lm_score(docs, "text", "doc_id", k=0.1, broadcast_model=True)


def q_sessions_30m(spark, sf):
    """Gap-based sessionization (new session when a user's inter-event
    gap exceeds 30 minutes) with per-session summaries — the standard
    event-analytics primitive, all integer window arithmetic (lag flag
    + RANGE-framed running sum, so tied timestamps share a session
    deterministically)."""
    from getml_community_spark.operators.sessionize import session_summary

    ev = _load(spark, sf, "events").select(
        F.col("user_id").alias("source"), "ts"
    )
    out = session_summary(ev, 1800, key_col="source", ts_col="ts")
    return out.select(
        F.col("key").cast("long").alias("user_id"),
        F.col("session_id").cast("long").alias("session_id"),
        "t_start",
        "t_end",
        "duration_s",
        "n_events",
    )


def q_m4_6h(spark, sf):
    """M4 visual downsampling (Jugel et al. VLDB 2014): per (user,
    6-hour pixel column) keep first/min/max/last of the raw series —
    the four points that make a line rendering pixel-perfect. One
    hash-aggregate, constant per-group state; ties pinned by
    lexicographic (value, ts) ordering on both engines."""
    from getml_community_spark.operators.downsample import m4_downsample

    ev = _load(spark, sf, "events").select(
        F.col("user_id").alias("source"), "ts", "value"
    )
    out = m4_downsample(ev, 21600, ts_col="ts")
    return out.select(
        F.col("source").cast("long").alias("user_id"),
        "bucket_epoch",
        "t_first",
        _r(F.col("v_first")).alias("v_first"),
        "t_min",
        _r(F.col("v_min")).alias("v_min"),
        "t_max",
        _r(F.col("v_max")).alias("v_max"),
        "t_last",
        _r(F.col("v_last")).alias("v_last"),
        "n_points",
    )


def q_cusum_1h(spark, sf):
    """CUSUM change-point statistics (Page 1954) on the hourly count
    tier: accumulates sustained drifts a per-bucket z-score misses.
    Non-recursive prefix-sum formulation (running sum minus its running
    extremum); all accumulation in exact micro-unit integers, so s_pos/
    s_neg/alarm are bit-identical across engines."""
    from getml_community_spark.operators.changepoint import cusum
    from getml_community_spark.operators.rollup import rollup_from_raw

    ev = _load(spark, sf, "events")
    agg = rollup_from_raw(
        ev, "1h", source_col="user_id", ts_col="ts", value_col="value"
    ).select("source", "bucket_start", "cnt")
    out = cusum(agg, "cnt", key_col="source", ts_col="bucket_start",
                k=0.5, h=8.0)
    return out.select(
        F.col("key").cast("long").alias("user_id"),
        "bucket_epoch",
        F.col("value").cast("long").alias("cnt"),
        "s_pos",
        "s_neg",
        "alarm",
    )


def q_deseasonal_anomaly(spark, sf):
    """THE timeseries composition: rollup → gapfill → seasonal
    decomposition → rolling z-score on the RESIDUAL. A z-score on raw
    counts pages on every rush hour; on residuals it flags only genuine
    surprises. Residuals are quantized to exact milli-unit integers
    before the z-window so the Σv/Σv² sums are order-independent
    (bit-stable cross-engine); the z-score is scale-invariant, so
    quantization only snaps the baseline, not the semantics."""
    from getml_community_spark.operators.anomaly import rolling_zscore
    from getml_community_spark.operators.decompose import seasonal_decompose
    from getml_community_spark.operators.gapfill import gapfill
    from getml_community_spark.operators.rollup import rollup_from_raw

    ev = _spread(_load(spark, sf, "events"))
    agg = rollup_from_raw(
        ev, "1h", source_col="user_id", ts_col="ts", value_col="value"
    )
    dense = gapfill(agg, 3600, windowed=False).select("source", "bucket_start", "cnt")
    dec = seasonal_decompose(
        dense, ts_col="bucket_start", value_col="cnt", key_col="source",
        period=24, bucket_seconds=3600,
    )
    base = dec.select(
        F.col("key").alias("source"),
        F.timestamp_seconds("bucket_epoch").alias("bucket_start"),
        F.floor(F.col("resid") * F.lit(1e3) + F.lit(0.5))
        .cast("long")
        .alias("resid_m"),
    )
    out = rolling_zscore(base, "resid_m", window=24, k=3.0)
    f6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return out.select(
        F.col("source").cast("long").alias("user_id"),
        F.col("bucket_start").cast("timestamp").cast("long").alias("bucket_epoch"),
        "resid_m",
        f6(F.col("zscore")).alias("zscore"),
        "is_anomaly",
    )


def q_token_budget(spark, sf):
    """Mixture construction by TOKEN budget ("30k chars of src0, 8k of
    src1, 5k of anything else, none of src2"): documents taken in
    deterministic md5-bucket order until the running per-source token
    sum crosses the budget (crossing doc included). The running sum in
    the output makes the query ORDER-SENSITIVE: any change to the hash
    order or the window frame changes cum_chars even if membership
    survives."""
    from getml_community_spark.operators.sampling import token_budget_sample

    docs = _load(spark, sf, "documents")
    out = token_budget_sample(
        docs,
        "doc_id",
        "source",
        "n_chars",
        {"src0": 30000, "src1": 8000, "src2": 0},
        default_budget=5000,
        seed="mix",
        audit_cols=True,
    )
    return out.select(
        "doc_id",
        "source",
        F.col("sample_bucket").cast("long").alias("bucket"),
        F.col("cum_tok").cast("long").alias("cum_chars"),
    )


def q_pii_redact(spark, sf):
    """PII scan + redaction (emails / IPv4 / SSN-shaped / intl phone)
    with DETERMINISTICALLY INJECTED PII — both engines build the same
    augmented text from doc_id, so the oracle exercises the real
    regex-count and regex-redact paths (dialect-portable patterns, no
    lookarounds; DuckDB needs the 'g' flag where Spark replaces all by
    default). The redacted text is compared via md5. Counts and
    redaction build from the operator module's PII_PATTERNS (single
    source of truth) in ONE projection — one scan, no join."""
    docs = _spread(_load(spark, sf, "documents"))
    inject = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(" ssn 123-45-6789")).otherwise(
            F.lit("")
        ),
        F.when(F.col("doc_id") % 2 == 0, F.lit(" call +1-555-0142 now")).otherwise(
            F.lit("")
        ),
    )
    d2 = docs.select("doc_id", inject.alias("text"))
    # counts and redaction are both pure maps — ONE projection, one
    # scan, no join (the stats⋈redact join costs a second scan)
    from getml_community_spark.operators.pii import PII_PATTERNS

    counts = {
        name: F.size(F.regexp_extract_all(F.col("text"), F.lit(rx), F.lit(0)))
        for name, (rx, _) in PII_PATTERNS.items()
    }
    red = F.col("text")
    for _, (rx, token) in PII_PATTERNS.items():
        red = F.regexp_replace(red, rx, token)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return d2.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["ipv4"].alias("n_ipv4"),
        counts["ssn"].alias("n_ssn"),
        counts["phone"].alias("n_phone"),
        total.alias("n_pii_total"),
        F.md5(red).alias("red_md5"),
    )


def q_stratified_sample(spark, sf):
    """Deterministic stratified sampling of documents by source (md5
    prefix bucket — the engine-portable reproducible-sampling hash),
    with per-stratum rates and a default; output includes the bucket so
    the oracle checks the threshold logic, not just membership."""
    from getml_community_spark.operators.sampling import (
        sample_bucket,
        stratified_sample,
    )

    docs = _load(spark, sf, "documents")
    out = stratified_sample(
        docs,
        "doc_id",
        "source",
        {"src0": 0.9, "src1": 0.5, "src2": 0.0},
        default_rate=0.2,
        seed="r3",
    )
    return out.select(
        "doc_id",
        "source",
        sample_bucket(F.col("doc_id"), "r3").alias("bucket"),
    )


def q_lttb_6h(spark, sf):
    """LTTB perceptual downsampling (fixed-reference variant) to one
    representative point per (user, 6h bucket). Inputs are quantized —
    ts floored to whole seconds, value to 1/16ths — so every bucket
    average is an exact dyadic rational (order-independent double sums)
    and the per-bucket argmax is engine-independent."""
    from getml_community_spark.operators.downsample import lttb_downsample

    ev = _load(spark, sf, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("tsec"),
        (F.floor(F.col("value") * 16 + 0.5) / 16).alias("vq"),
    )
    out = lttb_downsample(
        ev, 21600, source_col="user_id", ts_col="tsec", value_col="vq"
    )
    return out.select(
        F.col("source").cast("long").alias("user_id"),
        F.col("bucket_epoch").cast("long").alias("bucket_epoch"),
        F.col("ts").cast("long").alias("ts"),
        _r(F.col("value")).alias("value"),
    )


def q_tfidf_topk(spark, sf):
    """Top-3 tf-idf terms per document (smoothed sklearn idf), rounded
    with the IEEE-pure floor pattern: ln() agrees between JVM and
    DuckDB to the ulp on identical rational inputs, and the floor-round
    collapses any last-ulp drift below the 6-decimal gate."""
    from getml_community_spark.operators.textstats import tfidf_topk

    docs = _load(spark, sf, "documents")
    out = tfidf_topk(docs, "text", "doc_id", k=3, min_df=2)
    return out.select(
        "doc_id",
        "term",
        (F.floor(F.col("tfidf") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
            "tfidf"
        ),
        "rank",
    )


def q_minhash_dedup(spark, sf):
    """MinHash+LSH near-dedup with exact-Jaccard verification
    (LSH-then-verify): candidates come from banded LSH, the keep/drop
    decision uses the EXACT shingle Jaccard — so the oracle is plain
    all-pairs Jaccard in DuckDB. P(miss) for a true >= 0.8 pair is
    (1-0.8^4)^32 ~ 5e-8 (see minhash_lsh_pairs_verified)."""
    from getml_community_spark.operators.dedup import minhash_lsh_dedup

    docs = _load(spark, sf, "documents")
    # max_bucket_size=None: the DuckDB oracle is UNCAPPED all-pairs
    # Jaccard — the production cap default (1000) would silently drop
    # candidates at a larger SF and fail the hash gate.
    return minhash_lsh_dedup(
        docs, "text", "doc_id", threshold=0.8, verify=True,
        max_bucket_size=None,
    ).select("doc_id", "source")


def _md5_tokens_expr():
    """Deterministic token-ID sequence derived from `text`: md5-60 word
    hash (reproducible in DuckDB SQL, unlike xxhash64) mod a 65536
    vocab. The testdata has no tokens column, so token-axis contract
    queries tokenize with this shim — the operators themselves never
    touch text (production input is the pre-tokenized table,
    input_hint)."""
    words = F.filter(
        F.split(F.lower(F.col("text")), r"[^a-z0-9]+"), lambda w: w != ""
    )
    return F.transform(
        words,
        lambda w: (
            F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long")
            % F.lit(65536)
        ).cast("int"),
    )


_MD5_TOKENS_UDF = []


def _md5_tokens_arrow():
    """Arrow-batched `_md5_tokens_expr` (optimization guide §4.2): the
    JVM form runs an interpreted per-word md5+conv chain; hashlib.md5
    in C computes the identical ids (same lowercase hex digest, same
    first-15-hex-chars → int → mod 65536 arithmetic, same [^a-z0-9]+
    split on lowered ASCII text). Used by the token-axis contract
    queries whose downstream consumes a MATERIALIZED tokens column."""
    if not _MD5_TOKENS_UDF:
        import hashlib
        import re

        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        rx = re.compile(r"[^a-z0-9]+")

        def _tok(s):
            md5, split = hashlib.md5, rx.split
            return pd.Series(
                [
                    [
                        int(md5(w.encode()).hexdigest()[:15], 16) % 65536
                        for w in split(x.lower())
                        if w
                    ]
                    for x in s
                ]
            )

        _tok.__annotations__ = {"s": pd.Series, "return": pd.Series}
        _MD5_TOKENS_UDF.append(
            pandas_udf(_tok, "array<int>").asNondeterministic()
        )
    return _MD5_TOKENS_UDF[0](F.col("text"))


def q_token_neardup(spark, sf):
    """Near-duplicate TOKEN-SEQUENCE pairs (the input_hint payload:
    tokens array<int>) via token_minhash_pairs — MinHash-LSH over
    8-token-ID shingles, candidates re-scored with the EXACT shingle
    Jaccard, so the oracle is all-pairs Jaccard over the same shingle
    sets in DuckDB (P(miss) for a true >=0.8 pair ~ 5e-8)."""
    from getml_community_spark.operators.dedup import token_minhash_pairs

    # spread HERE, not just inside the operator: the exact-rescore
    # branch re-derives shingles from this frame, and a single-file scan
    # would run that (interpreted) pipeline on one core
    docs = _spread(_load(spark, sf, "documents"))
    df = docs.select("doc_id", _md5_tokens_arrow().alias("tokens"))
    # max_bucket_size=None: uncapped — the oracle is all-pairs
    pairs = token_minhash_pairs(
        df, "tokens", "doc_id", shingle_n=8, max_bucket_size=None
    )
    # exact_jaccard is a ratio of two ints — bit-identical IEEE division
    # in both engines, no rounding needed
    return pairs.where(F.col("exact_jaccard") >= 0.8).select(
        "id_a", "id_b", "exact_jaccard"
    )


def q_token_chunks(spark, sf):
    """Per-document overlapping token windows (packing.chunk_tokens:
    size=64, stride=48, min_tokens=8) over md5-derived token IDs — the
    RAG/long-doc splitting step. Chunks render as comma-joined strings
    so the driver hash covers the full array payload; the oracle
    replays the start arithmetic and list slicing in DuckDB."""
    from getml_community_spark.operators.packing import chunk_tokens

    docs = _spread(_load(spark, sf, "documents"))
    df = docs.select("doc_id", _md5_tokens_expr().alias("tokens"))
    ch = chunk_tokens(df, size=64, stride=48, min_tokens=8)
    return ch.select(
        "doc_id",
        "chunk_id",
        "chunk_start",
        F.concat_ws(
            ",", F.transform("tokens", lambda t: t.cast("string"))
        ).alias("chunk"),
        "n_tok",
    )


def q_bm25(spark, sf):
    """Okapi BM25 scores for a fixed 3-term query over documents
    (textstats.bm25_scores). Per-term contributions are micro-quantized
    longs summed exactly, so the gate compares integers — the
    lm_perplexity discipline; the oracle replays the Robertson idf and
    the length normalization with identically-associated arithmetic."""
    from getml_community_spark.operators.textstats import bm25_scores

    docs = _load(spark, sf, "documents")
    return bm25_scores(docs, ["scan", "join", "spark"]).select(
        "doc_id", "score_micro"
    )


def q_text_normalize(spark, sf):
    """Unicode NFC normalization + control strip + whitespace collapse
    (operators/textnorm.normalize_text). The testdata text is ASCII, so
    the query injects a decomposed-é / ﬁ-ligature / superscript-2
    suffix; NFC composes the é and keeps the compatibility chars —
    DuckDB's nfc_normalize (utf8proc) replays it, and md5 over the
    result makes the gate byte-exact without shipping full texts."""
    from getml_community_spark.operators.textnorm import normalize_text

    docs = _spread(_load(spark, sf, "documents"))
    # decomposed e+combining-acute, fi-ligature, superscript-2, a
    # BEL control char and a double space: all three cleanups fire
    suffix = " cafe\u0301 \ufb01 \u00b2 x\x07y  z"
    df = docs.select(
        "doc_id", F.concat(F.col("text"), F.lit(suffix)).alias("text")
    )
    out = normalize_text(df, strip_control=True, collapse_ws=True)
    return out.select(
        "doc_id",
        F.md5(F.col("text")).alias("h"),
        F.length("text").cast("long").alias("n"),
    )


def q_simhash_pairs(spark, sf):
    """SimHash near-dup pairs, oracle-exact configuration: md5-derived
    60-bit token hashes (reproducible in SQL, unlike xxhash64) and
    max_hamming=3 where the 4x16-bit pigeonhole blocking has recall 1 —
    so the output EQUALS all-pairs hamming<=3 computed in DuckDB."""
    from getml_community_spark.operators.dedup import simhash_pairs

    docs = _load(spark, sf, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"[^a-z0-9]+"), lambda w: w != ""
    )
    docs = docs.where(F.size(toks) > 0)
    # max_bucket_size=None: the oracle is uncapped all-pairs hamming —
    # the production cap default would break the "output EQUALS
    # all-pairs" claim at larger SFs.
    out = simhash_pairs(
        docs, "text", "doc_id", max_hamming=3, token_hash="md5_60",
        max_bucket_size=None,
    )
    return out.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


def q_lsh_topk(spark, sf):
    """SRP-LSH approximate top-k: the random hyperplanes are seeded and
    embedded as literals in the DuckDB oracle, so bucketing, candidate
    set, and re-rank are all oracle-checked end to end."""
    from getml_community_spark.operators.similarity import lsh_topk

    embs = _load(spark, sf, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = embs.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = lsh_topk(embs, queries, dim=64, k=5, num_planes=10, num_tables=8)
    return out.select(
        "query_id", "vec_id", _r(F.col("score"), 5).alias("score"),
        F.col("rank").cast("int").alias("rank"),
    )


# --------------------------------------------------------------------- #
# contract functions
# --------------------------------------------------------------------- #
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tiered rollup with gap-fill over events at sf0.001."""
    return q_gapfill_1h(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver-gate query registry.

    ROTATION POLICY (the driver samples the FIRST 50 entries in dict
    order, so position IS evidence): entries are ordered by how badly
    they need a fresh driver CORRECTNESS row —
      1. queries with NO driver row yet (new this round, or rotated
         out before ever being sampled);
      2. queries whose last driver row is stale (>=1 round old) or was
         red and has since been fixed;
      3. recently-green queries, operator-core first;
      4. tail (position 51+): long-stable basics, green in multiple
         consecutive driver rounds — parked until the rotation brings
         them back.
    After each round, re-sort: freshly-parked entries move up as their
    evidence ages; anything that was rotated out moves to section 1/2.
    """
    return {
        # -- 1: no driver row yet -------------------------------------
        "token_neardup": q_token_neardup,
        "token_chunks": q_token_chunks,
        "semdedup": q_semdedup,
        "text_normalize": q_text_normalize,
        "bm25": q_bm25,
        "exactsubstr_spans": q_exactsubstr_spans,
        "range_rebucket_2h": q_range_rebucket_2h,
        "distinct_hll_1h": q_distinct_hll_1h,
        "counter_rate_1h": q_counter_rate_1h,
        "hist_quantile_1h": q_hist_quantile_1h,
        "mjpeg_frames": q_mjpeg_frames,
        "line_dedup": q_line_dedup,
        # -- 2: stale (last row r3) or freshly fixed (r4 red) ---------
        "battery_full_1h": q_battery_full_1h,
        "stratified_sample": q_stratified_sample,
        "pack_stats": q_pack_stats,
        "gopher_quality": q_gopher_quality,
        "decontamination": q_decontamination,
        "text_stats": q_text_stats,
        "vocabulary": q_vocabulary,
        "brute_topk": q_brute_topk,
        "minhash_dedup": q_minhash_dedup,
        "simhash_pairs": q_simhash_pairs,
        "lsh_topk": q_lsh_topk,
        "embedding_near_dups": q_embedding_near_dups,
        "ivf_topk": q_ivf_topk,
        # -- 3: r4-green, operator-core first -------------------------
        "rollup_1m": q_rollup_1m,
        "rollup_1h_cascade": q_rollup_1h_cascade,
        "rollup_1d_cascade": q_rollup_1d_cascade,
        "salted_rollup_1h": q_salted_rollup_1h,
        "gapfill_1h": q_gapfill_1h,
        "gapfill_interp_1h": q_gapfill_interp_1h,
        "battery_1h": q_battery_1h,
        "ewma_trend_1h": q_ewma_trend_1h,
        "two_pass_1h": q_two_pass_1h,
        "lag_rolling_1h": q_lag_rolling_1h,
        "gorilla_roundtrip_1m": q_gorilla_roundtrip_1m,
        "asof_orders_events": q_asof_orders_events,
        "asof_upper_ts": q_asof_upper_ts,
        "asof_categorical_dummy": q_asof_categorical_dummy,
        "fastprop_features": q_fastprop_features,
        "exact_dedup": q_exact_dedup,
        "multimodal_features": q_multimodal_features,
        "png_decode": q_png_decode,
        "jpeg_decode": q_jpeg_decode,
        "anomaly_1h": q_anomaly_1h,
        "sax_daily": q_sax_daily,
        "pii_redact": q_pii_redact,
        "token_budget_sample": q_token_budget,
        "seasonal_decompose": q_seasonal_decompose,
        "deseasonal_anomaly": q_deseasonal_anomaly,
        "cusum_1h": q_cusum_1h,
        "m4_6h": q_m4_6h,
        "sessions_30m": q_sessions_30m,
        "lm_perplexity": q_lm_perplexity,
        "repetition_stats": q_repetition_stats,
        # -- 4: tail — multi-round-stable basics (parked this round) --
        "lttb_6h": q_lttb_6h,
        "sliding_window": q_sliding_window,
        "bmp_decode": q_bmp_decode,
        "wav_features": q_wav_features,
        "tfidf_topk": q_tfidf_topk,
        "mode_1h": q_mode_1h,
        "asof_multikey": q_asof_multikey,
        "string_ops": q_string_ops,
        "csv_roundtrip": q_csv_roundtrip,
        "word_features": q_word_features,
        "staging_join": q_staging_join,
        "pricing_summary": q_pricing_summary,
        "concat_union": q_concat_union,
        "scalar_expressions": q_scalar_expressions,
        "subselection_slice": q_subselection_slice,
        "seasonal": q_seasonal,
        "imputation": q_imputation,
        "category_trim": q_category_trim,
        "json_extract": q_json_extract,
    }


# DuckDB shingle-set expression matching operators/dedup.py::shingles
# (word 5-grams over an ASCII [^a-z0-9]+ split, distinct, whole-doc
# shingle for short docs) — verified token-identical to the Spark side.
_SHINGLE_CTE = """
    toks AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS w
      FROM documents
    ), sh AS (
      SELECT doc_id, source,
             list_distinct([array_to_string(w[i:i+4], ' ')
                            for i in generate_series(1, greatest(len(w)-4, 1))]) AS s
      FROM toks
    )
"""


def _simhash_oracle_sql(max_hamming: int = 3) -> str:
    """All-pairs SimHash with md5-60 token hashes — the exact oracle for
    q_simhash_pairs (pigeonhole blocking has recall 1 at hamming<=3)."""
    hex_parse = (
        "list_reduce([CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)"
        " for c in str_split(substr(md5(wtok), 1, 15), '')],"
        " (a, b) -> a * 16 + b)"
    )
    votes = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) > 0"
        f" THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END)"
        for b in range(60)
    )
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    x -> x <> '')) AS wtok
          FROM documents
        ), h AS (
          SELECT doc_id, {hex_parse} AS hv FROM toks
        ), fp AS (
          SELECT doc_id, ({votes}) AS fp FROM h GROUP BY doc_id
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
        FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
    """


def _token_neardup_oracle_sql(shingle_n: int = 8, vocab: int = 65536) -> str:
    """All-pairs exact token-shingle Jaccard — the oracle for
    q_token_neardup (LSH recall argument as in minhash_dedup). The
    token derivation (md5-60 word hash mod vocab) and the shingle
    rendering (comma-joined id windows, whole-sequence shingle for
    short docs) mirror the Spark side verbatim."""
    hex_parse = (
        "list_reduce([CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)"
        " for c in str_split(substr(md5(wtok), 1, 15), '')],"
        " (a, b) -> a * 16 + b)"
    )
    n1 = shingle_n - 1
    jac = (
        "CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)"
        " / CAST(len(list_distinct(a.s || b.s)) AS DOUBLE)"
    )
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 list_transform(
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               x -> x <> ''),
                   wtok -> {hex_parse} % {vocab}) AS t
          FROM documents
        ), sh AS (
          SELECT doc_id,
                 list_distinct([array_to_string(t[i:i+{n1}], ',')
                                for i in generate_series(1, greatest(len(t)-{n1}, 1))]) AS s
          FROM toks
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               {jac} AS exact_jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE {jac} >= 0.8
    """


def _token_chunks_oracle_sql(
    size: int = 64, stride: int = 48, min_tokens: int = 8, vocab: int = 65536
) -> str:
    """Replays chunk_tokens' start arithmetic (starts 0, stride, ...
    while inside the doc; first chunk always kept; short tails dropped)
    over the same md5-derived token IDs with DuckDB list slicing."""
    hex_parse = (
        "list_reduce([CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)"
        " for c in str_split(substr(md5(wtok), 1, 15), '')],"
        " (a, b) -> a * 16 + b)"
    )
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 list_transform(
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               x -> x <> ''),
                   wtok -> {hex_parse} % {vocab}) AS t
          FROM documents
        ), ch AS (
          SELECT doc_id, t,
                 unnest(generate_series(0, (len(t)-1) // {stride})) AS cid
          FROM toks WHERE len(t) > 0
        ), sl AS (
          SELECT doc_id,
                 CAST(cid AS BIGINT) AS chunk_id,
                 CAST(cid * {stride} AS BIGINT) AS chunk_start,
                 t[cid*{stride}+1 : cid*{stride}+{size}] AS c
          FROM ch
        )
        SELECT doc_id, chunk_id, chunk_start,
               array_to_string(c, ',') AS chunk,
               CAST(len(c) AS BIGINT) AS n_tok
        FROM sl
        WHERE chunk_id = 0 OR len(c) >= {min_tokens}
    """


def _vec_lit(v) -> str:
    return "[" + ",".join(repr(float(x)) for x in v) + "]::DOUBLE[]"


def _lsh_topk_oracle_sql(
    dim: int = 64, k: int = 5, num_planes: int = 10, num_tables: int = 8,
    seed: int = 42,
) -> str:
    """SRP-LSH top-k with the SAME seeded hyperplanes as lsh_topk,
    embedded as literals — bucketing + candidates + re-rank in SQL."""
    from getml_community_spark.operators.similarity import _random_planes

    rows = []
    for t in range(num_tables):
        for i, p in enumerate(_random_planes(dim, num_planes, seed + 1000 * t)):
            rows.append(f"({t}, {i}, {_vec_lit(p)})")
    values = ",\n              ".join(rows)
    return f"""
        WITH planes(tbl, i, p) AS (VALUES {values}),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
              FROM embeddings ORDER BY vec_id LIMIT 5),
        cb AS (
          SELECT c.vec_id, pl.tbl,
                 sum(CASE WHEN list_dot_product(c.v, pl.p) > 0
                     THEN (CAST(1 AS BIGINT) << pl.i) ELSE 0 END) AS bucket
          FROM c CROSS JOIN planes pl GROUP BY 1, 2
        ),
        qb AS (
          SELECT q.query_id, pl.tbl,
                 sum(CASE WHEN list_dot_product(q.v, pl.p) > 0
                     THEN (CAST(1 AS BIGINT) << pl.i) ELSE 0 END) AS bucket
          FROM q CROSS JOIN planes pl GROUP BY 1, 2
        ),
        cand AS (
          SELECT DISTINCT qb.query_id, cb.vec_id
          FROM cb JOIN qb ON cb.tbl = qb.tbl AND cb.bucket = qb.bucket
        ),
        scored AS (
          SELECT cand.query_id, cand.vec_id,
                 list_cosine_similarity(c.v, q.v) AS score
          FROM cand JOIN c ON c.vec_id = cand.vec_id
                    JOIN q ON q.query_id = cand.query_id
        )
        SELECT query_id, vec_id, round(score, 5) AS score,
               CAST(row_number() OVER (
                 PARTITION BY query_id ORDER BY score DESC, vec_id ASC
               ) AS INT) AS rank
        FROM scored QUALIFY rank <= {k}
    """


def _ivf_topk_oracle_sql(k: int = 5, n_probe: int = 4) -> str:
    """IVF top-k with the fixed seeded centroids embedded as literals:
    nearest-cell assignment (max cosine, max-cell tiebreak to mirror
    Spark's greatest(struct)), n_probe probing, exact re-rank."""
    cent = _ivf_fixed_centroids()
    values = ",\n              ".join(
        f"({c}, {_vec_lit(v)})" for c, v in enumerate(cent)
    )
    return f"""
        WITH cent(cell, p) AS (VALUES {values}),
        corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
              FROM embeddings ORDER BY vec_id LIMIT 5),
        ca AS (
          SELECT vec_id, cell FROM (
            SELECT corpus.vec_id, cent.cell,
                   row_number() OVER (
                     PARTITION BY corpus.vec_id
                     ORDER BY list_cosine_similarity(corpus.v, cent.p) DESC,
                              cent.cell DESC
                   ) AS rn
            FROM corpus CROSS JOIN cent
          ) WHERE rn = 1
        ),
        qp AS (
          SELECT query_id, cell FROM (
            SELECT q.query_id, cent.cell,
                   row_number() OVER (
                     PARTITION BY q.query_id
                     ORDER BY list_cosine_similarity(q.v, cent.p) DESC,
                              cent.cell DESC
                   ) AS rn
            FROM q CROSS JOIN cent
          ) WHERE rn <= {n_probe}
        ),
        cand AS (
          SELECT qp.query_id, ca.vec_id FROM ca JOIN qp ON ca.cell = qp.cell
        ),
        scored AS (
          SELECT cand.query_id, cand.vec_id,
                 list_cosine_similarity(corpus.v, q.v) AS score
          FROM cand JOIN corpus ON corpus.vec_id = cand.vec_id
                    JOIN q ON q.query_id = cand.query_id
        )
        SELECT query_id, vec_id, round(score, 5) AS score,
               CAST(row_number() OVER (
                 PARTITION BY query_id ORDER BY score DESC, vec_id ASC
               ) AS INT) AS rank
        FROM scored QUALIFY rank <= {k}
    """


def _bm25_oracle_sql(k1: float = 1.2, b: float = 0.75) -> str:
    """BM25 with identically-associated double arithmetic: constants
    are rendered with repr() of the SAME python-computed values the
    Spark side uses (k1+1.0, 1.0-b), every * and / associates left to
    right exactly as the Column expression does, and the micro-quantize
    happens before the (exact, integer) cross-term sum."""
    terms = "('scan','join','spark')"
    idf = (
        "ln(1.0 + (CAST(st.n AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5)"
        " / (CAST(dfq.df AS DOUBLE) + 0.5))"
    )
    denom = (
        f"CAST(tf.tf AS DOUBLE) + {k1!r} * ({1.0 - b!r}"
        f" + {b!r} * CAST(dl.dl AS DOUBLE)"
        " / (CAST(st.sumdl AS DOUBLE) / CAST(st.n AS DOUBLE)))"
    )
    s = f"{idf} * (CAST(tf.tf AS DOUBLE) * {k1 + 1.0!r}) / ({denom})"
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                             x -> x <> '') AS w
          FROM documents
        ), dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM toks),
        st AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
        words AS (SELECT doc_id, unnest(w) AS term FROM toks),
        tf AS (
          SELECT doc_id, term, count(*) AS tf FROM words
          WHERE term IN {terms} GROUP BY 1, 2
        ),
        dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        scored AS (
          SELECT tf.doc_id,
                 CAST(floor(({s}) * 1000000.0 + 0.5) AS BIGINT) AS m
          FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id)
          CROSS JOIN st
        )
        SELECT doc_id, CAST(sum(m) AS BIGINT) AS score_micro
        FROM scored GROUP BY 1
    """


def _text_normalize_oracle_sql() -> str:
    """nfc_normalize (utf8proc) + the same control/whitespace regexes
    (Java ∩ RE2, 'g' flag for Spark's replace-all default); the
    injected suffix is built from chr() so no raw control bytes or
    combining characters sit in the SQL text."""
    suffix = (
        "' cafe' || chr(769) || ' ' || chr(64257) || ' ' || chr(178)"
        " || ' x' || chr(7) || 'y  z'"
    )
    return f"""
        SELECT doc_id, md5(t2) AS h, CAST(length(t2) AS BIGINT) AS n
        FROM (
          SELECT doc_id,
                 trim(regexp_replace(
                   regexp_replace(
                     nfc_normalize(text || {suffix}),
                     '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
                   '[ \\t\\n\\r]+', ' ', 'g')) AS t2
          FROM documents
        )
    """


def _semdedup_oracle_sql(eps: float = 0.65) -> str:
    """Assignment + within-cluster greedy dedup with the seeded
    centroid literals; the threshold is rendered as (1.0 - eps) so both
    engines compare against the identical IEEE double."""
    cent = _ivf_fixed_centroids()
    values = ",\n              ".join(
        f"({c}, {_vec_lit(v)})" for c, v in enumerate(cent)
    )
    return f"""
        WITH cent(cell, p) AS (VALUES {values}),
        corpus AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                   FROM embeddings),
        ca AS (
          SELECT vec_id, label, v, cell, sim FROM (
            SELECT corpus.vec_id, corpus.label, corpus.v, cent.cell,
                   list_cosine_similarity(corpus.v, cent.p) AS sim,
                   row_number() OVER (
                     PARTITION BY corpus.vec_id
                     ORDER BY list_cosine_similarity(corpus.v, cent.p) DESC,
                              cent.cell DESC
                   ) AS rn
            FROM corpus CROSS JOIN cent
          ) WHERE rn = 1
        ),
        losers AS (
          SELECT DISTINCT a.vec_id
          FROM ca a JOIN ca b
            ON a.cell = b.cell AND a.vec_id <> b.vec_id
          WHERE list_cosine_similarity(a.v, b.v) >= (1.0 - {eps!r})
            AND (b.sim < a.sim OR (b.sim = a.sim AND b.vec_id < a.vec_id))
        )
        SELECT ca.vec_id, CAST(ca.cell AS INT) AS cell, ca.label
        FROM ca WHERE ca.vec_id NOT IN (SELECT vec_id FROM losers)
    """


def oracle_sql() -> dict[str, str]:
    core_rollup = """
    SELECT user_id,
           date_trunc('{unit}', ts) AS bucket_start,
           count(value) AS cnt,
           round(sum(value), 6) AS sum_value,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value,
           round(sum(value) / {secs}.0, 6) AS rate
    FROM events GROUP BY 1, 2
    """
    return {
        "exactsubstr_spans": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS w
              FROM documents
            ), winlists AS (
              SELECT doc_id,
                     [{'pos': i - 1, 'gram': array_to_string(w[i:i+9], ',')}
                      for i in generate_series(1, len(w) - 9)] AS wl
              FROM toks WHERE len(w) >= 10
            ), wins AS (
              SELECT doc_id, u.pos AS pos, u.gram AS gram
              FROM (SELECT doc_id, unnest(wl) AS u FROM winlists)
            ), c AS (
              SELECT gram, count(*) AS cnt FROM wins GROUP BY 1
            ), dup AS (
              SELECT w.doc_id, w.pos
              FROM wins w JOIN c USING (gram) WHERE c.cnt >= 2
            ), runs AS (
              SELECT doc_id, pos,
                     pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                       AS run
              FROM dup
            )
            SELECT doc_id,
                   CAST(min(pos) AS BIGINT) AS span_start,
                   CAST(max(pos) + 10 AS BIGINT) AS span_end
            FROM runs GROUP BY doc_id, run
        """,
        "range_rebucket_2h": f"""
            SELECT user_id,
                   CAST(to_timestamp(CAST(floor(epoch(ts) / 7200) * 7200 AS BIGINT))
                        AS TIMESTAMP) AS bucket_start,
                   count(value) AS cnt,
                   round(sum(value), 6) AS sum_value,
                   round(min(value), 6) AS min_value,
                   round(max(value), 6) AS max_value,
                   floor(sum(value) / 7200.0 * 1e6 + 0.5) / 1e6 AS rate
            FROM events
            WHERE epoch(ts) >= {_RANGE_T0} AND epoch(ts) < {_RANGE_T1}
            GROUP BY 1, 2
        """,
        "distinct_hll_1h": """
            SELECT user_id, date_trunc('hour', ts) AS bucket_start,
                   CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        """,
        "rollup_1m": core_rollup.format(unit="minute", secs=60),
        "rollup_1h_cascade": core_rollup.format(unit="hour", secs=3600),
        "rollup_1d_cascade": """
            SELECT user_id, date_trunc('day', ts) AS bucket_start,
                   count(value) AS cnt,
                   round(sum(value), 6) AS sum_value,
                   floor(round(sum(value), 6) / 86400.0 * 1e6 + 0.5) / 1e6 AS rate
            FROM events GROUP BY 1, 2
        """,
        "salted_rollup_1h": """
            SELECT user_id, date_trunc('hour', ts) AS bucket_start,
                   count(value) AS cnt, round(sum(value), 6) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "gapfill_1h": """
            WITH agg AS (
              SELECT user_id, date_trunc('hour', ts) AS b,
                     count(value) AS cnt, sum(value) AS sv
              FROM events GROUP BY 1, 2
            ), bounds AS (
              SELECT user_id, min(b) AS lo, max(b) AS hi FROM agg GROUP BY 1
            ), spine AS (
              SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_start
              FROM bounds
            )
            SELECT s.user_id, s.bucket_start,
                   coalesce(a.cnt, 0) AS cnt,
                   round(coalesce(a.sv, 0), 6) AS sum_value,
                   round(coalesce(a.sv, 0) / 3600.0, 6) AS rate
            FROM spine s LEFT JOIN agg a
              ON a.user_id = s.user_id AND a.b = s.bucket_start
        """,
        "gapfill_interp_1h": """
            WITH agg AS (
              SELECT user_id, date_trunc('hour', ts) AS b,
                     count(value) AS cnt, sum(value) / 3600.0 AS rate
              FROM events GROUP BY 1, 2
            ), bounds AS (
              SELECT user_id, min(b) AS lo, max(b) AS hi FROM agg GROUP BY 1
            ), spine AS (
              SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_start
              FROM bounds
            ), dense AS (
              SELECT s.user_id, s.bucket_start,
                     coalesce(a.cnt, 0) AS cnt,
                     a.rate AS v,
                     epoch(s.bucket_start) AS t
              FROM spine s LEFT JOIN agg a
                ON a.user_id = s.user_id AND a.b = s.bucket_start
            ), w AS (
              SELECT *,
                last_value(v IGNORE NULLS) OVER
                  (PARTITION BY user_id ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
                  (PARTITION BY user_id ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
                first_value(v IGNORE NULLS) OVER
                  (PARTITION BY user_id ORDER BY t
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
                  (PARTITION BY user_id ORDER BY t
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
              FROM dense
            )
            SELECT user_id, bucket_start, CAST(cnt AS BIGINT) AS cnt,
                   floor((CASE WHEN v IS NOT NULL THEN v
                          WHEN pv IS NULL THEN nv
                          WHEN nv IS NULL THEN pv
                          ELSE pv + (nv - pv) * (t - pt) / (nt - pt) END) * 1e6 + 0.5001) / 1e6 AS rate
            FROM w
        """,
        "json_extract": """
            SELECT event_type,
                   count(CAST(json_extract(props, '$.k') AS INT)) AS n,
                   CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
                   round(avg(CAST(json_extract(props, '$.k') AS INT)), 6) AS avg_k,
                   CAST(min(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS min_k,
                   CAST(max(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "battery_1h": """
            SELECT user_id,
                   date_trunc('hour', ts) AS bucket_start,
                   count(value) AS cnt,
                   round(coalesce(sum(value), 0), 6) AS sum,
                   round(avg(value), 6) AS avg,
                   round(min(value), 6) AS min,
                   round(max(value), 6) AS max,
                   round(median(value), 6) AS median,
                   round(quantile_cont(value, 0.25), 6) AS q25,
                   round(quantile_cont(value, 0.75), 6) AS q75,
                   round(quantile_cont(value, 0.90), 6) AS q90,
                   round(var_pop(value), 6) AS var_pop,
                   round(stddev_pop(value), 6) AS stddev_pop,
                   cast(count(DISTINCT value) AS double) AS count_distinct,
                   round(arg_min(value, ts), 6) AS first,
                   round(arg_max(value, ts), 6) AS last,
                   round(CASE WHEN count(ts) <= 1 THEN 0.0
                         ELSE (max(epoch(ts)) - min(epoch(ts))) / (count(ts) - 1)
                         END, 6) AS avg_time_between,
                   round(sum(exp(ln(0.5) * (epoch(date_trunc('hour', ts)) + 3600 - epoch(ts)) / 3600.0) * value)
                         / sum(exp(ln(0.5) * (epoch(date_trunc('hour', ts)) + 3600 - epoch(ts)) / 3600.0)), 6)
                         AS ewma_1h,
                   -- + 0.0 normalizes DuckDB's signed zero (round(-1e-12, 6)
                   -- = -0.0) to Spark's BigDecimal +0.0 on subtraction-capable
                   -- metrics (r4 driver-gate byte class)
                   round(CASE WHEN var_pop(epoch(date_trunc('hour', ts)) + 3600 - epoch(ts)) = 0
                         THEN avg(value)
                         ELSE avg(value)
                              - avg(epoch(date_trunc('hour', ts)) + 3600 - epoch(ts))
                              * (covar_pop(epoch(date_trunc('hour', ts)) + 3600 - epoch(ts), value)
                                 / var_pop(epoch(date_trunc('hour', ts)) + 3600 - epoch(ts)))
                         END, 6) + 0.0 AS trend,
                   round(CASE WHEN avg(value) = 0 THEN NULL
                         ELSE var_pop(value) / avg(value) END, 6) + 0.0 AS variation_coefficient
            FROM events GROUP BY 1, 2
        """,
        "battery_full_1h": _battery_full_oracle_sql(),
        "ewma_trend_1h": """
            WITH base AS (
              SELECT user_id, date_trunc('hour', ts) AS bucket_start,
                     epoch(date_trunc('hour', ts)) + 3600 - epoch(ts) AS dt,
                     value AS v,
                     exp(ln(0.5) * (epoch(date_trunc('hour', ts)) + 3600 - epoch(ts)) / 3600.0) AS w
              FROM events
            ), m AS (
              SELECT user_id, bucket_start,
                     sum(w) AS sw,
                     sum(w * dt) / sum(w) AS mx,
                     sum(w * v) / sum(w) AS my,
                     var_pop(dt) AS vx
              FROM base GROUP BY 1, 2
            ), c AS (
              SELECT b.user_id, b.bucket_start,
                     sum(b.w * (b.dt - m.mx) * (b.dt - m.mx)) AS xx,
                     sum(b.w * (b.dt - m.mx) * (b.v - m.my)) AS xy,
                     any_value(m.sw) AS sw, any_value(m.mx) AS mx,
                     any_value(m.my) AS my, any_value(m.vx) AS vx
              FROM base b JOIN m USING (user_id, bucket_start)
              GROUP BY 1, 2
            )
            SELECT user_id, bucket_start,
                   -- + 0.0: signed-zero normalization (see battery_1h note)
                   round(CASE WHEN sw IS NULL OR sw = 0 THEN NULL
                         WHEN xx = 0 OR vx = 0 THEN my
                         ELSE my - mx * (xy / xx) END, 6) + 0.0 AS ewma_trend_1h
            FROM c
        """,
        "two_pass_1h": """
            WITH s AS (
              SELECT user_id, date_trunc('hour', ts) AS bucket_start,
                     max(value) AS mx, min(value) AS mn, avg(value) AS mean
              FROM events GROUP BY 1, 2
            )
            -- DuckDB sum(CASE...) returns HUGEINT (int128) which hashes
            -- differently from Spark's BIGINT: cast (round-1 verdict #3)
            SELECT e.user_id, date_trunc('hour', e.ts) AS bucket_start,
                   CAST(sum(CASE WHEN e.value = s.mx THEN 1 ELSE 0 END) AS BIGINT) AS num_max,
                   CAST(sum(CASE WHEN e.value = s.mn THEN 1 ELSE 0 END) AS BIGINT) AS num_min,
                   CAST(sum(CASE WHEN e.value > s.mean THEN 1 ELSE 0 END) AS BIGINT) AS count_above_mean,
                   CAST(sum(CASE WHEN e.value < s.mean THEN 1 ELSE 0 END) AS BIGINT) AS count_below_mean
            FROM events e JOIN s
              ON s.user_id = e.user_id AND s.bucket_start = date_trunc('hour', e.ts)
            GROUP BY 1, 2
        """,
        "lag_rolling_1h": """
            WITH agg AS (
              SELECT user_id, date_trunc('hour', ts) AS b,
                     count(value) AS cnt
              FROM events GROUP BY 1, 2
            ), bounds AS (
              SELECT user_id, min(b) AS lo, max(b) AS hi FROM agg GROUP BY 1
            ), spine AS (
              SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_start
              FROM bounds
            ), dense AS (
              SELECT s.user_id, s.bucket_start, coalesce(a.cnt, 0) AS cnt
              FROM spine s LEFT JOIN agg a
                ON a.user_id = s.user_id AND a.b = s.bucket_start
            )
            SELECT user_id, bucket_start, cnt,
                   lag(cnt, 1) OVER w AS cnt_lag1,
                   lag(cnt, 2) OVER w AS cnt_lag2,
                   CAST(sum(cnt) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll3_sum,
                   round(avg(cnt) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS roll3_avg
            FROM dense
            WINDOW w AS (PARTITION BY user_id ORDER BY bucket_start)
        """,
        "sliding_window": """
            SELECT event_id,
                   count(value) OVER w AS w_count,
                   round(sum(value) OVER w, 6) AS w_sum,
                   round(avg(value) OVER w, 6) AS w_avg,
                   round(min(value) OVER w, 6) AS w_min,
                   round(max(value) OVER w, 6) AS w_max
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW)
        """,
        "mode_1h": """
            SELECT user_id, bucket_start, round(value, 6) AS mode FROM (
              SELECT user_id, date_trunc('hour', ts) AS bucket_start, value,
                     count(*) AS c
              FROM events GROUP BY 1, 2, 3
            )
            QUALIFY row_number() OVER (
              PARTITION BY user_id, bucket_start ORDER BY c DESC, value DESC
            ) = 1
        """,
        "gorilla_roundtrip_1m": """
            SELECT cast(user_id AS varchar) AS user_id,
                   cast(epoch(date_trunc('minute', ts)) AS bigint) AS bucket_epoch,
                   round(sum(value) / 60.0, 6) AS rate
            FROM events GROUP BY 1, 2
        """,
        "asof_categorical_dummy": """
            WITH dummy AS (
              SELECT o.o_orderkey,
                     count(CASE WHEN e.user_id IS NULL THEN NULL WHEN e.event_type = 'click' THEN 1.0 ELSE 0.0 END) AS click_count,
                     round(coalesce(sum(CASE WHEN e.user_id IS NULL THEN NULL WHEN e.event_type = 'click' THEN 1.0 ELSE 0.0 END), 0.0), 6) AS click_sum,
                     round(avg(CASE WHEN e.user_id IS NULL THEN NULL WHEN e.event_type = 'click' THEN 1.0 ELSE 0.0 END), 6) AS click_avg,
                     round(avg(o.o_totalprice - 1000.0 * e.value), 6) + 0.0 AS du_avg,
                     round(min(o.o_totalprice - 1000.0 * e.value), 6) + 0.0 AS du_min,
                     round(max(o.o_totalprice - 1000.0 * e.value), 6) + 0.0 AS du_max
              FROM orders o LEFT JOIN events e
                ON e.user_id = o.o_custkey
               AND epoch(e.ts) <= {pop} - 3600
               AND epoch(e.ts) >  {pop} - 604800
              GROUP BY 1
            ) SELECT * FROM dummy
        """.format(pop=_POP_EPOCH_SQL),
        "word_features": """
            WITH words AS (
              SELECT source, unnest(list_distinct(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9'']+'),
                       x -> x <> ''))) AS word
              FROM documents
            ), vocab AS (
              SELECT word FROM words GROUP BY word
              ORDER BY count(*) DESC, word ASC LIMIT 10
            )
            SELECT source, word, count(*) AS n_docs
            FROM words WHERE word IN (SELECT word FROM vocab)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "asof_upper_ts": """
            SELECT o.o_orderkey,
                   count(e.value) AS cnt,
                   round(sum(e.value), 6) AS sum_value
            FROM orders o JOIN (
              SELECT user_id, ts, value,
                     CASE WHEN event_id % 7 <> 0
                          THEN ts + INTERVAL 3 DAY END AS valid_until
              FROM events
            ) e
              ON e.user_id = o.o_custkey
             AND epoch(e.ts) <= {pop}
             AND (e.valid_until IS NULL OR epoch(e.valid_until) > {pop})
            GROUP BY 1
        """.format(pop=_POP_EPOCH_SQL),
        "asof_orders_events": """
            SELECT o.o_orderkey,
                   count(e.value) AS cnt,
                   round(coalesce(sum(e.value), 0.0), 6) AS sum,
                   round(avg(e.value), 6) AS avg,
                   round(min(e.value), 6) AS min,
                   round(max(e.value), 6) AS max,
                   round(median(e.value), 6) AS median,
                   round(quantile_cont(e.value, 0.90), 6) AS q90,
                   round(stddev_pop(e.value), 6) AS stddev_pop,
                   round(arg_min(e.value, epoch(e.ts)), 6) AS first,
                   round(arg_max(e.value, epoch(e.ts)), 6) AS last
            FROM orders o LEFT JOIN events e
              ON e.user_id = o.o_custkey
             AND epoch(e.ts) <= {pop} - 3600
             AND epoch(e.ts) >  {pop} - 604800
            GROUP BY 1
        """.format(pop=_POP_EPOCH_SQL),
        "staging_join": """
            SELECT c.c_mktsegment, count(*) AS n_orders,
                   round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6) AS revenue
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1 ORDER BY 1
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 6) AS sum_qty,
                   round(sum(l_extendedprice), 6) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_extendedprice), 6) AS avg_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "concat_union": """
            SELECT event_type, count(*) AS n, round(sum(value), 6) AS sum_value
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "scalar_expressions": """
            SELECT o_orderkey,
                   round(abs(-o_totalprice), 6) AS abs_p,
                   cast(ceil(o_totalprice) AS double) AS ceil_p,
                   cast(floor(o_totalprice) AS double) AS floor_p,
                   round(pow(o_totalprice, 0.5), 6) AS pow_half,
                   round(sqrt(o_totalprice), 6) AS sqrt_p,
                   round(ln(o_totalprice), 6) AS ln_p,
                   round(exp(o_totalprice / 100000.0), 6) AS exp_scaled,
                   round(sin(o_totalprice / 1000.0), 6) AS sin_p,
                   round(fmod(o_totalprice, 7.0), 6) AS fmod7,
                   cast(year(o_orderdate) AS int) AS yr,
                   cast(month(o_orderdate) AS int) AS mon,
                   cast(day(o_orderdate) AS int) AS dom,
                   cast(hour(o_orderdate) AS int) AS hr,
                   cast(dayofweek(o_orderdate) AS int) AS dow,
                   cast(dayofyear(o_orderdate) AS int) AS doy,
                   CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END AS gt_100k,
                   CASE WHEN o_totalprice > 100000.0 THEN 'big' ELSE 'small' END AS bucketed
            FROM orders
        """,
        "subselection_slice": """
            SELECT o_orderkey, o_custkey, round(o_totalprice, 6) AS o_totalprice
            FROM orders ORDER BY o_orderkey LIMIT 100 OFFSET 100
        """,
        "seasonal": """
            SELECT cast(hour(ts) AS varchar) AS s_hour,
                   cast(dayofweek(ts) AS varchar) AS s_weekday,
                   count(*) AS n, round(avg(value), 6) AS avg_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "imputation": """
            WITH nulled AS (
              SELECT event_id,
                     CASE WHEN value > 1.5 THEN NULL ELSE value END AS v
              FROM events
            ), m AS (SELECT avg(v) AS mu FROM nulled)
            SELECT event_id,
                   round(coalesce(v, (SELECT mu FROM m)), 6) AS v_imputed,
                   CASE WHEN v IS NULL THEN 1 ELSE 0 END AS was_null
            FROM nulled
        """,
        "category_trim": """
            WITH top2 AS (
              SELECT event_type FROM events GROUP BY 1
              ORDER BY count(*) DESC, event_type ASC LIMIT 2
            )
            SELECT CASE WHEN e.event_type IN (SELECT event_type FROM top2)
                        THEN e.event_type ELSE 'trimmed' END AS event_type,
                   count(*) AS n
            FROM events e GROUP BY 1 ORDER BY 1
        """,
        "exact_dedup": """
            SELECT min(doc_id) AS doc_id, count(*) AS dup_count
            FROM (SELECT doc_id,
                         lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
                  FROM documents)
            GROUP BY norm
        """,
        "bmp_decode": """
            -- channel means of the deterministically-rendered 8x8 BMP,
            -- recomputed from the generating formula (the Spark side
            -- encodes + REALLY decodes the BMP byte stream)
            SELECT doc_id,
                   8 AS width, 8 AS height,
                   round(list_aggregate(list_transform(range(0, 64),
                     i -> CAST((n_chars + 3*i) % 256 AS DOUBLE)), 'avg'), 6) AS mean_r,
                   round(list_aggregate(list_transform(range(0, 64),
                     i -> CAST((n_chars + 3*i + 37) % 256 AS DOUBLE)), 'avg'), 6) AS mean_g,
                   round(list_aggregate(list_transform(range(0, 64),
                     i -> CAST((n_chars + 3*i + 74) % 256 AS DOUBLE)), 'avg'), 6) AS mean_b
            FROM documents
        """,
        "png_decode": """
            -- channel means of the deterministically-rendered 8x8 PNG
            -- (filters cycle 0..4), recomputed from the generating
            -- formula (the Spark side deflate-encodes + REALLY inflates
            -- and unfilters the PNG byte stream)
            SELECT doc_id,
                   8 AS width, 8 AS height,
                   round(list_aggregate(list_transform(range(0, 64),
                     i -> CAST((n_chars*7 + 5*i) % 256 AS DOUBLE)), 'avg'), 6) AS mean_r,
                   round(list_aggregate(list_transform(range(0, 64),
                     i -> CAST((n_chars*7 + 5*i + 29) % 256 AS DOUBLE)), 'avg'), 6) AS mean_g,
                   round(list_aggregate(list_transform(range(0, 64),
                     i -> CAST((n_chars*7 + 5*i + 58) % 256 AS DOUBLE)), 'avg'), 6) AS mean_b
            FROM documents
        """,
        "jpeg_decode": """
            -- constant-8x8-block grayscale JPEG: DC snapped to the
            -- quality-90 quantization grid (quantum 3), zero AC energy
            -- -> the lossy codec round-trips EXACTLY; block stats
            -- recomputed from the generating formula. mean is x/4 of
            -- integers (exact at 6 decimals).
            SELECT doc_id,
                   16 AS width, 16 AS height,
                   round(list_aggregate(list_transform(range(0, 4),
                     k -> CAST(128 + ((n_chars*(k+3)) % 7 - 3) * 3 AS DOUBLE)),
                     'avg'), 6) AS mean_luma,
                   CAST(list_aggregate(list_transform(range(0, 4),
                     k -> 128 + ((n_chars*(k+3)) % 7 - 3) * 3),
                     'min') AS BIGINT) AS min_luma,
                   CAST(list_aggregate(list_transform(range(0, 4),
                     k -> 128 + ((n_chars*(k+3)) % 7 - 3) * 3),
                     'max') AS BIGINT) AS max_luma
            FROM documents
        """,
        "counter_rate_1h": """
            -- synthesize the cumulative counter exactly like the Spark
            -- side (integer cents, RANGE cumsum over full-precision ts,
            -- mod 500000), then PromQL reset walk: delta < 0 is a
            -- reset contributing the full post-reset value; the first
            -- sample of a source contributes nothing. Lag ordering
            -- mirrors the operator: (floor(epoch), counter).
            WITH c AS (
              SELECT user_id, ts,
                     CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                            OVER (PARTITION BY user_id ORDER BY ts
                                  RANGE UNBOUNDED PRECEDING) % 500000
                          AS DOUBLE) AS counter
              FROM events
            ), l AS (
              SELECT user_id, ts, counter,
                     lag(counter) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(floor(epoch(ts)) AS BIGINT), counter
                     ) AS prev
              FROM c
            )
            SELECT user_id, date_trunc('hour', ts) AS bucket_start,
                   count(*) AS n_samples,
                   CAST(sum(CASE WHEN prev IS NOT NULL AND counter < prev
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
                   round(coalesce(sum(
                     CASE WHEN prev IS NULL THEN NULL
                          WHEN counter >= prev THEN counter - prev
                          ELSE counter END), 0.0), 6) + 0.0 AS increase,
                   floor(coalesce(sum(
                     CASE WHEN prev IS NULL THEN NULL
                          WHEN counter >= prev THEN counter - prev
                          ELSE counter END), 0.0) / 3600.0 * 1e6 + 0.5) / 1e6
                     AS rate
            FROM l GROUP BY 1, 2
        """,
        "hist_quantile_1h": """
            -- direct 1h histogram quantiles from raw: equality with the
            -- Spark side's 1m->1h CASCADE proves exact mergeability.
            -- Integer bins/counts + type-1 rule -> byte-identical
            -- cross-engine; windowed sums cast (DuckDB HUGEINT)
            WITH h AS (
              SELECT user_id, date_trunc('hour', ts) AS bucket_start,
                     CAST(floor(value / 0.25) AS BIGINT) AS bin,
                     count(*) AS cnt
              FROM events WHERE value IS NOT NULL
              GROUP BY 1, 2, 3
            ), c AS (
              SELECT user_id, bucket_start, bin, cnt,
                     CAST(sum(cnt) OVER (PARTITION BY user_id, bucket_start
                                         ORDER BY bin) AS BIGINT) AS cum,
                     CAST(sum(cnt) OVER (PARTITION BY user_id, bucket_start)
                          AS BIGINT) AS tot
              FROM h
            )
            SELECT user_id, bucket_start,
                   CAST(sum(cnt) AS BIGINT) AS cnt,
                   round(min(CASE WHEN cum >= ceil(0.50 * tot) THEN bin END) * 0.25, 6) AS p50,
                   round(min(CASE WHEN cum >= ceil(0.90 * tot) THEN bin END) * 0.25, 6) AS p90,
                   round(min(CASE WHEN cum >= ceil(0.99 * tot) THEN bin END) * 0.25, 6) AS p99
            FROM c GROUP BY 1, 2
        """,
        "mjpeg_frames": """
            -- 3-frame MJPEG AVI of constant-8x8-block frames (DC on
            -- the q90 quantization grid, quantum 3): the container
            -- walk + T.81 decode round-trips EXACTLY, so per-frame
            -- stats are recomputed from the generating formula.
            -- 10 fps -> frame_ms = frame_idx * 100. mean is x/4 of
            -- integers (exact at 6 decimals).
            SELECT doc_id,
                   CAST(f.range AS INT) AS frame_idx,
                   CAST(f.range * 100 AS BIGINT) AS frame_ms,
                   16 AS width, 16 AS height,
                   round(list_aggregate(list_transform(range(0, 4),
                     k -> CAST(128 + ((n_chars*(k+3) + 5*f.range) % 7 - 3) * 3 AS DOUBLE)),
                     'avg'), 6) AS mean_luma,
                   CAST(list_aggregate(list_transform(range(0, 4),
                     k -> 128 + ((n_chars*(k+3) + 5*f.range) % 7 - 3) * 3),
                     'min') AS BIGINT) AS min_luma,
                   CAST(list_aggregate(list_transform(range(0, 4),
                     k -> 128 + ((n_chars*(k+3) + 5*f.range) % 7 - 3) * 3),
                     'max') AS BIGINT) AS max_luma
            FROM documents, range(0, 3) f
        """,
        "wav_features": """
            -- PCM16 stats of the deterministically-rendered 64-sample
            -- waveform, recomputed from the generating formula (the
            -- Spark side encodes + REALLY decodes the RIFF byte stream).
            -- mean is a x/64 rational (exact at 6 decimals); rms uses
            -- the IEEE-pure floor(x*1e6+0.5)/1e6 on both sides.
            SELECT doc_id,
                   16000 AS sample_rate, 64 AS n_samples,
                   round(list_aggregate(list_transform(range(0, 64),
                     k -> CAST((n_chars*31 + 17*k) % 65536 - 32768 AS DOUBLE)),
                     'avg'), 6) AS mean_sample,
                   floor(sqrt(list_aggregate(list_transform(range(0, 64),
                     k -> CAST((n_chars*31 + 17*k) % 65536 - 32768 AS DOUBLE)
                        * CAST((n_chars*31 + 17*k) % 65536 - 32768 AS DOUBLE)),
                     'avg')) * 1e6 + 0.5) / 1e6 AS rms,
                   CAST(list_aggregate(list_transform(range(0, 64),
                     k -> abs((n_chars*31 + 17*k) % 65536 - 32768)),
                     'max') AS BIGINT) AS peak
            FROM documents
        """,
        "anomaly_1h": """
            -- rolling trailing-24-bucket z-score on the hourly count
            -- tier; explicit exact Σv/Σv² window sums (integer inputs)
            WITH agg AS (
              SELECT user_id, date_trunc('hour', ts) AS b,
                     count(value) AS cnt
              FROM events GROUP BY 1, 2
            ), zs AS (
              SELECT user_id,
                     CAST(epoch(b) AS BIGINT) AS bucket_epoch,
                     CAST(cnt AS BIGINT) AS cnt,
                     CAST(count(cnt) OVER w AS DOUBLE) AS n,
                     sum(CAST(cnt AS DOUBLE)) OVER w AS s1,
                     sum(CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE)) OVER w AS s2
              FROM agg
              WINDOW w AS (PARTITION BY user_id ORDER BY b
                           ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
            )
            SELECT user_id, bucket_epoch, cnt,
                   round(CASE WHEN n >= 24
                              AND (s2/n - (s1/n)*(s1/n)) > 0
                         THEN (cnt - s1/n)
                              / sqrt(greatest(s2/n - (s1/n)*(s1/n), 0.0))
                         END, 6) AS zscore,
                   coalesce(abs(CASE WHEN n >= 24
                                     AND (s2/n - (s1/n)*(s1/n)) > 0
                                THEN (cnt - s1/n)
                                     / sqrt(greatest(s2/n - (s1/n)*(s1/n), 0.0))
                                END) > 3.0, false) AS is_anomaly
            FROM zs
        """,
        "sax_daily": """
            -- SAX words (PAA-8, alphabet-4) per (user, day) raw-value
            -- series: z-norm with population sigma, equal-count PAA
            -- segments seg = floor(i*8/n), standard-normal breakpoints.
            -- z and paa use the IEEE-pure floor(x*1e6+0.5)/1e6 rounding
            -- on both engines so letters match exactly.
            WITH ranked AS (
              SELECT user_id AS key,
                     CAST(floor(epoch(ts)/86400)*86400 AS BIGINT) AS window_epoch,
                     value AS v,
                     row_number() OVER (PARTITION BY user_id, floor(epoch(ts)/86400)
                                        ORDER BY ts, value) - 1 AS i,
                     count(*) OVER w2 AS n,
                     avg(value) OVER w2 AS mu,
                     sqrt(var_pop(value) OVER w2) AS sd
              FROM events
              WINDOW w2 AS (PARTITION BY user_id, floor(epoch(ts)/86400))
            ), z AS (
              SELECT key, window_epoch, n, CAST(floor(i * 8 / n) AS INT) AS seg,
                     CASE WHEN sd = 0 THEN CAST(0 AS BIGINT)
                          ELSE CAST(floor((v - mu)/sd*1e6+0.5) AS BIGINT)
                     END AS z_u
              FROM ranked
            ), paa AS (
              -- exact long sum / single division (order-independent),
              -- mirroring the engine's micro-unit PAA arithmetic
              SELECT key, window_epoch, n, seg,
                     floor(CAST(sum(z_u) AS BIGINT) / count(*) + 0.5)/1e6
                       AS paa
              FROM z GROUP BY 1,2,3,4
            ), lett AS (
              SELECT key, window_epoch, n, seg,
                     CASE WHEN paa < -0.6744897501960817 THEN 'a'
                          WHEN paa < 0.0 THEN 'b'
                          WHEN paa < 0.6744897501960817 THEN 'c'
                          ELSE 'd' END AS letter
              FROM paa
            )
            SELECT key AS user_id, window_epoch,
                   CAST(max(n) AS BIGINT) AS n_points,
                   string_agg(letter, '' ORDER BY seg) AS sax_word
            FROM lett GROUP BY 1, 2
        """,
        "seasonal_decompose": """
            -- gap-filled hourly cnt tier (same spine as gapfill_1h),
            -- then the classical additive decomposition: 2x24 centered
            -- MA trend from integer window sums, centered per-phase
            -- seasonal means, residual. floor(x*1e6+0.5)/1e6 rounding.
            WITH agg AS (
              SELECT user_id, date_trunc('hour', ts) AS b,
                     count(value) AS cnt
              FROM events GROUP BY 1, 2
            ), bounds AS (
              SELECT user_id, min(b) AS lo, max(b) AS hi FROM agg GROUP BY 1
            ), spine AS (
              SELECT user_id,
                     unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS b
              FROM bounds
            ), dense AS (
              SELECT s.user_id,
                     CAST(epoch(s.b) AS BIGINT) AS bucket_epoch,
                     coalesce(a.cnt, 0) AS cnt
              FROM spine s LEFT JOIN agg a
                ON a.user_id = s.user_id AND a.b = s.b
            ), t AS (
              SELECT user_id, bucket_epoch, cnt,
                     CASE WHEN count(*) OVER w1 = 24 AND count(*) OVER w2 = 24
                          THEN CAST(sum(cnt) OVER w1 + sum(cnt) OVER w2 AS BIGINT)
                     END AS num,
                     CAST(floor(bucket_epoch / 3600) AS BIGINT) % 24 AS phase
              FROM dense
              WINDOW w1 AS (PARTITION BY user_id ORDER BY bucket_epoch
                            ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING),
                     w2 AS (PARTITION BY user_id ORDER BY bucket_epoch
                            ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)
            ), pm AS (
              -- phase mean from INTEGER sums (order-independent), then
              -- micro-unit quantization — mirrors the engine exactly
              SELECT user_id, phase,
                     CASE WHEN count(num) > 0 THEN
                       CAST(floor(
                         CAST(48*sum(CASE WHEN num IS NOT NULL THEN cnt END)
                              - sum(num) AS BIGINT)
                         / (48.0 * count(num)) * 1e6 + 0.5) AS BIGINT)
                     END AS s_u
              FROM t GROUP BY 1, 2
            ), km AS (
              SELECT user_id, CAST(sum(s_u) AS BIGINT) AS S,
                     count(s_u) AS P
              FROM pm GROUP BY 1
            ), sea AS (
              SELECT pm.user_id, pm.phase,
                     (s_u - S * 1.0 / P) / 1e6 AS seasonal
              FROM pm JOIN km ON pm.user_id = km.user_id
            )
            SELECT t.user_id, t.bucket_epoch, CAST(t.cnt AS BIGINT) AS cnt,
                   floor(t.num / 48.0 * 1e6 + 0.5)/1e6 AS trend,
                   floor(sea.seasonal * 1e6 + 0.5)/1e6 AS seasonal,
                   floor((t.cnt - t.num / 48.0 - sea.seasonal) * 1e6 + 0.5)/1e6
                     AS resid
            FROM t JOIN sea
              ON t.user_id = sea.user_id AND t.phase = sea.phase
        """,
        "repetition_stats": _repetition_oracle_sql(),
        "line_dedup": r"""
            -- global first-occurrence line dedup + ordered reassembly;
            -- winner = min (doc_id, pos) per normalized line
            WITH aug AS (
              SELECT doc_id,
                     text || chr(10) || 'source footer ' || source
                          || chr(10) || 'shared corpus footer line' AS text
              FROM documents
            ), ls AS (
              SELECT doc_id, i - 1 AS pos, parts[i] AS line,
                     lower(trim(regexp_replace(parts[i], '[ \t\n\f\r]+', ' ', 'g')))
                       AS norm
              FROM (SELECT doc_id, string_split(text, chr(10)) AS parts
                    FROM aug), unnest(range(1, len(parts) + 1)) AS t(i)
            ), ranked AS (
              SELECT *, CASE WHEN norm = '' THEN 1 ELSE
                       row_number() OVER (PARTITION BY norm
                                          ORDER BY doc_id, pos) END AS rk
              FROM ls
            ), kept AS (
              SELECT doc_id, pos, line, norm FROM ranked WHERE rk = 1
            ), asm AS (
              SELECT doc_id,
                     string_agg(line, chr(10) ORDER BY pos) AS new_text,
                     CAST(sum(CASE WHEN norm <> '' THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_kept
              FROM kept GROUP BY 1
            ), tot AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN norm <> '' THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_lines
              FROM ls GROUP BY 1
            )
            SELECT t.doc_id, md5(coalesce(a.new_text, '')) AS text_md5,
                   t.n_lines, coalesce(a.n_kept, 0) AS n_kept
            FROM tot t LEFT JOIN asm a ON t.doc_id = a.doc_id
        """,
        "lm_perplexity": """
            -- corpus-trained add-0.1 bigram LM; per-bigram ln-probs
            -- quantized to micro-unit longs -> order-independent sums
            WITH base AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text),
                       '[^a-z0-9'']+'), x -> x <> '') AS ws
              FROM documents
            ), big AS (
              SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
              FROM base, unnest(range(1, len(ws))) AS t(i)
            ), cb AS (
              SELECT w1, w2, count(*) AS cb FROM big GROUP BY 1, 2
            ), cu AS (
              SELECT w1, count(*) AS cu FROM big GROUP BY 1
            ), v AS (
              SELECT CAST(count(DISTINCT w2) AS DOUBLE) AS v FROM big
            ), lp AS (
              SELECT cb.w1, cb.w2,
                     CAST(floor(ln((cb + 0.1)/(cu + 0.1*v))*1e6 + 0.5)
                       AS BIGINT) AS lp_u
              FROM cb JOIN cu ON cb.w1 = cu.w1 CROSS JOIN v
            )
            SELECT b.doc_id, count(*) AS n_bigrams,
                   floor(-CAST(sum(lp_u) AS BIGINT)/(1e6*count(*))*1e4
                         + 0.5)/1e4 AS avg_nll
            FROM big b JOIN lp ON b.w1 = lp.w1 AND b.w2 = lp.w2
            GROUP BY 1
        """,
        "sessions_30m": """
            -- lag-flag + RANGE-framed running sum (ties share a
            -- session); pure integer arithmetic end-to-end
            WITH e AS (
              SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS e
              FROM events
            ), f AS (
              SELECT user_id, e,
                     CASE WHEN lag(e) OVER w IS NULL
                            OR e - lag(e) OVER w > 1800
                          THEN 1 ELSE 0 END AS ns
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY e)
            ), s AS (
              SELECT user_id, e,
                     CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY e
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS sid
              FROM f
            )
            SELECT user_id, sid AS session_id,
                   min(e) AS t_start, max(e) AS t_end,
                   max(e) - min(e) AS duration_s,
                   count(*) AS n_events
            FROM s GROUP BY 1, 2
        """,
        "m4_6h": """
            -- M4: first/min/max/last per (user, 6h bucket); ties pinned
            -- by (v, t) lexicographic order = ORDER BY v, t row picks
            WITH pts AS (
              SELECT user_id,
                     CAST(floor(epoch(ts)/21600)*21600 AS BIGINT) AS bucket_epoch,
                     -- floor, not CAST: DuckDB CAST(double AS BIGINT)
                     -- rounds while Spark's timestamp->long truncates
                     CAST(floor(epoch(ts)) AS BIGINT) AS t, value AS v
              FROM events
            ), rk AS (
              SELECT *,
                row_number() OVER (PARTITION BY user_id, bucket_epoch
                                   ORDER BY t ASC, v ASC) AS r_first,
                row_number() OVER (PARTITION BY user_id, bucket_epoch
                                   ORDER BY v ASC, t ASC) AS r_min,
                row_number() OVER (PARTITION BY user_id, bucket_epoch
                                   ORDER BY v DESC, t DESC) AS r_max,
                row_number() OVER (PARTITION BY user_id, bucket_epoch
                                   ORDER BY t DESC, v DESC) AS r_last,
                count(*) OVER (PARTITION BY user_id, bucket_epoch) AS n
              FROM pts
            )
            SELECT user_id, bucket_epoch,
                   max(CASE WHEN r_first = 1 THEN t END) AS t_first,
                   round(max(CASE WHEN r_first = 1 THEN v END), 6) AS v_first,
                   max(CASE WHEN r_min = 1 THEN t END) AS t_min,
                   round(max(CASE WHEN r_min = 1 THEN v END), 6) AS v_min,
                   max(CASE WHEN r_max = 1 THEN t END) AS t_max,
                   round(max(CASE WHEN r_max = 1 THEN v END), 6) AS v_max,
                   max(CASE WHEN r_last = 1 THEN t END) AS t_last,
                   round(max(CASE WHEN r_last = 1 THEN v END), 6) AS v_last,
                   CAST(max(n) AS BIGINT) AS n_points
            FROM rk GROUP BY 1, 2
        """,
        "cusum_1h": """
            -- CUSUM via prefix sums in micro-unit integers: cum minus
            -- its running extremum (empty prefix = 0 included), exact
            -- long arithmetic end-to-end
            WITH agg AS (
              SELECT user_id, date_trunc('hour', ts) AS b,
                     count(value) AS cnt
              FROM events GROUP BY 1, 2
            ), base AS (
              SELECT user_id, CAST(epoch(b) AS BIGINT) AS bucket_epoch,
                     CAST(cnt AS BIGINT) AS cnt,
                     CAST(cnt * 1000000 AS BIGINT) AS v_u
              FROM agg
            ), mu AS (
              SELECT user_id,
                     CAST(floor(sum(v_u) / (1.0 * count(*)) + 0.5) AS BIGINT)
                       AS mu_u
              FROM base GROUP BY 1
            ), d AS (
              SELECT b.user_id, bucket_epoch, cnt,
                     v_u - mu_u - 500000 AS d_pos,
                     v_u - mu_u + 500000 AS d_neg
              FROM base b JOIN mu ON b.user_id = mu.user_id
            ), c AS (
              SELECT user_id, bucket_epoch, cnt,
                     CAST(sum(d_pos) OVER w AS BIGINT) AS cp,
                     CAST(sum(d_neg) OVER w AS BIGINT) AS cn
              FROM d
              WINDOW w AS (PARTITION BY user_id ORDER BY bucket_epoch
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            ), s AS (
              SELECT user_id, bucket_epoch, cnt,
                     cp - least(CAST(min(cp) OVER w AS BIGINT), 0) AS sp_u,
                     greatest(CAST(max(cn) OVER w AS BIGINT), 0) - cn AS sn_u
              FROM c
              WINDOW w AS (PARTITION BY user_id ORDER BY bucket_epoch
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            )
            SELECT user_id, bucket_epoch, cnt,
                   sp_u / 1000000.0 AS s_pos,
                   sn_u / 1000000.0 AS s_neg,
                   (sp_u > 8000000 OR sn_u > 8000000) AS alarm
            FROM s
        """,
        "deseasonal_anomaly": """
            -- decompose chain (same as seasonal_decompose), residual
            -- quantized to milli-unit INTEGERS, then the trailing-24
            -- z-score with exact Σv/Σv² integer window sums
            WITH agg AS (
              SELECT user_id, date_trunc('hour', ts) AS b,
                     count(value) AS cnt
              FROM events GROUP BY 1, 2
            ), bounds AS (
              SELECT user_id, min(b) AS lo, max(b) AS hi FROM agg GROUP BY 1
            ), spine AS (
              SELECT user_id,
                     unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS b
              FROM bounds
            ), dense AS (
              SELECT s.user_id,
                     CAST(epoch(s.b) AS BIGINT) AS bucket_epoch,
                     coalesce(a.cnt, 0) AS cnt
              FROM spine s LEFT JOIN agg a
                ON a.user_id = s.user_id AND a.b = s.b
            ), t AS (
              SELECT user_id, bucket_epoch, cnt,
                     CASE WHEN count(*) OVER w1 = 24 AND count(*) OVER w2 = 24
                          THEN CAST(sum(cnt) OVER w1 + sum(cnt) OVER w2 AS BIGINT)
                     END AS num,
                     CAST(floor(bucket_epoch / 3600) AS BIGINT) % 24 AS phase
              FROM dense
              WINDOW w1 AS (PARTITION BY user_id ORDER BY bucket_epoch
                            ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING),
                     w2 AS (PARTITION BY user_id ORDER BY bucket_epoch
                            ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)
            ), pm AS (
              SELECT user_id, phase,
                     CASE WHEN count(num) > 0 THEN
                       CAST(floor(
                         CAST(48*sum(CASE WHEN num IS NOT NULL THEN cnt END)
                              - sum(num) AS BIGINT)
                         / (48.0 * count(num)) * 1e6 + 0.5) AS BIGINT)
                     END AS s_u
              FROM t GROUP BY 1, 2
            ), km AS (
              SELECT user_id, CAST(sum(s_u) AS BIGINT) AS S,
                     count(s_u) AS P
              FROM pm GROUP BY 1
            ), sea AS (
              SELECT pm.user_id, pm.phase,
                     (s_u - S * 1.0 / P) / 1e6 AS seasonal
              FROM pm JOIN km ON pm.user_id = km.user_id
            ), r AS (
              SELECT t.user_id, t.bucket_epoch,
                     CAST(floor((t.cnt - t.num / 48.0 - sea.seasonal) * 1e3
                                + 0.5) AS BIGINT) AS resid_m
              FROM t JOIN sea
                ON t.user_id = sea.user_id AND t.phase = sea.phase
            ), zs AS (
              SELECT user_id, bucket_epoch, resid_m,
                     CAST(count(resid_m) OVER w AS DOUBLE) AS n,
                     sum(CAST(resid_m AS DOUBLE)) OVER w AS s1,
                     sum(CAST(resid_m AS DOUBLE) * CAST(resid_m AS DOUBLE))
                       OVER w AS s2
              FROM r
              WINDOW w AS (PARTITION BY user_id ORDER BY bucket_epoch
                           ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
            )
            SELECT user_id, bucket_epoch, resid_m,
                   floor(CASE WHEN n >= 24
                              AND (s2/n - (s1/n)*(s1/n)) > 0
                         THEN (resid_m - s1/n)
                              / sqrt(greatest(s2/n - (s1/n)*(s1/n), 0.0))
                         END * 1e6 + 0.5) / 1e6 AS zscore,
                   coalesce(abs(CASE WHEN n >= 24
                                     AND (s2/n - (s1/n)*(s1/n)) > 0
                                THEN (resid_m - s1/n)
                                     / sqrt(greatest(s2/n - (s1/n)*(s1/n), 0.0))
                                END) > 3.0, false) AS is_anomaly
            FROM zs
        """,
        "token_budget_sample": """
            -- per-source token-budget mixture: md5-bucket order,
            -- running n_chars sum, keep while the PREVIOUS cumsum is
            -- under budget (crossing doc included). Windowed sum is
            -- HUGEINT in DuckDB -> CAST AS BIGINT.
            WITH b AS (
              SELECT doc_id, source, n_chars,
                     list_reduce(list_transform(range(1, 9),
                       i -> CAST(strpos('0123456789abcdef',
                              substr(md5(CAST(doc_id AS VARCHAR) || 'mix'), CAST(i AS INT), 1)) - 1
                            AS BIGINT)),
                       (a, x) -> a * 16 + x) % 1000000 AS bucket
              FROM documents
            ), c AS (
              SELECT doc_id, source, bucket,
                     CAST(sum(n_chars) OVER w AS BIGINT) AS cum_chars,
                     CAST(sum(n_chars) OVER w - n_chars AS BIGINT) AS prev,
                     CASE source WHEN 'src0' THEN 30000
                                 WHEN 'src1' THEN 8000
                                 WHEN 'src2' THEN 0
                                 ELSE 5000 END AS budget
              FROM b
              WINDOW w AS (PARTITION BY source ORDER BY bucket, doc_id)
            )
            SELECT doc_id, source, bucket, cum_chars
            FROM c WHERE prev < budget AND budget > 0
        """,
        "pii_redact": r"""
            -- same injected text, same dialect-portable patterns; the
            -- 'g' flag mirrors Spark's replace-all default
            WITH inj AS (
              SELECT doc_id,
                     text || ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@example.com'
                          || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                          || '.' || CAST((doc_id*7) % 256 AS VARCHAR)
                          || CASE WHEN doc_id % 3 = 0
                                  THEN ' ssn 123-45-6789' ELSE '' END
                          || CASE WHEN doc_id % 2 = 0
                                  THEN ' call +1-555-0142 now' ELSE '' END AS text
              FROM documents
            )
            SELECT doc_id,
                   len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
                   len(regexp_extract_all(text,
                     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
                   len(regexp_extract_all(text,
                     '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssn,
                   len(regexp_extract_all(text,
                     '\+\d[\d\- ]{7,14}\d')) AS n_phone,
                   len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                     + len(regexp_extract_all(text,
                         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
                     + len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b'))
                     + len(regexp_extract_all(text,
                         '\+\d[\d\- ]{7,14}\d')) AS n_pii_total,
                   md5(regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(text,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                         '<EMAIL>', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                       '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
                       '\+\d[\d\- ]{7,14}\d', '<PHONE>', 'g')) AS red_md5
            FROM inj
        """,
        "stratified_sample": """
            -- md5-prefix bucket sampling, engine-portable: first 8 hex
            -- chars of md5(id || seed) parsed to a 32-bit int, mod 1e6
            WITH b AS (
              SELECT doc_id, source,
                     list_reduce(list_transform(range(1, 9),
                       i -> CAST(strpos('0123456789abcdef',
                              substr(md5(CAST(doc_id AS VARCHAR) || 'r3'), CAST(i AS INT), 1)) - 1
                            AS BIGINT)),
                       (a, x) -> a * 16 + x) % 1000000 AS bucket
              FROM documents
            )
            SELECT doc_id, source, bucket
            FROM b
            WHERE bucket < CASE source
                   WHEN 'src0' THEN 900000
                   WHEN 'src1' THEN 500000
                   WHEN 'src2' THEN 0
                   ELSE 200000 END
        """,
        "lttb_6h": """
            -- LTTB fixed-reference downsampling; quantized inputs make
            -- bucket averages exact dyadic rationals (order-free sums).
            -- floor(epoch(ts)): Spark's timestamp->long cast truncates,
            -- DuckDB's double->bigint cast rounds
            WITH p2 AS (
              SELECT user_id AS source,
                     CAST(floor(epoch(ts)) AS DOUBLE) AS t,
                     floor(value * 16 + 0.5) / 16 AS v,
                     CAST(floor(floor(epoch(ts)) / 21600) * 21600 AS BIGINT)
                       AS bucket_epoch
              FROM events
            ), avgs AS (
              SELECT source, bucket_epoch,
                     sum(t) / count(*) AS at, sum(v) / count(*) AS av
              FROM p2 GROUP BY 1, 2
            ), nbr AS (
              SELECT source, bucket_epoch,
                     lag(at)  OVER w AS pt, lag(av)  OVER w AS pv,
                     lead(at) OVER w AS nt, lead(av) OVER w AS nv
              FROM avgs WINDOW w AS (PARTITION BY source ORDER BY bucket_epoch)
            ), scored AS (
              SELECT p.source, p.bucket_epoch, p.t, p.v,
                     CASE WHEN n.pt IS NULL THEN p.t
                          WHEN n.nt IS NULL THEN -p.t
                          ELSE -abs((n.pt - n.nt) * (p.v - n.pv)
                                    - (n.pt - p.t) * (n.nv - n.pv))
                     END AS ok
              FROM p2 p JOIN nbr n USING (source, bucket_epoch)
            ), ranked AS (
              SELECT *, row_number() OVER (PARTITION BY source, bucket_epoch
                          ORDER BY ok ASC, t ASC) AS rn
              FROM scored
            )
            SELECT CAST(source AS BIGINT) AS user_id, bucket_epoch,
                   CAST(t AS BIGINT) AS ts, round(v, 6) AS value
            FROM ranked WHERE rn = 1
        """,
        "tfidf_topk": """
            -- smoothed tf-idf (sklearn form), top-3 per doc with
            -- (tfidf desc, term asc) tiebreak; same ascii tokenizer
            WITH words AS (
              SELECT doc_id, unnest(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9'']+'),
                       x -> x <> '')) AS term
              FROM documents
            ), tf AS (
              SELECT doc_id, term, count(*) AS tf FROM words GROUP BY 1, 2
            ), dfreq AS (
              SELECT term, count(*) AS df FROM tf GROUP BY 1 HAVING count(*) >= 2
            ), n AS (
              SELECT count(*) AS n_docs FROM documents
            ), scored AS (
              SELECT t.doc_id, t.term,
                     t.tf * (ln((n.n_docs + 1) * 1.0 / (d.df + 1)) + 1.0) AS tfidf
              FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
            ), ranked AS (
              SELECT doc_id, term, tfidf,
                     row_number() OVER (PARTITION BY doc_id
                       ORDER BY tfidf DESC, term ASC) AS rank
              FROM scored
            )
            SELECT doc_id, term,
                   floor(tfidf * 1e6 + 0.5) / 1e6 AS tfidf,
                   CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 3
        """,
        "pack_stats": """
            -- concat-and-chunk packing stats recomputed from span
            -- arithmetic: token k of a doc = length of word k, so a
            -- piece's token sum = chars in the word-slice it covers
            WITH d AS (
              SELECT doc_id, source,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                                 x -> x <> '') AS words
              FROM documents
            ), spans AS (
              SELECT doc_id, source, words, CAST(len(words) AS BIGINT) AS n,
                     CAST(sum(len(words)) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - len(words) AS BIGINT) AS strt
              FROM d WHERE len(words) > 0
            ), pieces AS (
              SELECT s.source, c.chunk_id,
                     least(s.strt + s.n, (c.chunk_id+1)*128)
                       - greatest(s.strt, c.chunk_id*128) AS piece_len,
                     greatest(s.strt, c.chunk_id*128) - c.chunk_id*128 AS p0,
                     length(array_to_string(list_slice(s.words,
                         CAST(greatest(s.strt, c.chunk_id*128) - s.strt + 1 AS BIGINT),
                         CAST(least(s.strt + s.n, (c.chunk_id+1)*128) - s.strt AS BIGINT)),
                         '')) AS piece_sum,
                     -- order-sensitive: Σ j·len(w_j) over the piece's
                     -- words (j 1-based within the piece)
                     list_sum(list_transform(list_slice(s.words,
                         CAST(greatest(s.strt, c.chunk_id*128) - s.strt + 1 AS BIGINT),
                         CAST(least(s.strt + s.n, (c.chunk_id+1)*128) - s.strt AS BIGINT)),
                         (w, j) -> j * length(w))) AS piece_jsum
              FROM spans s, LATERAL (SELECT unnest(generate_series(
                     s.strt // 128, (s.strt + s.n - 1) // 128)) AS chunk_id) c
            )
            SELECT source, chunk_id, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(piece_len) AS BIGINT) AS n_tok,
                   CAST(sum(piece_sum) AS BIGINT) AS sum_tok,
                   CAST(sum(p0 * piece_sum + piece_jsum) AS BIGINT) AS ord_sum
            FROM pieces GROUP BY source, chunk_id
        """,
        "gopher_quality": """
            -- Gopher document-filter rules (Rae et al. 2021 A1.1),
            -- min_words=20 / min_stop_hits=1 (non-vacuous on this corpus)
            WITH d AS (
              SELECT doc_id, text,
                list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                            x -> x <> '') AS words,
                list_filter(list_transform(string_split(text, chr(10)),
                            l -> trim(l)), l -> l <> '') AS lines
              FROM documents
            ), mm AS (
              SELECT doc_id,
                CAST(len(words) AS BIGINT) AS n_words,
                CASE WHEN len(words) > 0 THEN
                  length(array_to_string(words, '')) * 1.0 / len(words)
                  ELSE 0.0 END AS mean_word_len,
                CASE WHEN len(words) > 0 THEN
                  ((length(text) - length(replace(text, '#', '')))
                   + (length(text) - length(replace(text, '...', ''))) / 3.0)
                  / len(words) ELSE 0.0 END AS symbol_ratio,
                CASE WHEN len(words) > 0 THEN
                  len(list_filter(words, w -> regexp_matches(w, '[a-z]')))
                  * 1.0 / len(words) ELSE 0.0 END AS alpha_frac,
                CAST(len(list_intersect(list_distinct(words),
                  ['the','be','to','of','and','that','have','with']))
                  AS BIGINT) AS stop_hits,
                CAST(len(lines) AS BIGINT) AS n_lines,
                CASE WHEN len(lines) > 0 THEN
                  len(list_filter(lines, l -> l LIKE '-%' OR l LIKE '*%'
                      OR l LIKE '•%')) * 1.0 / len(lines)
                  ELSE 0.0 END AS bullet_frac,
                CASE WHEN len(lines) > 0 THEN
                  len(list_filter(lines, l -> l LIKE '%...')) * 1.0 / len(lines)
                  ELSE 0.0 END AS ellipsis_frac,
                CASE WHEN len(lines) > 0 THEN
                  1.0 - len(list_distinct(lines)) * 1.0 / len(lines)
                  ELSE 0.0 END AS dup_line_frac
              FROM d
            )
            SELECT doc_id, n_words,
                   round(mean_word_len, 6) AS mean_word_len,
                   round(symbol_ratio, 6) AS symbol_ratio,
                   round(alpha_frac, 6) AS alpha_frac,
                   stop_hits, n_lines,
                   round(bullet_frac, 6) AS bullet_frac,
                   round(ellipsis_frac, 6) AS ellipsis_frac,
                   round(dup_line_frac, 6) AS dup_line_frac,
                   (n_words >= 20 AND n_words <= 100000
                    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                    AND symbol_ratio <= 0.1 AND bullet_frac < 0.9
                    AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
                    AND stop_hits >= 1 AND dup_line_frac <= 0.3) AS keep
            FROM mm
        """,
        "decontamination": """
            -- benchmark = docs with doc_id % 19 == 0; flag any other doc
            -- sharing a distinct word 5-gram with the benchmark set
            WITH d AS (
              SELECT doc_id,
                list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                            x -> x <> '') AS words
              FROM documents
            ), sh AS (
              SELECT doc_id,
                CASE WHEN len(words) >= 5 THEN
                  list_distinct(list_transform(
                    range(1, CAST(len(words) AS BIGINT) - 3),
                    i -> array_to_string(list_slice(words, i, i + 4), ' ')))
                ELSE [] END AS shingles
              FROM d
            ), bench AS (
              SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 19 = 0
            ), hits AS (
              SELECT x.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
              FROM (SELECT doc_id, unnest(shingles) AS s FROM sh
                    WHERE doc_id % 19 <> 0) x
              JOIN bench b ON x.s = b.s
              GROUP BY x.doc_id
            )
            SELECT s.doc_id, CAST(len(s.shingles) AS BIGINT) AS n_shingles,
                   COALESCE(h.n_contaminated, 0) AS n_contaminated,
                   COALESCE(h.n_contaminated, 0) > 0 AS contaminated
            FROM sh s LEFT JOIN hits h USING (doc_id)
            WHERE s.doc_id % 19 <> 0
        """,
        "multimodal_features": """
            -- the fake decoder's features: numpy array_split(bytes, 16)
            -- chunk means. Split sizes: first (n % 16) chunks get
            -- n//16 + 1 bytes, the rest n//16 (all docs have n >= 16).
            WITH b AS (
              SELECT doc_id, text, octet_length(encode(text)) AS n
              FROM documents
            ), pos AS (
              SELECT doc_id, text, n, unnest(range(0, n)) AS i FROM b
            ), chunked AS (
              SELECT doc_id,
                     CAST(CASE WHEN i < ((n // 16) + 1) * (n % 16)
                          THEN i // ((n // 16) + 1)
                          ELSE (n % 16) + (i - ((n // 16) + 1) * (n % 16)) // (n // 16)
                     END AS INT) AS idx,
                     ord(substr(text, CAST(i + 1 AS INT), 1)) AS byte
              FROM pos
            ), agg AS (
              SELECT doc_id, idx, round(avg(byte), 6) AS fval
              FROM chunked GROUP BY 1, 2
            )
            SELECT a.doc_id, a.idx, a.fval,
                   CAST(b.n AS BIGINT) AS n_bytes,
                   'application/octet-stream' AS sniffed_mime
            FROM agg a JOIN b ON a.doc_id = b.doc_id
        """,
        "text_stats": """
            SELECT doc_id,
                   len(list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                                   x -> x <> '')) AS n_words,
                   length(text) AS n_chars
            FROM documents
        """,
        "vocabulary": """
            WITH words AS (
              SELECT doc_id, unnest(list_distinct(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9'']+'),
                       x -> x <> ''))) AS word
              FROM documents
            )
            SELECT word, count(*) AS doc_freq FROM words
            GROUP BY 1 HAVING count(*) >= 5
            ORDER BY doc_freq DESC, word ASC LIMIT 200
        """,
        "brute_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings ORDER BY vec_id LIMIT 5
            ), scored AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS score
              FROM embeddings e CROSS JOIN q
            )
            SELECT query_id, vec_id, round(score, 5) AS score,
                   cast(row_number() OVER (
                     PARTITION BY query_id ORDER BY score DESC, vec_id ASC
                   ) AS int) AS rank
            FROM scored
            QUALIFY rank <= 5
        """,
        "embedding_near_dups": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding, b.embedding), 5) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35
        """,
        "minhash_dedup": """
            WITH """ + _SHINGLE_CTE + """,
            losers AS (
              SELECT DISTINCT b.doc_id AS doc_id
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                    / CAST(len(list_distinct(a.s || b.s)) AS DOUBLE) >= 0.8
            )
            SELECT d.doc_id, d.source FROM documents d
            WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
        """,
        "fastprop_features": _fastprop_oracle_sql(),
        "asof_multikey": """
            SELECT o.o_orderkey,
                   count(e.value) AS cnt,
                   round(coalesce(sum(e.value), 0.0), 6) AS sum_value,
                   round(avg(e.value), 6) AS avg_value
            FROM orders o LEFT JOIN events e
              ON e.user_id = o.o_custkey
             AND (e.event_id % 3) = (o.o_orderkey % 3)
             AND epoch(e.ts) <= {pop} - 3600
             AND epoch(e.ts) >  {pop} - 604800
            GROUP BY 1
        """.format(pop=_POP_EPOCH_SQL),
        "string_ops": """
            SELECT o_orderkey,
                   o_orderstatus || '-' || o_orderpriority AS cat,
                   upper(o_orderpriority) AS up,
                   lower(o_orderstatus) AS lo,
                   substring(o_orderpriority, 1, 3) AS sub3,
                   CASE WHEN contains(o_orderpriority, 'URGENT') THEN 1 ELSE 0 END AS has_urgent,
                   cast(length(o_orderpriority) AS int) AS len_p,
                   replace(o_orderpriority, '-', '_') AS rep,
                   cast(o_orderkey AS varchar) AS key_str,
                   round(cast(cast(o_custkey AS varchar) AS double), 6) AS cust_num,
                   cast(epoch(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                                       '%Y-%m-%d %H:%M:%S')) AS bigint) AS ts_rt
            FROM orders
        """,
        "csv_roundtrip": """
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   round(o_totalprice, 2) AS price2
            FROM orders
        """,
        "token_neardup": _token_neardup_oracle_sql(),
        "token_chunks": _token_chunks_oracle_sql(),
        "simhash_pairs": _simhash_oracle_sql(max_hamming=3),
        "lsh_topk": _lsh_topk_oracle_sql(),
        "ivf_topk": _ivf_topk_oracle_sql(),
        "semdedup": _semdedup_oracle_sql(),
        "text_normalize": _text_normalize_oracle_sql(),
        "bm25": _bm25_oracle_sql(),
    }


if __name__ == "__main__":
    from getml_community_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=8)
    df = entry(spark)
    print("entry rows:", df.count())
    df.show(5)
