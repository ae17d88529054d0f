"""SQL transpilation — the reference's ``Pipeline.to_sql`` surface
(src/engine/src/transpilation/HumanReadableSQLGenerator.cpp: one CREATE
TABLE per feature, AbstractFeature.cpp:89-170 shape), re-targeted at
ANSI SQL that DuckDB / Spark SQL can run.

Two generators:
- :func:`asof_feature_sql` — the windowed as-of feature query
  (population LEFT JOIN peripheral ON key + time window, GROUP BY
  population id) with the aggregation battery rendered as portable SQL;
- :func:`rollup_sql` — the tier continuous-aggregate as plain SQL.

These are the engine's portable oracle (the reference ships a sqlite3
UDAF pack for the same purpose, sqlite3/connect.py:104-144); pytest
runs the transpiled SQL on DuckDB against the Spark operators.
"""

from __future__ import annotations

__all__ = ["asof_feature_sql", "rollup_sql", "AGG_SQL", "oracle_metric_sql"]


def _w(ts_pop: str, horizon: float, memory: float | None, ts_peri: str) -> str:
    cond = f"epoch({ts_peri}) <= epoch({ts_pop}) - {horizon}"
    if memory is not None:
        cond += f" AND epoch({ts_peri}) > epoch({ts_pop}) - {horizon} - {memory}"
    return cond


# Portable SQL for each battery aggregation; {v} = value expr, {t} =
# peripheral epoch, {tr} = reference epoch. Population-variance and
# linear-interpolation quantile semantics per Aggregations.hpp. The full
# battery (49 aggregations — every metric the reference's sqlite3 UDAF
# pack registers, sqlite3/connect.py:104-148) renders as ONE SELECT-list
# expression each; group-materializing forms (mode, num_max/min,
# count above/below mean, ewma_trend) use DuckDB list aggregates — the
# oracle path, not the engine path.
_DTC = "(CASE WHEN {v} IS NOT NULL THEN ({tr} - {t}) END)"  # Δt, v-paired


def _ewma_sql(h: float) -> str:
    w = f"(CASE WHEN {{v}} IS NOT NULL THEN exp(ln(0.5) * ({{tr}} - {{t}}) / {h}) END)"
    return f"sum({w} * {{v}}) / nullif(sum({w}), 0)"


def _ewma_trend_sql(h: float) -> str:
    """Weighted-LS intercept with CENTERED second moments
    (Aggregations.hpp:211-278), as one expression: plain aggregates for
    sw/mx/my; the centered sums via list aggregates with the aggregate
    means captured inside the lambda."""
    w = f"(CASE WHEN {{v}} IS NOT NULL THEN exp(ln(0.5) * ({{tr}} - {{t}}) / {h}) END)"
    flt = "FILTER (WHERE {v} IS NOT NULL)"
    sw = f"sum({w})"
    mx = f"(sum({w} * ({{tr}} - {{t}})) / {sw})"
    my = f"(sum({w} * {{v}}) / {sw})"
    zip3 = (
        f"list_zip(list({w}) {flt}, list({{tr}} - {{t}}) {flt}, list({{v}}) {flt})"
    )
    xx = f"list_sum(list_transform({zip3}, p -> p[1] * pow(p[2] - {mx}, 2)))"
    xy = (
        f"list_sum(list_transform({zip3},"
        f" p -> p[1] * (p[2] - {mx}) * (p[3] - {my})))"
    )
    return (
        f"CASE WHEN {sw} IS NULL OR {sw} = 0 THEN NULL "
        f"WHEN {xx} = 0 OR var_pop({_DTC}) = 0 THEN {my} "
        f"ELSE {my} - {mx} * (({xy}) / ({xx})) END"
    )


_TS_STRUCT = "(CASE WHEN {v} IS NOT NULL THEN struct_pack(v := {v}, t := {sign}({t})) END)"


AGG_SQL = {
    "count": "cast(count({v}) AS double)",
    "sum": "coalesce(sum({v}), 0.0)",
    "avg": "avg({v})",
    "min": "min({v})",
    "max": "max({v})",
    "median": "median({v})",
    "stddev_pop": "stddev_pop({v})",
    "var_pop": "var_pop({v})",
    # population (non-excess) skew/kurtosis from raw moments with the
    # reference's all-identical guard (DuckDB's builtins are SAMPLE
    # skew/kurtosis — different formula)
    "skew": (
        "CASE WHEN var_pop({v}) = 0 THEN 0.0 "
        "ELSE (avg(pow({v}, 3)) - 3 * avg({v}) * avg(pow({v}, 2)) "
        "+ 2 * pow(avg({v}), 3)) / pow(var_pop({v}), 1.5) END"
    ),
    "kurtosis": (
        "CASE WHEN var_pop({v}) = 0 THEN 0.0 "
        "ELSE (avg(pow({v}, 4)) - 4 * avg({v}) * avg(pow({v}, 3)) "
        "+ 6 * pow(avg({v}), 2) * avg(pow({v}, 2)) "
        "- 3 * pow(avg({v}), 4)) / pow(var_pop({v}), 2) END"
    ),
    "count_distinct": "cast(count(DISTINCT {v}) AS double)",
    "count_distinct_over_count": (
        "cast(count(DISTINCT {v}) AS double) "
        "/ nullif(cast(count({v}) AS double), 0.0)"
    ),
    "count_minus_count_distinct": (
        "cast(count({v}) AS double) - cast(count(DISTINCT {v}) AS double)"
    ),
    "first": "arg_min({v}, {t})",
    "last": "arg_max({v}, {t})",
    "avg_time_between": (
        "CASE WHEN count({t}) <= 1 THEN 0.0 "
        "ELSE (max({t}) - min({t})) / (count({t}) - 1) END"
    ),
    "trend": (
        f"CASE WHEN var_pop({_DTC}) = 0 THEN avg({{v}}) "
        f"ELSE avg({{v}}) - avg({_DTC}) * "
        f"(covar_pop({_DTC}, {{v}}) / var_pop({_DTC})) END"
    ),
    "variation_coefficient": (
        "CASE WHEN avg({v}) = 0 THEN NULL ELSE var_pop({v}) / avg({v}) END"
    ),
    # MODE, greatest-value tie rule (Aggregations.hpp:386-402)
    "mode": (
        "(list_reduce(map_entries(histogram({v})), (a, b) -> "
        "CASE WHEN b.value > a.value OR (b.value = a.value AND b.key > a.key) "
        "THEN b ELSE a END)).key"
    ),
    # two-pass family (Aggregations.hpp:404-440, 77-114) — the SQL form
    # materializes the group as a list (oracle path; the engine uses
    # two hash aggregations instead)
    "num_max": (
        "coalesce(cast(len(list_filter(list({v}), x -> x = max({v}))) AS double), 0.0)"
    ),
    "num_min": (
        "coalesce(cast(len(list_filter(list({v}), x -> x = min({v}))) AS double), 0.0)"
    ),
    "count_above_mean": (
        "coalesce(cast(len(list_filter(list({v}), x -> x > avg({v}))) AS double), 0.0)"
    ),
    "count_below_mean": (
        "coalesce(cast(len(list_filter(list({v}), x -> x < avg({v}))) AS double), 0.0)"
    ),
    # TIME SINCE {FIRST,LAST} {MAX,MIN}: lexicographic struct extremum
    # with the pinned tie direction (Aggregations.hpp:519-615), same
    # construction as operators/aggregates.py
    "time_since_last_maximum": (
        "max({tr}) - max" + _TS_STRUCT.replace("{sign}", "") + ".t"
    ),
    "time_since_first_maximum": (
        "max({tr}) + max" + _TS_STRUCT.replace("{sign}", "-") + ".t"
    ),
    "time_since_first_minimum": (
        "max({tr}) - min" + _TS_STRUCT.replace("{sign}", "") + ".t"
    ),
    "time_since_last_minimum": (
        "max({tr}) + min" + _TS_STRUCT.replace("{sign}", "-") + ".t"
    ),
}

# exact linear-interpolation quantiles (Aggregations.hpp:444-469)
for _q in (0.01, 0.05, 0.10, 0.25, 0.75, 0.90, 0.95, 0.99):
    AGG_SQL[f"q{int(_q * 100):02d}"] = f"quantile_cont({{v}}, {_q})"

# EWMA / EWMA_TREND families over the reference's half-life bank
# (Aggregations.hpp:176-278)
_HALF_LIVES_S = {
    "1s": 1.0, "1m": 60.0, "1h": 3600.0, "1d": 86400.0,
    "7d": 7 * 86400.0, "30d": 30 * 86400.0, "90d": 90 * 86400.0,
    "365d": 365 * 86400.0,
}
for _name, _h in _HALF_LIVES_S.items():
    AGG_SQL[f"ewma_{_name}"] = _ewma_sql(_h)
    AGG_SQL[f"ewma_trend_{_name}"] = _ewma_trend_sql(_h)


def oracle_metric_sql(metric: str, v: str, t: str, tr: str, digits: int = 6) -> str:
    """Render one AGG_SQL metric as a rounded, signed-zero-normalized
    oracle expression: ``(round(expr, digits) + 0.0)``.

    The ``+ 0.0`` is load-bearing for byte-hash gates: DuckDB's
    ``round`` keeps IEEE signed zero — ``round(-1e-12, 6)`` returns
    ``-0.0`` — while Spark's ``F.round`` goes through BigDecimal, which
    has no signed zero and emits ``+0.0``. The two are equal under
    ``==`` but differ byte-wise (146 ``skew`` cells at sf0.01, round-4
    driver gate). IEEE addition normalizes: ``-0.0 + 0.0 == +0.0`` in
    round-to-nearest, and is exact (a no-op) for every other value, so
    this is safe to apply to EVERY double metric, sign-capable or not.
    NULL propagates (``NULL + 0.0`` is NULL).
    """
    return f"(round({AGG_SQL[metric].format(v=v, t=t, tr=tr)}, {digits}) + 0.0)"


def asof_feature_sql(
    population: str,
    peripheral: str,
    on: str | tuple[str, str],
    population_id: str,
    pop_ts: str,
    peri_ts: str,
    value_col: str,
    horizon: float = 0.0,
    memory: float | None = None,
    aggs: list[str] | None = None,
) -> str:
    """Render the as-of feature query (the reference's FEATURE_i table,
    AbstractFeature.cpp:89-170) as one ANSI SQL statement."""
    aggs = aggs or ["count", "sum", "avg", "min", "max"]
    pop_key, peri_key = (on, on) if isinstance(on, str) else on
    v, t = f"t2.{value_col}", f"epoch(t2.{peri_ts})"
    tr = f"epoch(t1.{pop_ts})"
    cols = ",\n  ".join(
        AGG_SQL[a].format(v=v, t=t, tr=tr) + f" AS {a}" for a in aggs
    )
    return f"""SELECT
  t1.{population_id},
  {cols}
FROM {population} t1
LEFT JOIN {peripheral} t2
  ON t2.{peri_key} = t1.{pop_key}
 AND {_w(f"t1.{pop_ts}", horizon, memory, f"t2.{peri_ts}")}
GROUP BY t1.{population_id}"""


def rollup_sql(
    table: str,
    tier_seconds: int,
    source_col: str = "source",
    ts_col: str = "event_time",
    value_col: str = "n_tok",
) -> str:
    """Render a tier continuous-aggregate as ANSI SQL (the transpiled
    form of rollup_from_raw)."""
    b = f"to_timestamp(floor(epoch({ts_col}) / {tier_seconds}) * {tier_seconds})"
    return f"""SELECT
  {source_col} AS source,
  {b} AS bucket_start,
  count({value_col}) AS cnt,
  coalesce(sum({value_col}), 0) AS sum_n_tok,
  min({value_col}) AS min_n_tok,
  max({value_col}) AS max_n_tok,
  coalesce(sum({value_col}), 0) / {tier_seconds}.0 AS rate
FROM {table}
GROUP BY 1, 2"""
