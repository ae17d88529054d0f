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

__all__ = ["asof_feature_sql", "rollup_sql", "AGG_SQL"]


def _w(ts_pop: str, horizon: float, memory: float | None, ts_peri: str) -> str:
    cond = f"epoch({ts_peri}) <= epoch({ts_pop}) - {horizon}"
    if memory is not None:
        cond += f" AND epoch({ts_peri}) > epoch({ts_pop}) - {horizon} - {memory}"
    return cond


# Portable SQL for each battery aggregation; {v} = value expr, {t} =
# peripheral epoch, {tr} = reference epoch. Population-variance and
# linear-interpolation quantile semantics per Aggregations.hpp.
AGG_SQL = {
    "count": "count({v})",
    "sum": "coalesce(sum({v}), 0.0)",
    "avg": "avg({v})",
    "min": "min({v})",
    "max": "max({v})",
    "median": "median({v})",
    "q25": "quantile_cont({v}, 0.25)",
    "q75": "quantile_cont({v}, 0.75)",
    "q90": "quantile_cont({v}, 0.90)",
    "stddev_pop": "stddev_pop({v})",
    "var_pop": "var_pop({v})",
    "count_distinct": "cast(count(DISTINCT {v}) AS double)",
    "first": "arg_min({v}, {t})",
    "last": "arg_max({v}, {t})",
    "avg_time_between": (
        "CASE WHEN count({t}) <= 1 THEN 0.0 "
        "ELSE (max({t}) - min({t})) / (count({t}) - 1) END"
    ),
    "trend": (
        "CASE WHEN var_pop({tr} - {t}) = 0 THEN avg({v}) "
        "ELSE avg({v}) - avg({tr} - {t}) * "
        "(covar_pop({tr} - {t}, {v}) / var_pop({tr} - {t})) END"
    ),
    "ewma_1h": (
        "sum(exp(ln(0.5) * ({tr} - {t}) / 3600.0) * {v}) / "
        "sum(exp(ln(0.5) * ({tr} - {t}) / 3600.0))"
    ),
    "ewma_1d": (
        "sum(exp(ln(0.5) * ({tr} - {t}) / 86400.0) * {v}) / "
        "sum(exp(ln(0.5) * ({tr} - {t}) / 86400.0))"
    ),
    "variation_coefficient": (
        "CASE WHEN avg({v}) = 0 THEN NULL ELSE var_pop({v}) / avg({v}) END"
    ),
}


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
