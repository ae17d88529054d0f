"""Transpiled-SQL runner — the reference's deployment story
(src/python-api/getml/spark.py:26-60: read an SQL script, split on ';',
``spark.sql`` each statement) as a first-class call: feed it the output
of :func:`to_sql.asof_feature_sql` / :meth:`FastPropPipeline.to_sql` and
get the final DataFrame back, so ``to_sql()`` is a product (runs the
fitted pipeline anywhere Spark runs) and not just the test oracle.

Dialect note: the AGG_SQL templates target the ANSI subset DuckDB and
Spark share, except ``epoch(ts)`` (DuckDB-ism). Spark 4 supports SQL
scalar functions (CREATE TEMPORARY FUNCTION ... RETURN expr), so
:func:`register_compat` installs ``epoch`` once per session and the
same rendered SQL runs unchanged on both engines. Feature templates
that use DuckDB list aggregates (ewma_trend_*, mode, num_max/min,
count above/below mean) are oracle-only forms — the engine computes
those natively (operators/aggregates.py) and the runner raises a clear
error if asked to run one on Spark.
"""

from __future__ import annotations

import os
import re
from functools import reduce

from pyspark.sql import DataFrame, SparkSession

__all__ = ["register_compat", "run_sql", "run_pipeline_sql"]

# DuckDB-only constructs that cannot run on Spark SQL — fail fast with a
# pointer at the native operator instead of a cryptic parser error.
_DUCKDB_ONLY = re.compile(
    r"\b(list_zip|list_transform|list_filter|list_reduce|list_sum|"
    r"struct_pack|quantile_cont|map_entries|histogram)\s*\("
)


def register_compat(spark: SparkSession) -> None:
    """Install the SQL shims that make the rendered ANSI templates run
    on Spark: ``epoch(ts) -> double`` (DuckDB builtin, Spark SQL UDF).
    Idempotent (CREATE OR REPLACE)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION epoch(x TIMESTAMP) "
        "RETURNS DOUBLE RETURN CAST(x AS DOUBLE)"
    )


def _split_script(script: str) -> list[str]:
    """Split an SQL script on ';' like the reference does
    (spark.py:55-59) — statements in our rendered scripts never contain
    literal semicolons."""
    return [s for s in (p.strip() for p in script.split(";")) if s]


def run_sql(
    spark: SparkSession,
    statements: str | list[str],
    compat: bool = True,
) -> DataFrame | None:
    """Execute transpiled SQL against a live SparkSession.

    statements: one script string (split on ';'), a path to a '.sql'
    file or a directory of them (the reference's surface), or an
    explicit list of statements. Every statement is executed in order;
    the LAST statement's DataFrame is returned (None if the script is
    all DDL).
    """
    if isinstance(statements, str):
        if os.path.isdir(statements):
            stmts: list[str] = []
            for name in sorted(os.listdir(statements)):
                if name.endswith(".sql"):
                    with open(os.path.join(statements, name), encoding="utf-8") as f:
                        stmts.extend(_split_script(f.read()))
        elif statements.endswith(".sql") and os.path.isfile(statements):
            with open(statements, encoding="utf-8") as f:
                stmts = _split_script(f.read())
        else:
            stmts = _split_script(statements)
    else:
        stmts = [s for s in statements if s.strip()]
    if compat:
        register_compat(spark)
    out: DataFrame | None = None
    for stmt in stmts:
        m = _DUCKDB_ONLY.search(stmt)
        if m:
            raise ValueError(
                f"statement uses the DuckDB-only oracle form {m.group(1)}() — "
                "compute this aggregation with the native operator "
                "(operators/aggregates.py) instead of transpiled SQL"
            )
        out = spark.sql(stmt)
    return out


def run_pipeline_sql(
    spark: SparkSession,
    feature_sql: dict[str, str],
    population_id: str,
    compat: bool = True,
) -> DataFrame:
    """Run a fitted pipeline's ``to_sql()`` output (one SELECT per
    feature, keyed by feature name) and assemble the final feature
    table: population_id + every feature column, equi-joined on the id
    (the reference back-joins its per-feature FEATURE_i tables the same
    way). Each per-feature frame is (id, feature) — tiny relative to
    the peripheral scan that produced it, so the reduce-join chain is
    metadata-cheap and AQE broadcast-joins it."""
    if compat:
        register_compat(spark)
    frames = [run_sql(spark, sql, compat=False) for sql in feature_sql.values()]
    return reduce(lambda a, b: a.join(b, population_id, "outer"), frames)
