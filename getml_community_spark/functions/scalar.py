"""Scalar expression surface — the reference's lazy ColumnView operator
set (SURVEY.md §2.3) expressed as Spark Column functions.

Reference evaluators: FloatOpParser.cpp / StringOpParser.cpp /
BoolOpParser.cpp (src/engine/src/engine/); python surface
src/python-api/getml/data/columns/columns.py. Spark's Column expression
tree IS the reference's JSON cmd tree ({operator_, operand1_,
operand2_}, columns.py:296-316) — Catalyst provides the laziness, so
this module only needs the few functions Spark lacks or whose
conventions differ (erf, tgamma, weekday/yearday offsets, double-epoch
timestamps).

Everything stays JVM-side / whole-stage-codegen: no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = [
    "rowid",
    "arange",
    "random_column",
    "erf",
    "tgamma",
    "lgamma",
    "cbrt",
    "weekday",
    "yearday",
    "as_ts",
    "as_num",
    "as_str",
    "epoch_seconds",
    "from_epoch",
    "update",
    "is_inf",
    "is_null_or_nan",
    "seconds",
    "minutes",
    "hours",
    "days",
    "weeks",
    "milliseconds",
    "microseconds",
]


def erf(col: Column) -> Column:
    """Error function (FloatOpParser token 'erf'). Spark SQL ships no
    erf builtin; Abramowitz–Stegun 7.1.26 rational approximation keeps
    it codegen'd JVM-side (|error| ≤ 1.5e-7, adequate for feature
    engineering; use a pandas UDF where bit-exactness matters)."""
    x = col.cast("double")
    sign = F.when(x < 0, -1.0).otherwise(1.0)
    ax = F.abs(x)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * ax)
    poly = (
        t
        * (
            F.lit(0.254829592)
            + t
            * (
                F.lit(-0.284496736)
                + t * (F.lit(1.421413741) + t * (F.lit(-1.453152027) + t * F.lit(1.061405429)))
            )
        )
    )
    return sign * (F.lit(1.0) - poly * F.exp(-ax * ax))


def lgamma(col: Column) -> Column:
    """log-gamma: 'lgamma' token — Spark has no builtin; Stirling series
    via shift (Lanczos-free, codegen-safe). For x>0."""
    # use log(gamma(x)) = log(gamma(x+5)) - log(x(x+1)(x+2)(x+3)(x+4))
    x = col.cast("double")
    xs = x + F.lit(5.0)
    stirling = (
        (xs - F.lit(0.5)) * F.log(xs)
        - xs
        + F.lit(0.9189385332046727)  # 0.5*ln(2π)
        + F.lit(1.0) / (F.lit(12.0) * xs)
        - F.lit(1.0) / (F.lit(360.0) * xs * xs * xs)
        + F.lit(1.0) / (F.lit(1260.0) * xs * xs * xs * xs * xs)
    )
    shift = F.log(x * (x + 1) * (x + 2) * (x + 3) * (x + 4))
    return stirling - shift


def tgamma(col: Column) -> Column:
    """gamma via exp(lgamma) (the 'tgamma' token; SURVEY.md §2.3 trick)."""
    return F.exp(lgamma(col))


def cbrt(col: Column) -> Column:
    return F.cbrt(col)


def weekday(ts: Column) -> Column:
    """Reference 'weekday': days since Sunday, 0..6 (FloatOpParser —
    sqlite strftime('%w') convention). Spark dayofweek is 1=Sunday."""
    return (F.dayofweek(ts) - F.lit(1)).cast("double")


def yearday(ts: Column) -> Column:
    """Day of year 1..366 ('yearday' token)."""
    return F.dayofyear(ts).cast("double")


def epoch_seconds(ts: Column) -> Column:
    """Timestamps are double seconds since epoch in the reference
    (data/time.py:11-23); sub-second = fraction."""
    return ts.cast("double")


def from_epoch(sec: Column) -> Column:
    return sec.cast("timestamp")


def as_ts(col: Column, time_formats: list[str] | None = None) -> Column:
    """String → timestamp with format fallbacks (columns.py:1783-1849)."""
    if not time_formats:
        return F.to_timestamp(col)
    expr = F.to_timestamp(col, time_formats[0])
    for fmt in time_formats[1:]:
        expr = F.coalesce(expr, F.to_timestamp(col, fmt))
    return expr


def as_num(col: Column) -> Column:
    return col.cast("double")


def as_str(col: Column) -> Column:
    return col.cast("string")


def update(col: Column, cond: Column, values: Column) -> Column:
    """Conditional assignment (columns.py:1890-1946 'update')."""
    return F.when(cond, values).otherwise(col)


def is_inf(col: Column) -> Column:
    c = col.cast("double")
    return c.isin(float("inf"), float("-inf"))


def is_null_or_nan(col: Column) -> Column:
    c = col.cast("double")
    return c.isNull() | F.isnan(c)


def rowid(df, order_by: list[str] | None = None, out: str = "rowid"):
    """Generated rowid 0..n−1 (reference 'rowid' column,
    columns.py:112-173; used as pseudo-timestamp for ordered-but-
    unstamped series, modify_data_frames.cpp:135-149).

    With order_by: a deterministic global row_number (single-partition
    window for the final numbering — use only when a global order is
    semantically required). Without: monotonically_increasing_id
    (distributed, unique, NOT dense — the scalable default)."""
    from pyspark.sql import Window

    if order_by:
        w = Window.orderBy(*order_by)
        return df.withColumn(out, F.row_number().over(w) - F.lit(1))
    return df.withColumn(out, F.monotonically_increasing_id())


def arange(df, out: str = "arange", order_by: list[str] | None = None):
    """arange 0..n−1 (columns.py 'arange') — alias of rowid."""
    return rowid(df, order_by=order_by, out=out)


def random_column(df, seed: int = 42, out: str = "random"):
    """Uniform [0,1) random column with fixed seed
    (columns/random.py). rand(seed) is deterministic per row ordering
    within a partition layout; pin upstream partitioning for exact
    reproducibility."""
    return df.withColumn(out, F.rand(seed))


# duration helpers (reference data/time.py:23-125) — plain seconds
def seconds(n: float) -> float:
    return float(n)


def minutes(n: float) -> float:
    return 60.0 * n


def hours(n: float) -> float:
    return 3600.0 * n


def days(n: float) -> float:
    return 86400.0 * n


def weeks(n: float) -> float:
    return 7 * 86400.0 * n


def milliseconds(n: float) -> float:
    return n / 1e3


def microseconds(n: float) -> float:
    return n / 1e6
