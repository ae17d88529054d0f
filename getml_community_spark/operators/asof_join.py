"""As-of / interval join + windowed feature aggregation — the reference
engine's core computation.

Semantics (reference helpers/Matchmaker.hpp:126-131, window columns from
modify_data_frames.cpp:336-377, paper Fig. 2): peripheral row *i*
matches population row *o* iff

    jk_peri[i] == jk_pop[o]
    AND ts_pop[o] − horizon − memory < ts_peri[i] <= ts_pop[o] − horizon

(memory=None ⇒ no lower bound; an explicit ``upper_ts`` column replaces
memory, mutually exclusive — modify_data_frames.cpp:213-217). The
aggregation battery then reduces each population row's match set —
one ``groupBy(population_id).agg(*battery)`` computes every feature in
a single shuffle, the Spark analogue of the reference's row-wise
batched generation (FastProp.cpp:269-310).

Scale strategy ("bucketed"): the reference bounds window lookups with a
per-key timestamp tree index (tsindex/InMemoryIndex.hpp:37-43). The
shuffle-native analogue is TIME BUCKETING: peripheral rows get bucket
``floor(ts/W)`` with W = memory; each population row joins to the ≤
⌈m/W⌉+1 = 2 buckets its window can touch (exploded via a literal
array, pure JVM). The equi-join on (key, bucket) bounds candidates per
row to O(rows in 2 buckets) instead of O(rows per key) — the skew killer
for long-history keys. The exact range predicate filters inside the
joined stage before any aggregation state is built.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["asof_match", "asof_features"]


def _epoch(col: Column) -> Column:
    """Any timestamp flavor (TIMESTAMP/TIMESTAMP_NTZ/numeric/string) →
    double epoch seconds (the reference's time representation,
    data/time.py:11-23). NTZ needs the hop through TIMESTAMP (session
    tz is pinned UTC in session.py, so the hop is value-preserving)."""
    return col.cast("timestamp").cast("double")


def _window_bounds(t_pop: Column, horizon: float, memory: float | None):
    upper = t_pop - F.lit(float(horizon))
    lower = upper - F.lit(float(memory)) if memory is not None else None
    return lower, upper


def asof_match(
    population: DataFrame,
    peripheral: DataFrame,
    on: list[str] | str,
    population_id: str,
    pop_ts: str,
    peri_ts: str,
    horizon: float = 0.0,
    memory: float | None = None,
    upper_ts: str | None = None,
    strategy: str = "auto",
    peri_cols: list[str] | None = None,
    pop_cols: list[str] | None = None,
) -> DataFrame:
    """Return matched (population_id, pop_ts_epoch, peripheral columns)
    pairs under the reference window predicate.

    Timestamps may be TimestampType (cast to double epoch seconds — the
    reference stores double epoch, data/time.py:11-23) or numeric.
    """
    if memory is not None and upper_ts is not None:
        raise ValueError("memory and upper_ts are mutually exclusive")
    on = [on] if isinstance(on, str) else list(on)
    if not on:
        # keyless join: the reference adds a constant join key to both
        # sides (modify_data_frames.cpp:121-131 add_jk). The bucketed
        # strategy still bounds candidates by time bucket, so this is a
        # time-windowed cross join, not a full cartesian.
        population = population.withColumn("__jk", F.lit(1))
        peripheral = peripheral.withColumn("__jk", F.lit(1))
        on = ["__jk"]

    t_pop = _epoch(F.col(pop_ts))
    t_peri = _epoch(F.col(peri_ts))
    lower, upper = _window_bounds(t_pop, horizon, memory)

    keep = peri_cols or [c for c in peripheral.columns if c not in on]
    peri = peripheral.select(
        *on, t_peri.alias("__t_peri"), *[F.col(c) for c in keep if c != peri_ts]
    )
    # pop_cols: population attributes carried into the match frame — the
    # reference's same_units_* value extraction (population col − peripheral
    # col per match, fastprop/Aggregator.cpp:282-320) needs them.
    extra_pop = [c for c in (pop_cols or []) if c not in on and c != population_id]
    pop = population.select(
        F.col(population_id).alias("__pop_id"),
        *on,
        t_pop.alias("__t_pop"),
        *[F.col(c).alias(f"__pop_{c}") for c in extra_pop],
    )

    if strategy == "auto":
        strategy = "bucketed" if memory is not None else "range"

    if strategy == "bucketed":
        w = float(memory)
        peri = peri.withColumn(
            "__bkt", F.floor(F.col("__t_peri") / F.lit(w)).cast("long")
        )
        lo_b = F.floor((F.col("__t_pop") - F.lit(float(horizon)) - F.lit(w)) / F.lit(w))
        hi_b = F.floor((F.col("__t_pop") - F.lit(float(horizon))) / F.lit(w))
        pop_e = pop.withColumn(
            "__bkt",
            F.explode(F.array_distinct(F.array(lo_b.cast("long"), hi_b.cast("long")))),
        )
        joined = pop_e.join(peri, on=on + ["__bkt"], how="inner").drop("__bkt")
    else:
        joined = pop.join(peri, on=on, how="inner")

    upper_pred = F.col("__t_peri") <= (F.col("__t_pop") - F.lit(float(horizon)))
    cond = upper_pred
    if memory is not None:
        cond = cond & (
            F.col("__t_peri")
            > (F.col("__t_pop") - F.lit(float(horizon)) - F.lit(float(memory)))
        )
    if upper_ts is not None:
        # reference: NaN/NULL upper ⇒ open-ended (Matchmaker.hpp:126-131)
        u = _epoch(F.col(upper_ts))
        cond = cond & (u.isNull() | F.isnan(u) | (u > F.col("__t_pop")))
    return joined.where(cond)


def asof_features(
    population: DataFrame,
    peripheral: DataFrame,
    on: list[str] | str,
    population_id: str,
    pop_ts: str,
    peri_ts: str,
    value_col: str | None = None,
    horizon: float = 0.0,
    memory: float | None = None,
    include: set[str] | None = None,
    prefix: str = "",
    strategy: str = "auto",
    value_expr=None,
    peri_cols: list[str] | None = None,
    pop_cols: list[str] | None = None,
) -> DataFrame:
    """Per-population-row windowed aggregation battery (the reference's
    FEATURE_i tables, AbstractFeature.cpp:89-170, computed as ONE
    multi-aggregate groupBy instead of N feature tables + N back-joins —
    HumanReadableSQLGenerator.cpp:557's join chain collapses into a
    single shuffle).

    Population rows with no matches keep LEFT-join semantics: count=0,
    sum=0.0, everything else NULL (the engine's NaN), via the final
    left join back onto the population.
    """
    from .aggregates import battery

    if (value_col is None) == (value_expr is None):
        raise ValueError("pass exactly one of value_col / value_expr")
    matched = asof_match(
        population,
        peripheral,
        on,
        population_id,
        pop_ts,
        peri_ts,
        horizon=horizon,
        memory=memory,
        strategy=strategy,
        peri_cols=(peri_cols or ([value_col, peri_ts] if value_col else None)),
        pop_cols=pop_cols,
    )
    # value_expr enables the reference's value-extraction variants
    # (fastprop/Aggregator.cpp): categorical dummies
    # (CASE WHEN c='x' THEN 1 ELSE 0, SQLMaker.cpp:295-307) and
    # same-units differences (__pop_<col> - peripheral col, :282-320).
    aggs = battery(
        value_expr if value_expr is not None else F.col(value_col),
        ts=F.col("__t_peri"),
        t_ref=F.col("__t_pop"),  # Δt = ts_pop − ts_peri, Aggregator.hpp:415-423
        include=include,
        prefix=prefix,
    )
    feats = matched.groupBy("__pop_id").agg(*aggs)
    out = population.join(
        feats, population[population_id] == feats["__pop_id"], "left"
    ).drop("__pop_id")
    # empty-match defaults (Aggregations.hpp: COUNT→0, SUM→0.0)
    for c in (prefix + "count", prefix + "sum"):
        if c in out.columns:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0.0)))
    return out
