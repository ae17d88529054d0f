"""Staging joins — the reference's many-to-one / one-to-one placeholder
joins (src/engine/src/engine/staging.cpp:146-229 join_all/join_one):
LEFT JOIN dimension tables onto the population, with cardinality
validation for declared one-to-one joins (the reference errors when a
one-to-one join finds >1 match).

Spark-first: dimension sides are broadcast when small (Catalyst decides
via autoBroadcastJoinThreshold; ``broadcast_hint`` forces it), so the
fact table never shuffles — the scale-relevant property of a staging
join over 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["join_many_to_one", "join_one_to_one", "CardinalityError"]


class CardinalityError(ValueError):
    """A join declared one-to-one found duplicate keys on the dim side."""


def _dup_keys(dim: DataFrame, on: list[str], sample: int = 5) -> list:
    return (
        dim.groupBy(*on)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .limit(sample)
        .collect()
    )


def join_many_to_one(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    broadcast_hint: bool = True,
) -> DataFrame:
    """LEFT JOIN a dimension onto the fact table (join_all semantics:
    ≤1 match taken per fact row is the caller's contract; no check)."""
    on = [on] if isinstance(on, str) else list(on)
    d = F.broadcast(dim) if broadcast_hint else dim
    return fact.join(d, on, "left")


def join_one_to_one(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    broadcast_hint: bool = True,
) -> DataFrame:
    """LEFT JOIN with the reference's one-to-one validation
    (staging.cpp:212-229: error if a key matches more than one dim
    row). The check is one cheap groupBy on the (small) dim side."""
    on = [on] if isinstance(on, str) else list(on)
    dups = _dup_keys(dim, on)
    if dups:
        raise CardinalityError(
            f"one-to-one join: duplicate keys on dimension side: {dups}"
        )
    d = F.broadcast(dim) if broadcast_hint else dim
    return fact.join(d, on, "left")
