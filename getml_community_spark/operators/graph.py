"""Distributed connected components — the transitive closure behind
full near-duplicate clustering.

``minhash_lsh_dedup`` / ``embedding_near_dups`` emit PAIRS; dropping
the larger id of each pair is a one-hop approximation (documented in
dedup.py): in a chain a—b—c it keeps c when b was already dropped.
The exact semantics is "one survivor per connected component", which
needs an iterative algorithm — this module implements min-label
propagation (the simple member of the map-reduce CC family of
Kiveris et al. 2014, public):

    label(v) ← min(label(v), min over neighbors' labels)

repeated until no label changes. Convergence is bounded by the largest
component's diameter; near-dup clusters are shallow (dup clusters are
near-cliques), so a handful of rounds suffices — ``max_iter`` guards
pathological chains.

Scale shape per round: one shuffle join (edges × labels) + one
aggregation; the label frame is eagerly localCheckpoint'ed every round
so lineage stays O(1) deep and the convergence count reuses the
materialized RDD (GC-cleaned, same discipline as dedup.py). The
convergence check is a count() on the joined frame — one scalar per
round to the driver, never rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    ``edges`` is undirected input (each pair listed once is enough).
    Nodes only appear if they occur in ``edges`` — callers keep
    isolated nodes implicitly (they are their own component).
    Raises RuntimeError if ``max_iter`` rounds do not converge.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            e.join(labels, e["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("__nbr"))
        )
        merged = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.col("component").alias("__old"),
                F.least(
                    F.col("component"), F.coalesce(F.col("__nbr"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = merged.where(F.col("component") != F.col("__old")).count()
        labels = merged.select("node", "component")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter exceeds max_iter; raise it)"
    )
