"""Iterative graph operators (SURVEY.md §2.10 extension): connected
components over near-dup pair graphs — the dedup endgame (pairs →
clusters → one representative per cluster).

Label propagation with DataFrame ops only: each iteration joins labels
across edges and takes the min — O(diameter) rounds, each one shuffle
on the vertex id. Near-dup graphs are unions of small cliques/chains,
so convergence is fast; `localCheckpoint` truncates lineage so plans
don't grow with iterations (the classic iterative-Spark trap).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["connected_components"]


def connected_components(pairs: DataFrame, a: str = "a", b: str = "b", max_iter: int = 20) -> DataFrame:
    """Min-label propagation over an undirected edge list.

    Returns (id, component) where component = min vertex id reachable.
    Deterministic. Each iteration: label(v) ← min(label(v),
    min_{u∈N(v)} label(u)); stop when no label changed (or max_iter,
    which bounds cost on adversarial chains — 2^max_iter diameter
    coverage is ample for dedup graphs).

    Driver-sync budget: exactly ONE action per iteration. The `__changed`
    flag rides inside the label frame through a LAZY localCheckpoint,
    so the single `max(__changed)` aggregate both materializes the
    checkpoint (truncating lineage for the next round) and answers the
    convergence question — no separate count job re-running the join.
    """
    # edges feed EVERY iteration's join — persist once or the upstream
    # pair-generation plan (often itself a self-join) re-executes per round
    edges = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, "id", "left")
            .select("id", F.least("component", F.coalesce("nmin", "component")).alias("component"),
                    F.coalesce(F.col("nmin") < F.col("component"), F.lit(False)).alias("__changed"))
            .localCheckpoint(eager=False)
        )
        changed = updated.agg(F.max("__changed")).first()[0]
        labels = updated.select("id", "component")
        if not changed:
            break
    edges.unpersist()
    return labels
