"""Skew-mitigation operators (SURVEY.md §4.3; pyspark guide: salting).

AQE's skew-join splitting handles joins automatically; aggregations on
a hot key still funnel the whole key into one reducer. Two-stage salted
aggregation fixes that shape: stage 1 aggregates on (key, salt) — the
hot key fans out over `salt_buckets` reducers — stage 2 merges the
partials per key. Decomposable aggregates only (sum/count/min/max and
anything derived, e.g. avg = sum/count).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["salted_agg", "adaptive_salted_join"]


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """GROUP BY keys → sum/count/min/max/avg of `value`, salted.

    Identical results to a direct groupBy (merge of decomposed
    partials); the difference is purely physical — partial state for a
    hot key spreads over `salt_buckets` tasks before the (tiny) merge
    shuffle. Use when one key holds >~1/parallelism of all rows.
    """
    keys = list(keys)
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(value).alias("__s"),
        F.count(value).alias("__c"),
        F.min(value).alias("__mn"),
        F.max(value).alias("__mx"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("__s").alias("sum_value"),
        F.sum("__c").alias("n"),
        F.min("__mn").alias("min_value"),
        F.max("__mx").alias("max_value"),
        (F.sum("__s") / F.sum("__c")).alias("avg_value"),
    )


def adaptive_salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    salt_buckets: int = 8,
    hot_frac: float = 0.05,
) -> DataFrame:
    """Salted join that pays replication ONLY for detected hot keys —
    the production form of the full-salt recipe (which multiplies the
    entire build side by S even though almost every key is cold).

    1. Detect: per-key probe counts; keys holding more than `hot_frac`
       of all probe rows are hot. The hot set is by construction tiny
       (at most 1/hot_frac keys), so it broadcasts; at 100 TB compute
       it from a sample instead of the full count — the split is a
       pure optimization, so a sampling miss costs performance, never
       correctness.
    2. Split: probe rows tag hot/cold via broadcast semi-lookup; the
       build side replicates rows ONLY for hot keys (explode 0..S-1),
       cold build rows pass through once.
    3. Join: cold path is the plain equi-join AQE already handles;
       hot path joins on (key, salt) with the probe's salt drawn from
       a row-unique hash. Union of the two paths == the plain join,
       row for row (every probe row still meets its build row exactly
       once, in exactly one salt partition).

    Returns the joined frame with the probe and build columns.
    """
    total = probe.count()
    # checkpointed: the hot set (≤ 1/hot_frac rows) feeds BOTH broadcast
    # lookups; without it each broadcast recomputes the full probe-side
    # key-count aggregation. The TAGGED frames below are deliberately
    # NOT checkpointed: they are corpus-sized, and re-scanning the input
    # for the cold and hot filters streams in parallel for free, while
    # materializing them at 100 TB would cost more than it saves
    # (recompute-over-materialize, the same call exact_knn makes).
    hot_keys = (
        probe.groupBy(probe_key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > float(total) * hot_frac)
        .select(F.col(probe_key).alias("__hk"))
        .localCheckpoint(eager=False)
    )
    p_tagged = probe.join(
        F.broadcast(hot_keys), probe[probe_key] == hot_keys["__hk"], "left"
    )
    p_cold = p_tagged.filter(F.col("__hk").isNull()).drop("__hk")
    p_hot = p_tagged.filter(F.col("__hk").isNotNull()).drop("__hk")

    b_tagged = build.join(
        F.broadcast(hot_keys), build[build_key] == hot_keys["__hk"], "left"
    )
    b_cold = b_tagged.filter(F.col("__hk").isNull()).drop("__hk")
    b_hot = b_tagged.filter(F.col("__hk").isNotNull()).drop("__hk")

    cold = p_cold.join(b_cold, p_cold[probe_key] == b_cold[build_key])

    p_salted = p_hot.withColumn(
        "__salt", F.pmod(F.xxhash64(*p_hot.columns), F.lit(salt_buckets)).cast("int")
    )
    b_salted = b_hot.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    hot = p_salted.join(
        b_salted,
        (p_salted[probe_key] == b_salted[build_key]) & (p_salted["__salt"] == b_salted["__salt"]),
    ).drop("__salt")

    return cold.unionByName(hot)
