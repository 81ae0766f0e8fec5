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

__all__ = ["salted_agg"]


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
