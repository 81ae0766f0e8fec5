"""Data-quality validation (training-data pipelines live and die by
this): declarative rules evaluated in ONE pass over the table, plus
referential-integrity checks as anti-joins.

The single-aggregate formulation is the scale-correct shape: N rules
become N conditional sums inside one HashAggregate — one scan, no
per-rule jobs, partial aggregation before the (single-row) shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = ["Rule", "validate", "fk_violations"]


@dataclass(frozen=True)
class Rule:
    name: str
    predicate: Column  # rows where this is FALSE (or null) count as violations


def validate(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate all rules in one aggregate pass.

    Returns one row per rule: (rule, n_rows, n_violations, pct_ok).
    A null predicate result counts as a violation (unknown ≠ pass).
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(r.predicate.isNull() | ~r.predicate, 1).otherwise(0)).cast("long").alias(f"__v_{i}")
        for i, r in enumerate(rules)
    ]
    row = df.agg(*aggs)
    # unpivot the single agg row with stack() — one scan, one plan, no
    # N-way self-union of the aggregate subtree
    pairs = ", ".join(f"'{r.name}', __v_{i}" for i, r in enumerate(rules))
    return row.select(
        F.expr(f"stack({len(rules)}, {pairs})").alias("rule", "n_violations"), "n_rows"
    ).select(
        "rule",
        "n_rows",
        "n_violations",
        F.round((F.col("n_rows") - F.col("n_violations")) / F.greatest(F.col("n_rows"), F.lit(1)), 6).alias("pct_ok"),
    )


def fk_violations(fact: DataFrame, fk_col: str, dim: DataFrame, pk_col: str) -> DataFrame:
    """Referential integrity: fact rows whose FK has no match in the
    dimension (left_anti — the dim side broadcasts when small)."""
    return fact.join(F.broadcast(dim.select(pk_col)), fact[fk_col] == dim[pk_col], "left_anti")
