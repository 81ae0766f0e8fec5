"""Join operators beyond plain ``df.join`` (SURVEY.md §2.4).

The only join Spark lacks natively is the as-of join (J6). The naive
formulation — non-equi join + per-row max — is a quadratic
broadcast-nested-loop per key. The scalable formulation below is the
classic union+window rewrite: ONE shuffle on the join keys, linear scan
per partition, no pairwise blowup — this is the shape that survives
100 TB (both sides hash-partitioned by key, sorted once).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``on`` keys (DuckDB/pandas
    ``ASOF JOIN`` semantics, ties include equality) — or, with
    ``direction="forward"``, the EARLIEST right row with
    ``right.ts >= left.ts`` (next-event attribution; pandas
    merge_asof's forward mode, which DuckDB's ASOF lacks).

    Plan: tag both sides, union, then ``last(value, ignorenulls=True)``
    over a window partitioned by keys and ordered by (ts, side) — right
    rows sort before left rows at equal ts so "at-or-before" includes
    ties (forward mirrors it: ``first`` over the FOLLOWING frame with
    right rows sorting after left at equal ts, keeping ties included).
    Cost: one Exchange on ``on`` + one sort; no cartesian pair
    generation (contrast: join-then-rank is O(|L|·|R|) per key).
    """
    on = list(on)
    value_cols = list(value_cols)
    lcols = [c for c in left.columns]

    backward = direction == "backward"
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1 if backward else 0).alias("__side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__v_{c}") for c in value_cols],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0 if backward else 1).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"__l_{c}") for c in lcols],
    )

    w = Window.partitionBy(*on).orderBy(F.col("__ts").asc(), F.col("__side").asc())
    if backward:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fill = [F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}") for c in value_cols]
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        fill = [F.first(f"__v_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}") for c in value_cols]
    merged = l_tagged.unionByName(r_tagged).select("*", *fill)
    out = merged.filter(F.col("__side") == (1 if backward else 0)).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[F.col(f"__asof_{c}").alias(f"asof_{c}") for c in value_cols],
    )
    if how == "inner":
        out = out.dropna(subset=[f"asof_{c}" for c in value_cols], how="all")
    return out
