"""The flagship pipeline: hourly measurements → daily per-key averages.

This is the Spark-first re-expression of the reference's entire
transform (reference: scripts/energy_etl.py:53-79 — a serial per-zone
per-day loop computing ``sum(prices)/len(prices)``) plus the Power BI
dashboard query it feeds (month slicer → per-zone average cards,
reference: images/Powerbi.png, README.md:18-21).

Where the reference loops over O(zones × days) HTTP responses on one
thread, the engine expresses the same semantics as ONE declarative plan:

    scan → project(to_date) → [filter months] → groupBy(date, key).avg

which Catalyst executes as FileScan (column-pruned, predicate pushed)
→ partial HashAggregate (map-side combine: 24 hourly rows collapse to 1
before the shuffle) → Exchange on (date, key) → final HashAggregate.
At 100 TB with date-partitioned input, the month filter becomes partition
pruning and the shuffle carries only one row per (date, key) per task.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: The public API response shape consumed by the reference
#: (scripts/energy_etl.py:67-69; only SEK_per_kWh is read).
HOURLY_PRICE_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("SEK_per_kWh", T.DoubleType()),
            T.StructField("EUR_per_kWh", T.DoubleType()),
            T.StructField("EXR", T.DoubleType()),
            T.StructField("time_start", T.StringType()),
            T.StructField("time_end", T.StringType()),
        ]
    )
)

#: The reference's one durable table (scripts/energy_etl.py:92-97).
DAILY_AVG_SCHEMA = T.StructType(
    [
        T.StructField("date", T.DateType()),
        T.StructField("zone", T.StringType()),
        T.StructField("avg_price", T.DoubleType()),
        T.StructField("load_timestamp", T.TimestampType()),
    ]
)


def daily_average(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "zone",
    value_col: str = "price",
    months: Sequence[int] | None = None,
    value_alias: str = "avg_value",
) -> DataFrame:
    """GROUP BY day, key AVG(value) — the reference's core transform (A1)
    with the dashboard's month slicer (P5) folded in as a pushable filter.

    Returns columns (date, <key_col>, <value_alias>).
    """
    out = df.withColumn("date", F.to_date(F.col(ts_col)))
    if months:
        out = out.filter(F.month("date").isin(list(months)))
    return out.groupBy("date", key_col).agg(F.avg(value_col).alias(value_alias))


def zone_summary(daily: DataFrame, key_col: str = "zone", value_col: str = "avg_value", months: Sequence[int] | None = None) -> DataFrame:
    """The Power BI dashboard cards (A4+P5): per-key average over the
    month-filtered period (reference: images/Powerbi.png, 4 zone cards)."""
    out = daily
    if months:
        out = out.filter(F.month("date").isin(list(months)))
    return out.groupBy(key_col).agg(F.avg(value_col).alias("avg_value"))
