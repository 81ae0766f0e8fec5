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


def run_incremental(
    spark,
    table_path: str,
    fetcher,
    landing_dir: str,
    today,
    zones: Sequence[str] = ("SE1", "SE2", "SE3", "SE4"),
    cold_start_days: int = 10,
    config=None,
) -> bool:
    """The reference's full lifecycle (energy_etl.py:39-84), Spark-first:

    1. watermark = MAX(date) on the fact table (:22-37), cold-start
       fallback to today-10d (:45-46);
    2. fetch plan for (watermark, today] × zones — distributed, not the
       reference's serial loop;
    3. land JSON → schema-explicit read → daily per-zone average (A1);
    4. append to the date-partitioned fact table with audit column +
       skip-empty guard (:82, :100, :105).

    Returns True iff new rows were appended.
    """
    import datetime

    from ..sources.http_json import ApiConfig, fetch_plan, fetch_to_landing, read_landing
    from ..sources.sinks import latest_watermark, write_fact_table

    wm = latest_watermark(spark, table_path, "date")
    start = (wm + datetime.timedelta(days=1)) if wm else (today - datetime.timedelta(days=cold_start_days))
    if start > today:
        return False  # nothing new — the reference's early-exit path
    plan = fetch_plan(spark, start, today, zones)
    fetch_to_landing(plan, landing_dir, fetcher=fetcher, config=config or ApiConfig())
    landed = read_landing(spark, landing_dir)
    daily = (
        landed.groupBy("date", "zone")
        .agg(F.avg("SEK_per_kWh").alias("avg_price"))
        .filter((F.col("date") >= F.lit(start.isoformat()).cast("date")))
    )
    return write_fact_table(daily, table_path, partition_by=("date",))


def zone_summary(daily: DataFrame, key_col: str = "zone", value_col: str = "avg_value", months: Sequence[int] | None = None) -> DataFrame:
    """The Power BI dashboard cards (A4+P5): per-key average over the
    month-filtered period (reference: images/Powerbi.png, 4 zone cards)."""
    out = daily
    if months:
        out = out.filter(F.month("date").isin(list(months)))
    return out.groupBy(key_col).agg(F.avg(value_col).alias("avg_value"))
