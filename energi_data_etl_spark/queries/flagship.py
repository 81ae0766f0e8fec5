"""Flagship query (SURVEY.md §3.3 / §7 Phase 1).

The reference's whole pipeline + dashboard recast onto the ``events``
fixture: filter to selected months (P5), truncate event-time to day
(F1), group by (date, event_type) and average the value (A1) — exactly
``GROUP BY date, zone AVG(price)`` from scripts/energy_etl.py:69-70.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..pipeline.energy import daily_average
from ..sources.tables import load_table
from .catalog import query

FLAGSHIP_MONTHS = (1, 2, 3)


@query(
    "dashboard_cards",
    tier="A4+P5 (the Power BI zone cards: month slicer → per-key average)",
    oracle="""
        SELECT event_type,
               ROUND(AVG(value), 6) AS avg_value,
               COUNT(*) AS n_events
        FROM events
        WHERE MONTH(CAST(ts AS DATE)) IN (1)
        GROUP BY event_type
    """,
)
def dashboard_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's dashboard query (images/Powerbi.png: four per-zone
    average cards under a month slicer, README.md:18-21) — the engine's
    `zone_summary` composed over the raw events."""
    events = load_table(spark, "events", sf_dir)
    filtered = events.withColumn("date", F.to_date("ts")).filter(F.month("date").isin(1))
    return filtered.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "flagship_daily_avg",
    tier="A1+P5+F1 (REF core transform)",
    oracle="""
        SELECT CAST(ts AS DATE) AS date,
               event_type,
               ROUND(AVG(value), 6) AS avg_value
        FROM events
        WHERE MONTH(CAST(ts AS DATE)) IN (1, 2, 3)
        GROUP BY 1, 2
    """,
)
def flagship_daily_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily average value per event_type for Jan–Mar (reference transform
    energy_etl.py:69-70 + Power BI month slicer)."""
    events = load_table(spark, "events", sf_dir)
    daily = daily_average(events, ts_col="ts", key_col="event_type", value_col="value", months=FLAGSHIP_MONTHS)
    return daily.select("date", "event_type", F.round("avg_value", 6).alias("avg_value"))
