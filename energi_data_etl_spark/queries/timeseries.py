"""Time-series and incremental-maintenance queries: calendar-spine gap
filling with forward fill (the dashboard-continuity version of the
reference's daily table — a day with no ingested rows must still render,
energy_etl.py:69-70 never emits it), and the distributed MERGE/upsert
shape (the reference's append-only sink, energy_etl.py:105, upgraded to
keyed updates).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.tables import load_table
from .catalog import query


@query(
    "gapfill_forward",
    tier="W4+F1 (calendar spine + forward fill over sparse daily series)",
    oracle="""
        WITH spine AS (
            SELECT CAST(UNNEST(GENERATE_SERIES(DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY)) AS DATE) AS date
        ), types AS (
            SELECT DISTINCT event_type FROM events
        ), sparse AS (
            SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS date, event_type,
                   ROUND(AVG(value), 6) AS avg_value
            FROM events WHERE value > 180
            GROUP BY 1, 2
        ), joined AS (
            SELECT s.date, t.event_type, sp.avg_value
            FROM spine s CROSS JOIN types t
            LEFT JOIN sparse sp ON sp.date = s.date AND sp.event_type = t.event_type
        )
        SELECT date, event_type,
               LAST_VALUE(avg_value IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY date
                   ROWS UNBOUNDED PRECEDING) AS filled_value,
               CAST(avg_value IS NULL AS BOOLEAN) AS was_gap
        FROM joined
    """,
)
def gapfill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense calendar × observed categories, left-joined to the sparse
    series, gaps forward-filled with last-known value (days before the
    first observation stay NULL — honest, not zero-filled). The spine is
    generated, not scanned (sequence + explode: no driver loop); the
    fill is one window per category. events spans exactly Jan 2024 at
    every SF (TESTDATA), so the spine bounds are constants."""
    ev = load_table(spark, "events", sf_dir)
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"), F.lit("2024-01-30").cast("date"), F.expr("interval 1 day")
            )
        ).alias("date")
    )
    types = ev.select("event_type").distinct()
    sparse = (
        ev.filter(F.col("value") > 180)
        .groupBy(F.col("ts").cast("date").alias("date"), "event_type")
        .agg(F.round(F.avg("value"), 6).alias("avg_value"))
    )
    joined = (
        spine.crossJoin(F.broadcast(types))
        .join(sparse, ["date", "event_type"], "left")
    )
    w = Window.partitionBy("event_type").orderBy("date").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "date",
        "event_type",
        F.last("avg_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("avg_value").isNull().alias("was_gap"),
    )


@query(
    "merge_upsert_orders",
    tier="S5+J2 (distributed MERGE: full-outer coalesce upsert by key)",
    oracle="""
        WITH base AS (
            SELECT o_orderkey AS k, o_orderstatus AS status, o_totalprice AS price
            FROM orders WHERE o_orderkey % 3 != 0
        ), updates AS (
            -- raw IEEE product, NOT rounded per-row: ROUND(x*1.1, 2) hits
            -- .5-boundary cents where Spark HALF_UP and DuckDB scaled-double
            -- rounding diverge (ADVICE r05 high). Round only the wide SUM.
            SELECT o_orderkey AS k, o_orderstatus AS status, o_totalprice * 1.1 AS price
            FROM orders WHERE o_orderkey % 2 = 0
        ), merged AS (
            SELECT COALESCE(u.k, b.k) AS k,
                   COALESCE(u.status, b.status) AS status,
                   COALESCE(u.price, b.price) AS price,
                   CASE WHEN u.k IS NULL THEN 'kept'
                        WHEN b.k IS NULL THEN 'inserted'
                        ELSE 'updated' END AS op
            FROM base b FULL OUTER JOIN updates u ON b.k = u.k
        )
        SELECT status, op, COUNT(*) AS n, ROUND(SUM(price), 2) AS total_price
        FROM merged GROUP BY status, op
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO as a data-flow: base FULL OUTER JOIN updates on the
    key, COALESCE(update, base) per column, op tagged kept/updated/
    inserted. One shuffle on the merge key, linear, no driver state —
    the incremental-maintenance upgrade of the reference's append-only
    sink. At 100 TB both sides bucket by the key and the join is
    exchange-free (see operators/bucketing)."""
    o = load_table(spark, "orders", sf_dir)
    base = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("bk"),
        F.col("o_orderstatus").alias("bstatus"),
        F.col("o_totalprice").alias("bprice"),
    )
    updates = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("uk"),
        F.col("o_orderstatus").alias("ustatus"),
        # unrounded: per-row ROUND of a raw product diverges cross-engine
        # on .5-boundary cents; only the final wide SUM is rounded.
        (F.col("o_totalprice") * 1.1).alias("uprice"),
    )
    merged = base.join(updates, base.bk == updates.uk, "full_outer").select(
        F.coalesce("ustatus", "bstatus").alias("status"),
        F.coalesce("uprice", "bprice").alias("price"),
        F.when(F.col("uk").isNull(), "kept")
        .when(F.col("bk").isNull(), "inserted")
        .otherwise("updated")
        .alias("op"),
    )
    return merged.groupBy("status", "op").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("price"), 2).alias("total_price")
    )
