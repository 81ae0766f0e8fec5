"""Window-function surface (SURVEY.md §2.5 W1-W4). None exist in the
reference — its per-day loop (energy_etl.py:55-79) is what a windowed
formulation replaces. All built-in: one Exchange on the partition key
per window spec, sort within partitions, no driver round-trips.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..pipeline.energy import daily_average
from ..sources.tables import load_table
from .catalog import query


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily avg value per event_type — the flagship output (Phase 1),
    reused as the window-function base (composes like the reference's
    daily fact table feeding the dashboard)."""
    ev = load_table(spark, "events", sf_dir)
    return daily_average(ev, ts_col="ts", key_col="event_type", value_col="value")


_DAILY_CTE = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS date, event_type, AVG(value) AS avg_value
        FROM events GROUP BY 1, 2
    )
"""


@query(
    "window_lag_delta",
    tier="W2 (lag — day-over-day price delta, the canonical query on this data)",
    oracle=_DAILY_CTE
    + """
        SELECT date, event_type,
               ROUND(avg_value, 6) AS avg_value,
               ROUND(avg_value - LAG(avg_value, 1) OVER (PARTITION BY event_type ORDER BY date), 6) AS delta
        FROM daily
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("event_type").orderBy("date")
    return _daily(spark, sf_dir).select(
        "date",
        "event_type",
        F.round("avg_value", 6).alias("avg_value"),
        F.round(F.col("avg_value") - F.lag("avg_value", 1).over(w), 6).alias("delta"),
    )


@query(
    "window_rolling_7d",
    tier="W3 (rolling 7-day mean over daily aggregates)",
    oracle=_DAILY_CTE
    + """
        SELECT date, event_type,
               ROUND(AVG(avg_value) OVER (PARTITION BY event_type ORDER BY date
                                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS rolling_7d
        FROM daily
    """,
)
def window_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("event_type").orderBy("date").rowsBetween(-6, 0)
    return _daily(spark, sf_dir).select(
        "date", "event_type", F.round(F.avg("avg_value").over(w), 6).alias("rolling_7d")
    )


@query(
    "window_cumulative",
    tier="W4 (cumulative sum, first/last over frames)",
    oracle=_DAILY_CTE
    + """
        SELECT date, event_type,
               ROUND(SUM(avg_value) OVER (PARTITION BY event_type ORDER BY date
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_value,
               FIRST_VALUE(date) OVER (PARTITION BY event_type ORDER BY date) AS first_date
        FROM daily
    """,
)
def window_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("event_type").orderBy("date").rowsBetween(Window.unboundedPreceding, 0)
    return _daily(spark, sf_dir).select(
        "date",
        "event_type",
        F.round(F.sum("avg_value").over(w), 6).alias("cum_value"),
        F.first("date").over(w).alias("first_date"),
    )


@query(
    "window_range_1h",
    tier="W3 (time-based RANGE frame — trailing 1-hour window per event)",
    oracle="""
        SELECT event_id, user_id,
               CAST(COUNT(*) OVER w AS BIGINT)      AS n_last_hour,
               ROUND(SUM(value) OVER w, 4)          AS sum_last_hour
        FROM events
        WHERE user_id < 25
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def window_range_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time (not row counts): every event sees
    the events of the SAME user in its trailing hour — dense or sparse.
    Spark range frames need a numeric order key → seconds since epoch;
    bounds are inclusive in both engines."""
    ev = load_table(spark, "events", sf_dir).filter(F.col("user_id") < 25)
    secs = F.col("ts").cast("timestamp").cast("long")
    w = Window.partitionBy("user_id").orderBy(secs.alias("secs")).rangeBetween(-3600, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_last_hour"),
        F.round(F.sum("value").over(w), 4).alias("sum_last_hour"),
    )


@query(
    "window_rank_topk",
    tier="W1+§2.6 (per-group top-k via row_number)",
    oracle="""
        SELECT c_mktsegment, c_custkey, rn, ROUND(c_acctbal, 2) AS c_acctbal
        FROM (
            SELECT c_mktsegment, c_custkey, c_acctbal,
                   ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
            FROM customer
        ) t
        WHERE rn <= 3
    """,
)
def window_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per segment — rank-then-filter plans a
    partial per-partition top-k under AQE (WindowGroupLimit), so no
    partition materializes more than k rows per group."""
    c = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        c.select("c_mktsegment", "c_custkey", "c_acctbal", F.row_number().over(w).cast("long").alias("rn"))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "rn", F.round("c_acctbal", 2).alias("c_acctbal"))
    )


@query(
    "window_ranking_surface",
    tier="W1 (rank/dense_rank/percent_rank/ntile)",
    oracle="""
        SELECT c_mktsegment, c_custkey,
               RANK()         OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey) AS rnk,
               DENSE_RANK()   OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey) AS drnk,
               ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey), 6) AS prnk,
               NTILE(4)       OVER (PARTITION BY c_mktsegment ORDER BY c_custkey)   AS quartile
        FROM customer
        WHERE c_custkey < 400
    """,
)
def window_ranking_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking over a tied key (nationkey): rank/dense_rank/percent_rank
    are tie-stable; ntile uses the unique custkey order."""
    c = load_table(spark, "customer", sf_dir).filter(F.col("c_custkey") < 400)
    by_nation = Window.partitionBy("c_mktsegment").orderBy("c_nationkey")
    by_key = Window.partitionBy("c_mktsegment").orderBy("c_custkey")
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.rank().over(by_nation).cast("long").alias("rnk"),
        F.dense_rank().over(by_nation).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(by_nation), 6).alias("prnk"),
        F.ntile(4).over(by_key).cast("long").alias("quartile"),
    )
