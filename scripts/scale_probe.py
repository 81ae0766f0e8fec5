"""Scale probe: generate a synthetic events table N× the sf0.1 fixture
(multi-file, properly partitioned parquet — unlike the single-row-group
fixtures) and time the core operator shapes on it.

Answers the 100 TB design question empirically at the largest scale the
container holds: do the plans stay shuffle-bounded (linear-ish) as data
grows 100×? Usage: python scripts/scale_probe.py [rows_millions]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import pyspark.sql.functions as F

sys.path.insert(0, ".")
from energi_data_etl_spark.operators.joins import asof_join  # noqa: E402
from energi_data_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    millions = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    n = int(millions * 1_000_000)
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}

    # --- generate: 30 days of events, value + type + user, 32 files
    gen_dir = tempfile.mkdtemp(prefix="scale_events_")
    t0 = time.perf_counter()
    (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                (F.lit(1704067200_000000) + (F.col("id") % 2_592_000) * F.lit(1_000_000)).cast("long")
            ).alias("ts"),
            (F.xxhash64("id") % 100_000).alias("user_id"),
            F.element_at(
                F.array(F.lit("click"), F.lit("view"), F.lit("purchase"), F.lit("signup"), F.lit("error")),
                (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5)) + 1).cast("int"),
            ).alias("event_type"),
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100000)) / 100.0).alias("value"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(gen_dir)
    )
    out["generate_sec"] = round(time.perf_counter() - t0, 2)
    ev = spark.read.parquet(gen_dir)

    def timed(name, df):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        out[name] = round(time.perf_counter() - t0, 2)

    # the flagship shape: scan → project → groupBy(date, type).avg
    timed(
        "daily_avg",
        ev.groupBy(F.to_date("ts").alias("date"), "event_type").agg(F.avg("value").alias("avg_value")),
    )
    # window: daily lag per type over the aggregate (tiny after agg)
    from pyspark.sql import Window

    daily = ev.groupBy(F.to_date("ts").alias("date"), "event_type").agg(F.avg("value").alias("v"))
    w = Window.partitionBy("event_type").orderBy("date")
    timed("daily_lag", daily.select("date", "event_type", (F.col("v") - F.lag("v").over(w)).alias("d")))
    # heavy window: rank events per user by ts (shuffle n rows on user_id)
    wu = Window.partitionBy("user_id").orderBy("ts")
    timed("rank_per_user", ev.select("user_id", "ts", F.row_number().over(wu).alias("rn")).filter(F.col("rn") <= 3))
    # as-of join: purchases vs clicks (union+window — the single-shuffle claim at volume)
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    timed("asof_join", asof_join(purchases, clicks, ["user_id"], "ts", "ts", ["value"]))
    # distinct users (shuffle-heavy) + sketch variant (map-side)
    timed("count_distinct_users", ev.agg(F.countDistinct("user_id").alias("u")))
    timed("approx_distinct_users", ev.agg(F.approx_count_distinct("user_id", 0.01).alias("u")))
    # top-k without total sort
    timed("topk_values", ev.orderBy(F.col("value").desc()).limit(100))

    out["rows"] = n
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
