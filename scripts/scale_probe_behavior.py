"""Behavioral-tier scale probe: generate synthetic events N× the
fixture scale (many users, skew-free) and time the tier's shapes:

* sessionize — gaps-and-islands (LAG → running sum → two aggs), all on
               ONE user_id exchange; must scale ~linearly in events
* funnel     — three chained conditional-MIN windows over user_id
               (no self-join); same single-exchange expectation
* sweepline  — open-interval counting: +1/-1 deltas + cumsum over the
               bounded date spine (the window is |dates|-sized
               regardless of event count — measured, not hand-waved)

Usage: python scripts/scale_probe_behavior.py [n_events] [n2]
       (defaults 1M and 5M; prints one JSON line with both timings)
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import pyspark.sql.functions as F
from pyspark.sql import Window

sys.path.insert(0, ".")
from energi_data_etl_spark.session import get_spark  # noqa: E402

SESSION_GAP_S = 1800


def _gen_events(spark, n: int, path: str) -> None:
    """Synthetic events: n rows over n/500 users, ~30-day span, typed."""
    n_users = max(n // 500, 1)
    (
        spark.range(n)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            F.col("id").alias("event_id"),
            (F.xxhash64("id") % n_users).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in ["view", "click", "purchase", "signup", "error"]]),
                (F.abs(F.xxhash64("id", F.lit(1))) % 5 + 1).cast("int"),
            ).alias("event_type"),
            (F.abs(F.xxhash64("id", F.lit(2))) % (30 * 86400)).alias("s"),
        )
        .write.mode("overwrite").parquet(path)
    )


def _timed(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 2)


def _sessionize(ev):
    wo = Window.partitionBy("user_id").orderBy("s", "event_id")
    sid = (
        ev.withColumn("ps", F.lag("s").over(wo))
        .withColumn("is_new", (F.col("ps").isNull() | ((F.col("s") - F.col("ps")) > SESSION_GAP_S)).cast("int"))
        .withColumn("session_id", F.sum("is_new").over(wo.rowsBetween(Window.unboundedPreceding, 0)))
    )
    per = sid.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_ev"), (F.max("s") - F.min("s")).alias("dur")
    )
    return per.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n_ev").alias("n_events")
    )


def _funnel(ev):
    w = Window.partitionBy("user_id")
    s3 = (
        ev.withColumn("t1", F.min(F.when(F.col("event_type") == "view", F.col("s"))).over(w))
        .withColumn("t2", F.min(F.when((F.col("event_type") == "click") & (F.col("s") > F.col("t1")), F.col("s"))).over(w))
        .withColumn("t3", F.min(F.when((F.col("event_type") == "purchase") & (F.col("s") > F.col("t2")), F.col("s"))).over(w))
    )
    u = s3.groupBy("user_id").agg(F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3"))
    return u.agg(F.count("t1").alias("n1"), F.count("t2").alias("n2"), F.count("t3").alias("n3"))


def _sweepline(ev):
    day = (F.col("s") / 86400).cast("long")
    spans = ev.groupBy("user_id").agg(
        F.min(day).alias("start_d"), (F.max(day) + 1).alias("end_d")
    )
    deltas = spans.groupBy(F.col("start_d").alias("d")).agg(F.count(F.lit(1)).alias("delta")).unionAll(
        spans.groupBy(F.col("end_d").alias("d")).agg((-F.count(F.lit(1))).alias("delta"))
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select("d", F.sum("net").over(w).alias("open"))


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 5_000_000]
    spark = get_spark("scale-probe-behavior")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sizes": sizes}
    for n in sizes:
        path = tempfile.mkdtemp(prefix=f"scale_events_{n}_")
        _gen_events(spark, n, path)
        ev = spark.read.parquet(path)
        out[f"sessionize_{n}"] = _timed(_sessionize(ev))
        out[f"funnel_{n}"] = _timed(_funnel(ev))
        out[f"sweepline_{n}"] = _timed(_sweepline(ev))
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
