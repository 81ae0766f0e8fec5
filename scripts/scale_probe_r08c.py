"""Round-8 late-batch scale probe: the ops-analytics tier at 1M and 5M
synthetic events / 250k→1.25M lineitems (fixture sf0.1 is 60k events —
fixture floors hide parallelism ceilings, r08 TWAP lesson).

Probed claims:
* active_users_rolling_7d — one (user, day) dedup shuffle + tiny-spine
  broadcast band join; ~linear.
* max_concurrent_sessions — user-partitioned sessionize + day-partitioned
  sweep over SESSION BOUNDARIES (volume compressed before the day window).
* run_length_collapse / floored_running_balance — user-partitioned
  windows; parallelism scales with users (n/500 here).
* ab_test_two_proportion — per-user rollup + 4-scalar global agg.
* proration_largest_remainder / pareto_frontier_lineitem /
  order_date_streaks — orderkey/custkey-partitioned windows or
  level-reduced frames over the synthetic star tables.

Usage: python scripts/scale_probe_r08c.py [n_small n_big]   (1M / 5M)
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import pyspark.sql.functions as F

sys.path.insert(0, ".")
from energi_data_etl_spark.queries import QUERIES  # noqa: E402
from energi_data_etl_spark.session import get_spark  # noqa: E402

PROBED = [
    "active_users_rolling_7d",
    "max_concurrent_sessions",
    "run_length_collapse",
    "floored_running_balance",
    "ab_test_two_proportion",
    "proration_largest_remainder",
    "pareto_frontier_lineitem",
    "order_date_streaks",
    # batch 10/11 additions
    "revenue_bridge_monthly",
    "weighted_median_by_flag",
    "km_conversion_hazard",
    "bfs_reachability_levels",
    "pagerank_integer_twin",
    "compaction_small_files",
]


def _gen(spark, n: int, d: str) -> None:
    """Fixture-shaped events + orders/lineitem star at n events and
    n/4 lineitems over n/20 orders."""
    n_users = max(n // 500, 1)
    (
        spark.range(n)
        .repartition(64)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                (
                    F.lit(1704067200_000000)
                    + (F.abs(F.xxhash64("id", F.lit(3))) % (30 * 86_400)) * F.lit(1_000_000)
                    + F.abs(F.xxhash64("id", F.lit(4))) % 1_000_000
                ).cast("long")
            ).alias("ts"),
            (F.abs(F.xxhash64("id")) % n_users).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in ["view", "click", "purchase", "signup", "error"]]),
                (F.abs(F.xxhash64("id", F.lit(1))) % 5 + 1).cast("int"),
            ).alias("event_type"),
            (F.abs(F.xxhash64("id", F.lit(2))) % 49_000 / 100.0 + 0.01).alias("value"),
            F.lit('{"k": 1}').alias("props"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/events.parquet")
    )
    n_orders = max(n // 20, 1)
    (
        spark.range(n_orders)
        .repartition(32)
        .select(
            F.col("id").alias("o_orderkey"),
            (F.abs(F.xxhash64("id", F.lit(5))) % max(n_orders // 10, 1)).alias("o_custkey"),
            (F.abs(F.xxhash64("id", F.lit(6))) % 49_999_900 / 100.0 + 1.0).alias("o_totalprice"),
            F.timestamp_seconds(
                F.lit(1704067200) + (F.abs(F.xxhash64("id", F.lit(7))) % (30 * 86_400))
            ).alias("o_orderdate"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/orders.parquet")
    )
    (
        spark.range(n // 4)
        .repartition(32)
        .select(
            (F.abs(F.xxhash64("id", F.lit(8))) % n_orders).alias("l_orderkey"),
            (F.abs(F.xxhash64("id", F.lit(12))) % max(n // 500, 1)).alias("l_partkey"),
            (F.abs(F.xxhash64("id", F.lit(13))) % 100).alias("l_suppkey"),
            (F.col("id") % 7 + 1).cast("int").alias("l_linenumber"),
            (F.abs(F.xxhash64("id", F.lit(9))) % 9_999_900 / 100.0 + 1.0).alias(
                "l_extendedprice"
            ),
            (F.abs(F.xxhash64("id", F.lit(10))) % 50 + 1.0).alias("l_quantity"),
            F.element_at(
                F.array(F.lit("A"), F.lit("N"), F.lit("R")),
                (F.abs(F.xxhash64("id", F.lit(11))) % 3 + 1).cast("int"),
            ).alias("l_returnflag"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/lineitem.parquet")
    )


def main() -> int:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    spark = get_spark("scale-probe-r08c")
    out: dict[str, dict[str, float]] = {}
    tmp = tempfile.mkdtemp(prefix="probe_r08c_")
    for label, n in (("small", n_small), ("big", n_big)):
        d = f"{tmp}/{label}"
        t0 = time.time()
        _gen(spark, n, d)
        print(f"[gen] {label} n={n} in {time.time() - t0:.1f}s", flush=True)
        for qname in PROBED:
            fn = QUERIES[qname].fn
            fn(spark, d).collect()  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                fn(spark, d).collect()
                best = min(best, time.time() - t0)
            out.setdefault(qname, {})[label] = round(best, 2)
            print(f"[{label}] {qname:34} min {best:.2f}s", flush=True)
    ratios = {k: round(v["big"] / v["small"], 2) for k, v in out.items()}
    print(json.dumps({"n_small": n_small, "n_big": n_big, "sec": out, "ratio_5x": ratios}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
