"""Round-8 final-batch scale probe: the fourth-session ops additions
at 1M and 5M events/rows.

Probed claims:
* slo_burn_rate_alert — corpus collapses to hour grain in one
  partial-agg pass; the window sort is calendar-sized. ~flat.
* rolling_correlation_daily — same argument at day grain. ~flat.
* cascade_delete_audit — broadcast membership probes over column-
  pruned scans; ~linear in fact rows.

Usage: python scripts/scale_probe_r08f.py [n_small n_big]   (1M / 5M)
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
    "slo_burn_rate_alert",
    "rolling_correlation_daily",
    "cascade_delete_audit",
]


def _gen(spark, n: int, d: str) -> None:
    (
        spark.range(n)
        .repartition(64)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                (
                    F.lit(1704067200_000000)
                    + (F.abs(F.xxhash64("id", F.lit(3))) % (30 * 86_400)) * F.lit(1_000_000)
                ).cast("long")
            ).alias("ts"),
            (F.abs(F.xxhash64("id")) % max(n // 500, 1)).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in ["view", "click", "purchase", "signup", "error"]]),
                (F.abs(F.xxhash64("id", F.lit(1))) % 5 + 1).cast("int"),
            ).alias("event_type"),
            # right-skewed value like the fixture: square a uniform
            (F.pow(F.abs(F.xxhash64("id", F.lit(2))) % 1000 / 1000.0, 2) * 490.0).alias("value"),
            F.lit('{"k": 1}').alias("props"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/events.parquet")
    )
    (
        spark.range(max(n // 10, 1))
        .repartition(64)
        .select(F.col("id").alias("c_custkey"))
        .write.mode("overwrite")
        .parquet(f"{d}/customer.parquet")
    )
    (
        spark.range(n)
        .repartition(64)
        .select(
            F.col("id").alias("o_orderkey"),
            (F.abs(F.xxhash64("id", F.lit(5))) % max(n // 10, 1)).alias("o_custkey"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/orders.parquet")
    )
    (
        spark.range(n)
        .repartition(64)
        .select((F.abs(F.xxhash64("id", F.lit(8))) % n).alias("l_orderkey"))
        .write.mode("overwrite")
        .parquet(f"{d}/lineitem.parquet")
    )


def main() -> int:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    spark = get_spark("scale-probe-r08f")
    out: dict[str, dict[str, float]] = {}
    tmp = tempfile.mkdtemp(prefix="probe_r08f_")
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
            print(f"[{label}] {qname:30} min {best:.2f}s", flush=True)
    ratios = {k: round(v["big"] / v["small"], 2) for k, v in out.items()}
    print(json.dumps({"n_small": n_small, "n_big": n_big, "sec": out, "ratio_5x": ratios}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
