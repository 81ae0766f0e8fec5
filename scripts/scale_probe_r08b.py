"""Round-8 batch-2/3 scale probe: the new event-tier queries at 1M and
5M synthetic events (fixture sf0.1 is 60k — fixture floors dominate
there, so the scale claims need real volume):

seasonal backtest / PSI / change-point / TWAP / OHLC / sequence
detection / path top-k / conversion latency / Misra-Gries / key skew.

Every one of these claims "ONE corpus-sized shuffle (or none), then
dimension-bounded work" — the probe measures the ratio at 5x events.

Usage: python scripts/scale_probe_r08b.py [n_small n_big]   (1M / 5M)
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
    "seasonal_naive_backtest",
    "psi_value_drift",
    "changepoint_binary_segmentation",
    "time_weighted_average_daily",
    "ohlc_hourly_resample",
    "event_sequence_detection",
    "user_path_topk",
    "conversion_latency_quantiles",
    "heavyhitters_misra_gries",
    "key_skew_audit",
]


def _gen(spark, n: int, d: str) -> None:
    """events.parquet shaped like the fixture (ts spread over 30 days,
    n/500 users, 5 types, 2dp values) + a 2-key lineitem for the skew
    audit."""
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
    (
        spark.range(n // 4)
        .repartition(32)
        .select(
            (F.abs(F.xxhash64("id", F.lit(7))) % (n // 40 + 1)).alias("l_partkey"),
            (F.abs(F.xxhash64("id", F.lit(8))) % (n // 400 + 1)).alias("l_suppkey"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/lineitem.parquet")
    )


def main() -> int:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    spark = get_spark("scale-probe-r08b")
    out: dict[str, dict[str, float]] = {}
    tmp = tempfile.mkdtemp(prefix="probe_r08b_")
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
