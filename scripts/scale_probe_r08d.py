"""Round-8 third-batch scale probe: the spatial / filter / rules tier
at 1M and 5M rows (fixture sf0.1 is 15k customers / 60k lineitems —
fixture floors hide parallelism ceilings, r08 TWAP lesson).

Probed claims:
* spatial grid radius join + nearest neighbor — candidate generation is
  an equi-join on cell id; with DENSITY held constant (space scales
  with sqrt(N)) both should be ~linear in N.
* bloom_filter_prejoin — filter build collapses to <=2048 bit_or rows,
  probe is a broadcast map stage; ~linear in probe size.
* countmin_frequency_audit — per-key partial agg + 768-cell broadcast.
* chisq_independence_audit — |types| x 7 cells in one pass.
* association_rules_lift — bounded per-order pair fan-out + 20-row
  broadcast metric joins.
* fifo_inventory_matching — per-part windows + overlap join with
  n_s + n_d - 1 per-part fan-out bound.

Usage: python scripts/scale_probe_r08d.py [n_small n_big]   (1M / 5M)
"""

from __future__ import annotations

import json
import math
import sys
import tempfile
import time

import pyspark.sql.functions as F

sys.path.insert(0, ".")
from energi_data_etl_spark.queries import QUERIES  # noqa: E402
from energi_data_etl_spark.queries.spatial import _candidate_pairs, _points  # noqa: E402
from energi_data_etl_spark.session import get_spark  # noqa: E402

PROBED = [
    "bloom_filter_prejoin",
    "countmin_frequency_audit",
    "chisq_independence_audit",
    "association_rules_lift",
    "fifo_inventory_matching",
]


def _gen(spark, n: int, d: str) -> None:
    """Fixture-shaped customer/orders/lineitem/events at n customers,
    n orders, n lineitems, n events."""
    prios = F.array(*[F.lit(p) for p in ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]])
    (
        spark.range(n)
        .repartition(64)
        .select(
            F.col("id").alias("c_custkey"),
            F.concat(F.lit("Customer#"), F.col("id").cast("string")).alias("c_name"),
            (F.col("id") % 25).cast("int").alias("c_nationkey"),
            (F.abs(F.xxhash64("id", F.lit(20))) % 1_000_000 / 100.0).alias("c_acctbal"),
            F.lit("BUILDING").alias("c_mktsegment"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/customer.parquet")
    )
    (
        spark.range(n)
        .repartition(64)
        .select(
            F.col("id").alias("o_orderkey"),
            (F.abs(F.xxhash64("id", F.lit(5))) % n).alias("o_custkey"),
            F.lit("O").alias("o_orderstatus"),
            (F.abs(F.xxhash64("id", F.lit(6))) % 49_999_900 / 100.0 + 1.0).alias("o_totalprice"),
            F.timestamp_seconds(
                F.lit(1704067200) + (F.abs(F.xxhash64("id", F.lit(7))) % (30 * 86_400))
            ).alias("o_orderdate"),
            F.element_at(prios, (F.abs(F.xxhash64("id", F.lit(14))) % 5 + 1).cast("int")).alias(
                "o_orderpriority"
            ),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/orders.parquet")
    )
    n_parts = max(n // 30, 1)  # ~30 lines/part -> ~15/side FIFO chains
    (
        spark.range(n)
        .repartition(64)
        .select(
            (F.abs(F.xxhash64("id", F.lit(8))) % max(n // 5, 1)).alias("l_orderkey"),
            (F.abs(F.xxhash64("id", F.lit(12))) % n_parts).alias("l_partkey"),
            (F.abs(F.xxhash64("id", F.lit(13))) % 100).alias("l_suppkey"),
            (F.col("id") % 7 + 1).cast("int").alias("l_linenumber"),
            (F.abs(F.xxhash64("id", F.lit(10))) % 50 + 1.0).alias("l_quantity"),
            (F.abs(F.xxhash64("id", F.lit(9))) % 9_999_900 / 100.0 + 1.0).alias("l_extendedprice"),
            F.lit(0.05).alias("l_discount"),
            F.lit(0.02).alias("l_tax"),
            F.element_at(
                F.array(F.lit("A"), F.lit("N"), F.lit("R")),
                (F.abs(F.xxhash64("id", F.lit(11))) % 3 + 1).cast("int"),
            ).alias("l_returnflag"),
            F.lit("O").alias("l_linestatus"),
            F.timestamp_seconds(
                F.lit(1704067200) + (F.abs(F.xxhash64("id", F.lit(15))) % (30 * 86_400))
            ).alias("l_shipdate"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/lineitem.parquet")
    )
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
            (F.abs(F.xxhash64("id", F.lit(2))) % 49_000 / 100.0 + 0.01).alias("value"),
            F.lit('{"k": 1}').alias("props"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/events.parquet")
    )


def _spatial(spark, d: str, n: int):
    """Radius-join degree histogram + NN top-20 with density held at
    ~8 expected neighbors (space = sqrt(pi * R^2 * N / 8))."""
    space = int(math.sqrt(math.pi * 24 * 24 * n / 8.0))
    pts = _points(spark, d, space=space)
    pairs = _candidate_pairs(pts, radius=24)
    deg = pairs.groupBy("a_id").agg(F.count(F.lit(1)).alias("deg"))
    hist = (
        pts.join(deg, pts.id == deg.a_id, "left")
        .select(F.coalesce(F.col("deg"), F.lit(0)).alias("deg"))
        .groupBy("deg")
        .count()
    )
    nn = (
        pairs.groupBy("a_id")
        .agg(F.min(F.struct("d2", "b_id")).alias("m"))
        .orderBy(F.col("m.d2"), F.col("a_id"))
        .limit(20)
    )
    return hist, nn


def main() -> int:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    spark = get_spark("scale-probe-r08d")
    out: dict[str, dict[str, float]] = {}
    tmp = tempfile.mkdtemp(prefix="probe_r08d_")
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
        for sname in ("spatial_radius_hist", "spatial_nn_top20"):
            idx = 0 if sname.endswith("hist") else 1
            _spatial(spark, d, n)[idx].collect()  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                _spatial(spark, d, n)[idx].collect()
                best = min(best, time.time() - t0)
            out.setdefault(sname, {})[label] = round(best, 2)
            print(f"[{label}] {sname:34} min {best:.2f}s", flush=True)
    ratios = {k: round(v["big"] / v["small"], 2) for k, v in out.items()}
    print(json.dumps({"n_small": n_small, "n_big": n_big, "sec": out, "ratio_5x": ratios}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
