"""Round-8 fourth-batch scale probe: batch-19 queries plus the two
third-session additions (entity_resolution_clusters,
trending_users_decayed) that landed after r08d, at 1M and 5M rows.

Probed claims:
* cms_join_cardinality — one partial-aggregated per-key pass; the
  sketch lives on 768 cells. ~linear in rows.
* spatial_point_in_polygon — join-free map stage + 16-cell rollup.
* column_profile_report — six column-pruned single-pass aggregates.
* interval_coalesce_users — per-user windows; two window fns share one
  shuffle+sort. Users scale with N (N/500), so partitions stay small.
* token_budget_apportionment — corpus-sized token count, then
  |sources| rows. ~linear.
* trending_users_decayed — conditional-shift projection + one groupBy.
* entity_resolution_clusters — the DISTINCT entity-name set is held
  FIXED (4k names; a catalog's entity count doesn't grow with row
  volume) so the probe measures the corpus rollup + CC rounds, which
  is the part that sees 100 TB; the blocked pair join is quadratic in
  block size BY DESIGN and bounded by the fixed name set.

Usage: python scripts/scale_probe_r08e.py [n_small n_big]   (1M / 5M)
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
    "cms_join_cardinality",
    "spatial_point_in_polygon",
    "column_profile_report",
    "interval_coalesce_users",
    "token_budget_apportionment",
    "trending_users_decayed",
    "entity_resolution_clusters",
]

ER_NAMES = 4_000  # fixed entity-catalog size across SFs


def _gen(spark, n: int, d: str) -> None:
    prios = F.array(*[F.lit(p) for p in ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]])
    (
        spark.range(n)
        .repartition(64)
        .select(
            F.col("id").alias("c_custkey"),
            F.concat(F.lit("Customer#"), F.col("id").cast("string")).alias("c_name"),
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
            F.element_at(
                F.array(F.lit("O"), F.lit("F"), F.lit("P")),
                (F.abs(F.xxhash64("id", F.lit(4))) % 3 + 1).cast("int"),
            ).alias("o_orderstatus"),
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
    (
        spark.range(n)
        .repartition(64)
        .select(
            F.col("id").alias("l_orderkey"),
            (F.abs(F.xxhash64("id", F.lit(12))) % max(n // 30, 1)).alias("l_partkey"),
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
            F.lit("view").alias("event_type"),
            (F.abs(F.xxhash64("id", F.lit(2))) % 49_000 / 100.0 + 0.01).alias("value"),
            F.lit('{"k": 1}').alias("props"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/events.parquet")
    )
    # part: n rows over a FIXED catalog of ER_NAMES distinct names; each
    # base entity has 3 spelling variants chained by levenshtein<=1
    # (md5-hex bases are >3 apart, so clusters never merge across bases)
    base = F.abs(F.xxhash64("id", F.lit(21))) % (ER_NAMES // 3)
    variant = F.abs(F.xxhash64("id", F.lit(22))) % 3
    (
        spark.range(n)
        .repartition(64)
        .select(
            F.col("id").alias("p_partkey"),
            F.concat(
                F.substring(F.md5(base.cast("string")), 1, 8),
                F.expr("repeat('x', cast(abs(xxhash64(id, 22)) % 3 as int))"),
            ).alias("p_name"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/part.parquet")
    )
    # documents: n/20 docs of 30 synthetic words across 8 sources
    (
        spark.range(max(n // 20, 1))
        .repartition(64)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(30)),
                    lambda i: F.substring(F.md5(F.concat(F.col("id").cast("string"), i.cast("string"))), 1, 5),
                ),
                " ",
            ).alias("text"),
            F.lit("en").alias("lang"),
            F.concat(F.lit("src"), (F.abs(F.xxhash64("id", F.lit(30))) % 8).cast("string")).alias(
                "source"
            ),
            F.lit(180).cast("long").alias("n_chars"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/documents.parquet")
    )


def main() -> int:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    spark = get_spark("scale-probe-r08e")
    out: dict[str, dict[str, float]] = {}
    tmp = tempfile.mkdtemp(prefix="probe_r08e_")
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
