"""Round-11b scale probe: every r11-window query that still lacked a
BASELINE ratio, at 1M -> 5M rows (full-shape synthetic tables extending
scale_probe_r08e's generator).

Expected shapes:
* masking_surface / xml_roundtrip_extract — pure JVM map stages over
  customer (mask/regex/xpath), ~linear.
* hierarchy_rollup_recursive — recursive CTE producing N·digits rows,
  ~linear (depth grows with log10 of the key domain).
* dq_expectation_suite — column-pruned scans of four tables, partial
  aggs, ~linear.
* fuzzy_join_prefix_filtered — q-gram prefix-filtered candidate join
  over part names on a FIXED distinct-name catalog (names don't grow
  with row volume), ~linear in rows.
* char_lm_quality_bits — per-doc char-bigram map over documents (n/20
  docs), ~linear.
* feature_equidepth_bins / benford_first_digit_audit — one partial-agg
  collapse of orders, ~linear scan cost.
* mutual_information_type_value — events collapse to |types|x|buckets|
  cells, ~linear scan cost.
* seasonal_adjusted_anomaly / attribution_last_touch /
  split_temporal_embargo — per-user/type windows or broadcast cut tags
  over events, ~linear (user count scales with N, window partitions
  stay constant-size).
* streaming_ohlc_candles / streaming_daily_active_users — bounded
  AvailableNow drains; state is candle/user-day-sized; cost = rows
  through the state store + fixed engine init.

Usage: python scripts/scale_probe_r11b.py [n_small n_big]   (1M / 5M)
"""

from __future__ import annotations

import json
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, ".")
from energi_data_etl_spark.queries import QUERIES  # noqa: E402
from energi_data_etl_spark.session import get_spark, scratch_dir  # noqa: E402

PROBED = [
    "masking_surface",
    "xml_roundtrip_extract",
    "hierarchy_rollup_recursive",
    "dq_expectation_suite",
    "fuzzy_join_prefix_filtered",
    "char_lm_quality_bits",
    "feature_equidepth_bins",
    "benford_first_digit_audit",
    "mutual_information_type_value",
    "seasonal_adjusted_anomaly",
    "attribution_last_touch",
    "split_temporal_embargo",
    "streaming_daily_active_users",
    "streaming_ohlc_candles",
]

ER_NAMES = 4000  # fixed distinct-name catalog for part (r08e convention)


def _gen(spark, n: int, d: str) -> None:
    prios = F.array(*[F.lit(p) for p in ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]])
    segs = F.array(*[F.lit(s) for s in ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]])
    types = F.array(*[F.lit(t) for t in ["view", "click", "purchase", "signup", "error"]])
    (
        spark.range(n)
        .repartition(64)
        .select(
            F.col("id").alias("c_custkey"),
            F.concat(F.lit("Customer#"), F.col("id").cast("string")).alias("c_name"),
            ((F.abs(F.xxhash64("id", F.lit(31))) % 1_099_999) / 100.0 - 999.99).alias("c_acctbal"),
            F.element_at(segs, (F.abs(F.xxhash64("id", F.lit(32))) % 5 + 1).cast("int")).alias("c_mktsegment"),
            (F.abs(F.xxhash64("id", F.lit(33))) % 25).alias("c_nationkey"),
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
            F.element_at(prios, (F.abs(F.xxhash64("id", F.lit(14))) % 5 + 1).cast("int")).alias("o_orderpriority"),
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
            (F.abs(F.xxhash64("id", F.lit(15))) % 50 + 1).cast("double").alias("l_quantity"),
            ((F.abs(F.xxhash64("id", F.lit(16))) % 11) / 100.0).alias("l_discount"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/lineitem.parquet")
    )
    (
        spark.range(n)
        .repartition(64)
        .select(
            F.col("id").alias("event_id"),
            # ns-long ts, the fixture's on-disk form: the streaming file
            # source reads the raw bigint (events_stream schema), the
            # batch loader normalizes per value (epoch_long_to_micros)
            (
                F.lit(1704067200_000000000)
                + (F.abs(F.xxhash64("id", F.lit(3))) % (30 * 86_400)) * F.lit(1_000_000_000)
            ).cast("long").alias("ts"),
            (F.abs(F.xxhash64("id")) % max(n // 500, 1)).alias("user_id"),
            F.element_at(types, (F.abs(F.xxhash64("id", F.lit(1))) % 5 + 1).cast("int")).alias("event_type"),
            (F.pow(F.abs(F.xxhash64("id", F.lit(2))) % 1000 / 1000.0, 2) * 490.0).alias("value"),
            F.lit('{"k": 1}').alias("props"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/events.parquet")
    )
    base = F.abs(F.xxhash64("id", F.lit(21))) % (ER_NAMES // 3)
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
            F.concat(F.lit("src"), (F.abs(F.xxhash64("id", F.lit(30))) % 8).cast("string")).alias("source"),
            F.lit(180).cast("long").alias("n_chars"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/documents.parquet")
    )


def main() -> int:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    spark = get_spark("scale-probe-r11b")
    out: dict[str, dict[str, float]] = {}
    tmp = scratch_dir("probe_r11b_")
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
            print(f"[{label}] {qname:32} min {best:.2f}s", flush=True)
    ratios = {k: round(v["big"] / v["small"], 2) for k, v in out.items()}
    print(json.dumps({"n_small": n_small, "n_big": n_big, "sec": out, "ratio_5x": ratios}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
