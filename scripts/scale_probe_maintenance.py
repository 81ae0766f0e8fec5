"""Maintenance/monitoring-tier scale probe: synthetic data N× the
fixture scale, timing the tier's shapes at two sizes so the scaling
exponent is measured, not claimed:

* snapshot_diff — two ~N-row snapshots, md5 row hash, FULL OUTER join
                  on the key + one agg; must scale ~linearly
* survivorship  — keep-best-copy dedup: ROW_NUMBER over ~N/5-sized
                  clusters ordered by (q DESC, id); one cluster-key
                  exchange; ~linear
* pagerank      — 3 power iterations over an N-edge graph with the
                  round-6 design (edge list shuffled ONCE at setup,
                  per-iteration shuffles touch only the |V| rank
                  frame); ~linear in edges

Usage: python scripts/scale_probe_maintenance.py [n1] [n2]
       (defaults 2M and 8M; prints one JSON line)
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import pyspark.sql.functions as F
from pyspark.sql import Window

sys.path.insert(0, ".")
from energi_data_etl_spark.operators.graph import pagerank  # noqa: E402
from energi_data_etl_spark.session import get_spark  # noqa: E402


def _timed(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 2)


def _gen_rows(spark, n: int, path: str) -> None:
    (
        spark.range(n)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            F.col("id").alias("k"),
            F.element_at(
                F.array(F.lit("O"), F.lit("F"), F.lit("P")),
                (F.abs(F.xxhash64("id")) % 3 + 1).cast("int"),
            ).alias("s"),
            (F.abs(F.xxhash64("id", F.lit(1))) % 10_000_000).alias("c"),
        )
        .write.mode("overwrite")
        .parquet(path)
    )


def probe_snapshot_diff(spark, path: str) -> float:
    rows = spark.read.parquet(path)
    old_snap = rows.filter(F.col("k") % 13 != 0)
    new_snap = rows.filter(F.col("k") % 17 != 0).withColumn(
        "c", F.col("c") + F.when(F.col("k") % 97 == 0, 500).otherwise(0)
    )
    h = lambda: F.md5(F.concat(F.col("s"), F.lit("|"), F.col("c").cast("string")))  # noqa: E731
    j = old_snap.select(F.col("k").alias("ok"), h().alias("oh"), F.col("c").alias("oc")).join(
        new_snap.select(F.col("k").alias("nk"), h().alias("nh"), F.col("c").alias("nc")),
        F.col("ok") == F.col("nk"),
        "full_outer",
    )
    out = (
        j.select(
            F.when(F.col("ok").isNull(), "added")
            .when(F.col("nk").isNull(), "removed")
            .when(F.col("oh") != F.col("nh"), "changed")
            .otherwise("unchanged")
            .alias("t"),
            (F.coalesce("nc", F.lit(0)) - F.coalesce("oc", F.lit(0))).alias("d"),
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("d").alias("dd"))
    )
    return _timed(out)


def probe_survivorship(spark, path: str, n: int) -> float:
    rows = spark.read.parquet(path)
    clustered = rows.select(
        "k",
        (F.col("k") % (n // 5)).alias("ck"),
        (F.abs(F.xxhash64("k")) % 1_000_000 / 1_000_000.0).alias("q"),
    )
    w = Window.partitionBy("ck").orderBy(F.col("q").desc(), "k")
    out = (
        clustered.withColumn("rn", F.row_number().over(w))
        .groupBy()
        .agg(F.sum((F.col("rn") == 1).cast("bigint")).alias("n_surv"))
    )
    return _timed(out)


def probe_pagerank(spark, path: str, n: int) -> float:
    edges = spark.read.parquet(path).select(
        (F.abs(F.xxhash64("k")) % (n // 10)).alias("src"),
        (F.abs(F.xxhash64("k", F.lit(7))) % (n // 10)).alias("dst"),
    )
    # hash-generated pairs collide (~50 dupes regardless of n) — honor
    # the operator's assume_distinct precondition
    edges = edges.distinct()
    t0 = time.perf_counter()
    pagerank(edges, iterations=3, assume_distinct=True).write.mode("overwrite").format(
        "noop"
    ).save()
    return round(time.perf_counter() - t0, 2)


def main() -> int:
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    spark = get_spark("scale-probe-maintenance")
    spark.sparkContext.setLogLevel("ERROR")
    result: dict[str, dict[str, float]] = {}
    with tempfile.TemporaryDirectory() as tmp:
        warm = f"{tmp}/warm"
        _gen_rows(spark, 100_000, warm)
        probe_snapshot_diff(spark, warm)
        probe_survivorship(spark, warm, 100_000)
        probe_pagerank(spark, warm, 100_000)
        for n in (n1, n2):
            path = f"{tmp}/rows_{n}"
            _gen_rows(spark, n, path)
            result.setdefault("snapshot_diff", {})[str(n)] = probe_snapshot_diff(spark, path)
            result.setdefault("survivorship", {})[str(n)] = probe_survivorship(spark, path, n)
            result.setdefault("pagerank_3it", {})[str(n)] = probe_pagerank(spark, path, n)
    print(json.dumps({"n1": n1, "n2": n2, "timings": result}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
