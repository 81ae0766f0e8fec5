"""Round-11 scale probe: the last four batch-20 plans without a
BASELINE ratio (VERDICT r10 item 6).

Probed claims:
* sessionize_incremental_merge — both window sorts partition by user;
  stitch joins are |users|-sized. ~linear in events.
* shortest_path_layered_dag — graph is |nation|-sized; edge build is
  one equi-join on the layer key (~5 edges/node), each relaxation
  round a broadcast join + partial-agg MIN. ~linear in nodes.
* target_encoding_loo — one partial-aggregated groupBy over the
  category column + a broadcast join back onto the scan. ~linear.
* semdedup_cell_prune — candidate pairs = Sigma n_c^2/2 with K=32
  cells, i.e. N^2/(2K): the certified fixture query is intentionally
  fixed-K (the oracle must mirror the centroid set), so the probe runs
  it at embedding-corpus sizes (20k/100k) and EXPECTS the documented
  ~N^2/K growth; the linear-at-scale path (K scaling with N, numpy
  kernels) is operators/similarity.py's IVF machinery — see
  BASELINE.md r11 notes.

Usage: python scripts/scale_probe_r11.py [n_small n_big]   (1M / 5M)
"""

from __future__ import annotations

import json
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, ".")
from energi_data_etl_spark.queries import QUERIES  # noqa: E402
from energi_data_etl_spark.session import get_spark, scratch_dir  # noqa: E402

#: query -> fraction of the headline row count it runs at. semdedup is
#: quadratic-by-design at fixed K (measured: 20k vectors already ran
#: minutes per pass), so the certified query is probed at 1/500 —
#: 2k/10k vectors spans the same 5x ratio and shows the N^2/K law
#: cheaply; the linear scaled operator gets its own larger corpus
#: (SEMDEDUP_SCALED_FRAC) where K actually grows with N.
PROBED = {
    "sessionize_incremental_merge": 1.0,
    "shortest_path_layered_dag": 1.0,
    "target_encoding_loo": 1.0,
    "semdedup_cell_prune": 0.002,
}

SEMDEDUP_SCALED_FRAC = 0.05  # 50k / 250k vectors -> K = 97 / 488 cells


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
            (F.pow(F.abs(F.xxhash64("id", F.lit(2))) % 1000 / 1000.0, 2) * 490.0).alias("value"),
            F.lit('{"k": 1}').alias("props"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/events.parquet")
    )
    (
        spark.range(n)
        .repartition(64)
        .select(F.col("id").alias("n_nationkey"))
        .write.mode("overwrite")
        .parquet(f"{d}/nation.parquet")
    )
    (
        spark.range(n)
        .repartition(64)
        .select(
            F.col("id").alias("o_orderkey"),
            F.element_at(
                F.array(*[F.lit(p) for p in ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]]),
                (F.abs(F.xxhash64("id", F.lit(7))) % 5 + 1).cast("int"),
            ).alias("o_orderpriority"),
            ((F.abs(F.xxhash64("id", F.lit(9))) % 10_000_000) / 100.0).alias("o_totalprice"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/orders.parquet")
    )
    for name, frac in (("embeddings", PROBED["semdedup_cell_prune"]), ("embeddings_big", SEMDEDUP_SCALED_FRAC)):
        n_vec = max(int(n * frac), 64)
        (
            spark.range(n_vec)
            .repartition(64)
            .select(
                F.col("id").alias("vec_id"),
                F.expr(
                    "transform(sequence(1, 64), j -> "
                    "cast((abs(xxhash64(id, j)) % 2001 - 1000) / 1000.0 as float))"
                ).alias("embedding"),
                F.lit(0).alias("label"),
            )
            .write.mode("overwrite")
            .parquet(f"{d}/{name}.parquet")
        )


def main() -> int:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    spark = get_spark("scale-probe-r11")
    out: dict[str, dict[str, float]] = {}
    tmp = scratch_dir("probe_r11_")
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
        # The scaled SemDeDup operator on a 25x-LARGER corpus than the
        # fixed-K certified query could touch — the contrast exhibit:
        # expect ~5x (linear: K grows with N, constant cell size) while
        # the query shows ~N^2/K on its smaller corpus.
        from energi_data_etl_spark.operators.similarity import semdedup_prune

        emb = spark.read.parquet(f"{d}/embeddings_big.parquet")
        n_vec = emb.count()

        def run_scaled():
            semdedup_prune(emb, threshold=0.4, corpus_count=n_vec).write.mode(
                "overwrite"
            ).format("noop").save()

        run_scaled()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            run_scaled()
            best = min(best, time.time() - t0)
        out.setdefault("semdedup_prune_scaled_op", {})[label] = round(best, 2)
        print(f"[{label}] {'semdedup_prune_scaled_op':30} min {best:.2f}s (n_vec={n_vec})", flush=True)
    ratios = {k: round(v["big"] / v["small"], 2) for k, v in out.items()}
    print(json.dumps({"n_small": n_small, "n_big": n_big, "sec": out, "ratio_5x": ratios}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
