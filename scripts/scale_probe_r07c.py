"""Round-7 late-batch new-operator scale probe (BASELINE.md "Round-7" section).

Times the twelve closing-r07 additions at sf0.01 vs sf0.1 (10x documents) as warm
minima over three runs each — the fixture-scale check that their single
corpus-sized stage (or none) is really what dominates:

    python scripts/scale_probe_r07c.py [sf_small sf_big]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, ".")
from energi_data_etl_spark.queries import QUERIES  # noqa: E402
from energi_data_etl_spark.session import apply_engine_conf  # noqa: E402

PROBED = [
    "ivm_join_delta",
    "cdc_apply_log",
    "bitmap_distinct_users",
    "join_skew_adaptive_salted",
    "robust_mad_outliers",
    "brand_cooccurrence_triangles",
    "fuzzy_join_qgram_candidates",
    "vocabulary_growth_curve",
    "inverted_index_postings",
    "bm25_topk_search",
    "kmeans_lloyd_assign",
    "k_anonymity_audit",
]


def main() -> int:
    sf_small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sf_big = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scale-probe-r07c")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    apply_engine_conf(spark)
    results: dict[str, dict[str, float]] = {}
    for sf in (sf_small, sf_big):
        for name in PROBED:
            fn = QUERIES[name].fn
            fn(spark, sf).collect()  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf).collect()
                best = min(best, time.time() - t0)
            results.setdefault(name, {})[sf] = best
            print(f"{sf.rsplit('/', 1)[-1]:7} {name:32} min {best:.2f}s", flush=True)
    print("\nratios (big/small):")
    for name, r in results.items():
        print(f"  {name:32} {r[sf_big] / r[sf_small]:.2f}x")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
