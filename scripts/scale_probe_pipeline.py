"""Training-data-pipeline scale probe: generate synthetic documents N×
the fixture scale (reusing scale_probe_llm's generator) and time the
new pipeline shapes:

* split      — md5-bucket train/val/test assignment + per-split agg
               (map stage + one small shuffle; must be ~scan-bound)
* contam     — hashed 3-gram shingle join of a 1k-doc benchmark against
               the full corpus (broadcast bench side; linear in
               corpus shingles)
* pack_global— concat-then-chunk packing with ONE global-order window
               (the documented single-reducer wall — measured, not
               hand-waved)
* pack_shard — the scale fix: the same packing windowed per 64-doc-id
               shard (parallel; what a real shard writer does)

Usage: python scripts/scale_probe_pipeline.py [n_docs]   (default 1M)
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import pyspark.sql.functions as F
from pyspark.sql import Window

sys.path.insert(0, ".")
from scripts.scale_probe_llm import _gen_documents  # noqa: E402
from energi_data_etl_spark.operators import pipeline as P  # noqa: E402
from energi_data_etl_spark.operators.text import token_count  # noqa: E402
from energi_data_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("scale-probe-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float | int] = {"n_docs": n_docs}

    doc_dir = tempfile.mkdtemp(prefix="scale_docs_")
    t0 = time.perf_counter()
    _gen_documents(spark, n_docs, doc_dir)
    out["generate_sec"] = round(time.perf_counter() - t0, 2)
    docs = spark.read.parquet(doc_dir)

    def timed(name, df):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        out[name] = round(time.perf_counter() - t0, 2)

    timed(
        "split",
        docs.withColumn("split", P.assign_split(F.col("doc_id")))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("c")),
    )

    # shingle the corpus ONCE (xxhash64 hot path — both join sides are
    # hashed in this job, cross-engine md5 not needed), then split
    shingled = docs.select("doc_id", F.explode(P.shingle_hashes("text", 3, hash_fn="xxhash64")).alias("h")).persist()
    bench = shingled.filter(F.col("doc_id") < 1000).select("h").distinct()
    train = shingled.filter(F.col("doc_id") >= 1000)
    timed(
        "contam",
        train.join(F.broadcast(bench), "h").groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")),
    )

    base = docs.select("doc_id", token_count("text").cast("bigint").alias("n_tok"))
    w_global = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    timed(
        "pack_global",
        base.withColumn("chunk", F.floor((F.sum("n_tok").over(w_global) - F.col("n_tok")) / 512))
        .groupBy("chunk")
        .agg(F.sum("n_tok").alias("t")),
    )

    shard = F.floor(F.col("doc_id") / 16384)
    w_shard = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    timed(
        "pack_shard",
        base.withColumn("shard", shard)
        .withColumn("chunk", F.floor((F.sum("n_tok").over(w_shard) - F.col("n_tok")) / 512))
        .groupBy("shard", "chunk")
        .agg(F.sum("n_tok").alias("t")),
    )

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
