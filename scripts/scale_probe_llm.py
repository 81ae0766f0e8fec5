"""LLM-pipeline scale probe: generate synthetic documents / embeddings
N× the fixture scale (multi-file parquet, realistic token mix) and time
the three heavy-hitter dedup/similarity shapes:

* minhash   — shingle → 64-hash signature → 16×4 banding → bucket join
              → exact-Jaccard verify (near_dup_minhash, capped buckets)
* jaccard   — blocked exact token-set Jaccard with the salted block-key
              join (the ngram_jaccard_pairs shape)
* matmul    — block-paired all-pairs cosine (neardup_pairs_matmul)

The first two are designed linear-ish (bounded blocks/buckets); the
matmul is inherently O(N²/B) flops but must stay task-parallel with flat
per-task memory — the probe demonstrates the curve, not just the claim
(docstrings say "scales"; BASELINE.md records what these measured).

Usage: python scripts/scale_probe_llm.py [n_docs] [n_vecs]
       (defaults 1_000_000 docs / 100_000 vectors)
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import pyspark.sql.functions as F

sys.path.insert(0, ".")
from energi_data_etl_spark.operators.dedup import near_dup_minhash  # noqa: E402
from energi_data_etl_spark.operators.similarity import neardup_pairs_matmul  # noqa: E402
from energi_data_etl_spark.session import get_spark  # noqa: E402


def _gen_documents(spark, n: int, out_dir: str) -> None:
    """20–59-token docs from a 5k-word vocabulary; every 50th doc is a
    near-copy of its predecessor (same word seed, distinct tail token)
    so the banding/verify stages see a realistic ~2% trickle of true
    near-dup pairs — NOT a flood (the flood case is the guardrail test's
    job). lang and length give the jaccard shape its block key."""
    seed = F.when(F.col("id") % 50 == 1, F.col("id") - 1).otherwise(F.col("id"))
    n_words = 20 + F.pmod(F.xxhash64(seed, F.lit(3)), F.lit(40))
    words = F.transform(
        F.sequence(F.lit(0), n_words.cast("int")),
        lambda i: F.concat(F.lit("w"), F.pmod(F.xxhash64(seed, i), F.lit(5000)).cast("string")),
    )
    tail = F.concat(F.lit("t"), F.pmod(F.xxhash64("id"), F.lit(100_000)).cast("string"))
    (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", F.concat(words, F.array(tail))).alias("text"),
            F.concat(F.lit("l"), F.pmod(F.xxhash64("id", F.lit(7)), F.lit(4)).cast("string")).alias("lang"),
        )
        .withColumn("n_chars", F.length("text"))
        .repartition(32)
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def _gen_embeddings(spark, n: int, out_dir: str) -> None:
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(2001)) / 1000.0 - 1.0).cast("float"),
    )
    (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .repartition(32)
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def _salted_block_jaccard(docs, n_salts: int = 16):
    """The ngram_jaccard_pairs plan shape, inlined over the probe table.
    Block granularity is the policy dial that bounds the per-block
    quadratic: the probe blocks on exact n_chars (~1200 blocks) — at
    probe volumes a 100-char-wide bucket would make 80k-doc blocks,
    which is a *blocking-key-choice* failure, not a join-shape one."""
    toks = F.array_distinct(F.transform(F.split(F.col("text"), " "), lambda t: F.xxhash64(t)))
    base = docs.select(
        "doc_id", "lang", F.col("n_chars").alias("len_bucket"), toks.alias("toks")
    ).persist()
    a = base.withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.lit(n_salts)).cast("int")).alias("a")
    b = base.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))).alias("b")
    jac = F.size(F.array_intersect("a.toks", "b.toks")) / F.greatest(F.size(F.array_union("a.toks", "b.toks")), F.lit(1))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"), F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.8)
    )


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark("scale-probe-llm")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float | int] = {"n_docs": n_docs, "n_vecs": n_vecs}

    doc_dir = tempfile.mkdtemp(prefix="scale_docs_")
    vec_dir = tempfile.mkdtemp(prefix="scale_vecs_")
    t0 = time.perf_counter()
    _gen_documents(spark, n_docs, doc_dir)
    _gen_embeddings(spark, n_vecs, vec_dir)
    out["generate_sec"] = round(time.perf_counter() - t0, 2)
    docs = spark.read.parquet(doc_dir)
    vecs = spark.read.parquet(vec_dir)

    def timed(name, df):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        out[name] = round(time.perf_counter() - t0, 2)

    timed("minhash", near_dup_minhash(docs, threshold=0.5))
    timed("jaccard_salted", _salted_block_jaccard(docs))
    # block count sized so the per-task sims TILE (N/B)²·8B stays ≤128 MB
    # — the tile, not the block vectors, is the per-task memory bound
    n_blocks = max(8, n_vecs // 4000)
    timed("matmul_blocked", neardup_pairs_matmul(vecs, threshold=0.9, n_blocks=int(n_blocks)))

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
