"""Round-8 retrieval-stack scale probe (VERDICT r07 item 7).

`bm25_topk_search`, `hybrid_retrieval_rrf` and the q-gram fuzzy join
landed after the r07b probe batch; this probe measures them at 1M and
10M synthetic documents (100k / 1M embedded vectors, 100k / 1M distinct
names) so the scale claims get measured ratios instead of docstring
assertions:

* BM25 / hybrid: "the corpus-sized shuffle carries |query| terms'
  postings, not the vocabulary" — the query-term filter lands before
  the groupBy, so 10x documents should cost ~linear scan + a postings
  shuffle proportional to the query terms' document frequencies.
* fuzzy q-gram join: the raw postings self-join is quadratic inside hot
  grams (the hazard the query docstring documents); the scale path it
  prescribes — "cap or drop the most frequent grams" — is measured here
  as a PREFIX-FILTERED variant: per name keep only its P rarest grams
  (rarest-first is the standard prefix-filtering bound), join on those,
  then levenshtein-verify. Candidates stay near-linear in names because
  prefix grams are df-biased-small by construction.

The corpus mirrors scale_probe_llm's generator but plants the BM25
query terms ("red", "widget", "small") at realistic selectivities
(~1/37, ~1/89, ~1/11 of docs) so the postings legs do real work.

Usage: python scripts/scale_probe_r08.py [n_small n_big]
       (defaults 1_000_000 and 10_000_000 documents; vectors and names
        scale at n/10; prints one JSON line with timings + ratios)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

import pyspark.sql.functions as F
from pyspark.sql import Window

sys.path.insert(0, ".")
from energi_data_etl_spark.queries import QUERIES  # noqa: E402
from energi_data_etl_spark.session import get_spark  # noqa: E402


def _gen_documents(spark, n: int, out: str) -> None:
    """20-59 token docs from a 5k-word vocabulary with the three BM25
    query terms planted at fixed modular selectivities (deterministic,
    engine-side generation — no driver data)."""
    n_words = 20 + F.pmod(F.xxhash64("id", F.lit(3)), F.lit(40))
    words = F.transform(
        F.sequence(F.lit(0), n_words.cast("int")),
        lambda i: F.concat(F.lit("w"), F.pmod(F.xxhash64("id", i), F.lit(5000)).cast("string")),
    )
    planted = F.concat_ws(
        " ",
        F.when(F.col("id") % 37 == 0, F.lit("red")),
        F.when(F.col("id") % 89 == 0, F.lit("widget widget")),
        F.when(F.col("id") % 11 == 0, F.lit("small")),
    )
    (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.trim(F.concat_ws(" ", F.concat_ws(" ", words), planted)).alias("text"),
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )


def _gen_embeddings(spark, n: int, out: str) -> None:
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (F.pmod(F.xxhash64("id", i), F.lit(2001)) / 1000.0 - 1.0).cast("float"),
    )
    (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )


def _gen_names(spark, n: int):
    """Distinct entity-like names: three 7-letter pseudo-words from a
    vocabulary that GROWS with n (n/20 words, so per-word name-group
    sizes stay ~60 at every scale — the realistic regime: a 10x-bigger
    entity corpus has 10x the distinct vocabulary, not 10x-bigger
    same-word clusters; a FIXED tiny vocabulary makes group sizes grow
    linearly and pair volume quadratically, which is the stop-gram /
    group-cap guardrail's job, not the prefix filter's) + a numeric
    tail for uniqueness; every 20th name is a 1-char edit of its
    predecessor (a realistic near-dup trickle for the levenshtein
    verify to find)."""
    seed = F.when(F.col("id") % 20 == 1, F.col("id") - 1).otherwise(F.col("id"))
    vocab = max(1000, n // 20)

    def word(salt: int):
        h = F.pmod(F.xxhash64(seed, F.lit(salt)), F.lit(vocab))
        return F.concat(
            F.lpad(F.conv(F.pmod(F.xxhash64(h, F.lit(salt + 7)), F.lit(26**5)).cast("string"), 10, 26), 5, "0"),
            F.lpad(F.conv(F.pmod(h, F.lit(676)).cast("string"), 10, 26), 2, "0"),
        )

    tail = F.when(F.col("id") % 20 == 1, F.lit("x")).otherwise(
        F.conv(F.pmod(F.xxhash64("id", F.lit(99)), F.lit(26**2)).cast("string"), 10, 26)
    )
    return (
        spark.range(n)
        .select(F.lower(F.concat_ws(" ", word(1), word(2), word(3), tail)).alias("p_name"))
        .distinct()
        .repartition(64)
    )


def _fuzzy_prefix_filtered(names, q: int = 4, prefix: int = 5):
    """The fuzzy_join_qgram_candidates plan shape with the scale
    mitigation its docstring prescribes: per name keep only the P
    globally-rarest q-grams (df-ascending, gram tiebreak), self-join on
    those, levenshtein-verify candidates. Shuffles: one df groupBy, one
    prefix-gram join, one pair groupBy — no hot-gram quadratic."""
    idx = F.sequence(F.lit(1), F.length("p_name") - F.lit(q - 1))
    grams = names.select(
        "p_name",
        F.explode(
            F.array_distinct(F.transform(idx, lambda i: F.col("p_name").substr(i, F.lit(q))))
        ).alias("g"),
    ).localCheckpoint(eager=False)
    df_counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("p_name").orderBy("df", "g")
    pref = (
        grams.join(df_counts, "g")
        .select("p_name", "g", F.row_number().over(w).alias("r"))
        .filter(F.col("r") <= prefix)
        .select("p_name", "g")
    )
    a = pref.select(F.col("p_name").alias("name_a"), "g")
    b = pref.select(F.col("p_name").alias("name_b"), "g")
    cand = (
        a.join(b, "g")
        .filter(F.col("name_a") < F.col("name_b"))
        .groupBy("name_a", "name_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return cand.withColumn("lev", F.levenshtein("name_a", "name_b")).filter(F.col("lev") <= 2)


def _time(fn, runs: int = 2) -> float:
    fn()  # warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    fuzzy_only = "--fuzzy-only" in sys.argv
    n_small = int(args[0]) if args else 1_000_000
    n_big = int(args[1]) if len(args) > 1 else 10_000_000
    spark = get_spark("scale-probe-r08")
    out: dict[str, dict[str, float]] = {}
    tmp = tempfile.mkdtemp(prefix="probe_r08_")
    try:
        for label, n in (("small", n_small), ("big", n_big)):
            d = f"{tmp}/{label}"
            if not fuzzy_only:
                t0 = time.time()
                _gen_documents(spark, n, d)
                _gen_embeddings(spark, n // 10, d)
                print(f"[gen] {label} n={n} in {time.time() - t0:.1f}s", flush=True)
                for qname in ("bm25_topk_search", "hybrid_retrieval_rrf"):
                    fn = QUERIES[qname].fn
                    sec = _time(lambda: fn(spark, d).collect())
                    out.setdefault(qname, {})[label] = sec
                    print(f"[{label}] {qname:24} min {sec:.2f}s", flush=True)
            names = _gen_names(spark, n // 10).localCheckpoint()
            n_names = names.count()
            sec = _time(lambda: _fuzzy_prefix_filtered(names).count())
            out.setdefault("fuzzy_prefix_filtered", {})[label] = sec
            print(f"[{label}] fuzzy_prefix_filtered    min {sec:.2f}s ({n_names} names)", flush=True)
            names.unpersist()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    ratios = {k: round(v["big"] / v["small"], 2) for k, v in out.items()}
    print(json.dumps({"n_small": n_small, "n_big": n_big, "sec": out, "ratio_10x": ratios}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
