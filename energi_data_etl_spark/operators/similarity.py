"""Similarity search over embedding columns (SURVEY.md §2.10 L3; north
star: ANN at 100 TB).

Two tiers, as the mandate prescribes:

* exact brute-force top-k — the correctness baseline. Query set ⋈
  corpus via broadcast of the (small) query side; cosine is a JVM-side
  higher-order fold (zip_with + aggregate), then per-query top-k via
  window rank. Linear in |corpus| × |queries| — right answer when the
  query set is small; never the scale path for all-pairs.
* LSH-bucketed ANN (random hyperplanes) — the scale path: signature is
  a map stage; only bucket-mates are compared. Recall measured against
  the exact tier in tests (tests/test_llm_ops.py).

Vectors are float32 arrays; all arithmetic casts to double FIRST so
results are reproducible across engines (and DuckDB's list functions).
"""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

__all__ = ["dot", "l2_norm", "cosine", "exact_knn", "hyperplane_buckets", "ann_lsh_knn"]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def exact_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query side, fold the dot
    product in codegen, rank per query. Deterministic tiebreak on
    neighbor id. Returns (query_id, neighbor_id, rank, cos_sim)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("__qv"), F.col("__cv")).alias("__cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("__cos", 4).alias("cos_sim"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (Box–Muller on seeded PRNG) —
    no numpy dependency on executors; planes ship as literals."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def hyperplane_buckets(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64, n_planes: int = 8, seed: int = 42
) -> DataFrame:
    """Sign-random-projection LSH bucket id (0..2^n_planes-1) as a pure
    projection. Cosine-similar vectors collide with prob 1 - θ/π per
    plane."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = dot(F.col(vec_col), F.array(*[F.lit(v) for v in plane]))
        bucket = bucket + F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
    return df.withColumn("bucket", bucket)


def _multi_buckets(
    df: DataFrame, vec_col: str, dim: int, n_tables: int, n_planes: int, seed: int
) -> DataFrame:
    """(table, bucket) pairs for L independent hyperplane tables —
    OR-amplification: a near pair only needs to collide in ONE table.
    Exploded form so the candidate join is a plain equi-join."""
    entries = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        bucket = F.lit(0).cast("long")
        for i, plane in enumerate(planes):
            proj = dot(F.col(vec_col), F.array(*[F.lit(v) for v in plane]))
            bucket = bucket + F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        entries.append(F.struct(F.lit(t).alias("table"), bucket.alias("bucket")))
    return df.select("*", F.explode(F.array(*entries)).alias("__tb")).select(
        *df.columns, F.col("__tb.table").alias("table"), F.col("__tb.bucket").alias("bucket")
    )


def ann_lsh_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_tables: int = 12,
    n_planes: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: compare only within matching hyperplane
    buckets, unioned over L independent tables (OR-amplification).

    Collision prob for angle θ is 1-(1-(1-θ/π)^planes)^tables — with
    12×3 a 60° pair is caught w.p. ≈0.98. tables×planes is the
    recall/cost dial: clustered real-world embeddings want fewer
    tables & more planes; the fixture's near-orthogonal vectors are the
    worst case. Physical plan: map-stage bucketing, equi-join on
    (table,bucket), distinct pairs, cosine, window top-k — the corpus
    is never cross-joined."""
    qb = _multi_buckets(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
        "__qv", dim, n_tables, n_planes, seed,
    )
    cb = _multi_buckets(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "__cv", dim, n_tables, n_planes, seed,
    )
    cands = (
        qb.join(cb, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "__qv", "neighbor_id", "__cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select("query_id", "neighbor_id", cosine(F.col("__qv"), F.col("__cv")).alias("__cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("__cos", 4).alias("cos_sim"))
    )
