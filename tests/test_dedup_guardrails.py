"""Adversarial-skew dedup fixture (SURVEY.md §5 watch list): a
boilerplate flood — k near-identical docs — lands every copy in ONE
LSH bucket of EVERY band, generating k²·bands/2 candidate pairs. The
mega-bucket cap must bound that quadratic without losing either the
flood (exact dedup's job) or genuine near-dup pairs outside it."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from energi_data_etl_spark.operators import dedup as D
from energi_data_etl_spark.operators import text as X

FLOOD_N = 300
_BOILER = "this page is a mirror of the same boilerplate navigation text " * 3
_NEAR_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu nu xi omicron pi rho sigma tau upsilon"
_NEAR_B = "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu nu xi omicron pi rho sigma tau phi"


def _fixture(spark):
    rows = (
        [(i, _BOILER) for i in range(FLOOD_N)]
        + [(1000, _NEAR_A), (1001, _NEAR_B)]
        + [(2000 + i, f"unique document number {i} speaks only about topic {i * 7} and {i * 13}") for i in range(20)]
    )
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _signatures(df):
    base = df.select("doc_id", D.hashed_shingles(D.shingles("text", 3)).alias("sh"))
    return base.select("doc_id", D.minhash_signature(F.col("sh")).alias("sig"))


def test_megabucket_cap_bounds_flood_keeps_true_pairs(spark):
    sigs = _signatures(_fixture(spark)).persist()
    pairs = {(r.a, r.b) for r in D.lsh_candidate_pairs(sigs, max_bucket_size=50).collect()}
    assert (1000, 1001) in pairs, "true near-dup outside the flood must survive the cap"
    assert not any(a < FLOOD_N and b < FLOOD_N for a, b in pairs), "flood pairs must be dropped"
    assert len(pairs) < 1000


@pytest.mark.slow
def test_uncapped_flood_is_quadratic(spark):
    """The counterfactual the cap exists for: without max_bucket_size the
    flood bucket materializes all O(n²) pairs. Slow tier — the capped
    behavior itself is asserted in the default gate above."""
    sigs = _signatures(_fixture(spark)).persist()
    uncapped = D.lsh_candidate_pairs(sigs, max_bucket_size=None).count()
    assert uncapped >= FLOOD_N * (FLOOD_N - 1) // 2, "without the cap the flood is quadratic"


def test_flood_is_still_caught_by_exact_dedup(spark):
    df = _fixture(spark)
    groups = D.exact_dedup(df, X.fingerprint("text"))
    flood = groups.filter(F.col("n_copies") == FLOOD_N).collect()
    assert len(flood) == 1 and flood[0]["doc_id"] == 0


def test_bucket_stats_flags_megabuckets(spark):
    sigs = _signatures(_fixture(spark))
    stats = D.lsh_bucket_stats(sigs, max_bucket_size=50)
    flagged = stats.filter(F.col("dropped")).collect()
    assert len(flagged) >= 1
    assert all(r.n_members >= FLOOD_N for r in flagged)


def test_cap_sacrifices_near_but_not_exact_flood_documented_trade(spark):
    """The cap's honest cost (ADVICE r03): a flood of templated pages
    that differ in a few tokens (varying ids/dates) is neither exact-
    nor bag-duplicate, so the linear dedup passes do NOT recover what
    the cap drops — those near-dup pairs are sacrificed for
    boundedness. This test pins that trade so the docstring can't drift
    back to claiming the cap is free."""
    tmpl = " ".join(f"boilerplate{j} clause{j}" for j in range(30))  # 60 distinct tokens → pair Jaccard ≈ 0.97
    rows = [(i, tmpl + f" ref{i}") for i in range(120)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    base = df.select("doc_id", D.hashed_shingles(D.shingles("text", 3)).alias("sh"))
    sigs = base.select("doc_id", D.minhash_signature(F.col("sh")).alias("sig")).persist()

    uncapped = D.lsh_candidate_pairs(sigs, max_bucket_size=None).count()
    assert uncapped > 1000, "flood must actually collide in LSH buckets"
    capped = D.lsh_candidate_pairs(sigs, max_bucket_size=50).count()
    assert capped < uncapped / 10, "cap must bound the quadratic flood"

    # neither exact nor bag dedup catches the varying-token flood: the
    # dropped pairs are REALLY lost, not recovered by the cheap pass
    exact_groups = D.exact_dedup(df, X.fingerprint("text")).filter(F.col("n_copies") > 1).count()
    bag_groups = D.exact_dedup(df, X.bag_fingerprint("text")).filter(F.col("n_copies") > 1).count()
    assert exact_groups == 0 and bag_groups == 0


def _vec(j: int | None, dim: int = 64) -> list[float]:
    """All-ones flood vector (j=None) or a distinct one-hot-ish vector."""
    if j is None:
        return [1.0] * dim
    return [5.0 if i == j else (0.01 * ((i * 7 + j) % 5 - 2)) for i in range(dim)]


def test_ann_lsh_megabucket_cap_bounds_degenerate_corpus(spark):
    """ANN twin of the dedup flood test (VERDICT r03 item 4): a corpus
    of identical vectors lands whole tables in one (table, bucket); the
    relative cap drops those buckets so the candidate join stays
    bounded, while queries near DISTINCT corpus vectors keep their
    neighbors (their buckets are under cap in at least one table)."""
    from energi_data_etl_spark.operators import similarity as S

    flood = [(i, _vec(None)) for i in range(300)]
    distinct = [(1000 + j, _vec(j)) for j in range(20)]
    corpus = spark.createDataFrame(flood + distinct, ["vec_id", "embedding"])
    queries = spark.createDataFrame(distinct[:5], ["vec_id", "embedding"])

    stats = S.ann_lsh_bucket_stats(corpus, min_bucket_cap=50)
    flagged = stats.filter(F.col("dropped")).collect()
    assert len(flagged) >= 1
    assert all(r.n_members >= 300 for r in flagged)
    assert all(r.cap == 80 for r in flagged)  # max(floor 50, 0.25 × 320-vector table total)

    capped = S.ann_lsh_knn(queries, corpus, k=3, min_bucket_cap=50).collect()
    # no capped neighbor may come from the flood bucket...
    assert all(r.neighbor_id >= 1000 for r in capped)
    # ...but neighbors outside the flood survive (OR-amplification)
    assert len(capped) > 0

    uncapped = S.ann_lsh_knn(queries, corpus, k=3, max_bucket_frac=None).collect()
    assert any(r.neighbor_id < 300 for r in uncapped), "without the cap the flood floods the top-k"
