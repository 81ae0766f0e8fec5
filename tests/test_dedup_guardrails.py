"""Adversarial-skew dedup fixture (SURVEY.md §5 watch list): a
boilerplate flood — k near-identical docs — lands every copy in ONE
LSH bucket of EVERY band, generating k²·bands/2 candidate pairs. The
mega-bucket cap must bound that quadratic without losing either the
flood (exact dedup's job) or genuine near-dup pairs outside it."""

from __future__ import annotations

import pyspark.sql.functions as F

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
