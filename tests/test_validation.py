"""Validation-operator unit tests with planted violations."""

from __future__ import annotations

import pyspark.sql.functions as F

from energi_data_etl_spark.operators.validation import Rule, fk_violations, validate


def test_validate_counts_planted_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 2.0)], "id int, v double"
    )
    out = {r.rule: (r.n_rows, r.n_violations, r.pct_ok) for r in validate(
        df,
        [
            Rule("v_positive", F.col("v") > 0),  # -5.0 fails, NULL counts as violation
            Rule("id_nonnull", F.col("id").isNotNull()),
        ],
    ).collect()}
    assert out["v_positive"] == (4, 2, 0.5)
    assert out["id_nonnull"] == (4, 0, 1.0)


def test_fk_violations_finds_orphans(spark):
    fact = spark.createDataFrame([(1, 10), (2, 99), (3, 11)], "id int, fk int")
    dim = spark.createDataFrame([(10,), (11,)], "pk int")
    orphans = fk_violations(fact, "fk", dim, "pk").collect()
    assert [r.id for r in orphans] == [2]
