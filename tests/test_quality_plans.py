"""Plan-evidence tests for the round-8 tier: the scale claims in the
docstrings asserted against the actual physical plans (the
test_plans.py discipline extended to the new queries)."""

from __future__ import annotations

from energi_data_etl_spark.plans.inspect import explain_str
from energi_data_etl_spark.queries import QUERIES


def test_ohlc_single_hash_exchange(spark, sf_dir):
    """The (type, hour) exchange is REUSED by both window ranks and the
    final aggregation — exactly one hash exchange in the whole plan
    (the rangepartitioning one is the output orderBy)."""
    plan = explain_str(QUERIES["ohlc_hourly_resample"].fn(spark, sf_dir), mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_twap_single_hash_exchange(spark, sf_dir):
    """Window and daily rollup share the (type, day) partitioning."""
    plan = explain_str(QUERIES["time_weighted_average_daily"].fn(spark, sf_dir), mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_benford_partial_aggregation(spark, sf_dir):
    """The digit histogram map-side combines (partial_count before the
    exchange) and the 9-row digit dimension broadcasts."""
    plan = explain_str(QUERIES["benford_first_digit_audit"].fn(spark, sf_dir), mode="simple")
    assert "partial_count" in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_char_lm_model_join_broadcasts(spark, sf_dir):
    """The char-probability model (≤ alphabet rows) joins by broadcast,
    never a shuffle of the exploded corpus against it."""
    plan = explain_str(QUERIES["char_lm_quality_bits"].fn(spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" in plan, plan


def test_dq_ri_check_plans_anti_join(spark, sf_dir):
    """The referential-integrity expectation really is a LEFT ANTI join
    on the key, and the range checks partial-aggregate."""
    plan = explain_str(QUERIES["dq_expectation_suite"].fn(spark, sf_dir), mode="simple")
    assert "LeftAnti" in plan, plan
    assert "partial_count" in plan, plan


def test_sequence_detection_no_self_join(spark, sf_dir):
    """The A-then-B pattern is ONE window pass: no join of the fact
    table against itself anywhere in the plan (the suffix-frame trick's
    whole point)."""
    plan = explain_str(QUERIES["event_sequence_detection"].fn(spark, sf_dir), mode="simple")
    assert "Join" not in plan, plan
    assert plan.count("Scan parquet") == 1, plan


def test_attribution_no_self_join(spark, sf_dir):
    """Same single-pass guarantee for the backward-looking variant."""
    plan = explain_str(QUERIES["attribution_last_touch"].fn(spark, sf_dir), mode="simple")
    assert plan.count("Scan parquet") == 1, plan


def test_mi_joint_frame_is_checkpointed_once(spark, sf_dir):
    """Marginals derive from the checkpointed joint frame: the plan
    shows the truncated lineage (ExistingRDD), not four parquet scans
    of the fact table."""
    plan = explain_str(QUERIES["mutual_information_type_value"].fn(spark, sf_dir), mode="simple")
    assert plan.count("Scan parquet") == 0, plan  # all branches read the checkpoint
    assert "Scan ExistingRDD" in plan, plan
