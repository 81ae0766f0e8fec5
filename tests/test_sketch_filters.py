"""Method tests for the probabilistic-filter tier (queries/sketches.py):
the Bloom no-false-negative guarantee and fill arithmetic replayed in
python, and the count-min estimates replayed against a brute-force
dict sketch on the same fixture data."""

from __future__ import annotations

import hashlib

from energi_data_etl_spark.queries.sketches import (
    BLOOM_BITS,
    BLOOM_K,
    CMS_DEPTH,
    CMS_WIDTH,
    bloom_filter_prejoin,
    countmin_frequency_audit,
)
from energi_data_etl_spark.sources.tables import load_table


def _md5_pos(key: int, tag: str, mod: int) -> int:
    return int(hashlib.md5(f"{key}{tag}".encode()).hexdigest()[:8], 16) % mod


def test_bloom_matches_python_reference(spark, sf_dir):
    """The whole audit row replayed with a python set-of-bits Bloom on
    the same fixture keys: counts, fill, fp accounting, guarantee."""
    orders = load_table(spark, "orders", sf_dir)
    build = {
        r.o_custkey
        for r in orders.where("o_orderpriority = '1-URGENT'").select("o_custkey").distinct().collect()
    }
    probe = [r.c_custkey for r in load_table(spark, "customer", sf_dir).select("c_custkey").collect()]
    bits = set()
    for k in build:
        for i in range(BLOOM_K):
            bits.add(_md5_pos(k, f"b{i}", BLOOM_BITS))
    passes = {
        k for k in probe if all(_md5_pos(k, f"b{i}", BLOOM_BITS) in bits for i in range(BLOOM_K))
    }
    row = bloom_filter_prejoin(spark, sf_dir).collect()[0]
    assert row.n_build_keys == len(build)
    assert row.n_bits_set == len(bits)
    assert row.n_probe == len(probe)
    assert row.n_pass == len(passes)
    assert row.n_true_members == len([k for k in probe if k in build])
    assert row.n_false_positives == len([k for k in passes if k not in build])
    assert row.no_false_negatives  # construction guarantee
    assert build <= passes  # ...and literally: every member passes


def test_countmin_matches_python_reference(spark, sf_dir):
    """CMS estimates == a brute-force python d x w counter array; the
    overcount of a key is exactly the colliding keys' mass (min over
    rows), and never negative."""
    counts: dict[int, int] = {}
    for r in load_table(spark, "events", sf_dir).groupBy("user_id").count().collect():
        counts[r.user_id] = r["count"]
    cells: dict[tuple[int, int], int] = {}
    for user, c in counts.items():
        for r in range(CMS_DEPTH):
            key = (r, _md5_pos(user, f"c{r}", CMS_WIDTH))
            cells[key] = cells.get(key, 0) + c
    rows = countmin_frequency_audit(spark, sf_dir).collect()
    assert rows, "fixture has users"
    for row in rows:
        expect = min(
            cells[(r, _md5_pos(row.user_id, f"c{r}", CMS_WIDTH))] for r in range(CMS_DEPTH)
        )
        assert row.exact_cnt == counts[row.user_id]
        assert row.cms_est == expect
        assert row.overcount == expect - counts[row.user_id]
        assert row.overcount >= 0 and row.is_overestimate
    # top-20 selection is the true (exact desc, user asc) order
    order = [(-r.exact_cnt, r.user_id) for r in rows]
    assert order == sorted(order)


def test_filter_plans_stay_broadcast(spark, sf_dir):
    """Scale evidence: the probe-side membership checks are broadcast
    hash joins (the sketch is tiny by construction); no SMJ shuffle of
    the probe side against the sketch, no nested-loop product."""
    for q in (bloom_filter_prejoin, countmin_frequency_audit):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan
