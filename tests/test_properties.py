"""Property-based tests (SURVEY.md §5.2 item 5, hypothesis): algebraic
invariants the engine must hold for ANY input, generalizing the
reference's core transform (grouped average, energy_etl.py:69-70).

Examples are kept small and few — each one spins Spark jobs — but the
properties are the real contract: partition-order invariance, split/
union decomposability, dedup idempotence, salted-agg equivalence.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["SE1", "SE2", "SE3"]),
        st.integers(min_value=1, max_value=5),  # day
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=40,
)


def _daily(spark, rows):
    df = spark.createDataFrame([(z, d, v) for z, d, v in rows], "zone string, day int, price double")
    return {
        (r.zone, r.day): r.avg_price
        for r in df.groupBy("zone", "day").agg(F.avg("price").alias("avg_price")).collect()
    }


@given(rows=rows_strategy, seed=st.integers(min_value=0, max_value=2**31 - 1))
@settings(**SETTINGS)
def test_grouped_avg_invariant_under_row_permutation(spark, rows, seed):
    """A1 invariance: shuffling input rows (different partition order)
    must not change grouped averages beyond float round-off."""
    import random

    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)
    a, b = _daily(spark, rows), _daily(spark, shuffled)
    assert a.keys() == b.keys()
    for k in a:
        assert math.isclose(a[k], b[k], rel_tol=1e-9, abs_tol=1e-9)


@given(rows=rows_strategy, cut=st.integers(min_value=0, max_value=40))
@settings(**SETTINGS)
def test_grouped_avg_decomposes_over_union(spark, rows, cut):
    """Computing on a union of two splits == computing on the whole —
    the map-side-combine correctness property (the reference's
    per-zone accumulation across days is morally this union)."""
    cut = min(cut, len(rows))
    left, right = rows[:cut], rows[cut:]
    dfa = spark.createDataFrame([(z, d, v) for z, d, v in left] or [("SEX", 0, 0.0)], "zone string, day int, price double")
    dfb = spark.createDataFrame([(z, d, v) for z, d, v in right] or [("SEX", 0, 0.0)], "zone string, day int, price double")
    if not left:
        dfa = dfa.filter("zone <> 'SEX'")
    if not right:
        dfb = dfb.filter("zone <> 'SEX'")
    union = {
        (r.zone, r.day): r.avg_price
        for r in dfa.unionByName(dfb).groupBy("zone", "day").agg(F.avg("price").alias("avg_price")).collect()
    }
    whole = _daily(spark, rows)
    assert union.keys() == whole.keys()
    for k in whole:
        assert math.isclose(union[k], whole[k], rel_tol=1e-9, abs_tol=1e-9)


@given(
    texts=st.lists(
        st.text(alphabet="abcde ", min_size=1, max_size=30).filter(lambda s: s.strip()),
        min_size=1,
        max_size=15,
    )
)
@settings(**SETTINGS)
def test_exact_dedup_idempotent_and_count_preserving(spark, texts):
    """L1 properties: survivor count == distinct fingerprints; running
    dedup on its own survivors changes nothing; copies are accounted."""
    from energi_data_etl_spark.operators.dedup import exact_dedup
    from energi_data_etl_spark.operators.text import fingerprint

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = exact_dedup(df, fingerprint("text"))
    rows = out.collect()
    distinct_norm = {t.strip().lower() for t in texts}
    assert len(rows) == len(distinct_norm)
    assert sum(r.n_copies for r in rows) == len(texts)
    # idempotence: dedup of survivors is a no-op (all n_copies == 1)
    survivors = df.join(out.select("doc_id"), "doc_id", "left_semi")
    again = exact_dedup(survivors, fingerprint("text")).collect()
    assert len(again) == len(rows) and all(r.n_copies == 1 for r in again)


@given(
    values=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.floats(min_value=-1e4, max_value=1e4, allow_nan=False)),
        min_size=1,
        max_size=30,
    ),
    buckets=st.integers(min_value=1, max_value=8),
)
@settings(**SETTINGS)
def test_salted_agg_always_equals_direct(spark, values, buckets):
    from energi_data_etl_spark.operators.skew import salted_agg

    df = spark.createDataFrame(values, "k string, v double")
    got = {r.k: (r.n, r.min_value, r.max_value, r.avg_value) for r in salted_agg(df, ["k"], "v", buckets).collect()}
    want = {
        r.k: (r.n, r.mn, r.mx, r.av)
        for r in df.groupBy("k")
        .agg(F.count("v").alias("n"), F.min("v").alias("mn"), F.max("v").alias("mx"), F.avg("v").alias("av"))
        .collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0] and got[k][1] == want[k][1] and got[k][2] == want[k][2]
        assert math.isclose(got[k][3], want[k][3], rel_tol=1e-9, abs_tol=1e-9)


# --- snapshot-diff algebra (r06 maintenance tier) -----------------------

snap_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=60),  # key
        st.sampled_from(["O", "F", "P"]),
        st.integers(min_value=0, max_value=10_000),  # cents
    ),
    min_size=0,
    max_size=40,
    unique_by=lambda t: t[0],
)


def _diff_counts(spark, old_rows, new_rows):
    """Runs the PRODUCTION classifier (operators/pipeline.snapshot_diff
    — the same one snapshot_diff_orders certifies) on arbitrary
    generated snapshots; no reimplementation of the algebra."""
    from pyspark.sql import functions as SF

    from energi_data_etl_spark.operators.pipeline import snapshot_diff

    old_df = spark.createDataFrame(old_rows or [(0, "O", 0)], "k long, s string, c long")
    new_df = spark.createDataFrame(new_rows or [(0, "O", 0)], "k long, s string, c long")
    if not old_rows:
        old_df = old_df.filter("k < 0")
    if not new_rows:
        new_df = new_df.filter("k < 0")
    h = lambda: SF.md5(SF.concat(SF.col("s"), SF.lit("|"), SF.col("c").cast("string")))  # noqa: E731
    out = snapshot_diff(
        old_df.withColumn("h", h()), new_df.withColumn("h", h()), key="k", row_hash="h"
    ).groupBy(SF.col("change_type").alias("t")).count()
    return {r.t: r["count"] for r in out.collect()}


@given(old=snap_strategy, new=snap_strategy)
@settings(**SETTINGS)
def test_snapshot_diff_partitions_key_union(spark, old, new):
    """added+removed+changed+unchanged == |keys(old) ∪ keys(new)|, and
    each class equals its set-theoretic definition — for ANY pair of
    snapshots, not just the fixture's modular construction."""
    counts = _diff_counts(spark, old, new)
    ok = {t[0] for t in old}
    nk = {t[0] for t in new}
    by_key_old = {t[0]: (t[1], t[2]) for t in old}
    by_key_new = {t[0]: (t[1], t[2]) for t in new}
    expected = {
        "added": len(nk - ok),
        "removed": len(ok - nk),
        "changed": sum(1 for k in ok & nk if by_key_old[k] != by_key_new[k]),
        "unchanged": sum(1 for k in ok & nk if by_key_old[k] == by_key_new[k]),
    }
    expected = {k: v for k, v in expected.items() if v}
    assert counts == expected
    assert sum(counts.values()) == len(ok | nk)


@given(snap=snap_strategy)
@settings(**SETTINGS)
def test_snapshot_diff_self_is_all_unchanged(spark, snap):
    counts = _diff_counts(spark, snap, snap)
    assert set(counts) <= {"unchanged"}
    assert counts.get("unchanged", 0) == len(snap)


def test_snapshot_diff_null_hash_classifies_changed(spark):
    """A NULL row_hash on exactly one side of a both-sides key must read
    as 'changed', not fall through to 'unchanged' (ADVICE r06: plain !=
    evaluates to NULL and skips the branch; F.concat/md5 hashes go NULL
    whenever any value column is NULL, so this is easy to hit silently).
    NULL-on-both-sides is 'unchanged' under eqNullSafe — same content."""
    from energi_data_etl_spark.operators.pipeline import snapshot_diff

    old_df = spark.createDataFrame([(1, None), (2, "aa"), (3, None)], "k long, h string")
    new_df = spark.createDataFrame([(1, "bb"), (2, None), (3, None)], "k long, h string")
    got = {r.k: r.change_type for r in snapshot_diff(old_df, new_df, key="k", row_hash="h").collect()}
    assert got == {1: "changed", 2: "changed", 3: "unchanged"}
