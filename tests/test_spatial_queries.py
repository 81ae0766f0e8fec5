"""Method tests for the spatial tier (queries/spatial.py): grid-blocked
candidate generation pinned against brute-force numpy on the REAL
fixture coordinates, plus plan evidence that the self-join is an
equi-join on cell id (never a cartesian / nested-loop product)."""

from __future__ import annotations

import numpy as np

from energi_data_etl_spark.queries.spatial import (
    R2,
    _candidate_pairs,
    _points,
    spatial_grid_nearest_neighbor,
    spatial_grid_radius_join,
)


def _xy(spark, sf_dir):
    rows = _points(spark, sf_dir).collect()
    ids = np.array([r.id for r in rows], dtype=np.int64)
    x = np.array([r.x for r in rows], dtype=np.int64)
    y = np.array([r.y for r in rows], dtype=np.int64)
    return ids, x, y


def _brute_degrees(ids, x, y):
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    within = (d2 <= R2) & (ids[:, None] != ids[None, :])
    return within.sum(axis=1), d2, within


def test_grid_candidates_match_brute_force(spark, sf_dir):
    """Every directed pair the grid join emits == the all-pairs
    definition (completeness AND no false survivors)."""
    ids, x, y = _xy(spark, sf_dir)
    _, d2, within = _brute_degrees(ids, x, y)
    idx = {i: k for k, i in enumerate(ids)}
    expected = {
        (int(ids[i]), int(ids[j])) for i, j in zip(*np.nonzero(within))
    }
    got = {
        (r.a_id, r.b_id) for r in _candidate_pairs(_points(spark, sf_dir)).collect()
    }
    assert got == expected
    for r in _candidate_pairs(_points(spark, sf_dir)).collect():
        assert r.d2 == int(d2[idx[r.a_id], idx[r.b_id]])


def test_degree_histogram_matches_numpy(spark, sf_dir):
    ids, x, y = _xy(spark, sf_dir)
    deg, _, _ = _brute_degrees(ids, x, y)
    want = {int(k): int(v) for k, v in zip(*np.unique(deg, return_counts=True))}
    got = {
        r.neighbors_within_r: r.n_points
        for r in spatial_grid_radius_join(spark, sf_dir).collect()
    }
    assert got == want
    assert sum(got.values()) == len(ids)  # every point lands in one bucket


def test_nearest_neighbor_is_true_argmin(spark, sf_dir):
    """For every emitted (point, nn): nn is THE closest other point
    (min d2, ties to the smaller neighbor id) and within RADIUS."""
    ids, x, y = _xy(spark, sf_dir)
    idx = {int(i): k for k, i in enumerate(ids)}
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    rows = spatial_grid_nearest_neighbor(spark, sf_dir).collect()
    assert len(rows) <= 20
    seen = set()
    for r in rows:
        assert r.d2 <= R2
        i = idx[r.point_id]
        dist = d2[i].copy()
        dist[i] = np.iinfo(np.int64).max
        best = int(dist.min())
        assert r.d2 == best
        cands = ids[np.nonzero(dist == best)[0]]
        assert r.nn_id == int(cands.min())  # struct-MIN tie-break
        assert r.point_id not in seen
        seen.add(r.point_id)
    # rows are the GLOBAL 20 closest under (d2, point_id)
    order = [(r.d2, r.point_id) for r in rows]
    assert order == sorted(order)


def test_radius_join_plan_is_equi_join(spark, sf_dir):
    """Scale evidence: the physical plan joins on cell id (hash-
    joinable equi keys) — no CartesianProduct / BroadcastNestedLoop."""
    plan = spatial_grid_radius_join(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
