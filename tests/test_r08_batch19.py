"""Method tests for the r08 fourth-session batch: each query pinned
against an INDEPENDENT python implementation on the real fixture data
(not the DuckDB twin — parity already rides test_oracle_parity.py),
plus plan evidence for the scale claims that matter."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from energi_data_etl_spark.queries.datapipe import (
    APPORTION_BUDGET,
    token_budget_apportionment,
)
from energi_data_etl_spark.queries.quality import column_profile_report
from energi_data_etl_spark.queries.sketches import cms_join_cardinality
from energi_data_etl_spark.queries.spatial import (
    FENCE,
    QUAD,
    _points,
    spatial_point_in_polygon,
)
from energi_data_etl_spark.queries.timeseries import (
    PRESENCE_US,
    interval_coalesce_users,
)


def _ray_cast(px: int, py: int) -> bool:
    """Independent float even-odd ray cast (textbook form with the
    explicit intersection-x comparison, NOT the integer orientation
    test the query uses)."""
    inside = False
    n = len(FENCE)
    for i in range(n):
        x1, y1 = FENCE[i]
        x2, y2 = FENCE[(i + 1) % n]
        if (y1 <= py) != (y2 <= py):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xint:
                inside = not inside
    return inside


def test_point_in_polygon_matches_float_ray_cast(spark, sf_dir):
    pts = _points(spark, sf_dir).collect()
    grid_n = Counter((r.x // QUAD, r.y // QUAD) for r in pts)
    grid_in = Counter(
        (r.x // QUAD, r.y // QUAD) for r in pts if _ray_cast(r.x, r.y)
    )
    got = spatial_point_in_polygon(spark, sf_dir).collect()
    assert sum(r.n_inside for r in got) > 0  # fence actually catches points
    for r in got:
        assert r.n_pts == grid_n[(r.qx, r.qy)]
        assert r.n_inside == grid_in.get((r.qx, r.qy), 0)


def test_point_in_polygon_is_join_free(spark, sf_dir):
    plan = spatial_point_in_polygon(spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
        spatial_point_in_polygon(spark, sf_dir)._jdf.queryExecution(), "simple"
    )
    assert "Join" not in plan  # containment is a pure map stage


def test_cms_join_cardinality_exact_side_and_guarantee(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_partkey").toPandas()
    counts = df["l_partkey"].value_counts()
    f2 = int((counts.astype("int64") ** 2).sum())
    row = cms_join_cardinality(spark, sf_dir).collect()[0]
    assert row.exact_join_rows == f2
    assert row.n_rows == len(df) and row.n_keys == counts.size
    for est in (row.est_d0, row.est_d1, row.est_d2):
        assert est >= f2  # CMS inner product can only overestimate
    assert row.cms_est == min(row.est_d0, row.est_d1, row.est_d2)
    assert row.is_overestimate and row.overcount == row.cms_est - f2


def test_interval_coalesce_matches_python_merge(spark, sf_dir):
    from energi_data_etl_spark.sources.tables import load_table

    ev = load_table(spark, "events", sf_dir).select("user_id", "ts").toPandas()
    # independent µs derivation: pandas datetime arithmetic, not unix_micros
    us = (ev["ts"] - pd.Timestamp("1970-01-01")) // pd.Timedelta(microseconds=1)
    merged_stats = {}
    by_user: dict[int, list[int]] = {}
    for u, s in zip(ev["user_id"], us):
        by_user.setdefault(int(u), []).append(int(s))
    for u, starts in by_user.items():
        islands = []
        for s in sorted(starts):
            e = s + PRESENCE_US
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        merged_stats[u] = (
            len(islands),
            sum(e - s for s, e in islands),
            max(e - s for s, e in islands),
        )
    got = interval_coalesce_users(spark, sf_dir).collect()
    assert len(got) == len(merged_stats)
    for r in got:
        n, cov, mx = merged_stats[r.user_id]
        assert (r.n_islands, r.coverage_us, r.max_island_us) == (n, cov, mx)


def test_apportionment_sums_to_budget_and_matches_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("source", "text").toPandas()
    toks = docs["text"].str.lower().str.split(" ").map(lambda ts: sum(1 for t in ts if t))
    per = pd.DataFrame({"source": docs["source"], "n": toks}).groupby("source")["n"].sum()
    total = int(per.sum())
    quotas = {s: (APPORTION_BUDGET * int(t)) // total for s, t in per.items()}
    rems = {s: (APPORTION_BUDGET * int(t)) % total for s, t in per.items()}
    leftover = APPORTION_BUDGET - sum(quotas.values())
    order = sorted(per.index, key=lambda s: (-rems[s], s))
    final = {s: quotas[s] + (1 if order.index(s) < leftover else 0) for s in per.index}
    got = token_budget_apportionment(spark, sf_dir).collect()
    assert sum(r.final_alloc for r in got) == APPORTION_BUDGET
    for r in got:
        assert r.n_tokens == int(per[r.source])
        assert r.quota_floor == quotas[r.source]
        assert r.final_alloc == final[r.source]


def test_column_profile_matches_pandas(spark, sf_dir):
    pdf = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    got = {r.col_name: r for r in column_profile_report(spark, sf_dir).collect()}
    assert set(got) == {
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderdate",
        "o_orderstatus",
        "o_orderpriority",
    }
    for c in ("o_orderkey", "o_custkey", "o_totalprice"):
        r = got[c]
        assert r.n_rows == len(pdf)
        assert r.n_null == int(pdf[c].isna().sum())
        assert r.ndv == pdf[c].nunique()
        assert r.min_num == float(pdf[c].min()) and r.max_num == float(pdf[c].max())
        assert r.min_str is None and r.avg_len_c is None
    for c in ("o_orderstatus", "o_orderpriority"):
        r = got[c]
        assert r.ndv == pdf[c].nunique()
        assert r.min_str == pdf[c].min() and r.max_str == pdf[c].max()
        lens = pdf[c].dropna().str.len()
        assert r.avg_len_c == (int(lens.sum()) * 100) // len(lens)
    d = got["o_orderdate"]
    days = (pdf["o_orderdate"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
    assert d.min_num == float(days.min()) and d.max_num == float(days.max())


def test_semdedup_matches_numpy_brute_force(spark, sf_dir):
    """Independent numpy replay: L2-argmin assignment to the 32 seed
    vectors, within-cell cosine pairs via np.dot, prune = greater id."""
    import numpy as np

    from energi_data_etl_spark.queries.llm import semdedup_cell_prune

    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .selectExpr("vec_id", "cast(embedding as array<double>) v")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.v for r in rows])
    seed_mask = ids < 32
    seeds = V[seed_mask][np.argsort(ids[seed_mask])]
    d2 = ((V[:, None, :] - seeds[None, :, :]) ** 2).sum(axis=2)
    cell = d2.argmin(axis=1)  # ties: argmin picks lowest cid, same as ORDER BY d, cid
    nrm = (V * V).sum(axis=1)
    n_vecs, n_pairs, pruned = {}, {}, {}
    order = np.argsort(ids)
    for k in range(32):
        idx = order[cell[order] == k]
        n_vecs[k] = len(idx)
        n_pairs[k] = 0
        pr = set()
        for ii in range(len(idx)):
            for jj in range(ii + 1, len(idx)):
                a, b = idx[ii], idx[jj]
                cos = float(V[a] @ V[b]) / (np.sqrt(nrm[a]) * np.sqrt(nrm[b]))
                if cos > 0.4:
                    n_pairs[k] += 1
                    pr.add(int(ids[b]))
        pruned[k] = len(pr)
    got = semdedup_cell_prune(spark, sf_dir).collect()
    assert sum(r.n_dup_pairs for r in got) > 0  # fixture non-vacuous
    for r in got:
        assert r.n_vecs == n_vecs[r.cell]
        assert r.n_dup_pairs == n_pairs[r.cell], r.cell
        assert r.n_pruned == pruned[r.cell]
        assert r.n_kept == r.n_vecs - r.n_pruned


def test_cascade_delete_matches_pandas_replay(spark, sf_dir):
    import hashlib

    from energi_data_etl_spark.queries.datapipe import cascade_delete_audit

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey").toPandas()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_custkey").toPandas()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey").toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id").toPandas()

    def bucket(k: int) -> int:
        return int(hashlib.md5(f"{k}gdpr".encode()).hexdigest()[:8], 16) % 20

    victims = {int(k) for k in cust["c_custkey"] if bucket(int(k)) == 0}
    del_orders = {int(o) for o, c in zip(orders["o_orderkey"], orders["o_custkey"]) if int(c) in victims}
    exp = {
        "customer": (len(cust), len(victims)),
        "orders": (len(orders), len(del_orders)),
        "lineitem": (len(li), int(li["l_orderkey"].map(lambda o: int(o) in del_orders).sum())),
        "events": (len(ev), int(ev["user_id"].map(lambda u: int(u) in victims).sum())),
    }
    got = cascade_delete_audit(spark, sf_dir).collect()
    assert len(got) == 4
    for r in got:
        n_total, n_delete = exp[r.tbl]
        assert (r.n_total, r.n_delete, r.n_survive) == (n_total, n_delete, n_total - n_delete)
        assert r.n_delete > 0  # cohort non-vacuous at every SF


def test_slo_burn_rate_matches_python_replay(spark, sf_dir):
    from energi_data_etl_spark.queries.opsanalytics import (
        SLO_BAD_THRESHOLD,
        SLO_BURN1_PPM,
        SLO_BURN6_PPM,
        slo_burn_rate_alert,
    )
    from energi_data_etl_spark.sources.tables import load_table

    ev = load_table(spark, "events", sf_dir).select("ts", "value").toPandas()
    hours = (ev["ts"] - pd.Timestamp("1970-01-01")) // pd.Timedelta(hours=1)
    hourly: dict[int, list[int]] = {}
    for h, v in zip(hours, ev["value"]):
        n, bad = hourly.get(int(h), [0, 0])
        hourly[int(h)] = [n + 1, bad + (1 if v >= SLO_BAD_THRESHOLD else 0)]
    expected = {}
    for h in sorted(hourly):
        n1, b1 = hourly[h]
        n6 = sum(hourly.get(k, [0, 0])[0] for k in range(h - 5, h + 1))
        b6 = sum(hourly.get(k, [0, 0])[1] for k in range(h - 5, h + 1))
        burn1, burn6 = b1 * 100000000 // n1, b6 * 100000000 // n6
        if burn1 >= SLO_BURN1_PPM and burn6 >= SLO_BURN6_PPM:
            expected[h] = (n1, b1, burn1, n6, b6, burn6)
    got = slo_burn_rate_alert(spark, sf_dir).collect()
    assert len(got) > 0  # dials non-vacuous at every SF
    assert {r.hour_epoch for r in got} == set(expected)
    for r in got:
        n1, b1, burn1, n6, b6, burn6 = expected[r.hour_epoch]
        assert (r.n_1h, r.bad_1h, r.burn1_ppm) == (n1, b1, burn1)
        assert (r.n_6h, r.bad_6h, r.burn6_ppm) == (n6, b6, burn6)


def test_masking_surface_matches_python_replay(spark, sf_dir):
    import hashlib
    import re

    from energi_data_etl_spark.queries.datapipe import masking_surface

    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where("c_custkey < 50")
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .toPandas()
        .set_index("c_custkey")
    )
    got = masking_surface(spark, sf_dir).collect()
    assert len(got) == 50
    for r in got:
        name = cust.loc[r.c_custkey, "c_name"]
        masked = re.sub(r"[0-9]", "n", re.sub(r"[a-z]", "x", re.sub(r"[A-Z]", "X", name)))
        assert r.name_masked == masked
        assert r.name_pseudo == hashlib.sha256(f"{name}#pepper".encode()).hexdigest()
        import math

        assert r.acctbal_band == int(math.floor(cust.loc[r.c_custkey, "c_acctbal"] / 1000)) * 1000
        assert r.segment_kept == cust.loc[r.c_custkey, "c_mktsegment"]


def test_rolling_correlation_matches_numpy(spark, sf_dir):
    import numpy as np

    from energi_data_etl_spark.queries.timeseries import rolling_correlation_daily
    from energi_data_etl_spark.sources.tables import load_table

    ev = load_table(spark, "events", sf_dir).select("ts", "event_type").toPandas()
    days = (ev["ts"] - pd.Timestamp("1970-01-01")) // pd.Timedelta(days=1)
    daily: dict[int, list[int]] = {}
    for d, t in zip(days, ev["event_type"]):
        x, y = daily.get(int(d), [0, 0])
        daily[int(d)] = [x + (t == "view"), y + (t == "click")]
    got = rolling_correlation_daily(spark, sf_dir).collect()
    assert len(got) > 0
    ds = sorted(daily)
    for r in got:
        window = [daily[k] for k in ds if r.day_epoch - 6 <= k <= r.day_epoch]
        assert len(window) == 7  # only full windows emit
        xs = np.array([w[0] for w in window], dtype=float)
        ys = np.array([w[1] for w in window], dtype=float)
        ref = float(np.corrcoef(xs, ys)[0, 1])
        # FLOOR-6dp of the closed form vs numpy's formulation: agree to 1e-6
        assert abs(r.corr_f6 - ref) < 2e-6
        n, sx, sy = 7, int(xs.sum()), int(ys.sum())
        assert r.cov_num == n * int((xs * ys).sum()) - sx * sy
        assert (r.views, r.clicks) == (daily[r.day_epoch][0], daily[r.day_epoch][1])


def test_shortest_path_matches_python_dijkstra(spark, sf_dir):
    """Independent python Dijkstra (heap-based, not layer relaxation)
    over the same md5-weighted DAG."""
    import hashlib
    import heapq

    from energi_data_etl_spark.queries.opsanalytics import shortest_path_layered_dag

    def w(a: int, b: int) -> int:
        return 1 + int(hashlib.md5(f"{a}-{b}".encode()).hexdigest()[:8], 16) % 1000

    adj = {a: [(b, w(a, b)) for b in range(25) if b // 5 == a // 5 + 1] for a in range(25)}
    dist = {0: 0}
    heap = [(0, 0)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, 1 << 62):
            continue
        for v, wt in adj.get(u, []):
            if d + wt < dist.get(v, 1 << 62):
                dist[v] = d + wt
                heapq.heappush(heap, (d + wt, v))
    got = shortest_path_layered_dag(spark, sf_dir).collect()
    assert len(got) == 20  # every non-source-layer node reachable
    for r in got:
        assert r.best_cost == dist[r.node]
        assert r.hops == r.node // 5


def test_target_encoding_loo_matches_pandas(spark, sf_dir):
    import math

    from energi_data_etl_spark.queries.datapipe import target_encoding_loo

    pdf = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).toPandas()
    pdf["cents"] = pdf["o_totalprice"].map(lambda x: int(math.floor(x * 100 + 0.5)))
    sums = pdf.groupby("o_orderpriority")["cents"].sum().to_dict()
    ns = pdf.groupby("o_orderpriority")["cents"].count().to_dict()
    got = target_encoding_loo(spark, sf_dir).collect()
    assert len(got) > 0
    lookup = pdf.set_index("o_orderkey")
    for r in got:
        pr, cents = lookup.loc[r.o_orderkey, "o_orderpriority"], int(lookup.loc[r.o_orderkey, "cents"])
        assert r.cents == cents and r.o_orderpriority == pr
        loo_num, loo_den = sums[pr] - cents, ns[pr] - 1
        assert r.loo_mean_cents == loo_num // loo_den
        assert r.loo_mean_cents_f4 == math.floor(loo_num * 10000 / loo_den) / 10000.0


def test_temporal_embargo_boundaries_never_overlap(spark, sf_dir):
    from energi_data_etl_spark.queries.datapipe import split_temporal_embargo

    rows = {r.split: r for r in split_temporal_embargo(spark, sf_dir).collect()}
    assert set(rows) == {"train", "embargo", "test"}  # all three non-empty
    assert rows["train"].max_day < rows["embargo"].min_day
    assert rows["embargo"].max_day < rows["test"].min_day
    # gap and test widths match the dials exactly (fixture is day-dense)
    assert rows["test"].max_day - rows["test"].min_day + 1 == 10
    assert rows["embargo"].max_day - rows["embargo"].min_day + 1 == 2


def test_incremental_sessionize_seam_is_exercised(spark, sf_dir):
    """The merge path must actually fire on the fixture (a vacuous
    seam would certify nothing), and the stitched result must equal a
    direct full-data sessionization computed in-Spark."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from energi_data_etl_spark.queries.behavior import (
        INC_GAP_US,
        INC_NEW_DAYS,
        sessionize_incremental_merge,
    )
    from energi_data_etl_spark.sources.tables import load_table

    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("d"),
    )
    # full-data sessionization, straight over all history
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    marked = ev.select(
        "user_id",
        "event_id",
        "us",
        "d",
        F.when(
            F.lag("us").over(w).isNull() | ((F.col("us") - F.lag("us").over(w)) > INC_GAP_US), 1
        )
        .otherwise(0)
        .alias("ns"),
    )
    spans = (
        marked.select("user_id", "us", "d", F.sum("ns").over(wc).alias("sid"))
        .groupBy("user_id", "sid")
        .agg(
            F.min("us").alias("s"),
            F.max("us").alias("e"),
            F.count(F.lit(1)).alias("n"),
            F.min("d").alias("mind"),
            F.max("d").alias("maxd"),
        )
    )
    cut = ev.agg((F.max("d") - INC_NEW_DAYS + 1).alias("c")).collect()[0].c
    n_spanning = spans.where((F.col("mind") < cut) & (F.col("maxd") >= cut)).count()
    assert n_spanning > 0  # the stitch path actually runs

    full = (
        spans.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n").cast("long").alias("total_events"),
            F.max(F.col("e") - F.col("s")).cast("long").alias("max_len_us"),
            F.max("e").cast("long").alias("latest_end_us"),
        )
        .orderBy("user_id")
        .collect()
    )
    inc = sessionize_incremental_merge(spark, sf_dir).collect()
    assert [tuple(r) for r in inc] == [tuple(r) for r in full]
