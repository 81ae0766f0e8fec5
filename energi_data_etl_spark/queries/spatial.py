"""Round-8 spatial tier: grid-blocked geometric joins.

The reference has no spatial surface; this is the EXT tier's answer to
the geo workloads a 100 TB lake inevitably grows (geofenced joins,
nearest-facility lookups, density maps). The load-bearing idea is the
same one the LSH/dedup tier uses for text: NEVER form the all-pairs
product — block the data into equi-joinable cells so candidate
generation is a plain hash join, then verify candidates with the exact
predicate.

Geometry here is an integer grid: each customer gets a deterministic
point in a 1024x1024 lattice derived from the cross-engine md5 kernel
(CLAUDE.md: Spark ``conv(substring(md5(x),1,8),16,10)`` == DuckDB
``CAST('0x'||SUBSTRING(MD5(x),1,8) AS BIGINT)``), so coordinates,
distances, and every emitted value are exact BIGINTs on both engines —
no trig, no floats, no ulp traps. The DuckDB oracles are DEFINITIONAL
brute-force all-pairs scans (fine at fixture SFs, ~1 s at sf0.1), so a
hash match certifies the grid algorithm against the distance
definition itself, not against a twin of the same algorithm.

Grid-blocking invariant: with cell side == search radius R, every pair
within distance R lands in the same or an 8-adjacent cell, so the
9-cell neighborhood join loses nothing (certified by the oracle's
brute force; also pinned vs numpy in tests/test_spatial_queries.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .catalog import query

#: Lattice side; coordinates are md5-uniform in [0, SPACE).
SPACE = 1024
#: Search radius == grid cell side (the 9-cell completeness invariant).
RADIUS = 24
R2 = RADIUS * RADIUS

_XY_SQL = (
    "CAST('0x'||SUBSTRING(MD5(CAST(c_custkey AS VARCHAR)||'{axis}'),1,8) AS BIGINT) % 1024"
)


def _points(spark: SparkSession, sf_dir: str, space: int = SPACE) -> DataFrame:
    """Deterministic lattice points, one per customer (the md5 kernel
    stands in for a real lat/lon pair quantized to a fixed grid — the
    quantization is exactly what a production geo pipeline does before
    cell-blocking anyway). ``space`` is parameterized so the scale
    probe can hold point DENSITY constant while scaling N."""

    def axis(tag: str):
        return F.expr(
            "cast(conv(substring(md5(concat(cast(c_custkey as string),"
            f"'{tag}')),1,8),16,10) as bigint) % {space}"
        )

    return (
        load_table(spark, "customer", sf_dir)
        .select(
            F.col("c_custkey").alias("id"),
            axis("x").alias("x"),
            axis("y").alias("y"),
        )
        # consumed by BOTH sides of the self-join below (r07 rule:
        # compute-once via localCheckpoint, not persist)
        .localCheckpoint(eager=False)
    )


def _candidate_pairs(pts: DataFrame, radius: int = RADIUS) -> DataFrame:
    """Directed neighbor pairs within RADIUS via 9-cell grid blocking.

    Probe side keeps its own cell; build side is exploded to its 9
    surrounding cells, so the join is a pure EQUI-join on (cx, cy) —
    at 100 TB this is one hash-partitioned shuffle on cell id, and the
    per-cell fan-out is bounded by physical density, never N^2. The
    exact integer distance predicate then verifies candidates."""
    r2 = radius * radius
    a = pts.select(
        F.col("id").alias("a_id"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.expr(f"x div {radius}").alias("acx"),
        F.expr(f"y div {radius}").alias("acy"),
    )
    offsets = F.array(
        *[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    )
    b = (
        pts.select(
            F.col("id").alias("b_id"),
            F.col("x").alias("bx"),
            F.col("y").alias("by"),
            F.explode(offsets).alias("o"),
        )
        .select(
            "b_id",
            "bx",
            "by",
            (F.expr(f"bx div {radius}") + F.col("o.dx")).alias("bcx"),
            (F.expr(f"by div {radius}") + F.col("o.dy")).alias("bcy"),
        )
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        a.join(b, (F.col("acx") == F.col("bcx")) & (F.col("acy") == F.col("bcy")))
        .where(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id", d2.alias("d2"))
        .where(F.col("d2") <= F.lit(r2))
    )


@query(
    "spatial_grid_radius_join",
    tier="EXT spatial (grid-blocked radius self-join -> neighbor-degree histogram)",
    oracle=f"""
        WITH pts AS (
            SELECT c_custkey AS id,
                   {_XY_SQL.format(axis='x')} AS x,
                   {_XY_SQL.format(axis='y')} AS y
            FROM customer
        ),
        deg AS (
            SELECT a.id,
                   COUNT(b.id) AS deg
            FROM pts a LEFT JOIN pts b
              ON a.id <> b.id
             AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {R2}
            GROUP BY a.id
        )
        SELECT CAST(deg AS BIGINT) AS neighbors_within_r,
               CAST(COUNT(*) AS BIGINT) AS n_points
        FROM deg GROUP BY deg ORDER BY neighbors_within_r
    """,
)
def spatial_grid_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius self-join (find everything within distance R of each
    point) via 9-cell grid blocking, reported as the neighbor-degree
    histogram — the density-audit form whose output stays tiny at any
    scale while still pinning every single pair (a wrong candidate set
    shifts some point's degree and breaks the histogram).

    The oracle is the DEFINITIONAL all-pairs scan, so the hash match
    certifies grid-blocking completeness (cell side == R => all pairs
    within R are in adjacent cells), not merely twin-implementation
    agreement.

    Scale (100 TB): candidate generation is ONE equi-join on cell id —
    hash-partitioned, AQE-skewable if a city-sized cell gets hot; the
    build side's 9x explode is a map-side projection; the exact
    distance check is codegen'd integer arithmetic; degrees partial-
    aggregate map-side. Nothing is ever all-pairs, and the plan is the
    same one a billion-point radius join wants."""
    pts = _points(spark, sf_dir)
    deg = _candidate_pairs(pts).groupBy("a_id").agg(F.count(F.lit(1)).alias("deg"))
    with_zeros = (
        pts.join(deg, pts.id == deg.a_id, "left")
        .select(F.coalesce(F.col("deg"), F.lit(0)).alias("deg"))
    )
    return (
        with_zeros.groupBy("deg")
        .agg(F.count(F.lit(1)).cast("long").alias("n_points"))
        .select(F.col("deg").cast("long").alias("neighbors_within_r"), "n_points")
        .orderBy("neighbors_within_r")
    )


@query(
    "spatial_grid_nearest_neighbor",
    tier="EXT spatial (grid-blocked nearest-neighbor-within-R, argmin by struct-MIN)",
    oracle=f"""
        WITH pts AS (
            SELECT c_custkey AS id,
                   {_XY_SQL.format(axis='x')} AS x,
                   {_XY_SQL.format(axis='y')} AS y
            FROM customer
        ),
        cand AS (
            SELECT a.id AS point_id,
                   {{'d2': (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y),
                     'nb': b.id}} AS s
            FROM pts a JOIN pts b
              ON a.id <> b.id
             AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {R2}
        ),
        nn AS (SELECT point_id, MIN(s) AS m FROM cand GROUP BY point_id)
        SELECT point_id, m.nb AS nn_id, CAST(m.d2 AS BIGINT) AS d2
        FROM nn ORDER BY d2, point_id LIMIT 20
    """,
)
def spatial_grid_nearest_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor-within-R lookup (the 'closest facility' /
    spatial as-of): per point, the argmin-by-distance neighbor from
    the SAME grid-blocked candidate join, picked deterministically via
    struct-MIN over (d2, neighbor id) — the r08 argmax-by-time idiom
    applied to distance, so equidistant neighbors resolve identically
    on both engines. Emits the 20 globally-closest (point, nn) pairs
    under a total order (d2, then unique point id).

    The cell-side==R invariant does double duty here: any point whose
    true nearest neighbor is within R finds exactly that neighbor
    (candidates are complete within R, and argmin over a complete
    candidate set IS the nearest), certified by the brute-force
    oracle. Points with nothing within R are correctly absent.

    Scale: identical join shape to the radius query; the argmin is a
    partial-aggregated struct-MIN (no window, no sort of the pair
    set); top-20 is TakeOrderedAndProject — per-partition heaps, no
    global sort."""
    pts = _points(spark, sf_dir)
    return (
        _candidate_pairs(pts)
        .groupBy(F.col("a_id").alias("point_id"))
        .agg(F.min(F.struct(F.col("d2"), F.col("b_id").alias("nb"))).alias("m"))
        .select(
            "point_id",
            F.col("m.nb").alias("nn_id"),
            F.col("m.d2").cast("long").alias("d2"),
        )
        .orderBy("d2", "point_id")
        .limit(20)
    )


#: Point-in-polygon fence: a deliberately NON-convex hexagon (the
#: notch between (900,200) and (900,900) via (700,500) is what convex
#: shortcuts get wrong) with integer vertices inside the lattice.
FENCE = [(100, 100), (900, 200), (700, 500), (900, 900), (300, 800), (200, 400)]
#: Quadrant side for the density rollup (1024 / 4).
QUAD = 256


def _crossing_terms(px: str, py: str):
    """Per-edge ray-crossing indicators (Spark expr, SQL expr) — the
    even-odd rule with an EXACT integer orientation test, generated
    from the same vertex list so both engines evaluate the identical
    arithmetic. Edge (x1,y1)->(x2,y2) crosses the +x ray from (px,py)
    iff py is in the half-open y-span and the point lies strictly on
    the interior side: sign((x2-x1)*(py-y1) - (y2-y1)*(px-x1)) ==
    sign(y2-y1). Coordinates < 2^10, so products < 2^21 — exact BIGINT
    on both engines, no floats anywhere."""
    spark_terms, sql_terms = [], []
    n = len(FENCE)
    for i in range(n):
        x1, y1 = FENCE[i]
        x2, y2 = FENCE[(i + 1) % n]
        sgn = 1 if y2 > y1 else -1
        yspan = (
            f"(({y1} <= {py} AND {y2} > {py}) OR ({y2} <= {py} AND {y1} > {py}))"
        )
        left = f"(({x2}-{x1})*({py}-{y1}) - ({y2}-{y1})*({px}-{x1})) * {sgn} > 0"
        term = f"CASE WHEN {yspan} AND {left} THEN 1 ELSE 0 END"
        sql_terms.append(term)
        spark_terms.append(term)  # identical: pure ANSI arithmetic
    return spark_terms, sql_terms


_SPARK_CROSS, _SQL_CROSS = _crossing_terms("x", "y")


@query(
    "spatial_point_in_polygon",
    tier="EXT spatial (point-in-polygon geofence, exact integer even-odd ray cast)",
    oracle=f"""
        WITH pts AS (
            SELECT c_custkey AS id,
                   {_XY_SQL.format(axis='x')} AS x,
                   {_XY_SQL.format(axis='y')} AS y
            FROM customer
        ),
        flagged AS (
            SELECT x // {QUAD} AS qx, y // {QUAD} AS qy,
                   ({' + '.join(_SQL_CROSS)}) % 2 = 1 AS inside
            FROM pts
        )
        SELECT CAST(qx AS BIGINT) AS qx, CAST(qy AS BIGINT) AS qy,
               CAST(COUNT(*) AS BIGINT) AS n_pts,
               CAST(SUM(CASE WHEN inside THEN 1 ELSE 0 END) AS BIGINT) AS n_inside
        FROM flagged GROUP BY qx, qy ORDER BY qx, qy
    """,
)
def spatial_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geofence containment: classify every lattice point against a
    non-convex literal polygon with the even-odd ray cast, then roll
    the verdicts up into a 4x4 quadrant density grid (n_pts /
    n_inside per quadrant). Every crossing test is the exact integer
    orientation predicate from _crossing_terms — both engines run the
    IDENTICAL expression tree, so the hash gate certifies the
    geometry, not float luck; the non-convex notch means a wrong
    even-odd accumulation (e.g. counting touching-vertex edges twice)
    shifts whole quadrant counts.

    Scale (100 TB): containment is a pure map stage — the polygon is
    |edges| literal comparisons codegen'd into the scan projection (a
    real fence table would broadcast edges and F.aggregate over them);
    the rollup partial-aggregates to 16 cells. No join, no explode,
    ONE shuffle of 16 rows. This is the geofence filter a trillion-row
    GPS table wants: pushdown-friendly, skew-free."""
    pts = _points(spark, sf_dir)
    inside = (sum(F.expr(t) for t in _SPARK_CROSS) % 2 == 1).alias("inside")
    return (
        pts.select(
            F.expr(f"x div {QUAD}").alias("qx"),
            F.expr(f"y div {QUAD}").alias("qy"),
            inside,
        )
        .groupBy("qx", "qy")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pts"),
            F.sum(F.when(F.col("inside"), 1).otherwise(0)).cast("long").alias("n_inside"),
        )
        .select(F.col("qx").cast("long").alias("qx"), F.col("qy").cast("long").alias("qy"), "n_pts", "n_inside")
        .orderBy("qx", "qy")
    )
