"""convex_hull (monotone chain in the engine) vs the Jarvis-march
oracle — two independent algorithms over exact integer coords — plus
degenerate shapes and hull-property checks."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from osm_pbf_spark.operators.hull import convex_hull, hull_py


def _spark_hulls(spark, rows):
    df = spark.createDataFrame(rows, "group_id long, lat double, lon double")
    out = convex_hull(df).collect()
    hulls: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.group_id, r.hull_pos)):
        hulls.setdefault(r.group_id, []).append((r.ix, r.iy))
    return hulls


def test_hull_matches_jarvis_random(spark):
    rng = np.random.default_rng(47)
    rows, pts_by_grp = [], {}
    for g in range(6):
        n = int(rng.integers(3, 60))
        for _ in range(n):
            lat = float(rng.uniform(-50, 50))
            lon = float(rng.uniform(-120, 120))
            rows.append((g, lat, lon))
            ix = int(np.floor(lon * 1000.0 + 0.5))
            iy = int(np.floor(lat * 1000.0 + 0.5))
            pts_by_grp.setdefault(g, []).append((ix, iy))
    got = _spark_hulls(spark, rows)
    for g, pts in pts_by_grp.items():
        assert got[g] == hull_py(pts), f"group {g}"


def test_hull_degenerate_shapes(spark):
    rows = (
        [(1, 10.0, 10.0)] * 3                                  # single point (dups)
        + [(2, 0.0, float(x)) for x in range(5)]               # collinear segment
        + [(3, 0.0, 0.0), (3, 0.001, 0.001)]                   # two points
    )
    got = _spark_hulls(spark, rows)
    assert got[1] == [(10000, 10000)]
    assert got[2] == [(0, 0), (4000, 0)]
    assert got[3] == [(0, 0), (1, 1)]


def test_hull_contains_all_points(spark):
    rng = np.random.default_rng(53)
    rows = [(0, float(rng.uniform(-10, 10)), float(rng.uniform(-10, 10))) for _ in range(200)]
    got = _spark_hulls(spark, rows)[0]
    # every input point is inside or on the hull (cross >= 0 for CCW edges)
    pts = [(int(np.floor(lo * 1000.0 + 0.5)), int(np.floor(la * 1000.0 + 0.5)))
           for _, la, lo in rows]
    h = got
    for px, py in pts:
        for i in range(len(h)):
            ax, ay = h[i]
            bx, by = h[(i + 1) % len(h)]
            assert (bx - ax) * (py - ay) - (by - ay) * (px - ax) >= 0


def test_hull_partitioning_invariant(spark):
    rng = np.random.default_rng(59)
    rows = [(int(g), float(rng.uniform(-50, 50)), float(rng.uniform(-120, 120)))
            for g in rng.integers(0, 4, 300)]
    df = spark.createDataFrame(rows, "group_id long, lat double, lon double")
    a = {(r.group_id, r.hull_pos): (r.ix, r.iy) for r in convex_hull(df).collect()}
    b = {(r.group_id, r.hull_pos): (r.ix, r.iy)
         for r in convex_hull(df.repartition(17)).collect()}
    assert a == b
