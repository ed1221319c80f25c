"""distance_join vs brute-force numpy oracles (both metrics), window
coverage at cell boundaries, candidate multiplicity, and plan shape
(pure codegen — no Python stage)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_pbf_spark.functions.geometry import haversine_m
from osm_pbf_spark.operators.distance import distance_join, pick_distance_level


def _points(rng, n, lat_span=(40.0, 41.0), lon_span=(-74.5, -73.5)):
    lat = rng.uniform(*lat_span, n)
    lon = rng.uniform(*lon_span, n)
    return [(i, float(lat[i]), float(lon[i])) for i in range(n)]


def _brute_pairs(pts_a, pts_b, radius, metric):
    la = np.array([p[1] for p in pts_a])
    lo = np.array([p[2] for p in pts_a])
    lb = np.array([p[1] for p in pts_b])
    ob = np.array([p[2] for p in pts_b])
    out = set()
    for i in range(len(pts_a)):
        if metric == "haversine":
            d = haversine_m(np.full_like(lb, la[i]), np.full_like(ob, lo[i]), lb, ob)
            hit = d <= radius
        else:
            d = (la[i] - lb) ** 2 + (lo[i] - ob) ** 2
            hit = d <= radius * radius
        for j in np.nonzero(hit)[0]:
            out.add((pts_a[i][0], pts_b[int(j)][0]))
    return out


@pytest.mark.parametrize("metric,radius", [("haversine", 800.0), ("euclid2_deg", 0.01)])
def test_distance_join_matches_brute(spark, metric, radius):
    rng = np.random.default_rng(11)
    pts = _points(rng, 300)
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = {
        (r.id_a, r.id_b)
        for r in distance_join(df, df, radius, metric=metric).collect()
    }
    want = _brute_pairs(pts, pts, radius, metric)
    assert got == want
    assert any(a != b for a, b in got)  # non-trivial corpus


def test_distance_join_asymmetric_and_dist_values(spark):
    rng = np.random.default_rng(5)
    a = _points(rng, 80)
    b = [(i + 1000, la, lo) for i, la, lo in _points(rng, 120)]
    da = spark.createDataFrame(a, "id long, lat double, lon double")
    db = spark.createDataFrame(b, "id long, lat double, lon double")
    rows = distance_join(da, db, 2000.0, metric="haversine").collect()
    got = {(r.id_a, r.id_b): r.dist for r in rows}
    assert set(got) == _brute_pairs(a, b, 2000.0, "haversine")
    # distances match the numpy kernel to float64 round-off
    for (ia, ib), d in got.items():
        pa = next(p for p in a if p[0] == ia)
        pb = next(p for p in b if p[0] == ib)
        want = float(haversine_m(np.array([pa[1]]), np.array([pa[2]]), np.array([pb[1]]), np.array([pb[2]]))[0])
        assert abs(d - want) <= 1e-9 * max(1.0, want)


def test_distance_join_cell_boundary_coverage(spark):
    """Points straddling a cell boundary at exactly-representable coords
    must still pair up (the 3x3 window must include the neighbor cell)."""
    level = pick_distance_level(0.02, "euclid2_deg")
    # place pairs across the lat/lon boundary of cells at that level
    from osm_pbf_spark.functions.cells import cell_size_deg

    dlat, dlon = cell_size_deg(level)
    eps = dlat / 1024.0
    pts = []
    base_lat, base_lon = 10.0 * dlat, 20.0 * dlon  # exact cell corners (dyadic)
    pts.append((0, base_lat - eps, base_lon + 3 * eps))   # below lat edge
    pts.append((1, base_lat + eps, base_lon + 3 * eps))   # above lat edge
    pts.append((2, base_lat + 3 * eps, base_lon - eps))   # left of lon edge
    pts.append((3, base_lat + 3 * eps, base_lon + eps))   # right of lon edge
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = {
        (r.id_a, r.id_b)
        for r in distance_join(df, df, 0.02, metric="euclid2_deg").collect()
        if r.id_a < r.id_b
    }
    want = {(a, b) for (a, b) in _brute_pairs(pts, pts, 0.02, "euclid2_deg") if a < b}
    assert got == want
    assert (0, 1) in got and (2, 3) in got


def test_distance_join_multiplicity_exactly_one(spark):
    rng = np.random.default_rng(3)
    pts = _points(rng, 150)
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    out = distance_join(df, df, 1200.0, metric="haversine")
    dup = out.groupBy("id_a", "id_b").count().where(F.col("count") > 1).count()
    assert dup == 0


def test_distance_join_plan_is_pure_codegen(spark):
    df = spark.createDataFrame([(1, 10.0, 10.0)], "id long, lat double, lon double")
    plan = distance_join(df, df, 500.0)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan
    assert "Generate" in plan  # the 9-literal window explode


def test_pick_distance_level_bounds():
    lv = pick_distance_level(500.0, "haversine")
    from osm_pbf_spark.functions.cells import cell_size_deg

    import math

    m_per_deg_lon = 111_319.0 * math.cos(math.radians(85.0))
    dlat, dlon = cell_size_deg(lv)
    assert dlat * 110_567.0 >= 500.0 and dlon * m_per_deg_lon >= 500.0
    # finest such level: one step finer violates at least one axis
    nlat, nlon = cell_size_deg(lv + 1)
    assert nlat * 110_567.0 < 500.0 or nlon * m_per_deg_lon < 500.0 or lv == 29
    with pytest.raises(ValueError):
        pick_distance_level(-1.0, "haversine")
    with pytest.raises(ValueError):
        pick_distance_level(1.0, "nope")
