"""Douglas-Peucker simplify, geometry measures, and tile clipping vs
independent scalar oracles (shared code = none, so agreement is
evidence — same convention as test_line_tiles)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from osm_pbf_spark.functions import tiles as TL
from osm_pbf_spark.functions.geometry import haversine_m
from osm_pbf_spark.operators.measures import DEG2RAD, line_measures, segment_measures
from osm_pbf_spark.operators.simplify import douglas_peucker_np, simplify_lines
from osm_pbf_spark.operators.tiling import assign_line_tiles, clip_lines_to_tiles

# ---------------- Douglas-Peucker ----------------


def _dp_keep_recursive(xs, ys, tol):
    """Independent scalar oracle: recursive (engine is stack-iterative),
    explicit first-max scan (engine is np.argmax). Same IEEE expression
    order as the engine spec — that's the determinism contract."""
    n = len(xs)
    keep = [False] * n
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    tol2 = tol * tol

    def rec(i0, i1):
        if i1 - i0 < 2:
            return
        x0, y0, x1, y1 = xs[i0], ys[i0], xs[i1], ys[i1]
        dx, dy = x1 - x0, y1 - y0
        seg2 = dx * dx + dy * dy
        thr = tol2 if seg2 == 0.0 else tol2 * seg2
        best, bj = -1.0, -1
        for j in range(i0 + 1, i1):
            if seg2 == 0.0:
                d2 = (xs[j] - x0) * (xs[j] - x0) + (ys[j] - y0) * (ys[j] - y0)
            else:
                cr = dx * (y0 - ys[j]) - dy * (x0 - xs[j])
                d2 = cr * cr
            if d2 > best:
                best, bj = d2, j
        if best > thr:
            keep[bj] = True
            rec(i0, bj)
            rec(bj, i1)

    rec(0, n - 1)
    return keep


def test_dp_kernel_matches_recursive_oracle():
    rng = np.random.default_rng(11)
    for _ in range(60):
        n = int(rng.integers(2, 120))
        xs = np.cumsum(rng.uniform(0.0, 1.0, n))
        ys = rng.normal(0.0, 1.0, n)
        tol = float(rng.uniform(0.05, 2.0))
        got = douglas_peucker_np(ys, xs, tol)  # (lats=y, lons=x)
        want = _dp_keep_recursive(list(xs), list(ys), tol)
        assert got.tolist() == want, (n, tol)


def test_dp_kernel_edges():
    # collinear points all drop; duplicate endpoints (closed ring shape)
    ys = np.array([0.0, 0.0, 0.0, 0.0])
    xs = np.array([0.0, 1.0, 2.0, 3.0])
    assert douglas_peucker_np(ys, xs, 0.1).tolist() == [True, False, False, True]
    same = np.zeros(5)
    m = douglas_peucker_np(same, same, 0.5)  # all identical points
    assert m.tolist() == [True, False, False, False, True]
    spike = douglas_peucker_np(
        np.array([0.0, 5.0, 0.0]), np.array([0.0, 1.0, 2.0]), 0.5
    )
    assert spike.tolist() == [True, True, True]
    for n in (0, 1, 2):
        assert douglas_peucker_np(np.zeros(n), np.zeros(n), 0.5).sum() == min(n, 2)


def test_simplify_lines_operator(spark):
    rng = np.random.default_rng(3)
    rows = []
    for lid in range(8):
        n = int(rng.integers(2, 80))
        la = rng.normal(0, 5, n)
        lo = np.cumsum(rng.uniform(0, 2, n))
        rows.append((lid, [float(v) for v in la], [float(v) for v in lo]))
    df = spark.createDataFrame(
        rows, "line_id long, lats array<double>, lons array<double>"
    )
    out = {r.line_id: r for r in simplify_lines(df, 0.8).collect()}
    for lid, la, lo in rows:
        m = _dp_keep_recursive(lo, la, 0.8)
        want_la = [v for v, k in zip(la, m) if k]
        assert out[lid].lats == want_la
        assert out[lid].n_in == len(la) and out[lid].n_out == len(want_la)
        # endpoints survive
        assert out[lid].lats[0] == la[0] and out[lid].lats[-1] == la[-1]


# ---------------- measures ----------------


def _segs_df(spark, segs):
    return spark.createDataFrame(
        [(i, i % 3, *map(float, s)) for i, s in enumerate(segs)],
        "seg_id long, line_id long, lat0 double, lon0 double, lat1 double, lon1 double",
    )


def test_segment_measures_match_numpy(spark):
    rng = np.random.default_rng(5)
    segs = [tuple(rng.uniform(-80, 80, 2)) + tuple(rng.uniform(-170, 170, 2)) for _ in range(200)]
    segs = [(a, c, b, d) for (a, b), (c, d) in zip([s[:2] for s in segs], [s[2:] for s in segs])]
    got = {r.seg_id: r for r in segment_measures(_segs_df(spark, segs)).collect()}
    for i, (la0, lo0, la1, lo1) in enumerate(segs):
        want_m = float(
            haversine_m(np.array([la0]), np.array([lo0]), np.array([la1]), np.array([lo1]))[0]
        )
        # independent libm path vs JVM path: mm-rounded values may sit a
        # hair apart, never more than 1 unit
        assert abs(got[i].len_mm - round(want_m * 1000.0)) <= 1
        assert got[i].cross2_u == round((lo0 * la1 - lo1 * la0) * 1e8)
        assert got[i].mid_lat_u == round((la0 + la1) / 2.0 * 1e7)


def test_line_measures_shoelace_area(spark):
    # unit square ring (ccw in lon/lat): shoelace sum = 2*area = 2 deg^2
    ring = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0), (0.0, 0.0)]
    segs = [(*ring[i], *ring[i + 1]) for i in range(4)]  # (lat0,lon0,lat1,lon1)
    df = spark.createDataFrame(
        [(0, *map(float, s)) for s in segs],
        "line_id long, lat0 double, lon0 double, lat1 double, lon1 double",
    )
    row = line_measures(df).collect()[0]
    assert row.n_segs == 4
    assert row.cross2_u == 2 * 10**8 or row.cross2_u == -2 * 10**8
    # ~111.195 km per degree (R=6371008.8 m), four edges of ~that length
    assert abs(row.len_mm / 1e3 - 4 * 111.19 * 1000) / (4 * 111.19 * 1000) < 0.01


def test_measures_plan_native(spark):
    df = segment_measures(_segs_df(spark, [(0.0, 0.0, 1.0, 1.0)]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan


# ---------------- clip ----------------


def test_clip_preserves_tile_set_and_geometry(spark):
    rng = np.random.default_rng(9)
    segs = [
        (
            rng.uniform(-80, 80) + 1e-7,
            rng.uniform(-170, 170) + 1e-7,
            rng.uniform(-80, 80) + 1e-7,
            rng.uniform(-170, 170) + 1e-7,
        )
        for _ in range(80)
    ]
    df = _segs_df(spark, segs)
    zoom = 5
    tiles = {
        (r.seg_id, r.tile_x, r.tile_y)
        for r in assign_line_tiles(df, zoom).collect()
    }
    clipped = clip_lines_to_tiles(df, zoom).collect()
    assert {(r.seg_id, r.tile_x, r.tile_y) for r in clipped} == tiles
    eps = 1e-9
    for r in clipped:
        la0, lo0, la1, lo1 = segs[r.seg_id]
        sx, sy = TL.scale_linear(np.array([la0, la1]), np.array([lo0, lo1]), zoom)
        assert 0.0 <= r.t0 <= r.t1 <= 1.0
        # clipped endpoints sit on the segment AND inside the tile square
        for t, cx, cy in ((r.t0, r.cx0, r.cy0), (r.t1, r.cx1, r.cy1)):
            ex = sx[0] + (sx[1] - sx[0]) * t
            ey = sy[0] + (sy[1] - sy[0]) * t
            assert abs(cx - ex) < eps and abs(cy - ey) < eps
            assert r.tile_x - eps <= cx <= r.tile_x + 1 + eps
            assert r.tile_y - eps <= cy <= r.tile_y + 1 + eps
        # interior tiles get a real (non-degenerate) piece
    n_deg = sum(1 for r in clipped if r.t0 == r.t1)
    assert n_deg < len(clipped) / 10  # touch points are the rare case


def test_clip_plan_native_no_shuffle(spark):
    df = clip_lines_to_tiles(_segs_df(spark, [(1.0, 2.0, 3.0, 4.0)]), 6)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_deg2rad_literal_is_pi_over_180():
    assert DEG2RAD == np.pi / 180.0
