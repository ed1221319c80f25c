"""Line->tile supercover (operators/tiling.assign_line_tiles) vs the
independent crossing-parameter oracle (functions/tiles.segment_tiles_crossing).

The engine derives tiles per x-column from the linear parameterization;
the oracle splits at every gridline crossing and takes midpoints — two
different algorithms, shared code = none, so agreement is evidence.
Random coords get irrational-ish offsets so no endpoint ever lands
exactly on a gridline (where the engine's closed-interval convention
is deliberately more inclusive — pinned separately below).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_pbf_spark.functions import tiles as TL
from osm_pbf_spark.operators.tiling import assign_line_tiles

ZOOM = 6


def _seg_df(spark, segs):
    return spark.createDataFrame(
        [(i, *map(float, s)) for i, s in enumerate(segs)],
        "seg_id long, lat0 double, lon0 double, lat1 double, lon1 double",
    )


def _engine(spark, segs, scheme):
    df = assign_line_tiles(_seg_df(spark, segs), ZOOM, scheme=scheme)
    out: dict[int, set] = {i: set() for i in range(len(segs))}
    for r in df.select("seg_id", "tile_x", "tile_y").collect():
        out[r.seg_id].add((r.tile_x, r.tile_y))
    return out


def _oracle(segs, scheme):
    scale = TL.scale_linear if scheme == "linear" else TL.scale_mercator
    out = {}
    for i, (la0, lo0, la1, lo1) in enumerate(segs):
        sx, sy = scale(np.array([la0, la1]), np.array([lo0, lo1]), ZOOM)
        out[i] = TL.segment_tiles_crossing(sx[0], sy[0], sx[1], sy[1], ZOOM)
    return out


@pytest.mark.parametrize("scheme", ["linear", "mercator"])
def test_line_tiles_match_crossing_oracle(spark, scheme):
    rng = np.random.default_rng(7)
    segs = []
    for _ in range(120):
        la0, la1 = rng.uniform(-80, 80, 2) + 1e-7  # off-grid offsets
        lo0, lo1 = rng.uniform(-170, 170, 2) + 1e-7
        segs.append((la0, lo0, la1, lo1))
    # long, axis-aligned and degenerate shapes
    segs += [
        (10.123, -150.4, 10.123, 150.7),   # horizontal, many columns
        (-70.3, 20.456, 70.9, 20.456),     # vertical (sx0 == sx1)
        (33.33, 44.44, 33.33, 44.44),      # zero-length point
        (5.01, -179.99, -5.02, 179.98),    # nearly full-width
    ]
    assert _engine(spark, segs, scheme) == _oracle(segs, scheme)


def test_line_tiles_out_of_grid_drops(spark):
    # a segment entirely outside the grid paints NO tile (drop, not
    # clamp — same convention as the driver's duckdb oracle); a segment
    # straddling the boundary keeps only its in-grid tiles
    segs = [
        (95.0, -200.0, 95.0, -190.0),       # entirely above/left of grid
        (0.5, -185.0 + 1e-7, 0.5, -175.0),  # straddles lon=-180
    ]
    got = _engine(spark, segs, "linear")
    assert got[0] == set()
    assert got[1] == _oracle(segs, "linear")[1] and got[1]
    assert all(x >= 0 for x, _ in got[1])


def test_line_tiles_gridline_convention(spark):
    # an endpoint EXACTLY on a column boundary: the closed per-column
    # interval includes the touched column (degenerate point slice)
    n = 1 << ZOOM
    lon_edge = 360.0 * (10.0 / n) - 180.0  # sx == 10 exactly
    segs = [(0.5, lon_edge - 3.0, 0.5, lon_edge)]
    got = _engine(spark, segs, "linear")[0]
    assert any(x == 10 for x, _ in got), got


def test_line_tiles_linear_plan_is_pure_codegen(spark):
    df = assign_line_tiles(_seg_df(spark, [(1.0, 2.0, 3.0, 4.0)]), ZOOM)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # map-only: Generate+Project, no shuffle


def test_line_tiles_count_sanity(spark):
    # a diagonal across k columns emits between max(dx,dy) and dx+dy+1 tiles
    segs = [(-40.0 + 1e-7, -100.0 + 1e-7, 40.0 + 1e-7, 100.0 + 1e-7)]
    sx, sy = TL.scale_linear(np.array([-40.0 + 1e-7, 40.0 + 1e-7]),
                             np.array([-100.0 + 1e-7, 100.0 + 1e-7]), ZOOM)
    dx = abs(np.floor(sx[1]) - np.floor(sx[0]))
    dy = abs(np.floor(sy[1]) - np.floor(sy[0]))
    got = _engine(spark, segs, "linear")[0]
    assert max(dx, dy) + 1 <= len(got) <= dx + dy + 1
