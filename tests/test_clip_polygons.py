"""clip_polygons_to_tiles vs the scalar oracle + geometric invariants."""

from __future__ import annotations

import math

import numpy as np

from osm_pbf_spark.operators.spatial_join import Polygon


def _poly(pid, pts):
    return Polygon(pid, [np.array(pts, dtype=np.float64)])


def _shoelace2(q):
    s = 0
    for i in range(len(q)):
        x1, y1 = q[i - 1]
        x2, y2 = q[i]
        s += x1 * y2 - x2 * y1
    return abs(s)


def test_clip_matches_scalar_oracle(spark):
    from osm_pbf_spark.operators.tiling import clip_polygons_to_tiles
    from tests.oracle_geo import clip_ring_to_tile

    polys = [
        _poly("big", [[10.0, -20.0], [10.0, 15.0], [35.0, 15.0], [35.0, -20.0]]),
        _poly("tri", [[-30.0, -100.0], [-5.0, -60.0], [-45.0, -50.0]]),
        _poly("small", [[50.2, 100.1], [50.2, 100.4], [50.6, 100.4]]),
    ]
    got = {
        (r.poly_id, r.ring_idx, r.tile_x, r.tile_y): (
            list(r.qx), list(r.qy)
        )
        for r in clip_polygons_to_tiles(spark, polys, zoom=5).collect()
    }
    n = float(1 << 5)
    want = {}
    for p in polys:
        ring = [(float(a), float(b)) for a, b in p.rings[0]]
        sx = [(lon + 180.0) / 360.0 * n for _, lon in ring]
        sy = [(90.0 - lat) / 180.0 * n for lat, _ in ring]
        for tx in range(max(int(min(sx)), 0), min(int(max(sx)), 31) + 1):
            for ty in range(max(int(min(sy)), 0), min(int(max(sy)), 31) + 1):
                q = clip_ring_to_tile(ring, 5, tx, ty)
                if q is not None:
                    want[(p.poly_id, 0, tx, ty)] = (
                        [a for a, _ in q],
                        [b for _, b in q],
                    )
    assert got == want
    assert len(got) > 4  # the big box genuinely spans multiple tiles


def test_clip_area_is_conserved_across_tiles(spark):
    from osm_pbf_spark.operators.tiling import clip_polygons_to_tiles

    # an axis-aligned box: the sum of clipped-piece areas (integer
    # shoelace on the 4096 grid) equals the box's tile-space area
    poly = _poly("box", [[0.0, 0.0], [0.0, 40.0], [30.0, 40.0], [30.0, 0.0]])
    rows = clip_polygons_to_tiles(spark, [poly], zoom=4).collect()
    total = sum(
        _shoelace2(list(zip(r.qx, r.qy))) / 2.0 / (4096.0 * 4096.0)
        for r in rows
    )
    n = float(1 << 4)
    w = 40.0 / 360.0 * n
    h = 30.0 / 180.0 * n
    assert math.isclose(total, w * h, rel_tol=1e-3)


def test_clip_inside_single_tile_keeps_ring(spark):
    from osm_pbf_spark.operators.tiling import clip_polygons_to_tiles

    # tiny triangle strictly inside one z3 tile: one output row whose
    # quantized ring is just the scaled input
    poly = _poly("t", [[10.1, 10.1], [10.1, 12.0], [12.0, 12.0]])
    rows = clip_polygons_to_tiles(spark, [poly], zoom=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_pts == 3
    n = float(1 << 3)
    for i, (lat, lon) in enumerate([(10.1, 10.1), (10.1, 12.0), (12.0, 12.0)]):
        sx = (lon + 180.0) / 360.0 * n
        sy = (90.0 - lat) / 180.0 * n
        assert r.qx[i] == int(math.floor((sx - r.tile_x) * 4096 + 0.5))
        assert r.qy[i] == int(math.floor((sy - r.tile_y) * 4096 + 0.5))


def test_clip_degenerate_touch_dropped(spark):
    from osm_pbf_spark.operators.tiling import clip_polygons_to_tiles

    # polygon whose bbox touches a neighboring tile only along an edge
    # of measure zero in it: that tile yields < 3 distinct quantized
    # points and must be absent
    poly = _poly(
        "edge", [[0.0, 0.0], [0.0, 22.4999], [20.0, 22.4999], [20.0, 0.0]]
    )
    rows = clip_polygons_to_tiles(spark, [poly], zoom=4).collect()
    # z4: tile width 22.5 deg -> lon 22.4999 sits inside tile_x=8 only
    assert all(r.tile_x <= 8 for r in rows)
