"""Tile assignment vs slippy-map oracle; pyramid rollup conservation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_pbf_spark.operators.spatial_join import Polygon
from osm_pbf_spark.operators.tiling import (
    assign_point_tiles,
    polygon_tile_cover,
    tile_pyramid_rollup,
    tile_stats,
)
from tests import oracle_geo


def pts(n=2000, seed=13):
    rng = np.random.default_rng(seed)
    return [
        (f"p{i}", float(rng.uniform(-85, 85)), float(rng.uniform(-180, 180)))
        for i in range(n)
    ]


@pytest.mark.parametrize("z", [8, 12, 16])
def test_point_tiles_match_oracle(spark, z):
    data = pts()
    df = spark.createDataFrame(data, "doc_id string, lat double, lon double")
    got = {r["doc_id"]: (r["tile_x"], r["tile_y"]) for r in assign_point_tiles(df, z).collect()}
    for pid, la, lo in data:
        assert got[pid] == oracle_geo.point_to_tile_mercator(la, lo, z), (pid, la, lo)


def test_linear_tiles_native_plan(spark):
    df = spark.createDataFrame(pts(10), "doc_id string, lat double, lon double")
    tiled = assign_point_tiles(df, 8, scheme="linear")
    plan = tiled._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan  # pure JVM codegen — no Python hop
    rows = tiled.collect()
    for r in rows:
        assert 0 <= r["tile_x"] < 256 and 0 <= r["tile_y"] < 256


def test_tile_stats_and_rollup_conserve_counts(spark):
    data = pts(1000, seed=21)
    df = spark.createDataFrame(data, "doc_id string, lat double, lon double")
    tiled = assign_point_tiles(df, 10)
    stats = tile_stats(tiled)
    assert stats.agg(F.sum("n_docs")).collect()[0][0] == 1000

    pyramid = tile_pyramid_rollup(tiled, zoom=10, min_zoom=4)
    sums = {
        r["tile_z"]: r["total"]
        for r in pyramid.groupBy("tile_z").agg(F.sum("n_docs").alias("total")).collect()
    }
    # every pyramid level conserves the total count
    assert all(v == 1000 for v in sums.values())
    assert set(sums) == set(range(4, 11))


def test_polygon_tile_cover_contains_inside_points(spark):
    poly = Polygon("sq", [np.array([[10.0, 10.0], [10.0, 20.0], [20.0, 20.0], [20.0, 10.0]])])
    z = 8
    cover = {(r["tile_x"], r["tile_y"]) for r in polygon_tile_cover(spark, [poly], z).collect()}
    rng = np.random.default_rng(5)
    for _ in range(300):
        la, lo = float(rng.uniform(10, 20)), float(rng.uniform(10, 20))
        assert oracle_geo.point_to_tile_mercator(la, lo, z) in cover


def test_grid_smooth_matches_numpy(spark):
    import numpy as np
    from osm_pbf_spark.functions.cells import quantize
    from osm_pbf_spark.operators.tiling import grid_smooth

    rng = np.random.default_rng(29)
    lat = rng.uniform(-80, 80, 400)
    lon = rng.uniform(-170, 170, 400)
    level = 5
    n = 1 << level
    df = spark.createDataFrame(
        [(float(a), float(o)) for a, o in zip(lat, lon)], "lat double, lon double"
    )
    got = {(r.x, r.y): r.n_box for r in grid_smooth(df, level).collect()}

    qx, qy = quantize(lat, lon, level)
    grid = np.zeros((n, n), dtype=np.int64)
    np.add.at(grid, (qx, qy), 1)
    want = {}
    for x in range(n):
        for y in range(n):
            s = grid[max(0, x - 1):x + 2, max(0, y - 1):y + 2].sum()
            if s > 0:
                want[(x, y)] = int(s)
    assert got == want


def test_rasterize_polygons_matches_center_pip_and_handles_holes(spark):
    import numpy as np

    from osm_pbf_spark.operators.spatial_join import Polygon, pip_join
    from osm_pbf_spark.operators.tiling import rasterize_polygons

    donut = Polygon(
        "donut",
        [
            np.array([[0.1, 0.1], [0.1, 20.1], [20.1, 20.1], [20.1, 0.1]]),
            np.array([[5.1, 5.1], [5.1, 12.1], [12.1, 12.1], [12.1, 5.1]]),  # hole
        ],
    )
    tri = Polygon("tri", [np.array([[-10.2, -30.2], [-2.2, -10.2], [-18.2, -8.2]])])
    res = 0.5
    out = rasterize_polygons(spark, [donut, tri], res=res)
    got = {(r.poly_id, r.gx, r.gy) for r in out.collect()}
    assert got  # non-empty

    # documented contract: identical to a PIP join of the center points
    centers = spark.createDataFrame(
        sorted({(gx, gy) for _, gx, gy in got} | {
            (gx, gy) for gx in range(296, 342) for gy in range(158, 222)
        }),
        "gx long, gy long",
    ).selectExpr(
        "gx", "gy",
        "(CAST(gy AS DOUBLE) + 0.5D) * 0.5D + -90.0D AS lat",
        "(CAST(gx AS DOUBLE) + 0.5D) * 0.5D + -180.0D AS lon",
    )
    exp = {
        (r.poly_id, r.gx, r.gy)
        for r in pip_join(spark, centers, [donut, tri], level=8).collect()
    }
    assert got == exp

    # hole actually excluded: a center well inside the hole is absent
    # (hole spans lat/lon 5.1..12.1 -> center (8.25, 8.25) = gx 376, gy 196)
    assert ("donut", 376, 196) not in got
    # and the ring between outer and hole is present: (2.25, 2.25)
    assert ("donut", 364, 184) in got


def test_rasterize_rejects_non_dyadic_res(spark):
    import numpy as np
    import pytest as _pytest

    from osm_pbf_spark.operators.spatial_join import Polygon
    from osm_pbf_spark.operators.tiling import rasterize_polygons

    p = Polygon("p", [np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 1.0]])])
    with _pytest.raises(ValueError, match="power of two"):
        rasterize_polygons(spark, [p], res=0.3)
