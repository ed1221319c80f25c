"""Native-column cell id must be BIT-IDENTICAL to the numpy kernel.

The spatial operators mix the two (native with_cell on DataFrames,
numpy cell_id inside refine/kNN kernels and the pure-Python oracles),
so any divergence — a quantization operation-order change, an FMA, a
signed-shift slip — breaks join exactness. Checked over random points,
boundary/pole/antimeridian coordinates, and values that land exactly on
cell edges at several levels.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from osm_pbf_spark.functions import cells as C


def _coords(rng, n):
    lat = rng.uniform(-90.0, 90.0, n)
    lon = rng.uniform(-180.0, 180.0, n)
    # exact cell-edge coordinates at a few levels + poles/antimeridian
    edges_lat = np.array([-90.0, 90.0, 0.0, 45.0, -45.0, 180.0 * 5 / 16 - 90.0])
    edges_lon = np.array([-180.0, 180.0, 0.0, 90.0, -90.0, 360.0 * 3 / 32 - 180.0])
    lat = np.concatenate([lat, edges_lat, np.zeros_like(edges_lon)])
    lon = np.concatenate([lon, np.zeros_like(edges_lat), edges_lon])
    return lat, lon


def test_native_cell_matches_numpy(spark):
    rng = np.random.default_rng(7)
    lat, lon = _coords(rng, 5000)
    df = spark.createDataFrame(
        [(float(a), float(o)) for a, o in zip(lat, lon)], "lat double, lon double"
    )
    for level in (1, 4, 8, 12, 20, C.MAX_LEVEL):
        got = np.array(
            [
                r[0]
                for r in df.select(
                    C.cell_id_col(F.col("lat"), F.col("lon"), level)
                ).collect()
            ],
            dtype=np.int64,
        )
        want = C.cell_id(lat, lon, level)
        assert (got == want).all(), f"level {level}: {np.flatnonzero(got != want)[:5]}"


def test_native_parent_matches_numpy(spark):
    rng = np.random.default_rng(8)
    lat, lon = _coords(rng, 2000)
    cell = C.cell_id(lat, lon, 12)
    df = spark.createDataFrame([(int(c),) for c in cell], "cell long")
    for plevel in (0, 4, 8, 12):
        got = np.array(
            [r[0] for r in df.select(C.parent_col(F.col("cell"), 12, plevel)).collect()],
            dtype=np.int64,
        )
        want = C.parent(cell, plevel)
        assert (got == want).all()


def test_explode_multilevel_matches_direct_encodes(spark):
    """_explode_multilevel_cells derives coarse cells from the finest
    encode by parent shifts; every (row, level) pair must be
    bit-identical to encoding that level directly (the plan it
    replaced), including poles/antimeridian/cell-edge coordinates."""
    from osm_pbf_spark.operators.spatial_join import _explode_multilevel_cells

    rng = np.random.default_rng(7)
    lat, lon = _coords(rng, 500)
    pdf = __import__("pandas").DataFrame(
        {"doc_id": np.arange(len(lat)), "lat": lat, "lon": lon}
    )
    df = spark.createDataFrame(pdf)
    levels = [3, 8, 13]
    got = {
        (r["doc_id"], r["cell"])
        for r in _explode_multilevel_cells(df, levels, "lat", "lon").collect()
    }
    want = set()
    for lvl in levels:
        for r in df.select(
            "doc_id", C.cell_id_col(F.col("lat"), F.col("lon"), lvl).alias("cell")
        ).collect():
            want.add((r["doc_id"], r["cell"]))
    assert got == want
