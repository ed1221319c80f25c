"""Raster<->vector tile assignment (SURVEY.md §2.3 G6).

The reference maps geometries to raster tiles via its r-tree over the
tile grid; here it is arithmetic + a grid cover:

- point -> tile: vectorized slippy-map formula. Two schemes:
  * ``mercator`` — true Web-Mercator z/x/y, computed in a numpy
    pandas-UDF so it matches the pure-Python oracle's libm exactly;
  * ``linear``  — equirectangular floor-only grid computed with NATIVE
    Spark expressions (whole-stage codegen, no Python hop, and
    bit-reproducible in any engine — used for the duckdb oracle gate).
- polygon -> tiles: grid cover on the driver -> explode -> (tile, poly).
- tile rollups: plain groupBy / rollup over (z, x, y).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import tiles as TL
from .spatial_join import Polygon


def assign_point_tiles(
    df: DataFrame,
    zoom: int,
    scheme: str = "mercator",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Attach tile_x / tile_y / tile_z columns."""
    if scheme == "linear":
        n = float(1 << zoom)
        nmax = (1 << zoom) - 1
        x = F.floor((F.col(lon_col) + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
        y = F.floor((F.lit(90.0) - F.col(lat_col)) / F.lit(180.0) * F.lit(n))
        return (
            df.withColumn("tile_x", F.least(F.greatest(x, F.lit(0)), F.lit(nmax)).cast("long"))
            .withColumn("tile_y", F.least(F.greatest(y, F.lit(0)), F.lit(nmax)).cast("long"))
            .withColumn("tile_z", F.lit(zoom))
        )

    @F.pandas_udf(T.StructType([T.StructField("x", T.LongType()), T.StructField("y", T.LongType())]))
    def _tile(lat: pd.Series, lon: pd.Series) -> pd.DataFrame:
        x, y = TL.point_to_tile_mercator(lat.to_numpy(np.float64), lon.to_numpy(np.float64), zoom)
        return pd.DataFrame({"x": x, "y": y})

    return (
        df.withColumn("_t", _tile(F.col(lat_col), F.col(lon_col)))
        .withColumn("tile_x", F.col("_t.x"))
        .withColumn("tile_y", F.col("_t.y"))
        .withColumn("tile_z", F.lit(zoom))
        .drop("_t")
    )


def polygon_tile_cover(
    spark: SparkSession, polygons: list[Polygon], zoom: int
) -> DataFrame:
    """Vector -> raster: every (poly_id, tile) whose extents intersect."""
    rows = []
    for p in polygons:
        xy = TL.polygon_tile_cover_mercator(p.rings, zoom)
        rows.extend((p.poly_id, zoom, int(x), int(y)) for x, y in xy)
    return spark.createDataFrame(rows, "poly_id string, tile_z int, tile_x long, tile_y long")


def tile_stats(points_with_tiles: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-tile doc counts — the per-tile assignment output surface."""
    return points_with_tiles.groupBy("tile_z", "tile_x", "tile_y").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(id_col).alias("n_distinct_docs"),
    )


def tile_pyramid_rollup(points_with_tiles: DataFrame, zoom: int, min_zoom: int = 0) -> DataFrame:
    """Roll tile counts up the pyramid: parent tile at z-1 is (x>>1, y>>1).

    Two shuffles total, independent of pyramid depth: aggregate once at
    leaf zoom (the only pass over the big input — map-side partial agg
    does most of the work), then explode each leaf tile into its
    ancestor chain (z, x>>d, y>>d) and aggregate once more. A
    level-by-level chain of groupBys would pay one shuffle per zoom
    level and serialize the pyramid; this form is a single wide
    aggregation over |leaf_tiles| * depth tiny rows.
    """
    leaf = points_with_tiles.groupBy("tile_z", "tile_x", "tile_y").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    depth = zoom - min_zoom
    if depth <= 0:
        return leaf
    return (
        leaf.withColumn("_d", F.explode(F.sequence(F.lit(0), F.lit(depth))))
        .select(
            (F.col("tile_z") - F.col("_d")).cast("int").alias("tile_z"),
            F.expr("shiftrightunsigned(tile_x, _d)").alias("tile_x"),
            F.expr("shiftrightunsigned(tile_y, _d)").alias("tile_y"),
            "n_docs",
        )
        .groupBy("tile_z", "tile_x", "tile_y")
        .agg(F.sum("n_docs").alias("n_docs"))
    )
