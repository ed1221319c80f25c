"""Within-radius spatial distance join (SURVEY.md §2.3 G-family, r3).

``distance_join(left, right, radius)`` returns every (left, right) pair
within ``radius`` of each other — the reference r-tree's fixed-radius
range query (BASELINE.json:6 class) as ONE equi-join plan:

  1. pick the coarsest cell level whose cell extent >= the radius in
     both axes (so all matches of a point lie in its 3x3 cell window);
  2. left side: quantize (x, y) ONCE, explode a 9-literal (dx, dy)
     array, re-encode the neighbor cell AFTER the Generate — the
     explode itself carries no Morton expression trees (the r3
     multi-level-PIP lesson: exploding full encode expressions knocks
     the Generate out of whole-stage codegen);
  3. right side: its own cell id;
  4. shuffle equi-join on cell, native distance refine (<= radius).

Candidate multiplicity is exactly 1 per true pair (lat rows outside the
grid are filtered, not clamped; lon wraps mod n), so there is no
dedup shuffle after the join. Everything is whole-stage codegen — no
Python stage anywhere.

Scale: one shuffle per side on cell ids sized by the radius. Dense
cells fan out quadratically in the OUTPUT (inherent to the operator,
not the plan); AQE skew-join splits oversized shuffle partitions, and
callers with a known hot extent can pre-filter or salt as in pip_join.

Metrics:
  - ``haversine``   radius in meters, refine via the same native
    expression as operators/measures.py (DEG2RAD literal multiply).
  - ``euclid2_deg`` radius in DEGREES, refine on squared degree
    distance — IEEE +,-,* only, bit-reproducible across engines, used
    by the driver gate (q_distance_join) exactly like the kNN oracles.
    It is a FLAT degree-space metric: pairs whose shortest path crosses
    the antimeridian measure the long way round (wrap-window candidates
    simply fail the refine — no false positives). Use haversine for
    real geography.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import MAX_LEVEL, _quant_col, cell_size_deg, xy_to_cell_col
from .measures import _hav_m

__all__ = ["distance_join", "pick_distance_level"]

# conservative meters-per-degree floors (true value varies with latitude)
_M_PER_DEG_LAT = 110_567.0
_M_PER_DEG_LON_EQ = 111_319.0


def pick_distance_level(radius: float, metric: str, max_abs_lat: float = 85.0) -> int:
    """Coarsest level whose cell extent covers ``radius`` in both axes."""
    if metric == "euclid2_deg":
        r_lat = r_lon = float(radius)
    elif metric == "haversine":
        r_lat = radius / _M_PER_DEG_LAT
        r_lon = radius / (_M_PER_DEG_LON_EQ * math.cos(math.radians(max_abs_lat)))
    else:
        raise ValueError(f"unknown metric {metric!r}")
    if r_lat <= 0 or r_lon <= 0:
        raise ValueError("radius must be positive")
    lv = min(int(math.floor(math.log2(180.0 / r_lat))), int(math.floor(math.log2(360.0 / r_lon))))
    return max(2, min(MAX_LEVEL, lv))  # level>=2 so the 3x3 lon wrap never self-dups


def distance_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    metric: str = "haversine",
    level: int | None = None,
    left_id: str = "id",
    right_id: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 85.0,
) -> DataFrame:
    """All (id_a, id_b, dist) pairs with distance <= ``radius``.

    ``dist`` is meters for ``haversine``, SQUARED degrees for
    ``euclid2_deg`` (radius is compared against dist in those same
    units: ``dist2 <= radius*radius``). Pairs where both sides are the
    same id column name and value are NOT suppressed — self-join
    callers filter ``id_a < id_b`` themselves (cheaper than a generic
    guard, and asymmetric joins have no self-pairs).
    """
    if level is None:
        level = pick_distance_level(radius, metric, max_abs_lat)
    if not 2 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [2, {MAX_LEVEL}], got {level}")
    n = 1 << level
    dlat, dlon = cell_size_deg(level)
    if metric == "haversine":
        if dlat * _M_PER_DEG_LAT < radius or (
            dlon * _M_PER_DEG_LON_EQ * math.cos(math.radians(max_abs_lat)) < radius
        ):
            raise ValueError(f"level {level} cells are smaller than radius {radius} m")
    elif metric == "euclid2_deg":
        if dlat < radius or dlon < radius:
            raise ValueError(f"level {level} cells are smaller than radius {radius} deg")
    else:
        raise ValueError(f"unknown metric {metric!r}")

    window = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    lt = (
        left.select(
            F.col(left_id).alias("id_a"),
            F.col(lat_col).alias("_lat_a"),
            F.col(lon_col).alias("_lon_a"),
            _quant_col(F.col(lon_col), 180.0, 360.0, level).alias("_x"),
            _quant_col(F.col(lat_col), 90.0, 180.0, level).alias("_y"),
        )
        .withColumn("_d", F.explode(window))
        .withColumn("_ny", F.col("_y") + F.col("_d.dy"))
        .where((F.col("_ny") >= 0) & (F.col("_ny") < n))
        .withColumn("_nx", F.pmod(F.col("_x") + F.col("_d.dx"), F.lit(n)))
        .select(
            "id_a",
            "_lat_a",
            "_lon_a",
            xy_to_cell_col(F.col("_nx"), F.col("_ny"), level).alias("_cell"),
        )
    )
    rt = right.select(
        F.col(right_id).alias("id_b"),
        F.col(lat_col).alias("_lat_b"),
        F.col(lon_col).alias("_lon_b"),
        _quant_col(F.col(lon_col), 180.0, 360.0, level).alias("_x"),
        _quant_col(F.col(lat_col), 90.0, 180.0, level).alias("_y"),
    ).select("id_b", "_lat_b", "_lon_b", xy_to_cell_col(F.col("_x"), F.col("_y"), level).alias("_cell"))

    j = lt.join(rt, "_cell")
    if metric == "haversine":
        dist = _hav_m(F.col("_lat_a"), F.col("_lon_a"), F.col("_lat_b"), F.col("_lon_b"))
        cond = dist <= F.lit(float(radius))
    else:
        dla = F.col("_lat_a") - F.col("_lat_b")
        dlo = F.col("_lon_a") - F.col("_lon_b")
        dist = dla * dla + dlo * dlo
        cond = dist <= F.lit(float(radius) * float(radius))
    return j.select("id_a", "id_b", dist.alias("dist")).where(cond)
