"""Rectangle-overlap join (SURVEY.md §2.3 G-family, r3).

``bbox_join(left, right, level)`` returns every (left, right) pair of
axis-aligned lat/lon boxes that OVERLAP — the reference r-tree's window
query (BASELINE.json:6 class: MBR-tree descent -> exact test) as one
distributed equi-join plan:

  1. quantize each box's corners once at ``level`` (same grid as
     functions/cells.py, native expressions);
  2. explode each box to its covered grid cells with two chained
     ``explode(sequence(lo, hi))`` Generates — plain (cx, cy) ints, no
     Morton encode inside the Generate (r3 codegen lesson);
  3. shuffle equi-join on (cx, cy);
  4. exact overlap refine + RESPONSIBILITY-CELL dedup: a true pair is
     counted once per shared cell, so emit it only in the canonical
     shared cell — the one holding the intersection's min corner,
     ``(greatest(ax0,bx0), greatest(ay0,by0))``. Pure arithmetic
     equality on already-carried ints: no distinct/groupBy dedup
     shuffle after the join.

Everything is whole-stage codegen; the only shuffle is the (cx, cy)
equi-join. Skew from a hot cell is AQE-splittable; a box spanning many
cells multiplies its candidate rows by its cover size — pick ``level``
so typical boxes span O(1) cells (the ``pick_bbox_level`` helper sizes
it from a box-extent estimate, like distance.pick_distance_level).

Boxes are given in plain [-90,90]x[-180,180] degrees; antimeridian-
wrapping boxes are NOT supported (split them first) — this matches the
SQL overlap predicate the driver oracle runs verbatim.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import MAX_LEVEL, _quant_col

__all__ = ["bbox_join", "pick_bbox_level"]


def pick_bbox_level(typical_extent_deg: float) -> int:
    """Coarsest level whose cells are >= a typical box extent (deg), so
    typical boxes cover <= 2x2 cells."""
    if typical_extent_deg <= 0:
        raise ValueError("typical_extent_deg must be positive")
    lv = int(math.floor(math.log2(180.0 / typical_extent_deg)))
    return max(0, min(MAX_LEVEL, lv))


def _cover(df: DataFrame, ident: str, suffix: str, cols: dict[str, str], level: int) -> DataFrame:
    """(id, box, x0, y0) exploded to one row per covered grid cell."""
    out = df.select(
        F.col(ident).alias(f"id_{suffix}"),
        F.col(cols["lat_min"]).alias(f"_lat_min_{suffix}"),
        F.col(cols["lat_max"]).alias(f"_lat_max_{suffix}"),
        F.col(cols["lon_min"]).alias(f"_lon_min_{suffix}"),
        F.col(cols["lon_max"]).alias(f"_lon_max_{suffix}"),
        _quant_col(F.col(cols["lon_min"]), 180.0, 360.0, level).alias(f"_x0_{suffix}"),
        _quant_col(F.col(cols["lon_max"]), 180.0, 360.0, level).alias(f"_x1_{suffix}"),
        _quant_col(F.col(cols["lat_min"]), 90.0, 180.0, level).alias(f"_y0_{suffix}"),
        _quant_col(F.col(cols["lat_max"]), 90.0, 180.0, level).alias(f"_y1_{suffix}"),
    )
    return out.select(
        "*",
        F.explode(F.sequence(F.col(f"_y0_{suffix}"), F.col(f"_y1_{suffix}"))).alias("_cy"),
    ).select(
        "*",
        F.explode(F.sequence(F.col(f"_x0_{suffix}"), F.col(f"_x1_{suffix}"))).alias("_cx"),
    )


def bbox_join(
    left: DataFrame,
    right: DataFrame,
    level: int,
    left_id: str = "id",
    right_id: str = "id",
    lat_min: str = "lat_min",
    lat_max: str = "lat_max",
    lon_min: str = "lon_min",
    lon_max: str = "lon_max",
) -> DataFrame:
    """All (id_a, id_b) pairs of overlapping boxes (closed-interval
    overlap, boundary touch counts — the same ``<=`` predicate as the
    SQL oracle). Self-join callers filter ``id_a < id_b`` themselves."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}], got {level}")
    cols = {"lat_min": lat_min, "lat_max": lat_max, "lon_min": lon_min, "lon_max": lon_max}
    lt = _cover(left, left_id, "a", cols, level)
    rt = _cover(right, right_id, "b", cols, level)
    j = lt.join(rt, ["_cy", "_cx"])
    overlap = (
        (F.col("_lat_min_a") <= F.col("_lat_max_b"))
        & (F.col("_lat_min_b") <= F.col("_lat_max_a"))
        & (F.col("_lon_min_a") <= F.col("_lon_max_b"))
        & (F.col("_lon_min_b") <= F.col("_lon_max_a"))
    )
    responsible = (F.col("_cx") == F.greatest("_x0_a", "_x0_b")) & (
        F.col("_cy") == F.greatest("_y0_a", "_y0_b")
    )
    return j.where(overlap & responsible).select("id_a", "id_b")
