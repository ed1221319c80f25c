"""Polygon-overlay join (SURVEY.md §2.3 G-family, r3) — which polygon
pairs intersect. Completes the r-tree query-class family
(BASELINE.json:6): point-in-polygon, kNN, window (bbox), radius,
nearest-edge, and segment-intersection are the others; this is the
polygon x polygon overlay test (area overlap, containment, or boundary
touch all count, matching the inclusive DE-9IM "intersects").

Plan — the bbox.py / segjoin.py skeleton with a polygon-exact refine:

  1. per-polygon snapped integer vertex arrays (micro-degree grid,
     hull.py/segjoin.py convention) and the lat/lon bbox, all computed
     NATIVELY (array transform + array_min/max — no Python);
  2. bbox cell cover at ``level`` via two chained native sequence
     Generates (plain ints; the Morton encode stays out of the
     Generate — the r3 codegen lesson);
  3. one equi-join shuffle on (cx, cy) + RESPONSIBILITY-CELL dedup
     (pair emitted only in the cell of the bbox-intersection's min
     corner ⇒ multiplicity exactly 1, no distinct shuffle) + exact
     snapped-bbox overlap prefilter;
  4. exact refine in ONE Arrow-batched mapInPandas stage (the
     documented per-candidate-pair UDF case, like the PIP refine):
     numpy all-pairs edge intersection on the integer grid (4
     orientation SIGN tests — never d1*d2, which overflows int64 at
     world scale) and, when no edge pair meets, a strict half-open
     crossing-number containment test of each polygon's first vertex.

Correctness of the two-case refine: if NO edge pair of A and B
intersects (proper or touch), every vertex of A is either strictly
inside or strictly outside B (a vertex ON B's boundary would register
as a collinear/endpoint touch of its incident edges), so testing ONE
vertex per side decides containment exactly, and the half-open
crossing-number parity is exact for off-boundary points on the integer
grid. All refine arithmetic is int64 (coords <= 3.6e8 grid units ⇒
products <= ~2.6e17 < 2^63).

Output kinds: 'cross' (boundaries meet), 'a_in_b', 'b_in_a'.
The oracle (q_poly_overlap) is a verbatim brute-force SQL formulation:
EXISTS over exploded edge pairs + a SUM-parity crossing-number — an
independent expression of the same exact integer predicate.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import MAX_LEVEL, _quant_col
from .segjoin import SEG_SNAP_SCALE

__all__ = ["polygon_overlap_join", "dissolve_groups"]


def _snap_arr(pts: F.Column, field: str) -> F.Column:
    return F.transform(
        pts, lambda p: F.floor(p[field] * F.lit(SEG_SNAP_SCALE) + F.lit(0.5)).cast("long")
    )


def _edges(xs: np.ndarray, ys: np.ndarray):
    """Closed-ring edge endpoint arrays (drops an explicit closing
    vertex so the implied closing edge is never duplicated)."""
    if len(xs) > 1 and xs[0] == xs[-1] and ys[0] == ys[-1]:
        xs, ys = xs[:-1], ys[:-1]
    nxt = np.roll(np.arange(len(xs)), -1)
    return xs, ys, xs[nxt], ys[nxt]


def _any_edge_intersect(a, b) -> bool:
    """Any edge pair of rings a=(x0,y0,x1,y1), b likewise intersecting
    (proper crossing or collinear/endpoint touch), all-pairs via
    broadcasting; exact int64 sign tests."""
    ax0, ay0, ax1, ay1 = (v[:, None] for v in a)
    bx0, by0, bx1, by1 = (v[None, :] for v in b)
    d1 = (ax1 - ax0) * (by0 - ay0) - (ay1 - ay0) * (bx0 - ax0)
    d2 = (ax1 - ax0) * (by1 - ay0) - (ay1 - ay0) * (bx1 - ax0)
    d3 = (bx1 - bx0) * (ay0 - by0) - (by1 - by0) * (ax0 - bx0)
    d4 = (bx1 - bx0) * (ay1 - by0) - (by1 - by0) * (ax1 - bx0)
    proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & (
        ((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))
    )
    if proper.any():
        return True

    def on(a_x0, a_y0, a_x1, a_y1, px, py):
        return (
            (px >= np.minimum(a_x0, a_x1)) & (px <= np.maximum(a_x0, a_x1))
            & (py >= np.minimum(a_y0, a_y1)) & (py <= np.maximum(a_y0, a_y1))
        )

    touch = (
        ((d1 == 0) & on(ax0, ay0, ax1, ay1, bx0, by0))
        | ((d2 == 0) & on(ax0, ay0, ax1, ay1, bx1, by1))
        | ((d3 == 0) & on(bx0, by0, bx1, by1, ax0, ay0))
        | ((d4 == 0) & on(bx0, by0, bx1, by1, ax1, ay1))
    )
    return bool(touch.any())


def _strictly_inside(px: int, py: int, ring) -> bool:
    """Exact half-open crossing-number parity for an OFF-BOUNDARY point
    (callers guarantee that — see module docstring)."""
    x0, y0, x1, y1 = ring
    up = (y0 <= py) & (py < y1)
    dn = (y1 <= py) & (py < y0)
    t = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
    cross = (up & (t > 0)) | (dn & (t < 0))
    return bool(np.count_nonzero(cross) & 1)


def _refine(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        ids_a, ids_b, kinds = [], [], []
        for id_a, xa, ya, id_b, xb, yb in zip(
            pdf["id_a"], pdf["xs_a"], pdf["ys_a"],
            pdf["id_b"], pdf["xs_b"], pdf["ys_b"],
        ):
            ea = _edges(np.asarray(xa, dtype=np.int64), np.asarray(ya, dtype=np.int64))
            eb = _edges(np.asarray(xb, dtype=np.int64), np.asarray(yb, dtype=np.int64))
            ra = (ea[0], ea[1], ea[2], ea[3])
            rb = (eb[0], eb[1], eb[2], eb[3])
            if _any_edge_intersect(ra, rb):
                kind = "cross"
            elif _strictly_inside(int(ea[0][0]), int(ea[1][0]), rb):
                kind = "a_in_b"
            elif _strictly_inside(int(eb[0][0]), int(eb[1][0]), ra):
                kind = "b_in_a"
            else:
                continue
            ids_a.append(id_a)
            ids_b.append(id_b)
            kinds.append(kind)
        yield pd.DataFrame({"id_a": ids_a, "id_b": ids_b, "kind": kinds})


def polygon_overlap_join(
    left: DataFrame,
    right: DataFrame,
    level: int,
    left_id: str = "poly_id",
    right_id: str = "poly_id",
) -> DataFrame:
    """All (id_a, id_b, kind) pairs of intersecting simple polygons.

    Sides carry ``(id, pts: array<struct<lat: double, lon: double>>)``
    — one outer ring each, closing vertex optional (closure implied).
    ``kind``: 'cross' if any boundary edges meet (incl. touches), else
    'a_in_b' / 'b_in_a' for strict containment. Self-join callers
    filter ``id_a < id_b`` themselves.
    """
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}], got {level}")

    def prep(df: DataFrame, ident: str, suffix: str) -> DataFrame:
        lats = F.transform("pts", lambda p: p["lat"])
        lons = F.transform("pts", lambda p: p["lon"])
        boxed = df.select(
            F.col(ident).alias(f"id_{suffix}"),
            _snap_arr(F.col("pts"), "lon").alias(f"xs_{suffix}"),
            _snap_arr(F.col("pts"), "lat").alias(f"ys_{suffix}"),
            _quant_col(F.array_min(lons), 180.0, 360.0, level).alias(f"_x0_{suffix}"),
            _quant_col(F.array_max(lons), 180.0, 360.0, level).alias(f"_x1_{suffix}"),
            _quant_col(F.array_min(lats), 90.0, 180.0, level).alias(f"_y0_{suffix}"),
            _quant_col(F.array_max(lats), 90.0, 180.0, level).alias(f"_y1_{suffix}"),
        )
        return boxed.select(
            "*",
            F.explode(F.sequence(F.col(f"_y0_{suffix}"), F.col(f"_y1_{suffix}"))).alias("_cy"),
        ).select(
            "*",
            F.explode(F.sequence(F.col(f"_x0_{suffix}"), F.col(f"_x1_{suffix}"))).alias("_cx"),
        )

    lt = prep(left, left_id, "a")
    rt = prep(right, right_id, "b")
    j = lt.join(rt, ["_cy", "_cx"])
    responsible = (F.col("_cx") == F.greatest("_x0_a", "_x0_b")) & (
        F.col("_cy") == F.greatest("_y0_a", "_y0_b")
    )
    bbox_hit = (
        (F.array_min("xs_a") <= F.array_max("xs_b"))
        & (F.array_min("xs_b") <= F.array_max("xs_a"))
        & (F.array_min("ys_a") <= F.array_max("ys_b"))
        & (F.array_min("ys_b") <= F.array_max("ys_a"))
    )
    cand = j.where(responsible & bbox_hit).select(
        "id_a", "xs_a", "ys_a", "id_b", "xs_b", "ys_b"
    )
    out_schema = (
        f"id_a {cand.schema['id_a'].dataType.simpleString()}, "
        f"id_b {cand.schema['id_b'].dataType.simpleString()}, kind string"
    )
    return cand.mapInPandas(_refine, schema=out_schema)


def dissolve_groups(
    polys: DataFrame,
    level: int,
    poly_id: str = "poly_id",
    rounds: int | None = None,
) -> DataFrame:
    """DISSOLVE: partition polygons into groups whose members
    transitively overlap/touch (the GIS "merge overlapping
    footprints" op — building-footprint dedup, coverage merging).
    Returns ``(poly_id, group_id)`` for EVERY input polygon, where
    ``group_id`` is the minimum poly_id of its overlap component
    (deterministic, engine-independent); isolated polygons form
    singleton groups.

    Composition of two scale-shaped primitives: the pair set from
    :func:`polygon_overlap_join` (cell-cover join, no all-pairs) feeds
    :func:`~..graph.connected_components` (alternating star rounds —
    O(log n) rounds, two narrow shuffles each, no collect_list).
    ``rounds`` forwards to the CC fixpoint control (None = converge
    with one tiny aggregate action per round; k = fixed-round, zero
    driver actions, correct when 2^k exceeds the overlap-graph
    diameter)."""
    from .graph import connected_components

    pairs = polygon_overlap_join(polys, polys, level, poly_id, poly_id)
    edges = pairs.where(F.col("id_a") < F.col("id_b")).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    cc = connected_components(edges, rounds=rounds)
    return (
        polys.select(F.col(poly_id))
        .join(cc.withColumnRenamed("node", poly_id), poly_id, "left")
        .select(
            poly_id,
            F.coalesce("component", F.col(poly_id)).alias("group_id"),
        )
    )


def areal_interpolate(
    spark,
    src_polys,
    tgt_polys,
    values: DataFrame,
    res: float,
    value_col: str = "value",
    id_col: str = "poly_id",
) -> DataFrame:
    """Areal interpolation — transfer a count-like value between two
    INCOMPATIBLE polygon zone systems (census tracts -> grid cells,
    districts -> catchments): each source zone's value is reallocated
    to targets proportionally to overlap area, the standard
    area-weighting method (Goodchild & Lam 1980).

    Overlap areas are measured on the EXACT dyadic raster
    (rasterize_polygons center-fill at ``res``), so every weight is a
    ratio of exact int64 cell counts. Per-source contributions are
    micro-quantized — ``(value * n_overlap * 10^6) DIV n_src_cells``
    (nonnegative: Spark DIV == floor) — making the per-target sum an
    exact, order-free int64; total quantization error is under
    n_sources/10^6 of a value unit. Values must be nonnegative
    integers (WHERE guard). Sources are assumed to tile space without
    overlap (double-allocation otherwise — caller contract, as is
    target overlap).

    Returns ``(tgt_id, n_cells, est_micro, n_src)`` — every target
    zone appears; zero-overlap targets carry est_micro 0.

    Plan: two rasterize Generates (map-only), ONE (gx, gy) equi-join
    of the two cell sets, two bounded aggregates, one broadcast-sized
    values join — the cell join is the only data-sized shuffle, and
    its volume is the raster resolution the caller chose.
    """
    from .tiling import rasterize_polygons

    vv = F.col(value_col).cast("bigint")
    values = values.where(
        F.when(vv >= 0, F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"areal_interpolate: {value_col} must be >= 0, got "),
                    F.col(value_col).cast("string"),
                )
            )
        )
    ).select(F.col(id_col).alias("src_id"), vv.alias("_v"))
    src_cells = rasterize_polygons(spark, src_polys, res).select(
        F.col("poly_id").alias("src_id"), "gx", "gy"
    )
    tgt_cells = rasterize_polygons(spark, tgt_polys, res).select(
        F.col("poly_id").alias("tgt_id"), "gx", "gy"
    )
    src_tot = src_cells.groupBy("src_id").agg(
        F.count(F.lit(1)).alias("_n_src_cells")
    )
    overlap = (
        src_cells.join(tgt_cells, ["gx", "gy"])
        .groupBy("src_id", "tgt_id")
        .agg(F.count(F.lit(1)).alias("_n_overlap"))
    )
    contrib = (
        overlap.join(src_tot, "src_id")
        .join(values, "src_id")
        .select(
            "tgt_id",
            F.expr(
                "(_v * _n_overlap * 1000000L) DIV _n_src_cells"
            ).alias("_c"),
        )
    )
    est = contrib.groupBy("tgt_id").agg(
        F.sum("_c").alias("est_micro"), F.count(F.lit(1)).alias("n_src")
    )
    tgt_n = tgt_cells.groupBy("tgt_id").agg(F.count(F.lit(1)).alias("n_cells"))
    all_t = spark.createDataFrame(
        [(p.poly_id,) for p in tgt_polys], "tgt_id string"
    )
    return (
        all_t.join(tgt_n, "tgt_id", "left")
        .join(est, "tgt_id", "left")
        .select(
            "tgt_id",
            F.coalesce("n_cells", F.lit(0)).cast("bigint").alias("n_cells"),
            F.coalesce("est_micro", F.lit(0)).cast("bigint").alias("est_micro"),
            F.coalesce("n_src", F.lit(0)).cast("bigint").alias("n_src"),
        )
    )
