"""Two-stage point-in-polygon join (SURVEY.md §2.3 G2/G3/G4).

Replaces the reference's in-process r-tree query (BASELINE.json:6):
the r-tree's coarse MBR descent becomes a BROADCAST cell-cover equi-join
and its exact leaf test becomes a batched-pandas-UDF refine.

    stage 1 (coarse): points.withColumn("cell", ...)
                      .join(broadcast(cover), "cell")
        -- a BroadcastHashJoin: no shuffle of the (huge) point side.
    stage 2 (exact):  candidates flagged `full` skip refinement (their
                      whole cell is inside the polygon — the r-tree
                      "interior node" shortcut); `partial` candidates go
                      through a vectorized crossing-number test.

At 10^12-doc scale stage 1 stays shuffle-free (cover is tiny:
#polygons x cells/polygon) and stage 2 is narrow. For polygon sets too
large to broadcast there is a `shuffle` strategy that shuffles the
point side on cell — and THERE a dense urban cell is a hot key, killed
by operators.skew measured salting (see the strategy branch below).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import cells as C
from ..functions.geometry import point_in_polygon, ring_bbox


@dataclass
class Polygon:
    poly_id: str
    rings: list[np.ndarray]  # each (m, 2) of (lat, lon); ring 0 outer, rest holes
    tags: dict = field(default_factory=dict)


def _segments_cross_rect(p0: np.ndarray, p1: np.ndarray, rect: np.ndarray) -> np.ndarray:
    """Does segment p0->p1 intersect each rect? Liang-Barsky, vectorized
    over rects. p0/p1: (2,) lat,lon. rect: (k, 4) lat0,lat1,lon0,lon1."""
    d = p1 - p0
    t0 = np.zeros(len(rect))
    t1 = np.ones(len(rect))
    ok = np.ones(len(rect), dtype=bool)
    for dim, lo_i, hi_i in ((0, 0, 1), (1, 2, 3)):
        lo = rect[:, lo_i]
        hi = rect[:, hi_i]
        if d[dim] == 0.0:
            ok &= (p0[dim] >= lo) & (p0[dim] <= hi)
        else:
            ta = (lo - p0[dim]) / d[dim]
            tb = (hi - p0[dim]) / d[dim]
            tmin = np.minimum(ta, tb)
            tmax = np.maximum(ta, tb)
            t0 = np.maximum(t0, tmin)
            t1 = np.minimum(t1, tmax)
    return ok & (t0 <= t1)


def polygon_cell_cover(polygons: list[Polygon], level: int) -> pd.DataFrame:
    """Cover each polygon with cells at ``level`` -> rows (cell, poly_id, full).

    Classification per cell (sound, possibly conservative):
      - candidate set = all cells intersecting the polygon bbox;
      - indicators: any of the cell's 4 corners + center inside; any
        polygon vertex inside the (eps-expanded) cell; any polygon edge
        crossing the (eps-expanded) cell;
      - no indicator        -> cell cannot intersect polygon: dropped
        (a polygon overlapping a rect with no vertex inside and no edge
        crossing would have to contain the rect -> corners inside);
      - all 5 samples inside AND no vertex inside AND no edge crossing
        -> `full` (entire cell inside polygon; refine skipped);
      - otherwise -> `partial` (exact PIP refine decides).
    """
    rows = {"cell": [], "poly_id": [], "full": []}
    for poly in polygons:
        lat_min, lat_max, lon_min, lon_max = ring_bbox(poly.rings)
        x0, y0 = C.quantize(np.array([lat_min]), np.array([lon_min]), level)
        x1, y1 = C.quantize(np.array([lat_max]), np.array([lon_max]), level)
        xs = np.arange(int(x0[0]), int(x1[0]) + 1)
        ys = np.arange(int(y0[0]), int(y1[0]) + 1)
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        gx, gy = gx.ravel(), gy.ravel()
        cell_ids = C.xy_to_cell(gx, gy, level)
        c_lat0, c_lat1, c_lon0, c_lon1 = C.cell_bounds(cell_ids)

        inside_count = np.zeros(len(cell_ids), dtype=np.int64)
        for plat, plon in (
            (c_lat0, c_lon0), (c_lat0, c_lon1), (c_lat1, c_lon0), (c_lat1, c_lon1),
            ((c_lat0 + c_lat1) / 2.0, (c_lon0 + c_lon1) / 2.0),
        ):
            inside_count += point_in_polygon(plat, plon, poly.rings)

        eps_lat = (c_lat1 - c_lat0) * 1e-9
        eps_lon = (c_lon1 - c_lon0) * 1e-9
        rect = np.stack(
            [c_lat0 - eps_lat, c_lat1 + eps_lat, c_lon0 - eps_lon, c_lon1 + eps_lon], axis=1
        )

        vertex_in = np.zeros(len(cell_ids), dtype=bool)
        edge_cross = np.zeros(len(cell_ids), dtype=bool)
        for ring in poly.rings:
            for v in ring:
                vertex_in |= (
                    (v[0] >= rect[:, 0]) & (v[0] <= rect[:, 1])
                    & (v[1] >= rect[:, 2]) & (v[1] <= rect[:, 3])
                )
            closed = np.vstack([ring, ring[:1]])
            for i in range(len(closed) - 1):
                edge_cross |= _segments_cross_rect(closed[i], closed[i + 1], rect)

        boundary = vertex_in | edge_cross
        full = (inside_count == 5) & ~boundary
        keep = (inside_count > 0) | boundary
        rows["cell"].extend(cell_ids[keep].tolist())
        rows["poly_id"].extend([poly.poly_id] * int(keep.sum()))
        rows["full"].extend(full[keep].tolist())
    return pd.DataFrame(rows)


def polygon_cell_cover_dist(
    spark: SparkSession, polygons: list[Polygon], level: int, slice_size: int = 64
) -> DataFrame:
    """Distributed polygon cell cover: same rows as polygon_cell_cover
    but computed by executors, ``slice_size`` polygons per task. The
    driver-side loop is fine to ~10^5 polygons at target_cells=256;
    for larger sets (the pip_join ``shuffle`` strategy's regime) the
    per-polygon work distributes embarrassingly — rings ship PICKLED
    inside an Arrow binary column, never as JVM row objects."""
    import pickle

    import pandas as pd

    slices = [
        pickle.dumps([(p.poly_id, p.rings) for p in polygons[i : i + slice_size]])
        for i in range(0, len(polygons), slice_size)
    ]
    if not slices:
        return spark.createDataFrame([], "cell long, poly_id string, full boolean")
    src = spark.createDataFrame(
        pd.DataFrame({"blob": slices}), "blob binary"
    ).repartition(min(len(slices), spark.sparkContext.defaultParallelism * 4))

    def _cover(batches):
        for pdf in batches:
            for blob in pdf["blob"]:
                group = [Polygon(pid, rings) for pid, rings in pickle.loads(bytes(blob))]
                yield polygon_cell_cover(group, level)

    return src.mapInPandas(_cover, "cell long, poly_id string, full boolean")


def with_cell(df: DataFrame, level: int, lat_col: str = "lat", lon_col: str = "lon",
              out_col: str = "cell") -> DataFrame:
    """Attach the Morton cell id — NATIVE column expression (whole-stage
    codegen; bit-identical to the numpy kernel, see cells.cell_id_col).
    Keeping this JVM-side removes a full-table Python hop from every
    spatial join / kNN / tiling pipeline."""
    return df.withColumn(out_col, C.cell_id_col(F.col(lat_col), F.col(lon_col), level))


def _explode_multilevel_cells(
    points: DataFrame, levels: list[int], lat_col: str, lon_col: str
) -> DataFrame:
    """Point side of a multi-level cover join: one ``cell`` row per
    distinct cover level. The finest-level cell is computed ONCE with
    the (large) Morton encode expression and every coarser level is
    derived from it by parent bit-shifts — EXACT (scaling by a power of
    two is lossless in float64, floor nests, and the clamp commutes
    with the shift; pinned bit-identical by tests/test_cells_native) —
    because exploding an array of full encode trees drops the Generate
    out of whole-stage codegen (~20x slower, measured 3.7 s vs 0.16 s
    on a 200k x 3-level probe)."""
    fin = max(levels)
    base = points.withColumn(
        "_cell_fin", C.cell_id_col(F.col(lat_col), F.col(lon_col), fin)
    )
    if len(levels) == 1:
        return base.withColumnRenamed("_cell_fin", "cell")
    return base.withColumn(
        "cell",
        F.explode(F.array(*[
            F.col("_cell_fin") if lvl == fin else C.parent_col(F.col("_cell_fin"), fin, lvl)
            for lvl in levels
        ])),
    ).drop("_cell_fin")


def pick_cover_level(
    poly: Polygon, target_cells: int = 256, min_level: int = 2, max_level: int = 16
) -> int:
    """Cover-level normalization (the S2 ``max_cells`` idea): choose the
    level where the polygon's bbox spans ~``target_cells`` cells. Small
    polygons get FINE cells (thin boundary band -> most candidates take
    the full-cell JVM bypass); huge polygons get COARSE cells (bounded
    cover size to compute and broadcast). One fixed global level
    degrades one of the two."""
    lat_min, lat_max, lon_min, lon_max = ring_bbox(poly.rings[:1])
    side = float(max(lat_max - lat_min, (lon_max - lon_min) / 2.0, 1e-12))
    import math

    # cells-per-side ~ sqrt(target): level s.t. 180/2^level ~ side/sqrt(target)
    level = int(math.floor(math.log2(180.0 * math.sqrt(target_cells) / side)))
    return max(min_level, min(max_level, level))


def pip_join(
    spark: SparkSession,
    points: DataFrame,
    polygons: list[Polygon],
    level: int | str = "auto",
    lat_col: str = "lat",
    lon_col: str = "lon",
    strategy: str = "broadcast",
    target_cells: int = 256,
    salt_threshold: int = 2_000_000,
) -> DataFrame:
    """points x polygons containment join -> points columns + poly_id.

    EXACT semantics: a row (p, poly) is emitted iff the crossing-number
    test (functions.geometry convention) says p in poly — matching the
    brute-force oracle bit-for-bit. ``level="auto"`` covers each polygon
    at its own normalized level (see pick_cover_level) — bounded cover
    size AND thin refine bands for any polygon-size mix. With the
    broadcast strategy all levels run in ONE plan (point side exploded
    to one cell per distinct level; level-tagged cell ids cannot
    collide); the shuffle strategy joins per level so salting stays
    per-level-keyed.
    """
    if level == "auto":
        by_level: dict[int, list[Polygon]] = {}
        for p in polygons:
            by_level.setdefault(pick_cover_level(p, target_cells), []).append(p)
        if not by_level:
            # empty polygon list (polygons_from_closed_ways can return
            # []): fall through to the non-auto path, which joins
            # against an empty cover and yields an empty DataFrame with
            # the points-plus-poly_id schema instead of None
            level = 12
        elif strategy == "broadcast":
            # SINGLE-PLAN multi-level join (r3): cell ids embed their
            # level in the low 5 bits (cells.cell_id_col), so covers at
            # different levels never collide — one broadcast join over
            # the union of all per-level covers, with the point side
            # exploded to its cell at each distinct level, then ONE
            # refine stage. The old plan unioned a full join+refine
            # branch per level — ~2k extra stages of fixed mapInPandas
            # and scheduling overhead per call (measured 2-3.5 s on a
            # 1000-point input), which dominated short spatial stages.
            levels = sorted(by_level)
            cover_pdf = pd.concat(
                [polygon_cell_cover(group, lvl) for lvl, group in sorted(by_level.items())],
                ignore_index=True,
            )
            cover = spark.createDataFrame(cover_pdf) if len(cover_pdf) else (
                spark.createDataFrame([], "cell long, poly_id string, full boolean")
            )
            pts = _explode_multilevel_cells(points, levels, lat_col, lon_col)
            cand = pts.join(F.broadcast(cover), "cell", "inner")
            return _refine_candidates(spark, cand, polygons, lat_col, lon_col)
        else:
            out = None
            for lvl, group in sorted(by_level.items()):
                part = pip_join(
                    spark, points, group, lvl, lat_col, lon_col, strategy, target_cells
                )
                out = part if out is None else out.unionByName(part)
            return out

    if strategy != "broadcast" and len(polygons) > 2000:
        # large-cover regime: compute the cover ON THE EXECUTORS
        # (driver loop is fine to ~10^5 polygons; beyond that it and
        # the createDataFrame upload become the bottleneck)
        cover = polygon_cell_cover_dist(spark, polygons, level)
    else:
        cover_pdf = polygon_cell_cover(polygons, level)
        cover = spark.createDataFrame(cover_pdf) if len(cover_pdf) else spark.createDataFrame(
            [], "cell long, poly_id string, full boolean"
        )
    pts = with_cell(points, level, lat_col, lon_col)
    if strategy == "broadcast":
        cand = pts.join(F.broadcast(cover), "cell", "inner")
    else:
        # shuffle strategy for polygon/cover sets too large to broadcast:
        # the equi-join shuffles the POINT side on cell, so a dense urban
        # cell (BASELINE's skew case) would land one reducer with 10^8+
        # rows. MEASURED SALTING (SURVEY §2.3 G4, operators.skew): one
        # cheap count-by-cell pass finds heavy cells, the point side
        # salts them pmod(hash(lat,lon), k), and the (small) cover side
        # replicates its rows for heavy cells across all k salts — the
        # join key becomes (cell, salt) and a hot cell spreads over k
        # reducers. AQE's skew-join split remains on as a backstop for
        # everything under the measuring threshold.
        from .skew import heavy_hitters, replicate_for_salt, with_salt

        heavy = heavy_hitters(pts, "cell", salt_threshold)
        pts_s = with_salt(pts, "cell", heavy, [lat_col, lon_col], "_salt")
        cover_s = replicate_for_salt(cover, "cell", heavy, "_salt")
        cand = pts_s.join(cover_s, ["cell", "_salt"], "inner").drop("_salt")

    return _refine_candidates(spark, cand, polygons, lat_col, lon_col)


def _refine_candidates(
    spark: SparkSession,
    cand: DataFrame,
    polygons: list[Polygon],
    lat_col: str,
    lon_col: str,
) -> DataFrame:
    """Exact stage shared by the pip_join paths: `full`-cell candidates
    bypass Python (provably inside); boundary candidates go through one
    vectorized crossing-number refine against the broadcast rings."""
    rings_by_poly = {p.poly_id: [r.copy() for r in p.rings] for p in polygons}
    b_rings = spark.sparkContext.broadcast(rings_by_poly)
    out_schema = cand.drop("full", "cell").schema

    # rows in `full`-covered cells are provably inside: keep them on the
    # JVM side untouched — only boundary-cell candidates pay the Python
    # refine hop (at deep cover levels that is a thin perimeter band)
    full_part = cand.filter(F.col("full")).drop("full", "cell")
    boundary = cand.filter(~F.col("full"))

    def _refine(batches):
        rings_map = b_rings.value
        for pdf in batches:
            if not len(pdf):
                continue
            lat = pdf[lat_col].to_numpy(np.float64)
            lon = pdf[lon_col].to_numpy(np.float64)
            keep = np.zeros(len(pdf), dtype=bool)
            for pid, idx in pdf.groupby("poly_id").indices.items():
                keep[idx] = point_in_polygon(lat[idx], lon[idx], rings_map[pid])
            yield pdf[keep].drop(columns=["full", "cell"])

    return full_part.unionByName(boundary.mapInPandas(_refine, out_schema))


RINGS_SCHEMA = (
    "poly_id string, ring_idx int, "
    "pts array<struct<lat: double, lon: double>>"
)


def rings_from_closed_ways(geoms_df: DataFrame) -> DataFrame:
    """Assembled closed ways -> rings DataFrame for pip_join_rings.

    (way/<id>, ring_idx=0, pts without the closing duplicate). The
    DataFrame-native sibling of sources.pbf_source.polygons_from_closed_
    ways — no driver collect, no polygon-count cap."""
    return geoms_df.filter("is_closed AND size(points) >= 4").select(
        F.concat(F.lit("way/"), F.col("way_id").cast("string")).alias("poly_id"),
        F.lit(0).alias("ring_idx"),
        F.slice("points", 1, F.size("points") - 1).alias("pts"),
    )


def _grouped_rings(rings_df: DataFrame) -> DataFrame:
    """(poly_id, ring_idx, pts) -> one row per polygon with its rings
    sorted by ring_idx (ring 0 outer, rest holes)."""
    return rings_df.groupBy("poly_id").agg(
        F.sort_array(F.collect_list(F.struct("ring_idx", "pts"))).alias("_rings")
    )


def _np_rings(rings_cell) -> list[np.ndarray]:
    return [
        np.asarray([[q["lat"], q["lon"]] for q in r["pts"]], dtype=np.float64)
        for r in rings_cell
    ]


def rings_cell_cover(
    rings_df: DataFrame, level: int | str, target_cells: int = 256
) -> DataFrame:
    """Distributed cell cover of a RINGS DataFrame -> (cell, poly_id,
    full, level) rows, computed entirely on executors (one mapInPandas
    over polygon rows; same classification as polygon_cell_cover).

    ``level="auto"`` normalizes per polygon (pick_cover_level): without
    it one oversized polygon (an admin boundary among 10^6 building
    footprints) meshgrids ~10^5+ cells and runs the per-edge loop
    against all of them inside a single task."""
    return _rings_cover_from_grouped(_grouped_rings(rings_df), level, target_cells)


def _rings_cover_from_grouped(
    polys: DataFrame, level: int | str, target_cells: int
) -> DataFrame:
    def _cover(batches):
        for pdf in batches:
            by_level: dict[int, list[Polygon]] = {}
            for pid, rings in zip(pdf["poly_id"], pdf["_rings"]):
                p = Polygon(pid, _np_rings(rings))
                lvl = level if level != "auto" else pick_cover_level(p, target_cells)
                by_level.setdefault(lvl, []).append(p)
            for lvl, group in sorted(by_level.items()):
                out = polygon_cell_cover(group, lvl)
                out["level"] = np.int32(lvl)
                yield out

    return polys.mapInPandas(
        _cover, "cell long, poly_id string, full boolean, level int"
    )


def pip_join_rings(
    spark: SparkSession,
    points: DataFrame,
    rings_df: DataFrame,
    level: int | str = "auto",
    lat_col: str = "lat",
    lon_col: str = "lon",
    target_cells: int = 256,
    salt_threshold: int = 2_000_000,
) -> DataFrame:
    """PIP join against a DataFrame polygon side — the 10^6+-polygon
    regime (all building footprints) where ``pip_join``'s broadcast
    list and 100k driver collect don't fit (SURVEY §2.3 G2/G3).

    Same exact crossing-number semantics as ``pip_join``; nothing about
    the polygons ever lands on the driver (the only driver action is
    the distinct cover-LEVEL list — at most 15 ints):

      1. cover: one distributed pass over polygon rows
         (rings_cell_cover), per-polygon level normalization when
         ``level="auto"`` (same pick_cover_level rule as pip_join —
         bounded cover work for huge polygons, thin refine bands for
         small ones); the cover is persisted so the Python cover pass
         runs once, not once per level;
      2. coarse: ONE shuffle join for all cover levels — the point
         side explodes to its cell at each distinct level (level-tagged
         cell ids cannot collide), so the heavy-hitter count pass and
         the salted join each run once, not once per level; hot cells
         killed by measured salting (operators.skew) with AQE as
         backstop;
      3. refine: `full`-cell candidates bypass Python (provably inside);
         boundary candidates COGROUP with their polygon's rings on
         poly_id — the ring payload is shuffled once per polygon, not
         duplicated per candidate row. The grouped-rings subtree is
         shared with the cover pass, so its shuffle is reused
         (ReuseExchange) rather than re-aggregated from scratch.

    ``rings_df`` schema: RINGS_SCHEMA (ring 0 outer, rest holes; no
    closing duplicate vertex).
    """
    from .skew import heavy_hitters, replicate_for_salt, with_salt

    polys = _grouped_rings(rings_df)
    cover = _rings_cover_from_grouped(polys, level, target_cells).persist()
    levels = sorted(r["level"] for r in cover.select("level").distinct().collect())

    if levels:
        pts = _explode_multilevel_cells(points, levels, lat_col, lon_col)
        heavy = heavy_hitters(pts, "cell", salt_threshold)
        pts_s = with_salt(pts, "cell", heavy, [lat_col, lon_col], "_salt")
        cov_s = replicate_for_salt(cover.drop("level"), "cell", heavy, "_salt")
        cand = pts_s.join(cov_s, ["cell", "_salt"], "inner").drop("_salt", "cell")
    else:  # empty polygon side: empty result, points+poly_id schema
        empty = spark.createDataFrame([], "cell long, poly_id string, full boolean")
        cand = with_cell(points, 12, lat_col, lon_col).join(empty, "cell").drop("cell")

    out_schema = cand.drop("full").schema
    full_part = cand.filter(F.col("full")).drop("full")
    boundary = cand.filter(~F.col("full")).drop("full")

    def _refine(cand_pdf: pd.DataFrame, rings_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(cand_pdf) or not len(rings_pdf):
            return cand_pdf.iloc[0:0]
        rings = _np_rings(rings_pdf["_rings"].iloc[0])
        keep = point_in_polygon(
            cand_pdf[lat_col].to_numpy(np.float64),
            cand_pdf[lon_col].to_numpy(np.float64),
            rings,
        )
        return cand_pdf[keep]

    refined = (
        boundary.groupBy("poly_id")
        .cogroup(polys.groupBy("poly_id"))
        .applyInPandas(_refine, out_schema)
    )
    return full_part.unionByName(refined)


def sample_points_in_polygons(
    rings_df: DataFrame,
    k: int,
    seed: int = 0,
    oversample: int = 8,
) -> DataFrame:
    """Deterministic spatial sampling: up to ``k`` seeded pseudo-
    uniform points INSIDE each polygon — synthetic sensor placement,
    per-zone Monte-Carlo rollups, training-label point generation.
    Replayable in any engine/partitioning (rand() gives a different
    sample every run and engine).

    Input is the pip_join_rings ring shape ``(poly_id, ring_idx,
    pts array<struct<lat,lon>>)``; holes flip containment (even-odd,
    the shared point_in_polygon kernel).

    Spec: candidate j (1-based, up to ``k * oversample``) maps two
    40-bit md5 draws into the polygon's bbox —

        u = md5_40(seed:poly:j:u) / 2^40     (exact: 2^-40 is dyadic)
        lat = lat_min + u * (lat_max - lat_min)   (fixed IEEE chain)

    — candidates are tested inside-ness in j order and the FIRST k
    inside are kept (``rank`` = 1..k by j). Thin polygons may yield
    fewer than k (acceptance = area/bbox; size ``oversample``
    accordingly — documented, not silent: n per polygon is the
    caller's signal).

    Returns ``(poly_id, rank, j, lat, lon)``.

    Plan: one per-polygon ring aggregate (bbox + ring payload), a
    native sequence-explode Generate of the candidates, one poly-keyed
    join, ONE applyInPandas per polygon (vectorized crossing-number
    over the candidate batch + j-order head) — the pip refine class;
    polygons parallelize, no driver collect, no cap.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if oversample < 1:
        raise ValueError(f"oversample must be >= 1, got {oversample}")
    import pandas as pd

    from ..functions.geometry import point_in_polygon

    m = int(k) * int(oversample)
    polys = rings_df.groupBy("poly_id").agg(
        F.collect_list(F.struct("ring_idx", "pts")).alias("_rings"),
        F.min(F.expr("array_min(transform(pts, p -> p.lat))")).alias("_lat0"),
        F.max(F.expr("array_max(transform(pts, p -> p.lat))")).alias("_lat1"),
        F.min(F.expr("array_min(transform(pts, p -> p.lon))")).alias("_lon0"),
        F.max(F.expr("array_max(transform(pts, p -> p.lon))")).alias("_lon1"),
    )
    h40 = lambda tag: (  # noqa: E731
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(str(seed)),
                        F.col("poly_id").cast("string"),
                        F.col("j").cast("string"),
                        F.lit(tag),
                    )
                ),
                1,
                10,
            ),
            16,
            10,
        ).cast("bigint")
    )
    two40 = float(1 << 40)
    cand = polys.select(
        "poly_id",
        "_rings",
        F.explode(F.sequence(F.lit(1), F.lit(m))).alias("j"),
        "_lat0",
        "_lat1",
        "_lon0",
        "_lon1",
    ).select(
        "poly_id",
        "_rings",
        "j",
        (
            F.col("_lat0")
            + (h40("u").cast("double") / F.lit(two40))
            * (F.col("_lat1") - F.col("_lat0"))
        ).alias("lat"),
        (
            F.col("_lon0")
            + (h40("v").cast("double") / F.lit(two40))
            * (F.col("_lon1") - F.col("_lon0"))
        ).alias("lon"),
    )

    def _refine(pdf: "pd.DataFrame") -> "pd.DataFrame":
        out = []
        for pid, grp in pdf.groupby("poly_id", sort=False):
            rings = [
                np.array([[p["lat"], p["lon"]] for p in r["pts"]])
                for r in sorted(grp.iloc[0]["_rings"], key=lambda r: r["ring_idx"])
            ]
            g = grp.sort_values("j")
            keep = point_in_polygon(
                g["lat"].to_numpy(), g["lon"].to_numpy(), rings
            )
            sel = g[keep].head(k)
            for rank, (_, row) in enumerate(sel.iterrows(), start=1):
                out.append((pid, rank, int(row["j"]), row["lat"], row["lon"]))
        return pd.DataFrame(
            out, columns=["poly_id", "rank", "j", "lat", "lon"]
        )

    schema = "poly_id string, rank int, j long, lat double, lon double"
    return cand.groupBy("poly_id").applyInPandas(_refine, schema)
