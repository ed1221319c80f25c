"""Segment-intersection join (SURVEY.md §2.3 G-family, r3) — the last
reference r-tree query class (BASELINE.json:6): which line segments
cross which. Point-in-polygon, kNN, window (bbox), radius, and
nearest-edge are the others, all already distributed; this one finds
every (left, right) segment pair that intersects (proper crossings AND
endpoint/collinear touches).

Plan — same skeleton as operators/bbox.py (this is an MBR join with a
different refine):

  1. each segment's bbox is covered by grid cells at ``level`` (two
     chained native sequence Generates, no Morton in the Generate);
  2. one equi-join shuffle on (cx, cy);
  3. RESPONSIBILITY-CELL dedup: emit a pair only in the cell holding
     the bbox-intersection's min corner — multiplicity exactly 1, no
     distinct shuffle;
  4. EXACT intersect refine on integer-snapped coordinates
     (``floor(v*scale + 0.5)``, the hull.py grid): four orientation
     cross-products in int64 plus collinear on-segment bbox tests.

Exactness bounds: at scale=1e6 a coordinate is <= 3.6e8 in grid units,
so one orientation product is <= ~1.3e17 < 2^63 — safe for WORLD-span
segments. But the SIGN test must compare signs, never multiply two
orientations (d1*d2 would be ~1e34): the predicate is written as sign
comparisons only. Every comparison is integer, so Spark and any ANSI
engine agree bit-for-bit.

The oracle (q_seg_intersect) runs the same predicate as a verbatim
brute-force SQL theta join — the join STRATEGY (cell cover + dedup vs
all-pairs) is what the gate checks, like q_bbox_join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import MAX_LEVEL

__all__ = ["segment_intersect_join", "SEG_SNAP_SCALE"]

SEG_SNAP_SCALE = 1_000_000.0  # micro-degree grid (~0.11 m)

# packed-point layout: one int64 carries both snapped coordinates,
# (x + 2^31) in bits 32..63, (y + 2^31) in bits 0..31 — the regroup
# shuffles TWO longs per segment endpoint pair instead of four, the
# same packed-vertex discipline as the way-assembly regroup.  The
# guard bound is 2^30-1 snapped units (~1073 degrees): within it the
# biased halves fit uint32 AND every orientation product stays under
# 2^62, so the exactness analysis above holds; beyond it the operator
# raises instead of silently wrapping.
_PACK_BIAS = 1 << 31
_PACK_MASK = (1 << 32) - 1
_PT_BOUND = (1 << 30) - 1


def _snap(c: F.Column) -> F.Column:
    return F.floor(c * F.lit(SEG_SNAP_SCALE) + F.lit(0.5)).cast("long")


def _pack_pt(x: F.Column, y: F.Column) -> F.Column:
    """Bias-pack a snapped (x, y) into one int64; rows beyond the
    exactness bound raise instead of silently wrapping into a wrong
    grid position (the guard lives in the USED column so Catalyst
    cannot prune it)."""
    ok = (
        (x >= -_PT_BOUND) & (x <= _PT_BOUND) & (y >= -_PT_BOUND) & (y <= _PT_BOUND)
    )
    packed = F.shiftleft(x + F.lit(_PACK_BIAS), 32).bitwiseOR(y + F.lit(_PACK_BIAS))
    return F.when(ok, packed).otherwise(
        F.raise_error(
            F.concat(
                F.lit("segment coordinate exceeds exactness bound: x="),
                x.cast("string"),
                F.lit(" y="),
                y.cast("string"),
            )
        )
    )


def _ux(p: F.Column) -> F.Column:
    return F.shiftrightunsigned(p, 32) - F.lit(_PACK_BIAS)


def _uy(p: F.Column) -> F.Column:
    return p.bitwiseAND(F.lit(_PACK_MASK)) - F.lit(_PACK_BIAS)


def _orient(ax, ay, bx, by, cx, cy) -> F.Column:
    """Exact int64 cross product (b-a) x (c-a)."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _opposite(d1: F.Column, d2: F.Column) -> F.Column:
    return ((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))


def _on_seg(ax, ay, bx, by, px, py) -> F.Column:
    """Given collinearity, is p within the [a, b] bbox?"""
    return (
        (px >= F.least(ax, bx)) & (px <= F.greatest(ax, bx))
        & (py >= F.least(ay, by)) & (py <= F.greatest(ay, by))
    )


def segment_intersect_join(
    left: DataFrame,
    right: DataFrame,
    level: int,
    left_id: str = "seg_id",
    right_id: str = "seg_id",
) -> DataFrame:
    """All (id_a, id_b, proper) pairs of intersecting segments.
    Segment columns on both sides: (id, alat, alon, blat, blon).
    ``proper`` is true for a transversal crossing, false for endpoint
    or collinear-overlap touches (both count as intersecting, matching
    the inclusive SQL predicate). Self-join callers filter
    ``id_a < id_b`` themselves."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}], got {level}")

    from ..functions.cells import _quant_col

    def prep(df: DataFrame, ident: str, suffix: str) -> DataFrame:
        # shuffle row is (id, two packed endpoints, bbox-min cell, cell
        # key) — the _x1/_y1 cover bounds exist only to drive the
        # Generates and are dropped before the exchange
        boxed = df.select(
            F.col(ident).alias(f"id_{suffix}"),
            _pack_pt(_snap(F.col("alon")), _snap(F.col("alat"))).alias(f"p0_{suffix}"),
            _pack_pt(_snap(F.col("blon")), _snap(F.col("blat"))).alias(f"p1_{suffix}"),
            _quant_col(F.least("alon", "blon"), 180.0, 360.0, level).alias(f"_x0_{suffix}"),
            _quant_col(F.greatest("alon", "blon"), 180.0, 360.0, level).alias(f"_x1_{suffix}"),
            _quant_col(F.least("alat", "blat"), 90.0, 180.0, level).alias(f"_y0_{suffix}"),
            _quant_col(F.greatest("alat", "blat"), 90.0, 180.0, level).alias(f"_y1_{suffix}"),
        )
        return boxed.select(
            "*",
            F.explode(F.sequence(F.col(f"_y0_{suffix}"), F.col(f"_y1_{suffix}"))).alias("_cy"),
        ).select(
            f"id_{suffix}",
            f"p0_{suffix}",
            f"p1_{suffix}",
            f"_x0_{suffix}",
            f"_y0_{suffix}",
            "_cy",
            F.explode(F.sequence(F.col(f"_x0_{suffix}"), F.col(f"_x1_{suffix}"))).alias("_cx"),
        )

    lt = prep(left, left_id, "a")
    rt = prep(right, right_id, "b")
    j = lt.join(rt, ["_cy", "_cx"])
    responsible = (F.col("_cx") == F.greatest("_x0_a", "_x0_b")) & (
        F.col("_cy") == F.greatest("_y0_a", "_y0_b")
    )
    p0x, p0y = _ux(F.col("p0_a")), _uy(F.col("p0_a"))
    p1x, p1y = _ux(F.col("p1_a")), _uy(F.col("p1_a"))
    q0x, q0y = _ux(F.col("p0_b")), _uy(F.col("p0_b"))
    q1x, q1y = _ux(F.col("p1_b")), _uy(F.col("p1_b"))
    d1 = _orient(p0x, p0y, p1x, p1y, q0x, q0y)
    d2 = _orient(p0x, p0y, p1x, p1y, q1x, q1y)
    d3 = _orient(q0x, q0y, q1x, q1y, p0x, p0y)
    d4 = _orient(q0x, q0y, q1x, q1y, p1x, p1y)
    proper = _opposite(d1, d2) & _opposite(d3, d4)
    touch = (
        ((d1 == 0) & _on_seg(p0x, p0y, p1x, p1y, q0x, q0y))
        | ((d2 == 0) & _on_seg(p0x, p0y, p1x, p1y, q1x, q1y))
        | ((d3 == 0) & _on_seg(q0x, q0y, q1x, q1y, p0x, p0y))
        | ((d4 == 0) & _on_seg(q0x, q0y, q1x, q1y, p1x, p1y))
    )
    return j.where(responsible & (proper | touch)).select(
        "id_a", "id_b", proper.alias("proper")
    )


def ring_self_intersections(
    rings_df: DataFrame,
    level: int = 12,
) -> DataFrame:
    """Polygon VALIDITY check: every pair of non-adjacent segments of
    the same ring that PROPERLY cross (a transversal "bowtie"
    crossing — the classic invalid-geometry bug in hand-drawn or
    stitched OSM polygons). Input is the pip_join_rings ring shape
    ``(poly_id, ring_idx, pts array<struct<lat,lon>>)`` without the
    closing duplicate; the closing segment is synthesized.

    Adjacent segments share an endpoint, which is never a PROPER
    crossing (orientation 0 -> the touch branch), so the proper filter
    alone yields exactly the invalid pairs; collinear-overlap
    degeneracies are touches and deliberately not flagged here.

    Plan: one native Generate (a row per segment), the cell-grid
    segment equi-join (segment_intersect_join — each candidate pair
    tested once in its responsible cell), two slim meta joins to map
    segment ids back to (ring, index). Returns
    (poly_id, ring_idx, seg_i, seg_j) with seg_i < seg_j.
    """
    segs = (
        rings_df.where(F.size("pts") >= 3)
        .select(
            "poly_id",
            "ring_idx",
            "pts",
            F.explode(F.sequence(F.lit(1), F.size("pts"))).alias("i"),
        )
        .select(
            "poly_id",
            "ring_idx",
            "i",
            F.concat_ws(
                "#", "poly_id", F.col("ring_idx").cast("string"), F.col("i").cast("string")
            ).alias("sid"),
            F.element_at("pts", F.col("i")).alias("_p"),
            F.element_at(
                "pts",
                F.when(F.col("i") == F.size("pts"), F.lit(1)).otherwise(
                    F.col("i") + 1
                ),
            ).alias("_q"),
        )
        .select(
            "poly_id",
            "ring_idx",
            "i",
            "sid",
            F.col("_p.lat").alias("alat"),
            F.col("_p.lon").alias("alon"),
            F.col("_q.lat").alias("blat"),
            F.col("_q.lon").alias("blon"),
        )
    )
    pairs = (
        segment_intersect_join(segs, segs, level, left_id="sid", right_id="sid")
        .where(F.col("proper") & (F.col("id_a") < F.col("id_b")))
        # cheap superset reduction BEFORE the meta joins: keep only
        # same-(poly, ring) candidate pairs by sid prefix.  If a
        # string poly_id itself contains '#' this can keep extras —
        # the exact typed equality below still filters precisely.
        .where(
            F.substring_index("id_a", "#", 2) == F.substring_index("id_b", "#", 2)
        )
    )
    meta = segs.select("sid", "poly_id", "ring_idx", "i")
    ma = meta.select(
        F.col("sid").alias("id_a"),
        F.col("poly_id").alias("poly_id"),
        F.col("ring_idx").alias("ring_idx"),
        F.col("i").alias("_ia"),
    )
    mb = meta.select(
        F.col("sid").alias("id_b"),
        F.col("poly_id").alias("_pb"),
        F.col("ring_idx").alias("_rb"),
        F.col("i").alias("_ib"),
    )
    out = (
        pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .where((F.col("poly_id") == F.col("_pb")) & (F.col("ring_idx") == F.col("_rb")))
    )
    return out.select(
        "poly_id",
        "ring_idx",
        F.least("_ia", "_ib").alias("seg_i"),
        F.greatest("_ia", "_ib").alias("seg_j"),
    )
