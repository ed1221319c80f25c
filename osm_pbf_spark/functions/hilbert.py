"""Hilbert-curve sort keys for data layout (r3 late).

The Hilbert space-filling curve is Z-order's better-locality sibling:
consecutive key values are ALWAYS grid neighbors (Manhattan distance
1), so a range of the key maps to a compact blob of space with no
Z-curve "jump seams". For a layout rewrite (`compact()`-style file
clustering on two selective columns) that means tighter per-file
bounding boxes and fewer files overlapping any query rectangle — the
reason Iceberg/Delta offer Hilbert beside zorder for their clustering
rewrites.

Kernel: the classic xy2d walk (public algorithm — Wikipedia "Hilbert
curve", converted from the iterative C version) unrolled over the key
bits. One non-obvious simplification makes it pure cheap codegen: for
a 2^b grid the reflection step `x' = n-1-x` is exactly `x' = x XOR
(n-1)` (n-1 is an all-ones mask, so the subtraction never borrows),
and the algorithm only ever reads bits BELOW the current level after
the rotation — so the whole per-level update is two bit tests, one
shifted add, and a conditional XOR-swap. Each level is emitted as its
own projection (a chained ``select`` per level); Catalyst keeps the
aliases (CollapseProject refuses to inline multiply-referenced
non-trivial expressions), so the expression tree stays LINEAR in
``bits`` instead of exponential.

Cross-engine exactness: every op is integer shift/mask/xor/add — the
DuckDB gate replays the identical unrolled chain (q_hilbert) and
hashes the keys bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .zorder import _quant_range_col

__all__ = [
    "hilbert_key_col", "hilbert_xy2d", "hilbert_sorted", "hilbert_py",
    "hilbert_ranges",
]


def hilbert_py(qx: int, qy: int, bits: int) -> int:
    """Pure-Python reference of the same walk (tests + oracles)."""
    mask = (1 << bits) - 1
    d = 0
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        rx = (qx >> k) & 1
        ry = (qy >> k) & 1
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                qx ^= mask
                qy ^= mask
            qx, qy = qy, qx
    return d


def hilbert_xy2d(df: DataFrame, qx: Column, qy: Column, bits: int) -> DataFrame:
    """Append column ``hkey`` = Hilbert d-index of the already-quantized
    integer grid coords ``(qx, qy)`` in [0, 2^bits). One chained
    projection per level — linear expression growth, all codegen."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    mask = F.lit((1 << bits) - 1).cast("long")
    out = df.select(
        "*",
        qx.cast("long").alias("_hx"),
        qy.cast("long").alias("_hy"),
        F.lit(0).cast("long").alias("_hd"),
    )
    for k in range(bits - 1, -1, -1):
        s2 = 1 << (2 * k)
        rx = F.shiftrightunsigned(F.col("_hx"), k).bitwiseAND(F.lit(1))
        ry = F.shiftrightunsigned(F.col("_hy"), k).bitwiseAND(F.lit(1))
        d_new = F.col("_hd") + F.lit(s2).cast("long") * (
            (F.lit(3) * rx).bitwiseXOR(ry).cast("long")
        )
        # ry == 1 -> unchanged; else reflect (iff rx == 1) then swap
        x_new = F.when(ry == 1, F.col("_hx")).otherwise(
            F.when(rx == 1, F.col("_hy").bitwiseXOR(mask)).otherwise(F.col("_hy"))
        )
        y_new = F.when(ry == 1, F.col("_hy")).otherwise(
            F.when(rx == 1, F.col("_hx").bitwiseXOR(mask)).otherwise(F.col("_hx"))
        )
        keep = [c for c in out.columns if c not in ("_hx", "_hy", "_hd")]
        out = out.select(
            *keep, x_new.alias("_hx"), y_new.alias("_hy"), d_new.alias("_hd")
        )
    keep = [c for c in out.columns if c not in ("_hx", "_hy", "_hd")]
    return out.select(*keep, F.col("_hd").alias("hkey"))


def hilbert_key_col(
    df: DataFrame,
    xcol: Column,
    ycol: Column,
    los: tuple[float, float],
    his: tuple[float, float],
    bits: int = 16,
) -> DataFrame:
    """Append ``hkey`` = Hilbert key of ``(xcol, ycol)`` range-quantized
    to ``bits`` each (zorder's quantize, identical clamp/NULL rules)."""
    qx = _quant_range_col(xcol, los[0], his[0], bits)
    qy = _quant_range_col(ycol, los[1], his[1], bits)
    return hilbert_xy2d(df, qx, qy, bits)


def hilbert_sorted(
    df: DataFrame,
    xcol: str,
    ycol: str,
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` globally sorted on the Hilbert key of ``(xcol, ycol)`` —
    drop-in alternative to zorder_sorted for 2-D layout rewrites.
    Ranges from one tiny min/max agg; key column dropped from the
    output; explicit ``num_partitions`` (repartitionByRange +
    sortWithinPartitions) survives AQE coalescing like the zorder
    rewrite does."""
    row = df.agg(
        F.min(F.col(xcol).cast("double")),
        F.max(F.col(xcol).cast("double")),
        F.min(F.col(ycol).cast("double")),
        F.max(F.col(ycol).cast("double")),
    ).collect()[0]
    if any(v is None for v in row):
        raise ValueError(f"hilbert columns ({xcol}, {ycol}) have no non-NULL values")
    keyed = hilbert_key_col(
        df, F.col(xcol), F.col(ycol), (row[0], row[2]), (row[1], row[3]), bits
    )
    if num_partitions is None:
        s = keyed.sort("hkey")
    else:
        s = keyed.repartitionByRange(num_partitions, "hkey").sortWithinPartitions(
            "hkey"
        )
    return s.drop("hkey")


def hilbert_ranges(
    qx0: int, qx1: int, qy0: int, qy1: int, bits: int,
    max_ranges: int | None = None,
) -> list[tuple[int, int]]:
    """Decompose an inclusive QUANTIZED rectangle into the minimal
    sorted list of inclusive contiguous HILBERT-key ranges (the
    zorder.zorder_ranges twin for the better-locality curve): a
    quadtree walk that carries the curve's per-quadrant transform —
    each step consumes a top bit exactly like hilbert_py's xy2d walk
    (quadrant index (3*rx)^ry; on ry==0 flip-if-rx then swap) but
    expressed as a selector/flip pair per output axis, so child
    recursion stays in GLOBAL coordinates. Children are visited in
    ascending d order, so adjacent ranges merge on the fly.

    Because consecutive Hilbert keys are always grid neighbors, a
    rectangle decomposes into FEWER ranges than under Z-order (no
    seam jumps) — measured ~2-3x fewer on the same rectangles (see
    tests) — which is the whole point of paying for the fancier
    curve in a layout: fewer BETWEENs, fewer file-stat probes.
    """
    n = 1 << bits
    for v, name in ((qx0, "qx0"), (qx1, "qx1"), (qy0, "qy0"), (qy1, "qy1")):
        if not 0 <= v < n:
            raise ValueError(f"{name}={v} outside [0, {n})")
    if qx0 > qx1 or qy0 > qy1:
        raise ValueError("empty rectangle")
    out: list[tuple[int, int]] = []

    def comp(sel: str, flip: bool, gx: int, gy: int) -> int:
        v = gx if sel == "x" else gy
        return 1 - v if flip else v

    def rec(k, xb, yb, db, sx, fx, sy, fy):
        s = 1 << k
        if xb + s - 1 < qx0 or xb > qx1 or yb + s - 1 < qy0 or yb > qy1:
            return
        if qx0 <= xb and xb + s - 1 <= qx1 and qy0 <= yb and yb + s - 1 <= qy1:
            if out and out[-1][1] + 1 == db:
                out[-1] = (out[-1][0], db + s * s - 1)
            else:
                out.append((db, db + s * s - 1))
            return
        h = s >> 1
        kids = []
        for gx in (0, 1):
            for gy in (0, 1):
                rx = comp(sx, fx, gx, gy)
                ry = comp(sy, fy, gx, gy)
                q = (3 * rx) ^ ry
                if ry == 1:
                    child = (sx, fx, sy, fy)
                elif rx == 0:
                    child = (sy, fy, sx, fx)
                else:
                    child = (sy, not fy, sx, not fx)
                kids.append((q, xb + gx * h, yb + gy * h, child))
        for q, cx, cy, (csx, cfx, csy, cfy) in sorted(kids):
            rec(k - 1, cx, cy, db + h * h * q, csx, cfx, csy, cfy)

    rec(bits, 0, 0, 0, "x", False, "y", False)
    if max_ranges is not None and len(out) > max_ranges:
        raise ValueError(
            f"hilbert_ranges: {len(out)} ranges > max_ranges={max_ranges}; "
            "coarsen bits or split the query rectangle"
        )
    return out
