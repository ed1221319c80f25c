"""Douglas-Peucker polyline simplification — the vector-tile pipeline's
generalization step (SURVEY.md §2.3 extension, r3).

Per-line work is inherently sequential (the split point of each span
depends on the previous split), so this is the documented Pandas-UDF
case: one Arrow-batched ``pandas_udf`` over the line's coordinate
arrays. The plan stays a shuffle-free map stage — each line is
simplified where it already lives, lines never interact, and the UDF
is O(n log n) typical / O(n^2) worst per line. At 10^12 documents this
parallelizes perfectly; there is no cross-line state.

DETERMINISM CONTRACT (what the VALUES-replay oracle relies on): the
engine kernel (numpy) and the oracle (scalar Python) evaluate the SAME
IEEE expressions in the SAME order — `cross = dx*(y0-yp) - dy*(x0-xp)`,
keep iff `cross*cross > tol2*(dx*dx+dy*dy)` (degenerate anchors fall
back to squared euclid > tol2), farthest point = FIRST index attaining
the max (np.argmax tie-break == scalar strict-> loop). numpy float64
elementwise ops are bitwise-identical to Python float ops, so both
derivations agree exactly; they share no code.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["douglas_peucker_np", "simplify_lines"]


def douglas_peucker_np(lats: np.ndarray, lons: np.ndarray, tol: float) -> np.ndarray:
    """Boolean keep-mask for one polyline (iterative, explicit stack).
    Planar metric in (lon=x, lat=y) degree space; `tol` in degrees."""
    n = len(lats)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    x = np.asarray(lons, dtype=np.float64)
    y = np.asarray(lats, dtype=np.float64)
    tol2 = float(tol) * float(tol)
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 - i0 < 2:
            continue
        x0, y0, x1, y1 = x[i0], y[i0], x[i1], y[i1]
        dx, dy = x1 - x0, y1 - y0
        seg2 = dx * dx + dy * dy
        xs, ys = x[i0 + 1 : i1], y[i0 + 1 : i1]
        if seg2 == 0.0:
            d2 = (xs - x0) * (xs - x0) + (ys - y0) * (ys - y0)
            thr = tol2
        else:
            cross = dx * (y0 - ys) - dy * (x0 - xs)
            d2 = cross * cross
            thr = tol2 * seg2
        j = int(np.argmax(d2))  # FIRST max — oracle tie-break must match
        if d2[j] > thr:
            k = i0 + 1 + j
            keep[k] = True
            stack.append((k, i1))
            stack.append((i0, k))
    return keep


def simplify_lines(
    lines: DataFrame,
    tolerance_deg: float,
    id_col: str = "line_id",
    lats_col: str = "lats",
    lons_col: str = "lons",
) -> DataFrame:
    """Simplify every polyline; returns (id_col, lats, lons, n_in,
    n_out) with the simplified coordinate arrays. Endpoints are always
    kept; a 0/1/2-point line passes through unchanged."""
    tol = float(tolerance_deg)

    @F.pandas_udf("lats array<double>, lons array<double>, n_in int, n_out int")
    def _simp(lats_s: pd.Series, lons_s: pd.Series) -> pd.DataFrame:
        out_la, out_lo, n_in, n_out = [], [], [], []
        for la, lo in zip(lats_s, lons_s):
            a = np.asarray(la, dtype=np.float64)
            b = np.asarray(lo, dtype=np.float64)
            m = douglas_peucker_np(a, b, tol)
            out_la.append(a[m])
            out_lo.append(b[m])
            n_in.append(len(a))
            n_out.append(int(m.sum()))
        return pd.DataFrame(
            {"lats": out_la, "lons": out_lo,
             "n_in": np.asarray(n_in, np.int32), "n_out": np.asarray(n_out, np.int32)}
        )

    s = _simp(F.col(lats_col), F.col(lons_col))
    return lines.withColumn("_s", s).select(
        F.col(id_col),
        F.col("_s.lats").alias("lats"),
        F.col("_s.lons").alias("lons"),
        F.col("_s.n_in").alias("n_in"),
        F.col("_s.n_out").alias("n_out"),
    )


def chaikin_smooth(
    vertices: DataFrame,
    iters: int = 1,
    line_col: str = "line_id",
    pos_col: str = "pos",
    x_col: str = "ix",
    y_col: str = "iy",
) -> DataFrame:
    """Chaikin corner-cutting smoothing of open polylines — the map-
    generalization counterpart of Douglas-Peucker (DP removes points;
    Chaikin rounds corners for rendering). Each iteration replaces
    every segment (P, Q) by the quarter points 3/4·P + 1/4·Q and
    1/4·P + 3/4·Q, keeping the two endpoints (open-polyline
    convention), converging toward a quadratic B-spline.

    EXACT-INTEGER spec: input coordinates are integers (quantize with
    the hull/measures grid convention first); every iteration
    multiplies the coordinate UNIT by 4 — the quarter points are
    ``3*P + Q`` and ``P + 3*Q`` in the finer unit, endpoints scale by
    4 — so after ``iters`` rounds coordinates are exact int64 in
    units of ``4^iters`` (returned as ``scale_pow4``), with NO
    rounding anywhere: bit-identical in any engine, gate-hashable.
    ``iters <= 6`` keeps 4^6 * |coord| in range for grid coords.

    Returns ``(line_id, pos, ix, iy, scale_pow4)`` — each pass maps an
    n-vertex line to 2n vertices (P0, Q0, R0, Q1, R1, ..., P_{n-1}),
    pos renumbered from 0; single-vertex lines pass through scaled.

    Plan: per iteration ONE per-line window pair (lead + row_number
    share the line sort) and a 2-point Generate — no Python, no
    driver loop state; ``iters`` is plan depth, not driver actions.
    """
    if not 1 <= iters <= 6:
        raise ValueError(f"iters must be in [1, 6], got {iters}")
    from pyspark.sql import Window

    cur = vertices.select(
        F.col(line_col).alias("line_id"),
        F.col(pos_col).cast("bigint").alias("pos"),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    )
    for _ in range(iters):
        w = Window.partitionBy("line_id").orderBy("pos")
        seg = cur.select(
            "line_id",
            "pos",
            "x",
            "y",
            F.lead("x").over(w).alias("x2"),
            F.lead("y").over(w).alias("y2"),
            F.row_number().over(w).alias("_rn"),
            F.count(F.lit(1)).over(Window.partitionBy("line_id")).alias("_n"),
        )
        # interior quarter points from each segment + scaled endpoints
        pts = seg.select(
            "line_id",
            F.explode(
                F.when(
                    (F.col("_rn") == 1) & F.col("x2").isNotNull(),
                    # first vertex: endpoint + its segment's Q/R
                    F.array(
                        F.struct(
                            F.col("pos").alias("op"),
                            F.lit(0).alias("sub"),
                            (F.col("x") * 4).alias("nx"),
                            (F.col("y") * 4).alias("ny"),
                        ),
                        F.struct(
                            F.col("pos").alias("op"),
                            F.lit(1).alias("sub"),
                            (F.col("x") * 3 + F.col("x2")).alias("nx"),
                            (F.col("y") * 3 + F.col("y2")).alias("ny"),
                        ),
                        F.struct(
                            F.col("pos").alias("op"),
                            F.lit(2).alias("sub"),
                            (F.col("x") + F.col("x2") * 3).alias("nx"),
                            (F.col("y") + F.col("y2") * 3).alias("ny"),
                        ),
                    ),
                )
                .when(
                    F.col("x2").isNotNull(),  # interior segment: Q and R
                    F.array(
                        F.struct(
                            F.col("pos").alias("op"),
                            F.lit(1).alias("sub"),
                            (F.col("x") * 3 + F.col("x2")).alias("nx"),
                            (F.col("y") * 3 + F.col("y2")).alias("ny"),
                        ),
                        F.struct(
                            F.col("pos").alias("op"),
                            F.lit(2).alias("sub"),
                            (F.col("x") + F.col("x2") * 3).alias("nx"),
                            (F.col("y") + F.col("y2") * 3).alias("ny"),
                        ),
                    ),
                )
                .otherwise(  # last vertex: endpoint only
                    F.array(
                        F.struct(
                            F.col("pos").alias("op"),
                            F.lit(0).alias("sub"),
                            (F.col("x") * 4).alias("nx"),
                            (F.col("y") * 4).alias("ny"),
                        )
                    )
                )
            ).alias("_p"),
        )
        w2 = Window.partitionBy("line_id").orderBy(F.col("_p.op"), F.col("_p.sub"))
        cur = pts.select(
            "line_id",
            (F.row_number().over(w2) - 1).cast("bigint").alias("pos"),
            F.col("_p.nx").alias("x"),
            F.col("_p.ny").alias("y"),
        )
    return cur.select(
        "line_id",
        "pos",
        F.col("x").alias("ix"),
        F.col("y").alias("iy"),
        F.lit(iters).alias("scale_pow4"),
    )


def visvalingam_py(
    ix: list[int], iy: list[int], min_area2: int
) -> list[int]:
    """NAIVE O(n²) scalar replay of the Visvalingam spec (the oracle
    formulation — the engine kernel uses a lazy heap): repeatedly
    remove the interior point with the smallest (doubled area, index)
    while that area is below ``min_area2``. Returns kept indices."""
    n = len(ix)
    if n <= 2:
        return list(range(n))
    alive = list(range(n))

    def a2(k: int) -> int:
        p, i, q = alive[k - 1], alive[k], alive[k + 1]
        return abs(
            (ix[p] - ix[i]) * (iy[q] - iy[i])
            - (ix[q] - ix[i]) * (iy[p] - iy[i])
        )

    while len(alive) > 2:
        best = None
        for k in range(1, len(alive) - 1):
            key = (a2(k), alive[k])
            if best is None or key < best[0]:
                best = (key, k)
        if best[0][0] >= min_area2:
            break
        alive.pop(best[1])
    return alive


def visvalingam_simplify(
    lines: DataFrame,
    min_area2: int,
    scale: float = 1000.0,
    id_col: str = "line_id",
    lats_col: str = "lats",
    lons_col: str = "lons",
) -> DataFrame:
    """Visvalingam–Whyatt simplification — the area-based alternative
    to :func:`simplify_lines`' Douglas–Peucker (cartography prefers it
    for shape retention: points die in order of the triangle area they
    subtend).

    EXACT-INTEGER spec: coordinates snap to the ``floor(v·scale+0.5)``
    grid (the convex_hull posture), each interior point's effective
    area is the DOUBLED triangle area |cross| — exact int64 — and
    removal order is strictly ascending (area2, point index):
    remove-smallest repeats while area2 < ``min_area2``. Every
    engine reproduces the identical kept set; the oracle replays with
    a naive O(n²) scan (:func:`visvalingam_py`) against the engine's
    lazy-heap kernel. Endpoints always survive.

    Returns (id_col, qlats:array<bigint>, qlons:array<bigint>, n_in,
    n_out) in grid units. Plan: one Arrow-batched pandas UDF, map-only.
    """
    import heapq

    sc = float(scale)
    thr = int(min_area2)

    @F.pandas_udf(
        "qlats array<bigint>, qlons array<bigint>, n_in int, n_out int"
    )
    def _vw(lats_s: pd.Series, lons_s: pd.Series) -> pd.DataFrame:
        out_la, out_lo, n_in, n_out = [], [], [], []
        for la, lo in zip(lats_s, lons_s):
            ix = np.floor(np.asarray(la, np.float64) * sc + 0.5).astype(
                np.int64
            )
            iy = np.floor(np.asarray(lo, np.float64) * sc + 0.5).astype(
                np.int64
            )
            n = len(ix)
            if n <= 2:
                keep = list(range(n))
            else:
                prv = list(range(-1, n - 1))
                nxt = list(range(1, n + 1))
                dead = [False] * n

                def area2(i: int) -> int:
                    p, q = prv[i], nxt[i]
                    return abs(
                        int(ix[p] - ix[i]) * int(iy[q] - iy[i])
                        - int(ix[q] - ix[i]) * int(iy[p] - iy[i])
                    )

                heap = [(area2(i), i) for i in range(1, n - 1)]
                heapq.heapify(heap)
                alive = n
                while heap:
                    a, i = heapq.heappop(heap)
                    if dead[i] or a != area2(i):
                        continue  # stale entry — lazy invalidation
                    if a >= thr:
                        break
                    dead[i] = True
                    alive -= 1
                    p, q = prv[i], nxt[i]
                    nxt[p], prv[q] = q, p
                    for j in (p, q):
                        if 0 < j < n - 1 and not dead[j]:
                            heapq.heappush(heap, (area2(j), j))
                keep = [i for i in range(n) if not dead[i]]
            out_la.append([int(v) for v in ix[keep]])
            out_lo.append([int(v) for v in iy[keep]])
            n_in.append(n)
            n_out.append(len(keep))
        return pd.DataFrame(
            {
                "qlats": out_la,
                "qlons": out_lo,
                "n_in": np.asarray(n_in, np.int32),
                "n_out": np.asarray(n_out, np.int32),
            }
        )

    s = _vw(F.col(lats_col), F.col(lons_col))
    return lines.withColumn("_s", s).select(
        F.col(id_col),
        F.col("_s.qlats").alias("qlats"),
        F.col("_s.qlons").alias("qlons"),
        F.col("_s.n_in").alias("n_in"),
        F.col("_s.n_out").alias("n_out"),
    )
