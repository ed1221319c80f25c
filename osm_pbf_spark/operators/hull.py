"""Per-group convex hull (SURVEY.md §2.3 G-family, r3) — the
footprint/coverage summary of a point group (e.g. all POIs of a
region) as a distributed applyInPandas kernel.

Exactness contract: coordinates are snapped to an integer milli-degree
grid NATIVELY (``floor(v * scale + 0.5)`` — one fixed IEEE expression,
round-half-up) BEFORE the shuffle, so every orientation test in the
hull kernel is exact int64 arithmetic — no epsilon, no cross-engine
float drift. The hull spec: minimal vertex set (collinear edge points
EXCLUDED), counter-clockwise in the (ix, iy) plane, starting at the
lexicographically smallest vertex; degenerate groups yield 1 (point)
or 2 (segment) vertices.

Engine kernel: Andrew monotone chain (numpy int64) per group in one
Arrow batch. The driver-gate oracle replays with a JARVIS MARCH — a
genuinely different algorithm — over the same integer grid, so the
spec, not the implementation, is what's verified.

Plan: one groupBy(group) shuffle of slim (group, ix, iy) int rows;
hull size is O(points-on-hull), so output is tiny. Groups are
independent — parallel across the cluster; a single whale group is
bounded by its distinct grid points (the int snap dedups first).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["convex_hull", "hull_py", "hull_diameter"]

OUT_SCHEMA = T.StructType(
    [
        T.StructField("group_id", T.LongType()),
        T.StructField("hull_pos", T.IntegerType()),
        T.StructField("ix", T.LongType()),
        T.StructField("iy", T.LongType()),
    ]
)


def _chain(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain over unique int points, CCW from lex-min,
    strict turns (collinear excluded)."""
    pts = np.unique(pts, axis=0)  # sorts lexicographically (x, then y)
    n = len(pts)
    if n <= 2:
        return pts

    def half(order: np.ndarray) -> list[int]:
        out: list[int] = []
        for i in order:
            while len(out) >= 2:
                ox, oy = pts[out[-2]]
                ax, ay = pts[out[-1]]
                bx, by = pts[i]
                if (int(ax) - int(ox)) * (int(by) - int(oy)) - (int(ay) - int(oy)) * (
                    int(bx) - int(ox)
                ) <= 0:
                    out.pop()
                else:
                    break
            out.append(int(i))
        return out

    idx = np.arange(n)
    lower = half(idx)
    upper = half(idx[::-1])
    hull = lower[:-1] + upper[:-1]
    return pts[hull]


def _hull_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pts = pdf[["ix", "iy"]].to_numpy(dtype=np.int64)
    hull = _chain(pts)
    return pd.DataFrame(
        {
            "group_id": np.full(len(hull), int(pdf["group_id"].iloc[0]), dtype=np.int64),
            "hull_pos": np.arange(len(hull), dtype=np.int32),
            "ix": hull[:, 0],
            "iy": hull[:, 1],
        }
    )


def convex_hull(
    pts: DataFrame,
    group_col: str = "group_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    scale: float = 1000.0,
) -> DataFrame:
    """(group_id, hull_pos, ix, iy) — CCW minimal hull per group over
    the integer grid ``floor(coord * scale + 0.5)``."""
    slim = pts.select(
        F.col(group_col).alias("group_id"),
        F.floor(F.col(lon_col) * F.lit(float(scale)) + F.lit(0.5)).cast("long").alias("ix"),
        F.floor(F.col(lat_col) * F.lit(float(scale)) + F.lit(0.5)).cast("long").alias("iy"),
    ).dropDuplicates(["group_id", "ix", "iy"])
    return slim.groupBy("group_id").applyInPandas(_hull_group, OUT_SCHEMA)


def hull_py(points: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """INDEPENDENT oracle: Jarvis march (gift wrapping) over int
    points — same spec (CCW from lex-min, collinear excluded, farthest
    chosen along ties), different algorithm from the engine's chain."""
    pts = sorted(set(points))
    if len(pts) <= 2:
        return pts
    start = pts[0]
    hull = [start]
    cur = start
    while True:
        cand = None
        for p in pts:
            if p == cur:
                continue
            if cand is None:
                cand = p
                continue
            cross = (cand[0] - cur[0]) * (p[1] - cur[1]) - (cand[1] - cur[1]) * (
                p[0] - cur[0]
            )
            if cross < 0:
                cand = p  # p is clockwise of cand -> p is more extreme
            elif cross == 0:
                # collinear: keep the farthest
                da = (cand[0] - cur[0]) ** 2 + (cand[1] - cur[1]) ** 2
                db = (p[0] - cur[0]) ** 2 + (p[1] - cur[1]) ** 2
                if db > da:
                    cand = p
        if cand == start:
            break
        hull.append(cand)
        cur = cand
    return hull


def hull_diameter(hull: DataFrame) -> DataFrame:
    """Per-group diameter of a convex hull (the farthest point pair —
    site-spread / coverage-extent metric) from :func:`convex_hull`'s
    output rows ``(group_id, hull_pos, ix, iy)``.

    The diameter of a point set equals the max pairwise distance over
    its HULL vertices, so the quadratic pair scan here is over O(h)
    hull rows, not the raw points (rotating calipers is O(h) but a
    joined h² over tiny h is simpler and exactly replayable). d² is
    exact int64 on the hull's integer grid; the achieving pair is
    deterministic — ties broken by smallest (x1, y1, x2, y2) with the
    pair oriented by hull_pos. Groups with a single hull vertex return
    d2_max = 0 and NULL coordinates.

    Returns (group_id, n_hull, d2_max, diam_grid, x1, y1, x2, y2).
    Plan: one tiny keyed self-join + one ranking window per group.
    """
    from pyspark.sql import Window

    a = hull.select(
        "group_id",
        F.col("hull_pos").alias("_pa"),
        F.col("ix").alias("x1"),
        F.col("iy").alias("y1"),
    )
    b = hull.select(
        "group_id",
        F.col("hull_pos").alias("_pb"),
        F.col("ix").alias("x2"),
        F.col("iy").alias("y2"),
    )
    p = a.join(b, "group_id").where(F.col("_pa") < F.col("_pb"))
    dx = F.col("x2") - F.col("x1")
    dy = F.col("y2") - F.col("y1")
    p = p.select(
        "group_id", "x1", "y1", "x2", "y2", (dx * dx + dy * dy).alias("d2")
    )
    w = Window.partitionBy("group_id").orderBy(
        F.col("d2").desc(),
        F.col("x1").asc(),
        F.col("y1").asc(),
        F.col("x2").asc(),
        F.col("y2").asc(),
    )
    top = p.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    n = hull.groupBy("group_id").agg(F.count(F.lit(1)).alias("n_hull"))
    out = n.join(top.drop("_rn"), "group_id", "left")
    d2 = F.coalesce("d2", F.lit(0)).alias("d2_max")
    return out.select(
        "group_id",
        "n_hull",
        d2,
        F.sqrt(F.coalesce("d2", F.lit(0)).cast("double")).alias("diam_grid"),
        "x1",
        "y1",
        "x2",
        "y2",
    )
