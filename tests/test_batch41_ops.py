"""Batch-41: kendall_tau, binseg_split, hull_diameter."""

from __future__ import annotations

import math

from pyspark.sql import functions as F  # noqa: F401


# ------------------------------------------------------------ kendall_tau


def _scalar_tau(pairs):
    n = len(pairs)
    nc = nd = tx = ty = txy = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = pairs[j][0] - pairs[i][0]
            dy = pairs[j][1] - pairs[i][1]
            if dx == 0 and dy == 0:
                txy += 1
            elif dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif (dx > 0) == (dy > 0):
                nc += 1
            else:
                nd += 1
    n0 = n * (n - 1) // 2
    n1, n2 = tx + txy, ty + txy
    tau = None
    if n0 > n1 and n0 > n2:
        tau = float(nc - nd) / (
            math.sqrt(float(n0 - n1)) * math.sqrt(float(n0 - n2))
        )
    return n, nc, nd, n0, n1, n2, tau


def test_kendall_scalar_replay_with_ties(spark):
    from osm_pbf_spark.operators.stats import kendall_tau

    pairs = [((i * 3) % 7, (i * 5) % 9) for i in range(50)]
    df = spark.createDataFrame(pairs, "x long, y long")
    r = kendall_tau(df, "x", "y").collect()[0]
    n, nc, nd, n0, n1, n2, tau = _scalar_tau(pairs)
    assert (r.n, r.nc, r.nd, r.n0, r.n1, r.n2) == (n, nc, nd, n0, n1, n2)
    assert r.tau_b == tau


def test_kendall_monotone_and_reversed(spark):
    from osm_pbf_spark.operators.stats import kendall_tau

    up = [(i, i * 2) for i in range(30)]
    down = [(i, -3 * i) for i in range(30)]
    dfu = spark.createDataFrame(up, "x long, y long")
    dfd = spark.createDataFrame(down, "x long, y long")
    assert kendall_tau(dfu, "x", "y").collect()[0].tau_b == 1.0
    assert kendall_tau(dfd, "x", "y").collect()[0].tau_b == -1.0


def test_kendall_all_tied_side_null(spark):
    from osm_pbf_spark.operators.stats import kendall_tau

    df = spark.createDataFrame([(1, i) for i in range(10)], "x long, y long")
    assert kendall_tau(df, "x", "y").collect()[0].tau_b is None


# ------------------------------------------------------------ binseg_split


def test_binseg_scalar_replay(spark):
    from osm_pbf_spark.operators.stats import binseg_split

    xs = [10, 12, 11, 9, 10, 55, 54, 56, 53, 55, 54]
    rows = [(i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "seq long, x long")
    r = binseg_split(df, "seq", "x").collect()[0]
    n = len(xs)
    st = sum(xs)
    best = None
    for t in range(1, n):
        sl = sum(xs[:t])
        score = float(sl) * sl / t + float(st - sl) * (st - sl) / (n - t)
        key = (score, -(t - 1))
        if best is None or key > best[0]:
            best = (key, t)
    t = best[1]
    assert r.split_seq == t - 1  # split AFTER the last left seq
    assert r.split_seq == 4  # the planted boundary
    assert r.n_left == t and r.n_right == n - t
    assert r.sum_left == sum(xs[:t]) and r.sum_right == st - sum(xs[:t])
    assert r.score == best[0][0]
    assert r.gain == best[0][0] - float(st) * st / n
    assert r.gain > 0


def test_binseg_flat_series_zero_gain(spark):
    from osm_pbf_spark.operators.stats import binseg_split

    df = spark.createDataFrame(
        [(i, 7) for i in range(20)], "seq long, x long"
    )
    r = binseg_split(df, "seq", "x").collect()[0]
    assert r.gain == 0.0
    assert r.split_seq == 0  # tie -> smallest split seq


def test_binseg_grouped(spark):
    from osm_pbf_spark.operators.stats import binseg_split

    rows = [("a", i, 5 if i < 10 else 50) for i in range(20)] + [
        ("b", i, 100 if i < 4 else 2) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, seq long, x long")
    got = {r.g: r for r in binseg_split(df, "seq", "x", ["g"]).collect()}
    assert got["a"].split_seq == 9 and got["b"].split_seq == 3


# ---------------------------------------------------------- hull_diameter


def test_hull_diameter_square(spark):
    from osm_pbf_spark.operators.hull import convex_hull, hull_diameter

    # unit square (scaled): diameter = the diagonal, smallest pair wins
    pts = [(1, 0.0, 0.0), (1, 0.0, 1.0), (1, 1.0, 0.0), (1, 1.0, 1.0),
           (1, 0.5, 0.5)]  # interior point must not matter
    df = spark.createDataFrame(pts, "group_id long, lat double, lon double")
    r = hull_diameter(convex_hull(df)).collect()[0]
    assert r.n_hull == 4
    assert r.d2_max == 1000**2 + 1000**2
    assert r.diam_grid == math.sqrt(float(r.d2_max))
    # deterministic pair: smallest (x1,y1) among the two diagonals
    assert (r.x1, r.y1, r.x2, r.y2) == (0, 0, 1000, 1000)


def test_hull_diameter_degenerate(spark):
    from osm_pbf_spark.operators.hull import convex_hull, hull_diameter

    df = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 0.0, 0.0), (2, 0.0, 0.002)],
        "group_id long, lat double, lon double",
    )
    got = {r.group_id: r for r in hull_diameter(convex_hull(df)).collect()}
    assert got[1].n_hull == 1 and got[1].d2_max == 0
    assert got[1].x1 is None
    assert got[2].n_hull == 2 and got[2].d2_max == 4  # 2 grid steps in y
