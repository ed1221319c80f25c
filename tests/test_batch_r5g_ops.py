"""Batch r5-G: local Moran's I (LISA)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _lisa_replay(cells):
    n = len(cells)
    s = sum(x for _, _, x in cells)
    D = {(cx, cy): n * x - s for cx, cy, x in cells}
    ss = sum(d * d for d in D.values())
    out = {}
    for (cx, cy), d in D.items():
        nbs = [
            D[(cx + dx, cy + dy)]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0) and (cx + dx, cy + dy) in D
        ]
        nbsum = sum(nbs)
        num = d * nbsum
        li = (n * num) / ss if ss > 0 else None
        if not nbs or d == 0 or nbsum == 0:
            quad = None
        elif d > 0 and nbsum > 0:
            quad = "HH"
        elif d < 0 and nbsum < 0:
            quad = "LL"
        elif d > 0:
            quad = "HL"
        else:
            quad = "LH"
        out[(cx, cy)] = (len(nbs), num, li, quad)
    return out


def test_local_morans_i_hotspot_grid(spark):
    from osm_pbf_spark.operators.spatialstats import local_morans_i

    # 8x8 grid, a 2x2 hot block in one corner, noise elsewhere
    cells = [
        (x, y, 100 if (x < 2 and y < 2) else (x * 3 + y * 7) % 5)
        for x in range(8)
        for y in range(8)
    ]
    df = spark.createDataFrame(cells, "cx long, cy long, x long")
    got = {
        (r.cx, r.cy): (r.n_nb, r.li_num, r.local_i, r.quadrant)
        for r in local_morans_i(df).collect()
    }
    assert got == _lisa_replay(cells)
    # the hot corner is an HH cluster and the strongest local value
    assert got[(0, 0)][3] == "HH"
    assert got[(0, 0)][2] == max(v[2] for v in got.values() if v[2] is not None)


def test_local_morans_i_sums_to_global(spark):
    """Anselin's identity: sum of I_i equals n * global Moran
    numerator / SS — checked against the repo's own global operator."""
    from osm_pbf_spark.operators.spatialstats import local_morans_i, morans_i

    cells = [(x, y, (x * 13 + y * 29) % 17) for x in range(7) for y in range(7)]
    df = spark.createDataFrame(cells, "cx long, cy long, x long")
    loc = local_morans_i(df).agg(F.sum("local_i")).first()[0]
    (g,) = morans_i(df).collect()
    # sum(I_i) = n * sum_pairs(Da*Db)/SS; global = n*num/(w*SS)
    # -> sum(I_i) == global * w_pairs
    assert abs(loc - g.moran_i * g.w_pairs) < 1e-6
