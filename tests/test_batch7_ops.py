"""Batch-7 operators: morans_i, retention_cohorts (unpivot is a plain
DataFrame op covered by the driver gate)."""

from __future__ import annotations

import datetime


def _cells_df(spark, cells):
    return spark.createDataFrame(cells, "cx long, cy long, x long")


def _brute_morans(cells):
    n = len(cells)
    s = sum(x for (_, _, x) in cells)
    dev = {(cx, cy): n * x - s for (cx, cy, x) in cells}
    w = num = 0
    for (ax, ay), da in dev.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                db = dev.get((ax + dx, ay + dy))
                if db is not None:
                    w += 1
                    num += da * db
    ss = sum(d * d for d in dev.values())
    return n, w, (n * num) / (w * ss)


def test_morans_i_clustered_vs_dispersed(spark):
    from osm_pbf_spark.operators.spatialstats import morans_i

    # two tight high-value blobs far apart -> strong positive I
    clustered = [(0, 0, 9), (0, 1, 8), (1, 0, 9), (10, 10, 1), (10, 11, 1), (11, 10, 1)]
    # checkerboard -> negative I
    board = [(i, j, (i + j) % 2 * 8 + 1) for i in range(4) for j in range(4)]
    for cells in (clustered, board):
        r = morans_i(_cells_df(spark, cells)).collect()[0]
        n, w, want = _brute_morans(cells)
        assert (r.n_cells, r.w_pairs) == (n, w)
        assert r.moran_i == want
    assert morans_i(_cells_df(spark, clustered)).collect()[0].moran_i > 0
    assert morans_i(_cells_df(spark, board)).collect()[0].moran_i < 0


def test_morans_i_pseudorandom_grid(spark):
    from osm_pbf_spark.operators.spatialstats import morans_i

    cells = [((k * 7) % 9, (k * 11) % 9, (k * 13) % 5 + 1) for k in range(60)]
    # dedupe cells (grid_cell_counts would have aggregated)
    seen = {}
    for cx, cy, x in cells:
        seen[(cx, cy)] = x
    cells = [(cx, cy, x) for (cx, cy), x in seen.items()]
    r = morans_i(_cells_df(spark, cells)).collect()[0]
    n, w, want = _brute_morans(cells)
    assert (r.n_cells, r.w_pairs, r.moran_i) == (n, w, want)


def test_retention_cohorts_hand_built(spark):
    from osm_pbf_spark.operators.temporal import retention_cohorts

    ts = datetime.datetime
    rows = [
        # user 1: first week of Jan 2024 (Mon Jan 1), active weeks 0, 1, 3
        (1, ts(2024, 1, 3, 10)),
        (1, ts(2024, 1, 8, 9)),
        (1, ts(2024, 1, 22, 23)),
        # user 2: same cohort, only week 0 (two events, one distinct user-week)
        (2, ts(2024, 1, 1, 0)),
        (2, ts(2024, 1, 7, 23)),
        # user 3: cohort of Jan 8, active weeks 0 and 1
        (3, ts(2024, 1, 10, 12)),
        (3, ts(2024, 1, 15, 12)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_week.isoformat(), r.week_n): r.n_users
        for r in retention_cohorts(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }
