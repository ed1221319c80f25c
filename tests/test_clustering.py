"""Grid DBSCAN (operators/clustering.py) vs a brute-force union-find
reference, plus structural properties."""

from __future__ import annotations

import pytest


def ref_dbscan(pts: list[tuple[int, float, float]], eps: float, min_pts: int):
    """Independent O(n^2) DBSCAN with the same min tie-breaks."""
    nbrs = {
        i: [j for (j, xj, yj) in pts if (xi - xj) ** 2 + (yi - yj) ** 2 <= eps * eps]
        for (i, xi, yi) in pts
    }
    cores = {i for (i, _, _) in pts if len(nbrs[i]) >= min_pts}
    parent = {i: i for i in cores}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in cores:
        for j in nbrs[i]:
            if j in cores and j != i:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)  # root stays the min
    label = {i: find(i) for i in cores}
    out = {}
    for (i, _, _) in pts:
        if i in cores:
            out[i] = (label[i], True)
        else:
            cands = [label[j] for j in nbrs[i] if j in cores and j != i]
            out[i] = (min(cands) if cands else -1, False)
    return out


def _points_df(spark, pts):
    return spark.createDataFrame(
        [(int(i), float(x), float(y)) for (i, x, y) in pts],
        "id long, x double, y double",
    )


def _run(spark, pts, eps, min_pts):
    from osm_pbf_spark.operators.clustering import dbscan

    rows = dbscan(_points_df(spark, pts), eps=eps, min_pts=min_pts).collect()
    return {r.id: (r.cluster, r.is_core) for r in rows}


def test_dbscan_blobs_border_noise(spark):
    # blob A (6 tight points), blob B (5), a border point hanging off A,
    # and an isolated noise point
    pts = (
        [(i, 0.0 + 0.1 * i, 0.0) for i in range(6)]
        + [(10 + i, 50.0, 50.0 + 0.1 * i) for i in range(5)]
        + [(99, 1.4, 0.0)]  # reaches only 2 of A's points -> border, not core
        + [(100, 200.0, 200.0)]  # noise
    )
    got = _run(spark, pts, eps=1.0, min_pts=4)
    assert got == ref_dbscan(pts, 1.0, 4)
    assert got[100] == (-1, False)
    assert got[99][1] is False and got[99][0] == 0  # border of cluster 0
    assert {got[i][0] for i in range(6)} == {0}
    assert {got[10 + i][0] for i in range(5)} == {10}


def test_dbscan_matches_bruteforce_pseudorandom(spark):
    # integer-lattice coordinates -> no float boundary ambiguity
    pts = [
        (k, float((k * 7919) % 40), float((k * 104729) % 40)) for k in range(250)
    ]
    for eps, mp in [(2.0, 4), (3.0, 6), (1.0, 2)]:
        assert _run(spark, pts, eps, mp) == ref_dbscan(pts, eps, mp)


def test_dbscan_cell_boundary_pairs(spark):
    # neighbors straddling grid-cell boundaries must still pair up
    pts = [(1, 0.99, 0.0), (2, 1.01, 0.0), (3, 0.99, 0.99), (4, 1.01, 1.01)]
    got = _run(spark, pts, eps=1.0, min_pts=2)
    assert got == ref_dbscan(pts, 1.0, 2)
    assert got[1][0] == got[2][0] != -1


def test_dbscan_validates_params(spark):
    df = _points_df(spark, [(1, 0.0, 0.0)])
    from osm_pbf_spark.operators.clustering import dbscan

    with pytest.raises(ValueError):
        dbscan(df, eps=0.0, min_pts=2)
    with pytest.raises(ValueError):
        dbscan(df, eps=1.0, min_pts=0)
