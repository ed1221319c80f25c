"""Skew-adaptive kNN (level='auto') stays exact on a hot-cell corpus."""

from __future__ import annotations

import numpy as np

from osm_pbf_spark.operators.knn import knn_join
from tests import oracle_geo


import pytest


@pytest.mark.parametrize("brute_max", [10_000, 0])
def test_auto_level_exact_on_skewed(spark, brute_max):
    rng = np.random.default_rng(17)
    n = 600
    lat = rng.uniform(-60, 60, n)
    lon = rng.uniform(-170, 170, n)
    # hot cell: half the points inside 0.2 deg
    lat[: n // 2] = 52.5 + rng.uniform(-0.1, 0.1, n // 2)
    lon[: n // 2] = 13.4 + rng.uniform(-0.1, 0.1, n // 2)
    pts = [(f"d{i}", float(lat[i]), float(lon[i])) for i in range(n)]
    df = spark.createDataFrame(pts, "doc_id string, lat double, lon double")
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in knn_join(spark, df, df, k=4, level="auto", auto_levels=(6, 12),
                          brute_max_queries=brute_max).collect()
    }
    want = set(oracle_geo.knn_bruteforce(pts, pts, k=4))
    assert got == want


@pytest.mark.parametrize("brute_max", [10_000, 0])
def test_knn_exact_under_heavy_ties(spark, brute_max):
    """Many candidates at IDENTICAL coordinates: every slot at the k-th
    distance is a tie that must be broken by (dist, neighbor_id) — the
    stress case for the brute path's boundary-tie retention."""
    import numpy as np

    rng = np.random.default_rng(23)
    pts = []
    # 30 stacks of 12 identical points + some scatter
    for s in range(30):
        la, lo = float(rng.uniform(-60, 60)), float(rng.uniform(-170, 170))
        for j in range(12):
            pts.append((f"s{s:02d}_{j:02d}", la, lo))
    for i in range(80):
        pts.append((f"r{i:03d}", float(rng.uniform(-60, 60)), float(rng.uniform(-170, 170))))
    df = spark.createDataFrame(pts, "doc_id string, lat double, lon double")
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in knn_join(
            spark, df, df, k=5, level="auto", auto_levels=(6, 12),
            brute_max_queries=brute_max,
        ).collect()
    }
    want = set(oracle_geo.knn_bruteforce(pts, pts, k=5))
    assert got == want
