"""kNN ring expansion vs O(n^2) brute-force oracle — exact IDs + ranks."""

from __future__ import annotations

import numpy as np
import pytest

from osm_pbf_spark.operators.knn import knn_join
from tests import oracle_geo


def point_set(n=400, seed=3, clustered=True):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-60, 60, n)
    lon = rng.uniform(-170, 170, n)
    if clustered:
        lat[: n // 3] = rng.uniform(47.0, 48.0, n // 3)
        lon[: n // 3] = rng.uniform(7.0, 8.0, n // 3)
    return [(f"d{i}", float(lat[i]), float(lon[i])) for i in range(n)]


@pytest.mark.parametrize("k,metric,level", [
    (1, "haversine", 6),
    (5, "haversine", 6),
    (5, "euclid2_deg", 8),
    (10, "haversine", 10),  # deep level: sparse windows exercise the brute tail
])
def test_knn_self_join_matches_bruteforce(spark, k, metric, level):
    pts = point_set()
    df = spark.createDataFrame(pts, "doc_id string, lat double, lon double")
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in knn_join(spark, df, df, k=k, level=level, metric=metric).collect()
    }
    want = set(oracle_geo.knn_bruteforce(pts, pts, k=k, metric=metric))
    assert got == want


def test_knn_query_vs_candidates(spark):
    cands = point_set(300, seed=5)
    queries = point_set(40, seed=6)
    qdf = spark.createDataFrame(queries, "doc_id string, lat double, lon double")
    cdf = spark.createDataFrame(cands, "doc_id string, lat double, lon double")
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in knn_join(
            spark, qdf, cdf, k=3, level=7, exclude_self=False
        ).collect()
    }
    want = set(oracle_geo.knn_bruteforce(queries, cands, k=3, exclude_self=False))
    assert got == want


def test_knn_k_larger_than_candidates(spark):
    pts = point_set(5, seed=9, clustered=False)
    df = spark.createDataFrame(pts, "doc_id string, lat double, lon double")
    got = knn_join(spark, df, df, k=10, level=5).collect()
    # every query gets all 4 other points
    assert len(got) == 5 * 4
