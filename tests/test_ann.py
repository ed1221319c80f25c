"""IVF coarse-quantized ANN (operators.ann.cosine_topk_ivf).

The hybrid driver oracle (q_ivf_topk) pins the end-to-end result; these
tests pin the properties the oracle can't see per-run: recall against
the exact brute-force path, exactness of every emitted cosine, run-to-
run determinism (the whole scheme is RNG-free by construction), and the
k-means kernel's edge cases.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_pbf_spark.operators.ann import _kmeans_centroids, cosine_topk, cosine_topk_ivf


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_ivf_recall_and_exact_cosines_vs_brute(spark, emb):
    q = emb.filter(F.col("vec_id") < 30)
    exact = cosine_topk(q, emb, k=3).collect()
    approx = cosine_topk_ivf(q, emb, k=3, n_clusters=16, nprobe=8).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.7, recall  # measured 0.80 at nprobe=8/16 lists
    # precision is exact: any returned (q, n) cosine is bit-identical
    # to the brute-force fold for that pair
    exact_cos = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert r["cos"] == exact_cos[key]


def test_ivf_deterministic_across_runs(spark, emb):
    q = emb.filter(F.col("vec_id") < 20)
    a = sorted(map(tuple, cosine_topk_ivf(q, emb, k=3, n_clusters=8, nprobe=3).collect()))
    b = sorted(map(tuple, cosine_topk_ivf(q, emb, k=3, n_clusters=8, nprobe=3).collect()))
    assert a == b


def test_kmeans_kernel_edges():
    rng = np.random.default_rng(3)
    m = rng.normal(size=(40, 8))
    cent = _kmeans_centroids(m, 4)
    assert cent.shape == (4, 8)
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)
    # deterministic
    assert np.array_equal(cent, _kmeans_centroids(m.copy(), 4))
    # more clusters than rows clamps
    assert _kmeans_centroids(m[:2], 5).shape == (2, 8)
    # zero rows in the sample don't produce NaNs
    z = m.copy()
    z[0] = 0.0
    assert np.isfinite(_kmeans_centroids(z, 3)).all()
    with pytest.raises(ValueError):
        _kmeans_centroids(np.empty((0, 8)), 2)
