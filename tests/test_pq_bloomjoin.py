"""Product-quantization ANN (ann.py pq_*) and the Bloom runtime-filter
join reduction (sketch.py bloom_semi_reduce)."""

from __future__ import annotations

import math

import numpy as np


def _emb_df(spark, mat, start_id=0):
    rows = [(start_id + i, [float(x) for x in v]) for i, v in enumerate(mat)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _clustered(n_per=40, k=5, d=16, seed=3):
    rng = np.random.RandomState(seed)
    cents = rng.rand(k, d) * 10
    out = []
    for c in cents:
        out.append(c + rng.rand(n_per, d) * 0.5)
    return np.concatenate(out).astype(np.float32)


def test_pq_encode_deterministic_and_valid(spark):
    from osm_pbf_spark.operators.ann import pq_encode, pq_train

    mat = _clustered()
    df = _emb_df(spark, mat)
    book = pq_train(df, m=4, n_codes=8)
    assert book.shape == (4, 8, 4)
    c1 = {r.vec_id: list(r.pq_codes) for r in pq_encode(df, book).collect()}
    c2 = {
        r.vec_id: list(r.pq_codes)
        for r in pq_encode(df.repartition(5), book).collect()
    }
    assert c1 == c2  # partitioning-invariant
    assert all(0 <= c < 8 for cs in c1.values() for c in cs)


def test_pq_topk_matches_pure_python_spec(spark):
    from osm_pbf_spark.operators.ann import _pq_train_mat, pq_encode, pq_topk

    mat = _clustered(n_per=20, k=3)
    df = _emb_df(spark, mat)
    book = _pq_train_mat(
        np.asarray(mat[: len(mat)], dtype=np.float64), 4, 8
    )
    got = pq_topk(
        df.filter("vec_id < 5"), pq_encode(df, book), book, k=3
    ).collect()

    # pure-Python replay of the quantized spec
    scale = float(1 << 20)
    dsub = book.shape[2]

    def d2q(vec, cent, lo):
        s = 0
        for d in range(dsub):
            t = float(vec[lo + d]) - float(cent[d])
            s += math.floor(t * t * scale + 0.5)
        return s

    vecs = [[float(x) for x in v] for v in mat]
    codes = []
    for v in vecs:
        codes.append(
            [
                min(range(8), key=lambda j: (d2q(v, book[s][j], s * dsub), j))
                for s in range(4)
            ]
        )
    want = {}
    for qi in range(5):
        scored = []
        for ci in range(len(vecs)):
            if ci == qi:
                continue
            adc = sum(d2q(vecs[qi], book[s][codes[ci][s]], s * dsub) for s in range(4))
            scored.append((adc, ci))
        scored.sort()
        for rank, (adc, nid) in enumerate(scored[:3], start=1):
            want[(qi, nid)] = (rank, adc)
    got_map = {(r.query_id, r.neighbor_id): (r.rank, r.adc_d2q) for r in got}
    assert got_map == want  # bit-exact integer distances


def test_pq_topk_recall_on_clustered_data(spark):
    from osm_pbf_spark.operators.ann import pq_encode, pq_topk, pq_train

    mat = _clustered(n_per=40, k=5)
    df = _emb_df(spark, mat)
    book = pq_train(df, m=8, n_codes=32)
    got = pq_topk(df.filter("vec_id < 20"), pq_encode(df, book), book, k=5).collect()
    # exact L2 top-5 per query
    m64 = mat.astype(np.float64)
    hits = total = 0
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    for q in range(20):
        d = ((m64 - m64[q]) ** 2).sum(axis=1)
        d[q] = np.inf
        true5 = set(np.argsort(d, kind="stable")[:5].tolist())
        hits += len(true5 & by_q[q])
        total += 5
    assert hits / total >= 0.65  # measured 0.72 at 8x32 on this corpus


def test_pq_train_rejects_bad_dim(spark):
    import pytest

    from osm_pbf_spark.operators.ann import pq_train

    df = _emb_df(spark, np.random.RandomState(0).rand(10, 15).astype(np.float32))
    with pytest.raises(ValueError):
        pq_train(df, m=4, n_codes=4)


def test_bloom_semi_reduce_lossless_and_reducing(spark):
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.sketch import bloom_semi_reduce

    probe = spark.range(0, 20000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    build = spark.range(0, 20000, 131).select(F.col("id").alias("bk"))
    reduced = bloom_semi_reduce(probe, build, "k", "bk", n_words=256, depth=3)
    n_red = reduced.count()
    true_matches = probe.join(build, probe["k"] == build["bk"]).count()
    assert true_matches == 153
    # lossless: the real join over the reduced side = the real join
    j1 = sorted(
        tuple(r)
        for r in reduced.join(build, F.col("k") == F.col("bk")).select("k", "v").collect()
    )
    j2 = sorted(
        tuple(r)
        for r in probe.join(build, F.col("k") == F.col("bk")).select("k", "v").collect()
    )
    assert j1 == j2
    # and it actually filtered: way fewer rows than the probe side
    assert true_matches <= n_red < 2000  # 153 keys; FP rate well under 10%


def test_bloom_semi_reduce_no_probe_shuffle(spark):
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.sketch import bloom_semi_reduce

    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    build = spark.range(0, 100).select(F.col("id").alias("bk"))
    reduced = bloom_semi_reduce(probe, build, "k", "bk", n_words=64, depth=2)
    plan = reduced._jdf.queryExecution().executedPlan().toString()
    # every join the reducer adds must be a broadcast join — the probe
    # side must NOT be exchanged (only the tiny sketch aggregates are)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
