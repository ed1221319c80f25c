"""IVF-PQ ANN (ann.py ivfpq_topk) and the mergeable fixed-range
histogram sketch (sketch.py histogram_fixed / binned_quantiles)."""

from __future__ import annotations

import numpy as np

from tests.test_pq_bloomjoin import _clustered, _emb_df


def test_ivfpq_deterministic_and_recall(spark):
    from osm_pbf_spark.operators.ann import ivfpq_topk

    mat = _clustered(n_per=40, k=5)
    df = _emb_df(spark, mat)
    a = sorted(
        map(tuple, ivfpq_topk(df.filter("vec_id < 15"), df, k=5, n_lists=8, nprobe=3).collect())
    )
    b = sorted(
        map(
            tuple,
            ivfpq_topk(
                df.repartition(7).filter("vec_id < 15"), df, k=5, n_lists=8, nprobe=3
            ).collect(),
        )
    )
    assert a == b  # partitioning/run invariant, bit-exact
    # recall vs exact L2 top-5: residual codes inside probed lists
    m64 = mat.astype(np.float64)
    by_q = {}
    for qid, nid, rank, adc in a:
        by_q.setdefault(qid, set()).add(nid)
    hits = total = 0
    for q in range(15):
        d = ((m64 - m64[q]) ** 2).sum(axis=1)
        d[q] = np.inf
        true5 = set(np.argsort(d, kind="stable")[:5].tolist())
        hits += len(true5 & by_q[q])
        total += 5
    assert hits / total >= 0.5  # nprobe=3/8 lists; boundary loss expected


def test_ivfpq_probing_more_lists_improves_candidates(spark):
    from osm_pbf_spark.operators.ann import ivfpq_topk

    mat = _clustered(n_per=30, k=4)
    df = _emb_df(spark, mat)
    n1 = ivfpq_topk(df.filter("vec_id < 10"), df, k=100, n_lists=8, nprobe=1).count()
    n8 = ivfpq_topk(df.filter("vec_id < 10"), df, k=100, n_lists=8, nprobe=8).count()
    assert n8 >= n1  # full probing sees at least as many candidates
    assert n8 == 10 * 100  # nprobe = all lists -> every candidate scanned


def test_histogram_fixed_matches_brute_and_merges(spark):
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.sketch import histogram_fixed

    rng = np.random.RandomState(5)
    vals = [int(v) for v in rng.randint(-50, 1050, 3000)]  # incl. clamp edges
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v bigint")
    lo, hi, nb = 0, 1000, 16
    got = {
        r.hist_bin: r.hist_count
        for r in histogram_fixed(df, "v", ["grp"], lo, hi, nb).collect()
    }
    want = {}
    for v in vals:
        b = max(0, min(nb - 1, (v - lo) * nb // (hi - lo) if v >= lo else 0))
        want[b] = want.get(b, 0) + 1
    assert got == want
    # mergeable: shard histograms SUM into the full histogram
    d1 = spark.createDataFrame([("g", v) for v in vals[:1500]], "grp string, v bigint")
    d2 = spark.createDataFrame([("g", v) for v in vals[1500:]], "grp string, v bigint")
    merged = (
        histogram_fixed(d1, "v", ["grp"], lo, hi, nb)
        .union(histogram_fixed(d2, "v", ["grp"], lo, hi, nb))
        .groupBy("grp", "hist_bin")
        .agg(F.sum("hist_count").alias("hist_count"))
    )
    mm = {r.hist_bin: r.hist_count for r in merged.collect()}
    assert mm == want


def test_binned_quantiles_bracket_true_quantiles(spark):
    from osm_pbf_spark.operators.sketch import binned_quantiles

    rng = np.random.RandomState(9)
    vals = sorted(int(v) for v in rng.randint(0, 10_000, 5000))
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v bigint")
    lo, hi, nb = 0, 10_000, 100
    got = {
        (r.q_num, r.q_den): r.q_est
        for r in binned_quantiles(df, "v", ["grp"], lo, hi, nb).collect()
    }
    width = (hi - lo) // nb
    for (num, den), est in got.items():
        true_q = vals[(num * len(vals) + den - 1) // den - 1]  # ceil(q*n)-th
        assert est <= true_q < est + 2 * width  # bin-resolution bracket


def test_histogram_rejects_bad_range(spark):
    import pytest

    from osm_pbf_spark.operators.sketch import histogram_fixed

    df = spark.createDataFrame([("g", 1)], "grp string, v bigint")
    with pytest.raises(ValueError):
        histogram_fixed(df, "v", ["grp"], 10, 10, 4)
    with pytest.raises(ValueError):
        histogram_fixed(df, "v", ["grp"], 0, 10, 0)
