"""Batch-33 operators: logreg_train/predict, l_diversity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _logreg_py(rows, d, iters, lr_num, lr_den, w0=None):
    w = list(w0) if w0 else [0] * d
    n = len(rows)
    for _ in range(iters):
        G = [0] * d
        for r in rows:
            xs, y = r[:d], r[d]
            dot = sum(w[j] * xs[j] for j in range(d))
            z = float(dot) / 1e6
            try:
                ez = math.exp(-z)
            except OverflowError:
                ez = float("inf")
            p = 1.0 / (1.0 + ez)
            diff = (p - float(y)) * 1e6
            s_q = (
                int(math.floor(diff + 0.5))
                if diff >= 0
                else -int(math.floor(-diff + 0.5))
            )
            for j in range(d):
                G[j] += s_q * xs[j]
        for j in range(d):
            w[j] = w[j] - (lr_num * G[j]) // (lr_den * n)
    return w


def test_logreg_matches_scalar_replay_bitwise(spark):
    from osm_pbf_spark.operators.stats import logreg_train

    rows = [
        (1, (i * 7) % 6, (i * 13) % 4, 1 if ((i * 7) % 6) >= 3 else 0)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "one int, a long, b long, y int")
    got = {
        r.feature: r.w_micro
        for r in logreg_train(
            df, ["one", "a", "b"], "y", iters=8, lr=(1, 20)
        ).collect()
    }
    w = _logreg_py(rows, 3, 8, 1, 20)
    assert got == {"one": w[0], "a": w[1], "b": w[2]}


def test_logreg_learns_separable_data_and_predict(spark):
    """On linearly separable data the trained model orders scores
    monotonically, classifies 9/10 feature values after 60 iterations
    (the boundary point converges by ~200 — checked in the scalar
    replay), and logreg_predict's dot is the exact integer."""
    from osm_pbf_spark.operators.stats import logreg_predict, logreg_train

    rows = [(1, x, 1 if x >= 5 else 0) for x in range(10) for _ in range(30)]
    df = spark.createDataFrame(rows, "one int, x long, y int")
    wdf = logreg_train(df, ["one", "x"], "y", iters=60, lr=(1, 2))
    w = {r.feature: r.w_micro for r in wdf.collect()}
    assert w["x"] > 0  # higher x -> higher score
    scored = logreg_predict(df, ["one", "x"], [w["one"], w["x"]]).collect()
    wrong = 0
    for r in scored:
        assert r.dot == w["one"] + w["x"] * r.x
        pred = 1 if r.score_ppm >= 500_000 else 0
        wrong += pred != r.y
    assert wrong <= len(rows) // 10  # only the boundary value may miss
    with pytest.raises(ValueError):
        logreg_predict(df, ["one", "x"], [1])


def test_logreg_validation_and_guard(spark):
    from osm_pbf_spark.operators.stats import logreg_train

    df = spark.createDataFrame([(1, 2)], "one int, y int")
    with pytest.raises(Exception, match="must be 0/1"):
        logreg_train(df, ["one"], "y", iters=1)
    ok = spark.createDataFrame([(1, 1)], "one int, y int")
    with pytest.raises(ValueError):
        logreg_train(ok, [], "y")
    with pytest.raises(ValueError):
        logreg_train(ok, ["one"], "y", iters=0)
    with pytest.raises(ValueError):
        logreg_train(ok, ["one"], "y", w0_micro=[1, 2])


def test_l_diversity_flags_homogeneous_classes(spark):
    from osm_pbf_spark.operators.dq import l_diversity

    rows = (
        [("94110", "flu")] * 5  # homogeneous: 1 distinct sensitive
        + [("94110x", "flu"), ("94110x", "cold"), ("94110x", "covid")]
        + [("10001", "flu"), ("10001", "cold")]  # 2 distinct < 3
    )
    df = spark.createDataFrame(rows, "zip string, dx string")
    got = sorted(
        (r.zip, r.n, r.n_distinct)
        for r in l_diversity(df, ["zip"], "dx", l=3).collect()
    )
    assert got == [("10001", 2, 2), ("94110", 5, 1)]
    with pytest.raises(ValueError):
        l_diversity(df, [], "dx", 3)
    with pytest.raises(ValueError):
        l_diversity(df, ["zip"], "dx", 1)
