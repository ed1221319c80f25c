"""Batch-48: conformal_threshold, target_encode."""

from __future__ import annotations

import math

import pytest


def test_conformal_scalar_replay(spark):
    from osm_pbf_spark.operators.stats import conformal_threshold

    scores = [(i * 13) % 97 for i in range(200)]
    df = spark.createDataFrame([(s,) for s in scores], "score long")
    r = conformal_threshold(df, "score", 1, 10).collect()[0]
    n = len(scores)
    rank = math.ceil((n + 1) * 9 / 10)
    assert (r.n, r.rank_r) == (n, rank)
    assert r.threshold == sorted(scores)[rank - 1]
    assert r.coverage_target == 0.9
    # empirical guarantee on the calibration set itself
    cov = sum(1 for s in scores if s <= r.threshold) / n
    assert cov >= 0.9


def test_conformal_small_n_null_threshold(spark):
    from osm_pbf_spark.operators.stats import conformal_threshold

    # n = 5, alpha = 1/10: rank = ceil(6*0.9) = 6 > n -> NULL
    df = spark.createDataFrame([(i,) for i in range(5)], "score long")
    r = conformal_threshold(df, "score", 1, 10).collect()[0]
    assert r.rank_r == 6 and r.threshold is None


def test_conformal_rejects_bad_alpha(spark):
    from osm_pbf_spark.operators.stats import conformal_threshold

    df = spark.createDataFrame([(1,)], "score long")
    with pytest.raises(ValueError):
        conformal_threshold(df, "score", 10, 10)


def test_target_encode_scalar_replay(spark):
    from osm_pbf_spark.operators.stats import target_encode

    rows = [("a", 10)] * 30 + [("b", 50)] * 3 + [("c", 100)]
    df = spark.createDataFrame(rows, "cat string, y long")
    got = {r.cat: r for r in target_encode(df, "cat", "y", k=5).collect()}
    n = len(rows)
    sy = sum(y for _, y in rows)
    for cat in ("a", "b", "c"):
        n_c = sum(1 for c, _ in rows if c == cat)
        sy_c = sum(y for c, y in rows if c == cat)
        enc = float(sy_c * n + 5 * sy) / float(n * (n_c + 5))
        r = got[cat]
        assert (r.n_c, r.sum_y) == (n_c, sy_c)
        assert r.enc == enc
    mu = sy / n
    # shrinkage: the singleton category sits closest to the global mean
    assert abs(got["c"].enc - mu) < abs(100 - mu) / 2
    # the big category barely moves from its raw mean
    assert abs(got["a"].enc - 10) < 3


def test_target_encode_k0_is_raw_mean(spark):
    from osm_pbf_spark.operators.stats import target_encode

    df = spark.createDataFrame(
        [("a", 4), ("a", 6), ("b", 10)], "cat string, y long"
    )
    got = {r.cat: r.enc for r in target_encode(df, "cat", "y", k=0).collect()}
    assert got["a"] == 5.0 and got["b"] == 10.0
