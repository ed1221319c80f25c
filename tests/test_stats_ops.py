"""Exact-integer statistics operators (operators/stats.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest


def _df(spark, pts):
    return spark.createDataFrame(
        [("g", int(x), int(y)) for x, y in pts], "grp string, x bigint, y bigint"
    )


def test_pearson_corr_matches_numpy(spark):
    from osm_pbf_spark.operators.stats import pearson_corr

    rng = np.random.RandomState(3)
    x = rng.randint(0, 100, 400)
    y = 3 * x + rng.randint(-40, 40, 400)
    r = pearson_corr(_df(spark, zip(x, y)), "x", "y", ["grp"]).collect()[0]
    assert r.n == 400
    want = np.corrcoef(x, y)[0, 1]
    assert abs(r.corr - want) < 1e-12
    # perfectly linear -> 1.0 up to one ulp (sqrt(vx)*sqrt(vy) vs
    # sqrt(vx*vy) differ in the last bit even on exact integers)
    r1 = pearson_corr(_df(spark, [(i, 2 * i + 5) for i in range(50)]), "x", "y", ["grp"]).collect()[0]
    assert abs(r1.corr - 1.0) < 1e-12


def test_ols_fit_matches_closed_form(spark):
    from osm_pbf_spark.operators.stats import ols_fit

    pts = [(i, 7 * i + 11) for i in range(30)]  # exact line
    r = ols_fit(_df(spark, pts), "x", "y", ["grp"]).collect()[0]
    assert r.slope == 7.0 and r.intercept == 11.0
    rng = np.random.RandomState(5)
    x = rng.randint(0, 50, 300)
    y = 2 * x + rng.randint(-9, 10, 300)
    r = ols_fit(_df(spark, zip(x, y)), "x", "y", ["grp"]).collect()[0]
    a, b = np.polyfit(x.astype(float), y.astype(float), 1)
    assert abs(r.slope - a) < 1e-9 and abs(r.intercept - b) < 1e-7


def test_zscore_properties_and_partition_invariance(spark):
    from osm_pbf_spark.operators.stats import zscore

    rows = [("a", i, ((i * 17) % 23)) for i in range(200)] + [("a", 999, 1000)]
    df = spark.createDataFrame(rows, "grp string, id bigint, x bigint")
    outs = []
    for parts in (1, 8):
        z = {r.id: r.z for r in zscore(df.repartition(parts), "x", ["grp"]).collect()}
        outs.append(z)
    assert outs[0] == outs[1]  # bit-identical across partitionings
    z = outs[0]
    # the planted outlier dominates
    assert z[999] == max(z.values()) and z[999] > 5
    # z-scores of the group mean-center: sum ~ 0
    assert abs(sum(z.values())) < 1e-9


def test_zscore_no_groups(spark):
    from osm_pbf_spark.operators.stats import zscore

    df = spark.createDataFrame([(i, i % 5) for i in range(20)], "id bigint, x bigint")
    got = zscore(df, "x").collect()
    assert len(got) == 20 and all(math.isfinite(r.z) for r in got)
