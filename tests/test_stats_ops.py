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


def test_spearman_unique_ranks_vs_numpy(spark):
    from osm_pbf_spark.operators.stats import spearman_corr

    rng = np.random.RandomState(21)
    x = rng.permutation(300)
    y = (x * 3 + rng.randint(0, 200, 300)) % 500
    rows = [(int(i), int(xv), int(yv)) for i, (xv, yv) in enumerate(zip(x, y))]
    df = spark.createDataFrame(rows, "id bigint, x bigint, y bigint")
    r = spearman_corr(df, "x", "y", tie_cols=["id"]).collect()[0]

    def ranks(a):
        order = np.lexsort((np.arange(len(a)), a))  # (value, id) unique
        rk = np.empty(len(a), dtype=float)
        rk[order] = np.arange(1, len(a) + 1)
        return rk

    want = np.corrcoef(ranks(np.array(x)), ranks(np.array(y)))[0, 1]
    assert abs(r.spearman - want) < 1e-12
    # monotone transform invariance: spearman(x, x^3-ish) == 1
    mono = spark.createDataFrame(
        [(i, i, i * i * i - 5 * i) for i in range(1, 60)], "id bigint, x bigint, y bigint"
    )
    rm = spearman_corr(mono, "x", "y", ["id"]).collect()[0]
    assert abs(rm.spearman - 1.0) < 1e-12


def test_ks_test_vs_brute(spark):
    from osm_pbf_spark.operators.stats import ks_test

    rng = np.random.RandomState(4)
    a = rng.randint(0, 40, 500)
    b = rng.randint(10, 50, 300)  # shifted distribution
    rows = [(int(v), "a") for v in a] + [(int(v), "b") for v in b]
    df = spark.createDataFrame(rows, "v bigint, s string")
    r = ks_test(df, "v", "s").collect()[0]
    assert (r.n_a, r.n_b) == (500, 300)

    vals = sorted(set(a) | set(b))
    want = max(
        abs((a <= v).sum() * 300 - (b <= v).sum() * 500) for v in vals
    ) / (500 * 300)
    assert r.ks_d == want
    # identical samples -> D == 0
    same = spark.createDataFrame(
        [(int(v), s) for v in a for s in ("a", "b")], "v bigint, s string"
    )
    assert ks_test(same, "v", "s").collect()[0].ks_d == 0.0


def test_chi2_test_vs_scalar(spark):
    from osm_pbf_spark.operators.stats import chi2_test

    # contingency: cat X: a=30 b=10; cat Y: a=20 b=40
    rows = (
        [("X", "a")] * 30 + [("X", "b")] * 10 + [("Y", "a")] * 20 + [("Y", "b")] * 40
    )
    df = spark.createDataFrame(rows, "c string, s string")
    r = chi2_test(df, "c", "s").collect()[0]
    assert r.n_total == 100 and r.dof == 1

    def scalar():
        obs = {("X", "a"): 30, ("X", "b"): 10, ("Y", "a"): 20, ("Y", "b"): 40}
        rt = {"X": 40, "Y": 60}
        ct = {"a": 50, "b": 50}
        n = 100
        total = 0
        for (ci, sj), o in obs.items():
            e = rt[ci] * ct[sj] / n
            total += (o - e) ** 2 / e
        return total

    assert abs(r.chi2 - scalar()) < 2e-6  # micro-unit quantization grid
    # homogeneous split -> chi2 == 0
    same = spark.createDataFrame(
        [("X", s) for s in ("a", "b")] * 25 + [("Y", s) for s in ("a", "b")] * 10,
        "c string, s string",
    )
    assert chi2_test(same, "c", "s").collect()[0].chi2 == 0.0


def test_cusum_vs_sequential_recurrence(spark):
    """The distributed prefix-identity form must equal the textbook
    sequential recurrence S_i = max(0, S_{i-1} + x_i - k), crossings
    and statistic values both."""
    from osm_pbf_spark.operators.stats import cusum_changepoints

    rng = np.random.RandomState(11)
    rows = []
    series = {}
    for key in range(6):
        n = 80 + key * 7
        base = rng.randint(0, 9, n)
        # inject a mean shift in the middle for even keys
        if key % 2 == 0:
            base[n // 2:] += 5
        series[str(key)] = [int(v) for v in base]
        rows += [(str(key), i, int(v)) for i, v in enumerate(base)]
    df = spark.createDataFrame(rows, "k string, i int, v bigint")
    drift, h = 5, 12
    out = cusum_changepoints(df, "k", "i", "v", drift=drift, threshold=h)
    got = {(r.key, r.ord, r.side): r.stat for r in out.collect()}

    want = {}
    for key, vals in series.items():
        for sign, side in ((1, "up"), (-1, "down")):
            s_prev = 0
            for i, v in enumerate(vals):
                s = max(0, s_prev + sign * (v - drift))
                if s > h and s_prev <= h:
                    want[(key, i, side)] = s
                s_prev = s
    assert got == want
    assert any(side == "up" for _, _, side in got)  # shifts were detected
