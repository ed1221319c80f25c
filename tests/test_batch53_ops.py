"""Batch-53: frequent_sequences, sprt_decision."""

from __future__ import annotations

import math

import pytest


def test_frequent_sequences_scalar(spark):
    from osm_pbf_spark.operators.temporal import frequent_sequences

    streams = {
        1: ["a", "b", "c", "a", "b", "c"],
        2: ["a", "b", "c", "x"],
        3: ["b", "c", "a"],
    }
    rows = [
        (k, i, it) for k, its in streams.items() for i, it in enumerate(its)
    ]
    df = spark.createDataFrame(rows, "key long, seq long, item string")
    got = {
        r.episode: r.support
        for r in frequent_sequences(df, "key", "seq", "item", k=3,
                                    min_support=1).collect()
    }
    want: dict = {}
    for its in streams.values():
        for i in range(len(its) - 2):
            ep = ">".join(its[i : i + 3])
            want[ep] = want.get(ep, 0) + 1
    assert got == want
    assert got["a>b>c"] == 3  # repeats inside key 1 count twice
    sup2 = frequent_sequences(
        df, "key", "seq", "item", k=3, min_support=3
    ).collect()
    assert {(r.episode, r.support) for r in sup2} == {("a>b>c", 3)}


def test_frequent_sequences_rejects_k1(spark):
    from osm_pbf_spark.operators.temporal import frequent_sequences

    df = spark.createDataFrame([(1, 1, "a")], "key long, seq long, item string")
    with pytest.raises(ValueError, match="k must be >= 2"):
        frequent_sequences(df, "key", "seq", "item", k=1)


def test_sprt_llr_literals():
    from osm_pbf_spark.operators.stats import sprt_llr_micro

    wa, wd = sprt_llr_micro(1, 2, 11, 20)
    assert wa == int(math.floor(math.log(0.55 / 0.5) * 1e6 + 0.5))
    assert wd == -int(math.floor(-math.log(0.45 / 0.5) * 1e6 + 0.5))
    assert wa > 0 > wd


def test_sprt_decisions_scalar(spark):
    from osm_pbf_spark.operators.stats import sprt_decision, sprt_llr_micro

    wa, wd = sprt_llr_micro(1, 2, 11, 20)
    up, lo = 5 * wa, 4 * wd  # tight bounds so tiny streams decide
    rows = (
        [("win", i, 1) for i in range(10)]           # all successes
        + [("lose", i, 0) for i in range(10)]        # all failures
        + [("mix", i, i % 2) for i in range(6)]      # oscillates
    )
    df = spark.createDataFrame(rows, "exp string, seq long, y long")
    got = {r.exp: r for r in
           sprt_decision(df, "exp", "seq", "y", (1, 2), (11, 20),
                         up, lo).collect()}
    assert got["win"].decision == "accept_h1" and got["win"].n_obs == 5
    assert got["win"].llr_micro == 5 * wa
    assert got["lose"].decision == "accept_h0" and got["lose"].n_obs == 4
    assert got["mix"].decision == "continue" and got["mix"].n_obs == 6
    assert got["mix"].llr_micro == 3 * wa + 3 * wd


def test_sprt_rejects_bad_outcome(spark):
    from osm_pbf_spark.operators.stats import sprt_decision

    df = spark.createDataFrame([("e", 1, 2)], "exp string, seq long, y long")
    with pytest.raises(Exception, match="sprt_decision"):
        sprt_decision(df, "exp", "seq", "y", (1, 2), (11, 20), 10, -10).collect()


# -------------------------------------------------- regression_metrics


def test_regression_metrics_scalar(spark):
    import math

    from osm_pbf_spark.operators.evals import regression_metrics

    pairs = [((i * 7) % 50, (i * 7) % 50 + (i % 9) - 4) for i in range(200)]
    df = spark.createDataFrame(pairs, "y long, yhat long")
    r = regression_metrics(df, "y", "yhat").collect()[0]
    n = len(pairs)
    sae = sum(abs(y - yh) for y, yh in pairs)
    sse = sum((y - yh) ** 2 for y, yh in pairs)
    sy = sum(y for y, _ in pairs)
    syy = sum(y * y for y, _ in pairs)
    assert (r.n, r.sae, r.sse) == (n, sae, sse)
    assert r.mae == sae / n and r.rmse == math.sqrt(sse / n)
    assert r.r2 == 1.0 - (n * sse) / (n * syy - sy * sy)
    assert 0.9 < r.r2 <= 1.0  # predictor is close


def test_regression_metrics_perfect_and_constant(spark):
    from osm_pbf_spark.operators.evals import regression_metrics

    perfect = spark.createDataFrame([(i, i) for i in range(20)], "y long, yhat long")
    r = regression_metrics(perfect, "y", "yhat").collect()[0]
    assert r.mae == 0.0 and r.rmse == 0.0 and r.r2 == 1.0
    const = spark.createDataFrame([(5, 4)] * 10, "y long, yhat long")
    assert regression_metrics(const, "y", "yhat").collect()[0].r2 is None


# ------------------------------------------------------------ lift_table


def test_lift_table_scalar(spark):
    from osm_pbf_spark.operators.evals import lift_table

    # 100 items; positives concentrated in the top scores
    rows = [(i, 1000 - i, 1 if i < 25 and i % 2 == 0 else 0)
            for i in range(100)]
    df = spark.createDataFrame(rows, "item long, score long, y long")
    got = sorted(lift_table(df, "score", "y", "item", n_buckets=10).collect(),
                 key=lambda r: r.bucket)
    assert [r.n for r in got] == [10] * 10
    total_pos = sum(y for _, _, y in rows)
    ranked = sorted(rows, key=lambda r: (-r[1], r[0]))
    cum = 0
    for bi, r in enumerate(got):
        chunk = ranked[bi * 10 : (bi + 1) * 10]
        n_pos = sum(y for _, _, y in chunk)
        cum += n_pos
        assert r.n_pos == n_pos and r.cum_pos == cum
        assert r.gain == cum / total_pos
        assert r.lift == (n_pos * 100) / (10 * total_pos)
    # top deciles dominate: lift[0] well above 1, tail at 0
    assert got[0].lift > 3.0 and got[-1].n_pos == 0


# ----------------------------------------------------------- bootstrap_ci


def test_bootstrap_scalar_replay(spark):
    import hashlib

    from osm_pbf_spark.operators.stats import bootstrap_ci

    vals = [(i * 13) % 40 for i in range(120)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = bootstrap_ci(df, "v", n_replicas=50, alpha_num=10,
                     alpha_den=100).collect()[0]
    n = len(vals)
    ranked = sorted(vals)
    sums = []
    for b in range(50):
        s = 0
        for i in range(n):
            h = int(hashlib.md5(f"{b}:{i}".encode()).hexdigest()[:10], 16)
            s += ranked[h % n]
        sums.append(s)
    sums.sort()
    k_lo = -((-50 * 10) // 200)      # ceil(50*0.05) = 3
    k_hi = -((-50 * 190) // 200)     # ceil(50*0.95) = 48
    assert (r.n, r.n_replicas) == (n, 50)
    assert r.lo_sum == sums[k_lo - 1] and r.hi_sum == sums[k_hi - 1]
    assert r.mean_obs == sum(vals) / n
    assert r.lo_mean <= r.mean_obs <= r.hi_mean  # CI covers the mean
    assert r.lo_mean == r.lo_sum / n


def test_bootstrap_degenerate_constant(spark):
    from osm_pbf_spark.operators.stats import bootstrap_ci

    df = spark.createDataFrame([(7,)] * 30, "v long")
    r = bootstrap_ci(df, "v", n_replicas=20).collect()[0]
    assert r.lo_mean == r.hi_mean == 7.0


# ------------------------------------------------------------- woe_iv


def test_woe_iv_scalar(spark):
    import math

    from osm_pbf_spark.operators.stats import woe_iv

    rows = [("a", 1)] * 30 + [("a", 0)] * 10 + [("b", 1)] * 5 + [
        ("b", 0)
    ] * 25 + [("z", 1)]  # a category with zero negatives
    df = spark.createDataFrame(rows, "cat string, y long")
    got = {r.cat: r for r in woe_iv(df, "cat", "y").collect()}
    P = sum(y for _, y in rows)
    Q = sum(1 - y for _, y in rows)
    K = 3
    p1, q1 = P + K, Q + K
    iv = 0
    for cat in ("a", "b", "z"):
        pos = sum(y for c, y in rows if c == cat)
        neg = sum(1 - y for c, y in rows if c == cat)
        lnv = math.log(((pos + 1) * q1) / ((neg + 1) * p1))
        wq = int(math.floor(abs(lnv) * 1e6 + 0.5)) * (1 if lnv >= 0 else -1)
        d = ((pos + 1) * q1 - (neg + 1) * p1) / (p1 * q1)
        t = d * lnv
        iv += int(math.floor(abs(t) * 1e6 + 0.5)) * (1 if t >= 0 else -1)
        r = got[cat]
        assert (r.n_pos, r.n_neg, r.woe_micro) == (pos, neg, wq)
    assert all(r.iv_micro == iv for r in got.values())
    assert got["a"].woe_micro > 0 > got["b"].woe_micro
    assert iv > 0  # a predictive feature has positive IV


def test_best_split_multi_picks_planted_feature(spark):
    from osm_pbf_spark.operators.stats import best_split_multi

    rows = [
        (i % 13, 0 if i < 100 else 50, (i * 7) % 5, 0 if i < 100 else 1)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "x1 long, x2 long, x3 long, y long")
    got = {r.feature: r for r in
           best_split_multi(df, ["x1", "x2", "x3"], "y").collect()}
    assert got["x2"].is_best == 1 and got["x2"].rank == 1
    assert got["x2"].wgini == 0.0 and got["x2"].threshold == 0
    assert got["x1"].is_best == 0 and got["x3"].is_best == 0
    assert len(got) == 3


# -------------------------------------------------------- nelson_aalen


def test_nelson_aalen_scalar(spark):
    from osm_pbf_spark.operators.temporal import nelson_aalen

    # durations with events (ev=1) and censoring (ev=0)
    rows = [(2, 1), (3, 1), (3, 0), (5, 1), (5, 1), (7, 0), (9, 1)]
    df = spark.createDataFrame(rows, "dur long, ev long")
    got = sorted(nelson_aalen(df, "dur", "ev").collect(), key=lambda r: r.t)
    n = len(rows)
    times = sorted({d for d, _ in rows})
    cum = 0
    at_risk = n
    exp = []
    for t in times:
        d = sum(1 for dd, e in rows if dd == t and e == 1)
        c = sum(1 for dd, e in rows if dd == t and e == 0)
        cum += int((d / at_risk) * 1e6 + 0.5)
        exp.append((t, at_risk, d, c, cum))
        at_risk -= d + c
    assert [(r.t, r.n_risk, r.d, r.c, r.hazard_micro) for r in got] == exp
    assert got[-1].hazard == exp[-1][4] / 1e6
    # hazard is nondecreasing
    hs = [r.hazard_micro for r in got]
    assert hs == sorted(hs)


def test_nelson_aalen_rejects_bad_event(spark):
    from osm_pbf_spark.operators.temporal import nelson_aalen

    df = spark.createDataFrame([(1, 2)], "dur long, ev long")
    with pytest.raises(Exception, match="nelson_aalen"):
        nelson_aalen(df, "dur", "ev").collect()


# --------------------------------------------------------- logrank_test


def test_logrank_identical_groups_zero(spark):
    from osm_pbf_spark.operators.stats import logrank_test

    rows = [(d, e, s) for d, e in [(2, 1), (4, 1), (5, 0), (7, 1)]
            for s in ("a", "b")]
    df = spark.createDataFrame(rows, "dur long, ev long, side string")
    r = logrank_test(df, "dur", "ev", "side").collect()[0]
    assert r.oe_micro == 0 and abs(r.z) < 1e-9


def test_logrank_scalar_replay(spark):
    from osm_pbf_spark.operators.stats import logrank_test

    rows = [(2, 1, "a"), (3, 1, "a"), (9, 0, "a"), (10, 1, "a"),
            (8, 1, "b"), (12, 1, "b"), (14, 0, "b"), (15, 1, "b")]
    df = spark.createDataFrame(rows, "dur long, ev long, side string")
    r = logrank_test(df, "dur", "ev", "side").collect()[0]
    times = sorted({d for d, e, _ in rows if e == 1})
    oe = v = 0
    for t in times:
        d1 = sum(1 for d, e, s in rows if d == t and e == 1 and s == "a")
        d2 = sum(1 for d, e, s in rows if d == t and e == 1 and s == "b")
        n1 = sum(1 for d, _, s in rows if d >= t and s == "a")
        n2 = sum(1 for d, _, s in rows if d >= t and s == "b")
        d_, n_ = d1 + d2, n1 + n2
        if d_ == 0:
            continue
        oev = (d1 * n_ - d_ * n1) / n_
        oe += int(abs(oev) * 1e6 + 0.5) * (1 if oev >= 0 else -1)
        if n_ > 1:
            vv = (d_ * n1 * n2) * (n_ - d_) / (n_ * n_) / (n_ - 1)
            v += int(vv * 1e6 + 0.5)
    assert (r.oe_micro, r.v_micro) == (oe, v)
    # group a dies early: O1 - E1 must be positive (excess early events)
    assert r.oe_micro > 0 and r.z > 0


# --------------------------------------------------------------- anova_f


def test_anova_scalar_replay(spark):
    from osm_pbf_spark.operators.stats import anova_f

    groups = {"g1": [1, 2, 3, 4], "g2": [11, 12, 13], "g3": [5, 6, 7, 8, 9]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    r = anova_f(df, "v", "g").collect()[0]
    n = len(rows)
    S = sum(v for _, v in rows)
    k = len(groups)
    ssb_m = ssw_m = 0
    for vs in groups.values():
        ng, sg, ssg = len(vs), sum(vs), sum(v * v for v in vs)
        ssw = (ng * ssg - sg * sg) / ng
        a = sg * n - S * ng
        ssb = (a * a) / (n * n * ng)
        ssw_m += int(ssw * 1e6 + 0.5)
        ssb_m += int(ssb * 1e6 + 0.5)
    assert (r.n, r.k) == (n, k)
    assert (r.ssb_micro, r.ssw_micro) == (ssb_m, ssw_m)
    assert r.f == (ssb_m / (k - 1)) / (ssw_m / (n - k))
    assert r.f > 10  # g2 is far separated


def test_anova_degenerate(spark):
    from osm_pbf_spark.operators.stats import anova_f

    one = spark.createDataFrame([("g", i) for i in range(5)], "g string, v long")
    assert anova_f(one, "v", "g").collect()[0].f is None  # k = 1
    const = spark.createDataFrame(
        [("a", 3)] * 4 + [("b", 3)] * 4, "g string, v long"
    )
    assert anova_f(const, "v", "g").collect()[0].f is None  # SSW = 0


# ---------------------------------------------------- poisson_rate_test


def test_poisson_rate_scalar(spark):
    import math

    from osm_pbf_spark.operators.stats import poisson_rate_test

    # side a: 30 events over 60 units (0.5/u); b: 10 over 50 (0.2/u)
    rows = [(1, 2, "a")] * 30 + [(1, 5, "b")] * 10
    df = spark.createDataFrame(rows, "x long, t long, side string")
    r = poisson_rate_test(df, "x", "t", "side").collect()[0]
    assert (r.x_a, r.t_a, r.x_b, r.t_b) == (30, 60, 10, 50)
    assert r.rate_a == 0.5 and r.rate_b == 0.2
    num = (30 * 50 - 10 * 60) / (60 * 50)
    var = 30 / 60**2 + 10 / 50**2
    assert r.z == num / math.sqrt(var)
    assert r.z > 2  # rates genuinely differ


def test_poisson_rate_zero_count_null(spark):
    from osm_pbf_spark.operators.stats import poisson_rate_test

    rows = [(0, 10, "a"), (5, 10, "b")]
    df = spark.createDataFrame(rows, "x long, t long, side string")
    assert poisson_rate_test(df, "x", "t", "side").collect()[0].z is None


# ---------------------------------------------------------- rare_collapse


def test_rare_collapse_semantics(spark):
    from osm_pbf_spark.operators.stats import rare_collapse

    rows = [("a",)] * 10 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "cat string")
    out = rare_collapse(df, "cat", min_count=5).collect()
    got = {}
    for r in out:
        got.setdefault((r.cat, r.cat_collapsed), 0)
        got[(r.cat, r.cat_collapsed)] += 1
    assert got == {("a", "a"): 10, ("b", "__other__"): 3,
                   ("c", "__other__"): 1}
    # min_count=1 keeps everything
    kept = rare_collapse(df, "cat", min_count=1).collect()
    assert all(r.cat == r.cat_collapsed for r in kept)


# --------------------------------------------------- visvalingam_simplify


def test_visvalingam_engine_matches_naive(spark):
    from osm_pbf_spark.operators.simplify import (
        visvalingam_py,
        visvalingam_simplify,
    )

    lines = []
    for lid in range(6):
        lats = [float(((lid + 1) * i * 37) % 101) / 10.0 for i in range(25)]
        lons = [float(((lid + 3) * i * 53 + i * i) % 97) / 10.0
                for i in range(25)]
        lines.append((lid, lats, lons))
    df = spark.createDataFrame(
        lines, "line_id long, lats array<double>, lons array<double>"
    )
    got = {r.line_id: r for r in
           visvalingam_simplify(df, min_area2=500, scale=10.0).collect()}
    import math

    for lid, lats, lons in lines:
        ix = [int(math.floor(v * 10.0 + 0.5)) for v in lats]
        iy = [int(math.floor(v * 10.0 + 0.5)) for v in lons]
        keep = visvalingam_py(ix, iy, 500)
        r = got[lid]
        assert list(r.qlats) == [ix[i] for i in keep]
        assert list(r.qlons) == [iy[i] for i in keep]
        assert (r.n_in, r.n_out) == (25, len(keep))
        # endpoints always survive
        assert r.qlats[0] == ix[0] and r.qlats[-1] == ix[-1]


def test_visvalingam_threshold_monotone(spark):
    from osm_pbf_spark.operators.simplify import visvalingam_simplify

    lats = [0.0, 0.1, 0.0, 5.0, 0.0, 0.1, 0.0]
    lons = [float(i) for i in range(7)]
    df = spark.createDataFrame(
        [(1, lats, lons)], "line_id long, lats array<double>, lons array<double>"
    )
    outs = {
        t: visvalingam_simplify(df, min_area2=t, scale=10.0)
        .collect()[0]
        .n_out
        for t in (1, 5, 1000, 10**9)
    }
    assert outs[1] >= outs[5] >= outs[1000] >= outs[10**9]
    assert outs[10**9] == 2  # only endpoints at an absurd threshold
    assert outs[1000] >= 3   # the big spike survives a moderate one


def test_frequent_sequences_null_mid_window_drops(spark):
    """ADVICE r3: a NULL item anywhere in a window drops that window —
    a shortened (k-1)-episode must never be counted as a k-episode."""
    from osm_pbf_spark.operators.temporal import frequent_sequences

    rows = [(1, 0, "a"), (1, 1, None), (1, 2, "c"), (1, 3, "d"), (1, 4, "e")]
    df = spark.createDataFrame(rows, "key long, seq long, item string")
    got = {
        r.episode: r.support
        for r in frequent_sequences(df, "key", "seq", "item", k=3,
                                    min_support=1).collect()
    }
    # windows (a,NULL,c) and (NULL,c,d) are dropped; only (c,d,e) is full
    assert got == {"c>d>e": 1}
    assert "a>c" not in got and "c>d" not in got


def test_frequent_sequences_sep_collision_raises(spark):
    from osm_pbf_spark.operators.temporal import frequent_sequences

    rows = [(1, 0, "a>b"), (1, 1, "c"), (1, 2, "d")]
    df = spark.createDataFrame(rows, "key long, seq long, item string")
    with pytest.raises(Exception, match="contains sep"):
        frequent_sequences(df, "key", "seq", "item", k=2,
                           min_support=1).collect()


def test_bootstrap_empty_input_is_clean_empty(spark):
    """ADVICE r3: zero input rows must short-circuit (sequence(0,-1)
    descends and pmod(h,0) errors without the guard)."""
    from osm_pbf_spark.operators.stats import bootstrap_ci

    df = spark.createDataFrame([], "v long")
    assert bootstrap_ci(df, "v", n_replicas=8).count() == 0


def test_cluster_pair_metrics_n1_ari_is_null(spark):
    """ADVICE r3: n <= 1 made expect = 0/0 = NaN and NaN != 0.0 is
    TRUE in Spark — the ARI must come back NULL, not NaN."""
    import math

    from osm_pbf_spark.operators.clustering import cluster_pair_metrics

    df = spark.createDataFrame([(1, "a", "x")], "id long, pred string, truth string")
    r = cluster_pair_metrics(df, "pred", "truth").collect()[0]
    assert r.n == 1
    assert r.ari is None or not math.isnan(r.ari)
    assert r.ari is None
