"""Batch-38: kruskal_wallis, welch_ttest, cramers_v, mutual_information."""

from __future__ import annotations

import math


def _ranks(values):
    """value -> tie-averaged rank (1-based, as a float multiple of 0.5)."""
    sv = sorted(values)
    first = {}
    for i, v in enumerate(sv):
        first.setdefault(v, i + 1)
    cnt = {}
    for v in sv:
        cnt[v] = cnt.get(v, 0) + 1
    return {v: first[v] + (cnt[v] - 1) / 2.0 for v in cnt}


def test_kruskal_scalar_replay(spark):
    from osm_pbf_spark.operators.stats import kruskal_wallis

    rows = [(["g1", "g2", "g3"][i % 3], (i * 7) % 11) for i in range(90)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = kruskal_wallis(df, "v", "g").collect()[0]
    n = len(rows)
    rk = _ranks([v for _, v in rows])
    groups: dict = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    # replay the operator's own fold order: group key ascending
    s = 0.0
    for g in sorted(groups):
        vs = groups[g]
        r2 = sum(int(2 * rk[v]) for v in vs)  # doubled ranks, exact
        s += (float(r2) * float(r2)) / float(4 * len(vs))
    h = (s * 12.0) / float(n * (n + 1)) - float(3 * (n + 1))
    cnt: dict = {}
    for _, v in rows:
        cnt[v] = cnt.get(v, 0) + 1
    ties = sum(c * c * c - c for c in cnt.values())
    h_tie = h / (1.0 - float(ties) / float(n * n * n - n))
    assert (r.n, r.k, r.ties_t) == (n, 3, ties)
    assert r.h == h and r.h_tie == h_tie
    # sanity vs the classic identity: no group effect when all groups
    # share the same distribution modulo arrangement -> small H
    assert abs(h_tie) < 1.0


def test_kruskal_separated_groups(spark):
    from osm_pbf_spark.operators.stats import kruskal_wallis

    rows = [("lo", i % 5) for i in range(50)] + [
        ("hi", 100 + i % 5) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    r = kruskal_wallis(df, "v", "g").collect()[0]
    # perfectly separated two groups of 50: H approaches n-1 scaled;
    # must be large and positive
    assert r.h_tie > 70.0


def test_welch_scalar_replay(spark):
    from osm_pbf_spark.operators.stats import welch_ttest

    xs_a = [(i * 13) % 37 for i in range(40)]
    xs_b = [10 + (i * 7) % 23 for i in range(25)]
    rows = [(x, "a") for x in xs_a] + [(x, "b") for x in xs_b]
    df = spark.createDataFrame(rows, "x long, side string")
    r = welch_ttest(df, "x", "side").collect()[0]
    na, nb = len(xs_a), len(xs_b)
    sxa, sxxa = sum(xs_a), sum(x * x for x in xs_a)
    sxb, sxxb = sum(xs_b), sum(x * x for x in xs_b)
    va = na * sxxa - sxa * sxa
    vb = nb * sxxb - sxb * sxb
    a = float(va) / float(na * na * (na - 1))
    b = float(vb) / float(nb * nb * (nb - 1))
    md = float(sxa * nb - sxb * na) / float(na * nb)
    t = md / math.sqrt(a + b)
    dfw = ((a + b) * (a + b)) / (
        (a * a) / float(na - 1) + (b * b) / float(nb - 1)
    )
    d = md / math.sqrt(
        (float(va) / float(na) + float(vb) / float(nb)) / float(na + nb - 2)
    )
    assert (r.n_a, r.n_b) == (na, nb)
    assert r.mean_diff == md and r.t == t
    assert r.df_welch == dfw and r.cohens_d == d
    # Welch dof bounded by min(na,nb)-1 .. na+nb-2
    assert min(na, nb) - 1 <= dfw <= na + nb - 2


def test_welch_degenerate_side(spark):
    from osm_pbf_spark.operators.stats import welch_ttest

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "b")], "x long, side string"
    )
    r = welch_ttest(df, "x", "side").collect()[0]
    assert r.n_a == 1 and r.t is None and r.cohens_d is None


def _contingency_py(rows):
    cells: dict = {}
    for a, b in rows:
        cells[(a, b)] = cells.get((a, b), 0) + 1
    r: dict = {}
    c: dict = {}
    for (a, b), o in cells.items():
        r[a] = r.get(a, 0) + o
        c[b] = c.get(b, 0) + o
    return cells, r, c, len(rows)


def test_cramers_scalar_replay(spark):
    from osm_pbf_spark.operators.stats import cramers_v

    rows = [(["p", "q", "r"][i % 3], ["u", "v"][(i * 2 + i // 5) % 2])
            for i in range(120)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = cramers_v(df, "a", "b").collect()[0]
    cells, r, c, n = _contingency_py(rows)
    q = 0
    for a in r:  # FULL margin grid — zero cells contribute r*c/n
        for b in c:
            o = cells.get((a, b), 0)
            num = o * n - r[a] * c[b]
            t = (float(num) * float(num)) / float(n * r[a] * c[b])
            q += int(math.floor(t * 1e6 + 0.5))
    chi2 = float(q) / 1e6
    m = min(len(r) - 1, len(c) - 1)
    v = math.sqrt(chi2 / float(n * m))
    assert (got.n, got.r_card, got.c_card) == (n, 3, 2)
    assert got.chi2 == chi2 and got.v == v
    assert 0.0 <= got.v <= 1.0 + 1e-9


def test_cramers_perfect_association(spark):
    from osm_pbf_spark.operators.stats import cramers_v

    rows = [(["p", "q"][i % 2], ["u", "v"][i % 2]) for i in range(80)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = cramers_v(df, "a", "b").collect()[0]
    assert abs(got.v - 1.0) < 1e-6  # perfect 1:1 mapping -> V = 1


def test_mutual_information_scalar_replay(spark):
    from osm_pbf_spark.operators.stats import mutual_information

    rows = [(["p", "q", "r"][i % 3], ["u", "v"][(i // 3) % 2])
            for i in range(90)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = mutual_information(df, "a", "b").collect()[0]
    cells, r, c, n = _contingency_py(rows)
    s = 0
    for (a, b), o in cells.items():
        t = float(o) * math.log(float(n * o) / float(r[a] * c[b]))
        s += int(math.floor(t * 1e6 + 0.5)) if t >= 0 else -int(
            math.floor(-t * 1e6 + 0.5)
        )
    assert got.n == n and got.n_cells == len(cells)
    assert got.mi_micro_rows == s
    assert got.mi_nats == float(s) / 1e6 / float(n)
    # independent-by-construction layout -> MI ~ 0
    assert abs(got.mi_nats) < 1e-3


def test_mutual_information_deterministic_function(spark):
    from osm_pbf_spark.operators.stats import mutual_information

    # b = f(a): MI equals H(b) = ln 2 for a balanced binary b
    rows = [(["p", "q"][i % 2], ["u", "v"][i % 2]) for i in range(64)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = mutual_information(df, "a", "b").collect()[0]
    assert abs(got.mi_nats - math.log(2.0)) < 1e-5
