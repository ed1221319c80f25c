"""Batch-32 operators: kaplan_meier, prop_test, sample_points_in_polygons."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------- kaplan_meier


def _km_py(rows, scale=1_000_000):
    """Scalar KM replay under the micro-nat spec."""
    per: dict[int, list[int]] = {}
    for dur, ev in rows:
        d = per.setdefault(dur, [0, 0])
        d[0] += ev
        d[1] += 1 - ev
    ts = sorted(per)
    total = sum(d + c for d, c in per.values())
    out = {}
    log_micro, seen, dead = 0, 0, False
    for t in ts:
        d, c = per[t]
        n_risk = total - seen
        seen += d + c
        if dead:
            break  # no rows can follow total death
        if d == n_risk:
            out[t] = (n_risk, d, c, None, 0)
            dead = True
            continue
        if d > 0:
            ln = math.log((n_risk - d) / n_risk)
            log_micro += -int(math.floor(-ln * 1e6 + 0.5))
        out[t] = (
            n_risk,
            d,
            c,
            log_micro,
            int(math.floor(math.exp(log_micro / 1e6) * 1e6 + 0.5)),
        )
    return out


def test_km_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.temporal import kaplan_meier

    rows = [((i * 13) % 30, 1 if (i * 7) % 4 else 0) for i in range(300)]
    df = spark.createDataFrame(rows, "dur long, ev int")
    got = {
        r.t: (r.n_risk, r.d, r.c, r.log_micro, r.survival_ppm)
        for r in kaplan_meier(df, "dur", "ev").collect()
    }
    assert got == _km_py(rows)
    # survival is monotone nonincreasing over time
    sv = [got[t][4] for t in sorted(got)]
    assert all(sv[i] >= sv[i + 1] for i in range(len(sv) - 1))


def test_km_censoring_and_total_death(spark):
    from osm_pbf_spark.operators.temporal import kaplan_meier

    # 4 subjects: event@1, censored@2, event@3, event@3 (all die by 3)
    df = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1), (3, 1)], "dur long, ev int"
    )
    got = {r.t: (r.n_risk, r.d, r.c, r.log_micro, r.survival_ppm)
           for r in kaplan_meier(df, "dur", "ev").collect()}
    # t=1: S = 3/4; t=2: censoring only, S unchanged; t=3: d=n -> 0
    assert got[1][:3] == (4, 1, 0)
    assert got[1][4] == int(math.floor(math.exp(
        -int(math.floor(-math.log(3 / 4) * 1e6 + 0.5)) / 1e6) * 1e6 + 0.5))
    assert got[2][:3] == (3, 0, 1) and got[2][4] == got[1][4]
    assert got[3] == (2, 2, 0, None, 0)
    bad = spark.createDataFrame([(1, 2)], "dur long, ev int")
    with pytest.raises(Exception, match="must be 0/1"):
        kaplan_meier(bad, "dur", "ev").collect()


# ------------------------------------------------------------- prop_test


def test_prop_test_matches_direct_formula(spark):
    from osm_pbf_spark.operators.stats import prop_test

    rows = [("a", 1 if i % 3 == 0 else 0) for i in range(100)] + [
        ("b", 1 if i % 5 == 0 else 0) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "g string, succ int")
    r = prop_test(df, "g", "succ", sides=("a", "b")).collect()[0]
    na, sa = 100, sum(1 for i in range(100) if i % 3 == 0)
    nb, sb = 120, sum(1 for i in range(120) if i % 5 == 0)
    assert (r.n_a, r.s_a, r.n_b, r.s_b) == (na, sa, nb, sb)
    assert r.diff_num == sa * nb - sb * na
    z = float(sa * nb - sb * na) * math.sqrt(float(na + nb)) / math.sqrt(
        float((sa + sb) * (na + nb - sa - sb) * na * nb)
    )
    assert r.z == z
    # cross-check against the textbook form
    pa, pb, p = sa / na, sb / nb, (sa + sb) / (na + nb)
    assert r.z == pytest.approx(
        (pa - pb) / math.sqrt(p * (1 - p) * (1 / na + 1 / nb)), rel=1e-12
    )


def test_prop_test_degenerate_and_guard(spark):
    from osm_pbf_spark.operators.stats import prop_test

    all_succ = spark.createDataFrame(
        [("a", 1), ("b", 1)], "g string, succ int"
    )
    assert prop_test(all_succ, "g", "succ").collect()[0].z is None
    bad = spark.createDataFrame([("a", 5)], "g string, succ int")
    with pytest.raises(Exception, match="must be 0/1"):
        prop_test(bad, "g", "succ").collect()


# ----------------------------------------------- sample_points_in_polygons


def _rings_df(spark, polys):
    rows = []
    for pid, rings in polys.items():
        for ri, ring in enumerate(rings):
            rows.append(
                (pid, ri, [{"lat": float(a), "lon": float(b)} for a, b in ring])
            )
    return spark.createDataFrame(
        rows,
        "poly_id string, ring_idx int, pts array<struct<lat:double,lon:double>>",
    )


def test_sample_points_inside_and_deterministic(spark):
    from osm_pbf_spark.operators.spatial_join import sample_points_in_polygons

    polys = {
        "sq": [[(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]],
        "donut": [
            [(0.0, 20.0), (0.0, 40.0), (20.0, 40.0), (20.0, 20.0)],
            [(8.0, 28.0), (8.0, 32.0), (12.0, 32.0), (12.0, 28.0)],
        ],
    }
    df = _rings_df(spark, polys)
    a = sorted(map(tuple, sample_points_in_polygons(df, k=20, seed=3).collect()))
    b = sorted(map(tuple, sample_points_in_polygons(df, k=20, seed=3).collect()))
    assert a == b and len(a) > 0  # run-to-run deterministic
    for pid, rank, j, lat, lon in a:
        if pid == "sq":
            assert 0 <= lat <= 10 and 0 <= lon <= 10
        else:
            assert 0 <= lat <= 20 and 20 <= lon <= 40
            assert not (8 < lat < 12 and 28 < lon < 32)  # hole excluded
    # ranks contiguous from 1 per polygon
    by_p: dict = {}
    for pid, rank, *_ in a:
        by_p.setdefault(pid, []).append(rank)
    for v in by_p.values():
        assert sorted(v) == list(range(1, len(v) + 1))


def test_sample_points_seed_changes_sample_and_validation(spark):
    from osm_pbf_spark.operators.spatial_join import sample_points_in_polygons

    polys = {"sq": [[(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]]}
    df = _rings_df(spark, polys)
    a = {(r.lat, r.lon) for r in sample_points_in_polygons(df, k=10, seed=1).collect()}
    b = {(r.lat, r.lon) for r in sample_points_in_polygons(df, k=10, seed=2).collect()}
    assert a != b
    with pytest.raises(ValueError):
        sample_points_in_polygons(df, k=0)
    with pytest.raises(ValueError):
        sample_points_in_polygons(df, k=5, oversample=0)
