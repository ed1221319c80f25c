"""Batch r4-1: hillshade, focal_majority, interval_coverage,
nearest_event_join, mcnemar_test, cochran_armitage, maximal_matching,
spherical_ring_area — scalar-oracle pins for each new operator."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------- hillshade
def test_hillshade_scalar(spark):
    from osm_pbf_spark.operators.tiling import hillshade

    cells = [(x, y, (x * 13 + y * 7) % 50) for x in range(6) for y in range(6)]
    df = spark.createDataFrame(cells, "x long, y long, z long")
    got = {(r.x, r.y): (r.gx, r.gy, r.shade) for r in hillshade(df).collect()}

    z = {(x, y): v for x, y, v in cells}
    horn = [(0, 1, 2, 0), (1, 1, 1, 1), (1, -1, 1, -1), (-1, 0, -2, 0),
            (-1, 1, -1, 1), (-1, -1, -1, -1), (0, 1, 0, 2), (0, -1, 0, -2)]
    # rebuild coefficient table from the module to avoid drift
    from osm_pbf_spark.operators.tiling import _HORN_COEFS
    az_r, alt_r = math.radians(315.0), math.radians(45.0)
    ax = -math.cos(alt_r) * math.sin(az_r)
    ay = -math.cos(alt_r) * math.cos(az_r)
    azc = math.sin(alt_r)
    want = {}
    for (x, y) in z:
        nbrs = [(dx, dy) for dx, dy, _, _ in _HORN_COEFS]
        if not all((x + dx, y + dy) in z for dx, dy in set(nbrs)):
            continue
        gx = sum(cgx * z[(x + dx, y + dy)] for dx, dy, cgx, _ in _HORN_COEFS)
        gy = sum(cgy * z[(x + dx, y + dy)] for dx, dy, _, cgy in _HORN_COEFS)
        num = (ax * gx + ay * gy) + azc * 8.0
        den = math.sqrt(gx * gx + gy * gy + 64)
        want[(x, y)] = (gx, gy, int(math.floor(255.0 * max(num, 0.0) / den + 0.5)))
    assert got == want
    assert all(0 <= s <= 255 for (_, _, s) in got.values())


def test_hillshade_flat_is_full_ambient(spark):
    from osm_pbf_spark.operators.tiling import hillshade

    df = spark.createDataFrame(
        [(x, y, 7) for x in range(4) for y in range(4)], "x long, y long, z long"
    )
    rows = hillshade(df, altitude_deg=90.0).collect()
    assert rows and all(r.shade == 255 for r in rows)  # sun overhead, flat


# ----------------------------------------------------- focal_majority
def test_focal_majority_scalar(spark):
    from osm_pbf_spark.operators.tiling import focal_majority

    cells = [(x, y, (x + 2 * y) % 3) for x in range(7) for y in range(7)]
    df = spark.createDataFrame(cells, "x long, y long, v long")
    got = {(r.x, r.y): (r.v_maj, r.n_maj) for r in focal_majority(df).collect()}
    z = {(x, y): v for x, y, v in cells}
    want = {}
    for (x, y) in z:
        win = [z.get((x + dx, y + dy)) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        if any(w is None for w in win):
            continue
        counts: dict = {}
        for w in win:
            counts[w] = counts.get(w, 0) + 1
        best = min(counts, key=lambda c: (-counts[c], c))
        want[(x, y)] = (best, counts[best])
    assert got == want


def test_focal_majority_tie_breaks_to_smaller_class(spark):
    from osm_pbf_spark.operators.tiling import focal_majority

    # alternating 2-class checkerboard: 3x3 windows hold 5/4 or 4/5
    cells = [(x, y, (x + y) % 2) for x in range(5) for y in range(5)]
    df = spark.createDataFrame(cells, "x long, y long, v long")
    for r in focal_majority(df).collect():
        want = (r.x + r.y) % 2  # center parity has the 5 votes
        assert r.v_maj == want and r.n_maj == 5


# -------------------------------------------------- interval_coverage
def test_interval_coverage_scalar(spark):
    from osm_pbf_spark.operators.temporal import interval_coverage

    rows = [
        ("a", 0, 10), ("a", 5, 12), ("a", 12, 20),   # merge: [0,20) touching
        ("a", 30, 31),
        ("b", 0, 1), ("b", 2, 3), ("b", 4, 5),
        ("c", 0, 100), ("c", 10, 20),                 # nested
    ]
    df = spark.createDataFrame(rows, "key string, s long, e long")
    got = {r.key: (r.n_intervals, r.n_components, r.covered)
           for r in interval_coverage(df, "key", "s", "e").collect()}
    assert got == {"a": (4, 2, 21), "b": (3, 3, 3), "c": (2, 1, 100)}


def test_interval_coverage_rejects_empty_interval(spark):
    from osm_pbf_spark.operators.temporal import interval_coverage

    df = spark.createDataFrame([("a", 5, 5)], "key string, s long, e long")
    with pytest.raises(Exception, match="end <= start"):
        interval_coverage(df, "key", "s", "e").collect()


# ------------------------------------------------- nearest_event_join
def test_nearest_event_join_scalar(spark):
    import datetime as dt

    from osm_pbf_spark.operators.temporal import nearest_event_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(1, "u", ts(100)), (2, "u", ts(205)), (3, "u", ts(400)),
         (4, "w", ts(50))],
        "event_id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", ts(90), 9.0), ("u", ts(210), 21.0), ("u", ts(350), 35.0)],
        "user string, ts timestamp, val double",
    )
    got = {r.event_id: (r.val_r, r.nearest_ts_us_r)
           for r in nearest_event_join(left, right, on="user").collect()}
    base = int(t0.timestamp()) * 1_000_000
    assert got[1] == (9.0, base + 90_000_000)     # 10 s back beats 110 fwd
    assert got[2] == (21.0, base + 210_000_000)   # 5 s fwd beats 115 back
    assert got[3] == (35.0, base + 350_000_000)   # only backward exists
    assert got[4] == (None, None)                 # no key match


def test_nearest_event_join_tie_prefers_earlier(spark):
    import datetime as dt

    from osm_pbf_spark.operators.temporal import nearest_event_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, "u", t0 + dt.timedelta(seconds=100))],
        "event_id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", t0 + dt.timedelta(seconds=90), 1.0),
         ("u", t0 + dt.timedelta(seconds=110), 2.0)],
        "user string, ts timestamp, val double",
    )
    (r,) = nearest_event_join(left, right, on="user").collect()
    assert r.val_r == 1.0  # exact tie -> earlier (backward) row


def test_nearest_event_join_plan_single_exchange(spark):
    import datetime as dt

    from osm_pbf_spark.operators.temporal import nearest_event_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, "u", t0)], "event_id long, user string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", t0, 1.0)], "user string, ts timestamp, val double"
    )
    plan = (
        nearest_event_join(left, right, on="user")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan  # union+window, never a join


# --------------------------------------------------------- mcnemar
def test_mcnemar_scalar(spark):
    from osm_pbf_spark.operators.stats import mcnemar_test

    # b = 6 (a right, b wrong), c = 2
    rows = ([(1, 0)] * 6) + ([(0, 1)] * 2) + ([(1, 1)] * 5) + ([(0, 0)] * 3)
    df = spark.createDataFrame(rows, "a int, b int")
    (r,) = mcnemar_test(df, "a", "b").collect()
    assert (r.n, r.n_b, r.n_c, r.n_concordant) == (16, 6, 2, 8)
    assert r.chi2 == (6 - 2) ** 2 / 8.0


def test_mcnemar_no_discordant_is_null_and_guard(spark):
    from osm_pbf_spark.operators.stats import mcnemar_test

    df = spark.createDataFrame([(1, 1), (0, 0)], "a int, b int")
    (r,) = mcnemar_test(df, "a", "b").collect()
    assert r.chi2 is None
    bad = spark.createDataFrame([(2, 0)], "a int, b int")
    with pytest.raises(Exception, match="must be 0/1"):
        mcnemar_test(bad, "a", "b").collect()


# ------------------------------------------------- cochran_armitage
def test_cochran_armitage_scalar(spark):
    from osm_pbf_spark.operators.stats import cochran_armitage

    # dose 0/1/2 with rising event rates
    rows = []
    for w, (events, total) in {0: (2, 20), 1: (8, 20), 2: (15, 20)}.items():
        rows += [(w, 1)] * events + [(w, 0)] * (total - events)
    df = spark.createDataFrame(rows, "w int, d int")
    (r,) = cochran_armitage(df, "w", "d").collect()
    n, R = 60, 25
    swd = 0 * 2 + 1 * 8 + 2 * 15
    swn = 0 * 20 + 1 * 20 + 2 * 20
    sw2n = 0 + 20 + 4 * 20
    t = n * swd - R * swn
    v = n * sw2n - swn * swn
    assert (r.n, r.n_events, r.t_num, r.v_star) == (n, R, t, v)
    want_z = t * math.sqrt(n) / (math.sqrt(R) * math.sqrt(n - R) * math.sqrt(v))
    assert r.z == want_z
    assert r.z > 3  # strong positive trend


def test_cochran_armitage_degenerate_null(spark):
    from osm_pbf_spark.operators.stats import cochran_armitage

    allsame = spark.createDataFrame([(0, 1), (1, 1)], "w int, d int")
    (r,) = cochran_armitage(allsame, "w", "d").collect()
    assert r.z is None  # R == N
    const = spark.createDataFrame([(3, 1), (3, 0)], "w int, d int")
    (r2,) = cochran_armitage(const, "w", "d").collect()
    assert r2.z is None  # V* == 0


# ------------------------------------------------- maximal_matching
def _greedy_matching(edges):
    """Sequential greedy by (md5_40(u:v), u, v) — the spec order."""
    def pri(u, v):
        h = hashlib.md5(f"{u}:{v}".encode()).hexdigest()[:10]
        return (int(h, 16), u, v)

    norm = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v},
                  key=lambda e: pri(*e))
    used, out = set(), set()
    for u, v in norm:
        if u not in used and v not in used:
            used |= {u, v}
            out.add((u, v))
    return out


def test_maximal_matching_equals_sequential_greedy(spark):
    from osm_pbf_spark.operators.graph import maximal_matching

    edges = [((i * 7) % 40, (i * 13 + 3) % 40) for i in range(120)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.u, r.v) for r in maximal_matching(df).collect()}
    assert got == _greedy_matching(edges)


def test_maximal_matching_is_maximal_and_disjoint(spark):
    from osm_pbf_spark.operators.graph import maximal_matching

    edges = [((i * 3) % 25, (i * 11 + 1) % 25) for i in range(60)]
    df = spark.createDataFrame(edges, "src long, dst long")
    m = {(r.u, r.v) for r in maximal_matching(df).collect()}
    used = {x for e in m for x in e}
    assert len(used) == 2 * len(m)  # vertex-disjoint
    norm = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    for u, v in norm - m:
        assert u in used or v in used  # maximality


def test_maximal_matching_empty_and_selfloops(spark):
    from osm_pbf_spark.operators.graph import maximal_matching

    df = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
    assert maximal_matching(df).count() == 0


def test_maximal_matching_tail_equals_distributed_rounds(spark):
    """The single-task tail kernel must emit the SAME (u, v, round)
    rows as the pure distributed rounds path — identical winners and
    identical round numbers at every fixpoint step."""
    from osm_pbf_spark.operators.graph import maximal_matching

    edges = [((i * 7) % 200, (i * 31 + 5) % 200) for i in range(600)]
    df = spark.createDataFrame(edges, "src long, dst long")
    tail = {(r.u, r.v, r["round"]) for r in maximal_matching(df).collect()}
    dist = {
        (r.u, r.v, r["round"])
        for r in maximal_matching(df, tail_threshold=0).collect()
    }
    assert tail == dist and len(tail) > 10
    assert max(r for _, _, r in tail) >= 2  # multi-round case exercised


# ---------------------------------------------- spherical_ring_area
def _sph_ring_u(ring):
    DEG2RAD = 0.017453292519943295
    tot = 0
    for (la0, lo0), (la1, lo1) in zip(ring, ring[1:] + ring[:1]):
        term = ((lo1 - lo0) * DEG2RAD) * (
            2.0 + math.sin(la0 * DEG2RAD) + math.sin(la1 * DEG2RAD)
        )
        tot += int(math.floor(term * 1e12 + 0.5))
    return tot


def test_spherical_ring_area_scalar_and_latitude_shrink(spark):
    from osm_pbf_spark.operators.measures import (
        EARTH_RADIUS_M,
        spherical_ring_area,
    )

    def ring_rows(lid, lat_base):
        ring = [(lat_base, 0.0), (lat_base, 1.0),
                (lat_base + 1.0, 1.0), (lat_base + 1.0, 0.0)]
        segs = list(zip(ring, ring[1:] + ring[:1]))
        return [(lid, a[0], a[1], b[0], b[1]) for a, b in segs], ring

    rows0, ring0 = ring_rows("eq", 0.0)
    rows60, ring60 = ring_rows("n60", 60.0)
    df = spark.createDataFrame(
        rows0 + rows60, "line_id string, lat0 double, lon0 double, lat1 double, lon1 double"
    )
    got = {r.line_id: (r.n_segs, r.sph_u, r.area_m2)
           for r in spherical_ring_area(df).collect()}
    for lid, ring in (("eq", ring0), ("n60", ring60)):
        u = _sph_ring_u(ring)
        assert got[lid][1] == u
        assert got[lid][2] == EARTH_RADIUS_M * EARTH_RADIUS_M * abs(u) / 2e12
    # 1x1 deg at 60N is ~cos(60) = half the equatorial area
    ratio = got["n60"][2] / got["eq"][2]
    assert 0.45 < ratio < 0.55
    # sanity: equatorial 1x1 deg ~ 12300 km^2
    assert 1.2e10 < got["eq"][2] < 1.25e10


def test_spherical_ring_area_antimeridian_raises(spark):
    from osm_pbf_spark.operators.measures import spherical_ring_area

    df = spark.createDataFrame(
        [("x", 0.0, 179.0, 0.0, -179.0)],
        "line_id string, lat0 double, lon0 double, lat1 double, lon1 double",
    )
    with pytest.raises(Exception, match="antimeridian"):
        spherical_ring_area(df).collect()
