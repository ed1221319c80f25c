"""Batch-18 operators: H3-like hex grid (assignment + k-ring
smoothing), rectangular zonal statistics, trajectory kinematics,
exact frequent items (Misra-Gries candidates + exact recount), URL
parse/normalize, Naive-Bayes text classification. Scalar/brute
oracles + plan-shape pins, the established discipline."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _no_python(plan: str) -> bool:
    return (
        "ArrowEvalPython" not in plan
        and "BatchEvalPython" not in plan
        and "InPandas" not in plan
    )


# ---------------------------------------------------------------- hexgrid

def test_hex_assign_matches_scalar_replay(spark):
    from osm_pbf_spark.functions.hexgrid import hex_cell_df, hex_py

    # battery: lattice points, centers, edges, negatives, boundary band
    coords = []
    for i in range(-7, 8):
        for j in range(-7, 8):
            coords.append((i * 0.9 + j * 0.037, j * 1.1 - i * 0.013))
    coords += [(0.0, 0.0), (89.9, 179.9), (-89.9, -179.9), (0.125, 0.125)]
    df = spark.createDataFrame(coords, "lat double, lon double")
    got = [
        (r.hq, r.hr)
        for r in hex_cell_df(df, size=0.25).orderBy("lat", "lon").collect()
    ]
    exp = [hex_py(lat, lon, 0.25) for lat, lon in sorted(coords)]
    assert got == exp


def test_hex_assign_is_nearest_center(spark):
    """The cube-round assignment picks the hex whose center is nearest
    (Euclidean in the axial-scaled plane) — checked brute-force over a
    local center neighborhood for a pseudo-random point battery."""
    from osm_pbf_spark.functions.hexgrid import hex_center, hex_py

    size = 0.5
    pts = [
        (math.sin(i * 1.7) * 3.0, math.cos(i * 2.3) * 3.0) for i in range(300)
    ]
    for lat, lon in pts:
        hq, hr = hex_py(lat, lon, size)
        clat, clon = hex_center(hq, hr, size)
        d0 = (lat - clat) ** 2 + (lon - clon) ** 2
        for dq in (-2, -1, 0, 1, 2):
            for dr in (-2, -1, 0, 1, 2):
                nlat, nlon = hex_center(hq + dq, hr + dr, size)
                d = (lat - nlat) ** 2 + (lon - nlon) ** 2
                assert d >= d0 - 1e-12, (lat, lon, hq, hr, dq, dr)


def test_hex_kring_conserves_mass_and_shape(spark):
    from osm_pbf_spark.functions.hexgrid import hex_kring_counts

    # one point -> exactly 7 ring cells each with n_ring = 1
    df = spark.createDataFrame([(10.0, 20.0)], "lat double, lon double")
    rows = hex_kring_counts(df, size=0.25).collect()
    assert len(rows) == 7 and all(r.n_ring == 1 for r in rows)
    # total scattered mass = 7 * n_points always
    df2 = spark.createDataFrame(
        [(float(i % 13) * 0.3, float(i % 7) * 0.4) for i in range(200)],
        "lat double, lon double",
    )
    out = hex_kring_counts(df2, size=0.25).agg(F.sum("n_ring")).collect()[0][0]
    assert out == 7 * 200


def test_hex_plan_pure_codegen(spark):
    from osm_pbf_spark.functions.hexgrid import hex_cell_df, hex_kring_counts

    df = spark.createDataFrame([(1.0, 2.0)], "lat double, lon double")
    p = _plan(hex_cell_df(df))
    assert _no_python(p) and "Exchange" not in p
    p2 = _plan(hex_kring_counts(df))
    assert _no_python(p2)
    assert p2.count("Exchange") == 2  # two narrow shuffles, no more


# ------------------------------------------------------------- zonal stats

def test_zonal_stats_matches_brute(spark):
    from osm_pbf_spark.operators.spatialstats import zonal_stats

    pts = [
        (float(i % 37) - 18.0, float((i * 7) % 53) - 26.0, i % 11)
        for i in range(500)
    ]
    zones = [
        (z, -20.0 + z * 3.0, -20.0 + z * 3.0 + 8.0,
         -25.0 + z * 5.0, -25.0 + z * 5.0 + 12.0)
        for z in range(8)
    ]
    pdf = spark.createDataFrame(pts, "lat double, lon double, v long")
    zdf = spark.createDataFrame(
        zones, "zone_id long, lat_min double, lat_max double, "
               "lon_min double, lon_max double"
    )
    got = {
        r.zone_id: (r.n_pts, r.sum_v, r.min_v, r.max_v)
        for r in zonal_stats(pdf, zdf, level=6).collect()
    }
    for z, la0, la1, lo0, lo1 in zones:
        hit = [v for la, lo, v in pts if la0 <= la <= la1 and lo0 <= lo <= lo1]
        exp = (
            (len(hit), sum(hit), min(hit), max(hit))
            if hit else (0, 0, None, None)
        )
        assert got[z] == exp, z
    assert set(got) == set(range(8))  # empty zones kept


def test_zonal_stats_fanout_guard_fires(spark):
    from osm_pbf_spark.operators.spatialstats import zonal_stats

    pdf = spark.createDataFrame([(0.0, 0.0, 1)], "lat double, lon double, v long")
    zdf = spark.createDataFrame(
        [(1, -80.0, 80.0, -170.0, 170.0)],
        "zone_id long, lat_min double, lat_max double, "
        "lon_min double, lon_max double",
    )
    with pytest.raises(Exception, match="covers > 16 cells"):
        zonal_stats(pdf, zdf, level=6, max_zone_cells=16).collect()


def test_zonal_stats_plan_native(spark):
    from osm_pbf_spark.operators.spatialstats import zonal_stats

    pdf = spark.createDataFrame([(0.0, 0.0, 1)], "lat double, lon double, v long")
    zdf = spark.createDataFrame(
        [(1, -1.0, 1.0, -1.0, 1.0)],
        "zone_id long, lat_min double, lat_max double, "
        "lon_min double, lon_max double",
    )
    assert _no_python(_plan(zonal_stats(pdf, zdf, level=6)))


# ------------------------------------------------------------ kinematics

def test_kinematics_known_headings_and_speed(spark):
    from osm_pbf_spark.operators.matching import trajectory_kinematics

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 0.0, 0.0),
        (1, t0 + dt.timedelta(seconds=100), 1.0, 0.0),   # due north
        (1, t0 + dt.timedelta(seconds=200), 1.0, 1.0),   # due east
        (1, t0 + dt.timedelta(seconds=300), 0.0, 1.0),   # due south
        (1, t0 + dt.timedelta(seconds=400), 0.0, 1.0),   # zero move
    ]
    df = spark.createDataFrame(
        rows, "track_id long, ts timestamp, lat double, lon double"
    )
    out = {
        r.ts: r for r in trajectory_kinematics(df).collect()
    }
    assert len(out) == 4
    ordered = [out[k] for k in sorted(out)]
    # ~111 km per degree; speeds ~1.1 km/s over 100 s
    assert abs(ordered[0].dist_m - 111195) < 10
    assert ordered[0].bearing_deg == 0.0
    # due east at lat 1: 90 deg minus the convergence term sin(lat)*dlon/2
    assert abs(ordered[1].bearing_deg - 89.991274) < 1e-3
    # great-circle convergence term at lat 1
    assert abs(ordered[2].bearing_deg - 180.0) < 1e-6
    assert ordered[3].dist_m == 0 and ordered[3].bearing_deg is None
    assert ordered[3].speed_mps == 0.0
    for r in ordered[:3]:
        assert abs(r.speed_mps - r.dist_m / 100.0) < 1e-9


def test_kinematics_unordered_and_dup_ts(spark):
    from osm_pbf_spark.operators.matching import trajectory_kinematics

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 2, 10.0, 10.0),
        (1, t0, 1, 0.0, 0.0),     # duplicate ts: order_cols breaks tie
        (1, t0 + dt.timedelta(seconds=10), 3, 10.0, 20.0),
    ]
    df = spark.createDataFrame(
        rows, "track_id long, ts timestamp, seq long, lat double, lon double"
    )
    out = trajectory_kinematics(df, order_cols=("seq",)).orderBy("ts").collect()
    assert len(out) == 2
    assert out[0].dt_us == 0 and out[0].speed_mps is None  # dup ts: no div0
    assert out[1].dt_us == 10_000_000 and out[1].speed_mps is not None


def test_kinematics_plan_one_exchange_no_python(spark):
    from osm_pbf_spark.operators.matching import trajectory_kinematics

    df = spark.createDataFrame(
        [(1, __import__("datetime").datetime(2024, 1, 1), 0.0, 0.0)],
        "track_id long, ts timestamp, lat double, lon double",
    )
    p = _plan(trajectory_kinematics(df))
    assert _no_python(p)
    assert p.count("Exchange") == 1


# --------------------------------------------------------- frequent items

def test_frequent_items_exact_and_partition_invariant(spark):
    from osm_pbf_spark.operators.sketch import frequent_items

    rows = (
        [("hot%d" % (i % 5),) for i in range(400)]
        + [("warm%d" % (i % 20),) for i in range(200)]
        + [("tail%d" % i,) for i in range(300)]
        + [(None,)] * 10
    )
    exp = {}
    for (v,) in rows:
        if v is not None:
            exp[v] = exp.get(v, 0) + 1
    want = {k: v for k, v in exp.items() if v >= 50}
    for nparts in (1, 7, 32):
        df = spark.createDataFrame(rows, "item string").repartition(nparts)
        got = {
            r.item: r.n
            for r in frequent_items(df, "item", k=32, min_count=50).collect()
        }
        assert got == want, nparts


def test_frequent_items_loss_bound_guard(spark):
    from osm_pbf_spark.operators.sketch import frequent_items

    df = spark.createDataFrame([("a%d" % i,) for i in range(500)], "item string")
    with pytest.raises(Exception, match="loss bound"):
        frequent_items(df, "item", k=4, min_count=3).collect()


def test_frequent_items_default_threshold(spark):
    from osm_pbf_spark.operators.sketch import frequent_items

    rows = [("big",)] * 90 + [("t%d" % i,) for i in range(10)]
    df = spark.createDataFrame(rows, "item string")
    # N=100, k=9 -> loss bound ceil(100/10)=10, default min_count 11
    got = {r.item: r.n for r in frequent_items(df, "item", k=9).collect()}
    assert got == {"big": 90}


def test_frequent_items_arrow_stage_reused(spark):
    from osm_pbf_spark.operators.sketch import frequent_items

    df = spark.createDataFrame(
        [("a%d" % (i % 3),) for i in range(60)], "item string"
    ).repartition(3)
    out = frequent_items(df, "item", k=8, min_count=10)
    out.collect()
    p = _plan(out)  # adaptive plan after execution
    # vectorized Arrow kernel only — never row-at-a-time Python
    assert "BatchEvalPython" not in p and "InPandas" not in p
    assert "MapInArrow" in p
    # the MG subtree feeds candidates + N + guard: AQE must REUSE its
    # exchange, not re-run the scan per branch
    assert "ReusedExchange" in p


# ----------------------------------------------------------------- URLs

def test_url_normalize_known_values(spark):
    from osm_pbf_spark.operators.text import url_normalize

    cases = [
        ("HTTP://WWW.Ex.COM:80/a/b/?q=1#f", "http://www.ex.com/a/b?q=1",
         "ex.com"),
        ("https://Host.Org:443", "https://host.org/", "host.org"),
        ("https://Host.Org:8443/x", "https://host.org:8443/x", "host.org"),
        ("ftp://a.b.c.d:80/f/", "ftp://a.b.c.d:80/f", "c.d"),
        ("http://single", "http://single/", ""),
        ("http://e.com/", "http://e.com/", "e.com"),
        ("http://e.com/deep/x.html", "http://e.com/deep/x.html", "e.com"),
        # garbage in -> deterministic empty components (path defaults '/')
        ("not a url", ":///", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], "url string")
    got = {r.url: (r.url_norm, r.domain) for r in url_normalize(df).collect()}
    for u, norm, dom in cases:
        assert got[u] == (norm, dom), u


def test_url_parse_components(spark):
    from osm_pbf_spark.operators.text import url_parse

    df = spark.createDataFrame(
        [("https://h.io:9000/p/q?a=b&c=d#frag",)], "url string"
    )
    r = url_parse(df).collect()[0]
    assert (r.scheme, r.host, r.port, r.path, r.query, r.fragment) == (
        "https", "h.io", "9000", "/p/q", "a=b&c=d", "frag"
    )


def test_url_plan_map_only(spark):
    from osm_pbf_spark.operators.text import url_normalize

    df = spark.createDataFrame([("http://x.y/",)], "url string")
    p = _plan(url_normalize(df))
    assert _no_python(p) and "Exchange" not in p


# ------------------------------------------------------------ naive bayes

def _nb_py(train, score):
    """Scalar replay of nb_classify's exact micro-nat spec."""
    from collections import Counter

    c = Counter()
    t = Counter()
    nd = Counter()
    vocab = set()
    for _, label, text in train:
        nd[label] += 1
        for tok in [x for x in text.split(" ") if x]:
            c[(label, tok)] += 1
            t[label] += 1
            vocab.add(tok)
    n, v = len(train), len(vocab)
    out = {}
    for did, _, text in score:
        toks = [x for x in text.split(" ") if x]
        best = None
        for label in sorted(nd):
            sq = int(round(math.log(nd[label] / n) * 1e6))
            for tok in toks:
                sq += int(round(
                    math.log((c[(label, tok)] + 1) / (t[label] + v)) * 1e6
                ))
            if best is None or sq > best[1]:
                best = (label, sq)
        out[did] = (best[0], best[1], len(toks))
    return out


def test_nb_classify_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.text import nb_classify

    train = [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "the dog ate the food"),
        (3, "fr", "le chat et le chien"),
        (4, "fr", "le pain et le vin"),
        (5, "de", "der hund und die katze"),
    ]
    score = [
        (10, "", "the cat ate"),
        (11, "", "le chien et le chat"),
        (12, "", "die katze"),
        (13, "", "unseen tokens only here"),
        (14, "", ""),  # zero tokens: priors alone (en/fr tie -> en)
    ]
    tdf = spark.createDataFrame(train, "doc_id long, label string, text string")
    sdf = spark.createDataFrame(
        [(d, t) for d, _, t in score], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.pred_label, r.score_q, r.n_toks)
        for r in nb_classify(tdf, sdf).collect()
    }
    exp = _nb_py(train, score)
    assert got == exp
    assert got[10][0] == "en" and got[11][0] == "fr" and got[12][0] == "de"
    assert got[14][0] == "en"  # 2-2-1 priors: en/fr tie, label asc wins


def test_nb_classify_plan_native(spark):
    from osm_pbf_spark.operators.text import nb_classify

    tdf = spark.createDataFrame(
        [(1, "x", "a b")], "doc_id long, label string, text string"
    )
    sdf = spark.createDataFrame([(2, "a")], "doc_id long, text string")
    assert _no_python(_plan(nb_classify(tdf, sdf)))


# -------------------------------------------------------- exact quantiles

def test_exact_quantiles_matches_numpy_type1(spark):
    from osm_pbf_spark.operators.stats import exact_quantiles

    import numpy as np

    vals = [(("g%d" % (i % 3)), int(v)) for i, v in enumerate(
        np.random.RandomState(7).randint(-50, 200, size=400)
    )]
    df = spark.createDataFrame(vals, "g string, v long")
    qs = [(1, 10), (1, 4), (1, 2), (3, 4), (1, 1)]
    got = {
        r.g: (r.q_1_10, r.q_1_4, r.q_1_2, r.q_3_4, r.q_1_1)
        for r in exact_quantiles(df, "v", ["g"], qs).collect()
    }
    for g in ("g0", "g1", "g2"):
        xs = sorted(v for gg, v in vals if gg == g)
        n = len(xs)
        exp = tuple(xs[-(-num * n // den) - 1] for num, den in qs)  # ceil
        assert got[g] == exp, g


def test_exact_quantiles_validation_and_ties(spark):
    from osm_pbf_spark.operators.stats import exact_quantiles

    df = spark.createDataFrame([("a", 5)] * 9 + [("a", 7)], "g string, v long")
    r = exact_quantiles(df, "v", ["g"], [(9, 10), (91, 100)]).collect()[0]
    assert r.q_9_10 == 5 and r.q_91_100 == 7  # boundary exact at cum*den=num*n
    with pytest.raises(ValueError, match="out of"):
        exact_quantiles(df, "v", ["g"], [(0, 10)])
    with pytest.raises(ValueError, match="labels"):
        exact_quantiles(df, "v", ["g"], [(1, 2)], labels=["a", "b"])


def test_exact_quantiles_plan_native(spark):
    from osm_pbf_spark.operators.stats import exact_quantiles

    df = spark.createDataFrame([("a", 1)], "g string, v long")
    assert _no_python(_plan(exact_quantiles(df, "v", ["g"], [(1, 2)])))


# ------------------------------------------------------------- rendezvous

def test_rendezvous_stability_on_reshard(spark):
    """THE HRW property: adding a shard moves ONLY keys that go to the
    new shard; removing one moves only its own keys."""
    from osm_pbf_spark.operators.packing import rendezvous_assign

    df = spark.createDataFrame([(i,) for i in range(500)], "k long")
    s7 = [f"s{i}" for i in range(7)]
    a7 = {r.k: r.shard for r in rendezvous_assign(df, "k", s7).collect()}
    a8 = {
        r.k: r.shard
        for r in rendezvous_assign(df, "k", s7 + ["s7"]).collect()
    }
    moved = {k for k in a7 if a7[k] != a8[k]}
    assert all(a8[k] == "s7" for k in moved)
    assert 0 < len(moved) < 150  # ~1/8 of 500
    a6 = {
        r.k: r.shard
        for r in rendezvous_assign(df, "k", s7[:-1]).collect()
    }
    for k in a7:
        if a7[k] != "s6":
            assert a6[k] == a7[k], k


def test_rendezvous_plan_and_validation(spark):
    from osm_pbf_spark.operators.packing import rendezvous_assign

    df = spark.createDataFrame([(1,)], "k long")
    p = _plan(rendezvous_assign(df, "k", ["a", "b"]))
    assert _no_python(p) and "Exchange" not in p
    with pytest.raises(ValueError, match="unique"):
        rendezvous_assign(df, "k", ["a", "a"])
    with pytest.raises(ValueError, match="1..1024"):
        rendezvous_assign(df, "k", [])


# ------------------------------------------------------------ zorder ranges

def _z_of(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_ranges_exhaustive_small_grids(spark):
    from osm_pbf_spark.functions.zorder import zorder_ranges

    for bits in (2, 3, 4):
        n = 1 << bits
        rects = [
            (0, n - 1, 0, n - 1), (1, 2, 1, 2), (0, 0, 0, 0),
            (1, n - 2, 2, n - 1), (n // 2, n - 1, 0, n // 2),
        ]
        for qx0, qx1, qy0, qy1 in rects:
            rng = zorder_ranges(qx0, qx1, qy0, qy1, bits)
            # sorted, disjoint, merged
            for (a0, a1), (b0, b1) in zip(rng, rng[1:]):
                assert a1 + 1 < b0, (rng,)
            member = set()
            for lo, hi in rng:
                member.update(range(lo, hi + 1))
            exp = {
                _z_of(x, y, bits)
                for x in range(qx0, qx1 + 1)
                for y in range(qy0, qy1 + 1)
            }
            assert member == exp, (bits, qx0, qx1, qy0, qy1)


def test_zorder_ranges_guard_and_validation(spark):
    from osm_pbf_spark.functions.zorder import zorder_ranges

    with pytest.raises(ValueError, match="max_ranges"):
        zorder_ranges(1, 200, 1, 200, 8, max_ranges=10)
    with pytest.raises(ValueError, match="outside"):
        zorder_ranges(0, 256, 0, 1, 8)
    with pytest.raises(ValueError, match="empty"):
        zorder_ranges(5, 4, 0, 1, 8)


def test_zrange_predicate_fast_optimize(spark):
    """The regression that motivated the exists-form: many-term OR
    chains over a Morton key send constraint propagation super-linear.
    The exists predicate must plan + run a 247-range filter in
    seconds."""
    import time

    from osm_pbf_spark.functions.zorder import (
        zorder_key_col, zorder_ranges, zrange_predicate,
    )

    df = spark.createDataFrame(
        [(float(i % 90), float((i * 7) % 180)) for i in range(400)],
        "lat double, lon double",
    )
    key = zorder_key_col(
        [F.col("lon"), F.col("lat")], [-180.0, -90.0], [180.0, 90.0], bits=8
    )
    ranges = zorder_ranges(37, 133, 60, 201, 8)
    assert len(ranges) > 200
    t0 = time.time()
    out = (
        df.withColumn("zkey", key)
        .where(zrange_predicate(F.col("zkey"), ranges))
        .count()
    )
    assert time.time() - t0 < 30.0
    assert out > 0


# ------------------------------------------------------------- D8 flow

def test_flow_direction_matches_brute(spark):
    from osm_pbf_spark.operators.tiling import _D8_OFFS, flow_direction

    cells = {}
    for x in range(8):
        for y in range(8):
            cells[(x, y)] = ((x * 37 + y * 101) * 7919) % 500
    df = spark.createDataFrame(
        [(x, y, z) for (x, y), z in cells.items()], "x long, y long, z long"
    )
    got = {(r.x, r.y): (r.flow_dir, r.drop) for r in flow_direction(df).collect()}
    for (x, y), z in cells.items():
        best = (-1, 0)
        for d, dx, dy in _D8_OFFS:
            zn = cells.get((x + dx, y + dy))
            if zn is not None and z > zn:
                drop = z - zn
                if best[0] == -1 or drop > best[1] or (
                    drop == best[1] and d < best[0]
                ):
                    best = (d, drop)
        assert got[(x, y)] == best, (x, y)
    assert any(v[0] == -1 for v in got.values())  # pits/edge minima exist


def test_flow_direction_tiebreak_and_plan(spark):
    from osm_pbf_spark.operators.tiling import flow_direction

    # center higher than two equal neighbors (E and N): smaller code (E=0) wins
    df = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 3), (1, 2, 3)], "x long, y long, z long"
    )
    got = {(r.x, r.y): r.flow_dir for r in flow_direction(df).collect()}
    assert got[(1, 1)] == 0
    assert got[(2, 1)] == -1 and got[(1, 2)] == -1
    assert _no_python(_plan(flow_direction(df)))


# ---------------------------------------------------------------- LTTB

def test_lttb_endpoints_count_and_peak_preservation(spark):
    from osm_pbf_spark.operators.temporal import lttb_downsample

    # flat series with one sharp spike: uniform striding would miss it,
    # LTTB must keep it
    pts = [(1, i, 10 if i != 57 else 500) for i in range(100)]
    df = spark.createDataFrame(pts, "series_id long, x long, y long")
    out = sorted(
        (r.x, r.y) for r in lttb_downsample(df, k=10).collect()
    )
    assert len(out) == 10
    assert out[0] == (0, 10) and out[-1] == (99, 10)  # endpoints kept
    assert (57, 500) in out                            # the spike kept


def test_lttb_short_series_pass_through_and_validation(spark):
    from osm_pbf_spark.operators.temporal import lttb_downsample

    df = spark.createDataFrame(
        [(1, i, i * 3) for i in range(5)], "series_id long, x long, y long"
    )
    assert lttb_downsample(df, k=8).count() == 5
    with pytest.raises(ValueError, match="k must be"):
        lttb_downsample(df, k=2)


def test_lttb_partition_invariant(spark):
    from osm_pbf_spark.operators.temporal import lttb_downsample

    pts = [
        (s, i, ((i * 7919 + s * 13) % 400) - 200)
        for s in range(4) for i in range(200)
    ]
    df = spark.createDataFrame(pts, "series_id long, x long, y long")
    a = sorted(map(tuple, lttb_downsample(df.repartition(1), k=15).collect()))
    b = sorted(map(tuple, lttb_downsample(df.repartition(17), k=15).collect()))
    assert a == b and len(a) == 4 * 15


# ------------------------------------------------------ pointer doubling

def test_terminal_labels_chains_and_trees(spark):
    from osm_pbf_spark.operators.graph import terminal_labels

    # two chains into terminals 0 and 100, one deep chain of length 9
    ptr = (
        [(i, i - 1) for i in range(1, 10)] + [(0, 0)]
        + [(101, 100), (102, 100), (103, 101), (100, 100)]
    )
    df = spark.createDataFrame(ptr, "node long, next long")
    got = {r.node: r.root for r in terminal_labels(df, rounds=4).collect()}
    assert all(got[i] == 0 for i in range(10))
    assert got[100] == 100 and got[103] == 100 and got[102] == 100


def test_terminal_labels_convergence_guard(spark):
    from osm_pbf_spark.operators.graph import terminal_labels

    # chain of length 9 cannot converge in 2 rounds (2^2 = 4 steps)
    ptr = [(i, i - 1) for i in range(1, 10)] + [(0, 0)]
    df = spark.createDataFrame(ptr, "node long, next long")
    with pytest.raises(Exception, match="did not reach a terminal"):
        terminal_labels(df, rounds=2).collect()
    # and the same call with check off returns partial labels quietly
    assert terminal_labels(df, rounds=2, check_converged=False).count() == 10


def test_terminal_labels_log_rounds(spark):
    from osm_pbf_spark.operators.graph import terminal_labels

    # length-1000 chain converges in ceil(log2(1000)) = 10 rounds
    ptr = [(i, i - 1) for i in range(1, 1001)] + [(0, 0)]
    df = spark.createDataFrame(ptr, "node long, next long")
    got = terminal_labels(df, rounds=10)
    assert got.where(F.col("root") != 0).count() == 0


# -------------------------------------------------------------- table diff

def test_table_diff_statuses_and_nullsafe(spark):
    from osm_pbf_spark.operators.checksum import table_diff

    l = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30), (4, None, 40)],
        "k long, s string, v long",
    )
    r = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "X", 30), (5, "e", 50)],
        "k long, s string, v long",
    )
    got = {row.k: row.diff_status for row in table_diff(l, r, ["k"]).collect()}
    # 1 identical (absent), 2 identical incl. NULL==NULL, 3 changed,
    # 4 removed, 5 added
    assert got == {3: "changed", 4: "removed", 5: "added"}


def test_table_diff_subset_compare_and_plan(spark):
    from osm_pbf_spark.operators.checksum import table_diff

    l = spark.createDataFrame([(1, "a", 10)], "k long, s string, v long")
    r = spark.createDataFrame([(1, "a", 99)], "k long, s string, v long")
    assert table_diff(l, r, ["k"], compare_cols=["s"]).count() == 0
    assert table_diff(l, r, ["k"]).collect()[0].diff_status == "changed"
    assert _no_python(_plan(table_diff(l, r, ["k"])))
    with pytest.raises(ValueError, match="key_cols"):
        table_diff(l, r, [])


# ------------------------------------------------------------ concurrency

def test_max_concurrency_brute_and_halfopen(spark):
    from osm_pbf_spark.operators.temporal import max_concurrency

    iv = [
        (1, 0, 10), (1, 5, 15), (1, 9, 12), (1, 20, 25),
        (2, 0, 10), (2, 10, 20),  # back-to-back: never concurrent
        (3, 3, 4),
    ]
    df = spark.createDataFrame(iv, "key long, start_us long, end_us long")
    got = {
        r.key: (r.max_concurrent, r.peak_us)
        for r in max_concurrency(df).collect()
    }
    # brute sweep
    for k in (1, 2, 3):
        best, peak = 0, None
        times = sorted({t for kk, s, e in iv if kk == k for t in (s, e)})
        for t in times:
            c = sum(1 for kk, s, e in iv if kk == k and s <= t < e)
            if c > best:
                best, peak = c, t
        assert got[k] == (best, peak), k
    assert got[2][0] == 1  # half-open: [0,10) and [10,20) don't overlap


def test_max_concurrency_rejects_bad_interval(spark):
    from osm_pbf_spark.operators.temporal import max_concurrency

    df = spark.createDataFrame([(1, 5, 5)], "key long, start_us long, end_us long")
    with pytest.raises(Exception, match="start >= end"):
        max_concurrency(df).collect()


# ----------------------------------------------------------------- splits

def test_split_assign_stable_proportional_leakage_safe(spark):
    from osm_pbf_spark.operators.packing import split_assign

    df = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    w = {"train": 8, "val": 1, "test": 1}
    a = {r.k: r.split for r in split_assign(df, "k", w).collect()}
    # proportions near 80/10/10
    from collections import Counter

    c = Counter(a.values())
    assert 1450 < c["train"] < 1750 and 120 < c["val"] < 280
    # growth-stable: the first 500 keys keep their split in a bigger corpus
    small = {
        r.k: r.split
        for r in split_assign(
            spark.createDataFrame([(i,) for i in range(500)], "k long"), "k", w
        ).collect()
    }
    assert all(a[k] == small[k] for k in small)
    # duplicate keys land together (leakage-safe)
    dup = spark.createDataFrame([(7,), (7,), (7,)], "k long")
    assert len({r.split for r in split_assign(dup, "k", w).collect()}) == 1
    # a different seed reshuffles
    b = {r.k: r.split for r in split_assign(df, "k", w, seed=1).collect()}
    assert any(a[k] != b[k] for k in a)


def test_split_assign_validation_and_plan(spark):
    from osm_pbf_spark.operators.packing import split_assign

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="positive ints"):
        split_assign(df, "k", {"a": 0})
    with pytest.raises(ValueError, match="non-empty"):
        split_assign(df, "k", {})
    p = _plan(split_assign(df, "k", {"a": 1, "b": 1}))
    assert _no_python(p) and "Exchange" not in p


def test_hex_kring_radius_k(spark):
    from osm_pbf_spark.functions.hexgrid import hex_disk_offsets, hex_kring_counts

    assert len(hex_disk_offsets(1)) == 7
    assert len(hex_disk_offsets(2)) == 19
    assert len(hex_disk_offsets(3)) == 37
    with pytest.raises(ValueError, match="k must be"):
        hex_disk_offsets(0)
    df = spark.createDataFrame([(10.0, 20.0)], "lat double, lon double")
    rows = hex_kring_counts(df, size=0.25, k=2).collect()
    assert len(rows) == 19 and all(r.n_ring == 1 for r in rows)


# ------------------------------------------------------------- assemble

def test_assemble_spans_validates_and_single_exchange(spark):
    from osm_pbf_spark.operators.docrender import assemble_spans, validate_spans

    pieces = [
        (1, 10, "text", "hello", None),
        (1, 20, "media", "", "m1"),
        (1, 30, "text", "world", None),
        (2, 5, "media", "", "m2"),
        (2, 6, "text", "x", None),
    ]
    df = spark.createDataFrame(
        pieces, "doc_id long, seq long, kind string, text string, media_ref string"
    )
    docs = assemble_spans(df)
    # validate_spans(assemble_spans(x)) is all-green by construction
    v = validate_spans(docs).collect()
    assert all(r.offsets_ok and r.width_ok for r in v)
    got = {r.doc_id: [tuple(s) for s in r.spans] for r in docs.collect()}
    assert got[1] == [
        ("text", "hello", "", 0),
        ("media", "", "m1", 6),
        ("text", "world", "", 6),
    ]
    assert got[2] == [("media", "", "m2", 0), ("text", "x", "", 0)]
    # window + agg share the key: exactly ONE Exchange NODE. An
    # executed AdaptiveSparkPlan prints Final AND Initial plans — cut
    # at the Initial marker or every node double-counts.
    final = _plan(docs).split("== Initial Plan ==")[0]
    n_exchange_nodes = sum(
        1 for ln in final.splitlines()
        if "Exchange hashpartitioning" in ln and "Reused" not in ln
    )
    assert n_exchange_nodes == 1


def test_assemble_spans_rejects_text_plus_media(spark):
    from osm_pbf_spark.operators.docrender import assemble_spans

    df = spark.createDataFrame(
        [(1, 1, "text", "oops", "m9")],
        "doc_id long, seq long, kind string, text string, media_ref string",
    )
    with pytest.raises(Exception, match="BOTH text and"):
        assemble_spans(df).collect()


# -------------------------------------------------------- hilbert ranges

def test_hilbert_ranges_exhaustive_and_fewer_than_z(spark):
    from osm_pbf_spark.functions.hilbert import hilbert_py, hilbert_ranges
    from osm_pbf_spark.functions.zorder import zorder_ranges

    for bits in (2, 3, 4):
        n = 1 << bits
        rects = [
            (0, n - 1, 0, n - 1), (1, 2, 1, 2), (0, 0, 0, 0),
            (1, n - 2, 2, n - 1), (n // 2, n - 1, 0, n // 2),
            (0, n - 1, 1, 1),
        ]
        for qx0, qx1, qy0, qy1 in rects:
            rng = hilbert_ranges(qx0, qx1, qy0, qy1, bits)
            for (a0, a1), (b0, b1) in zip(rng, rng[1:]):
                assert a1 + 1 < b0  # sorted, disjoint, merged
            member = set()
            for lo, hi in rng:
                member.update(range(lo, hi + 1))
            exp = {
                hilbert_py(x, y, bits)
                for x in range(qx0, qx1 + 1)
                for y in range(qy0, qy1 + 1)
            }
            assert member == exp, (bits, qx0, qx1, qy0, qy1)
    # the locality payoff: materially fewer ranges than Z on the same rect
    hz = len(hilbert_ranges(37, 133, 60, 201, 8))
    zz = len(zorder_ranges(37, 133, 60, 201, 8))
    assert hz < zz / 2, (hz, zz)  # measured 102 vs 247


def test_zrange_join_over_hilbert_key_plans_fast(spark):
    """A WHERE over the 8-level Hilbert projection chain explodes in
    the optimizer (recorded lesson); the broadcast range join must
    plan + run in seconds and return the coordinate-filter answer."""
    import time

    from osm_pbf_spark.functions.hilbert import (
        hilbert_key_col, hilbert_py, hilbert_ranges,
    )
    from osm_pbf_spark.functions.zorder import zrange_join

    df = spark.createDataFrame(
        [(float((i * 13) % 160) - 80.0, float((i * 29) % 340) - 170.0)
         for i in range(500)],
        "lat double, lon double",
    )
    keyed = hilbert_key_col(
        df, F.col("lon"), F.col("lat"), (-180.0, -90.0), (180.0, 90.0), bits=6
    )
    rng = hilbert_ranges(10, 40, 5, 50, 6)
    t0 = time.time()
    got = sorted(r.hkey for r in zrange_join(keyed, F.col("hkey"), rng).collect())
    assert time.time() - t0 < 30.0

    def q2(v, lo, hi, bits):
        n = float(1 << bits)
        x = math.floor((v - lo) / (hi - lo) * n)
        return min(max(int(x), 0), (1 << bits) - 1)

    exp = sorted(
        hilbert_py(q2(lon, -180.0, 180.0, 6), q2(lat, -90.0, 90.0, 6), 6)
        for lat, lon in [(r.lat, r.lon) for r in df.collect()]
        if 10 <= q2(lon, -180.0, 180.0, 6) <= 40
        and 5 <= q2(lat, -90.0, 90.0, 6) <= 50
    )
    assert got == exp


# ---------------------------------------------------- grouped heavy hitters

def test_frequent_items_grouped_exact_and_invariant(spark):
    from osm_pbf_spark.operators.sketch import frequent_items_grouped

    rows = []
    for g in ("ga", "gb", "gc"):
        rows += [(g, f"{g}hot{i % 4}") for i in range(200)]
        rows += [(g, f"{g}tail{i}") for i in range(80)]
    exp = {}
    for g, v in rows:
        exp[(g, v)] = exp.get((g, v), 0) + 1
    want = {kv: n for kv, n in exp.items() if n >= 30}
    for nparts in (1, 9):
        df = spark.createDataFrame(rows, "g string, item string").repartition(nparts)
        got = {
            (r.g, r.item): r.n
            for r in frequent_items_grouped(
                df, "g", "item", k=32, min_count=30
            ).collect()
        }
        assert got == want, nparts


def test_frequent_items_grouped_per_group_guard(spark):
    from osm_pbf_spark.operators.sketch import frequent_items_grouped

    # group 'big' has 600 rows -> bound ceil(600/5)=120 > min_count 50
    rows = [("big", "x%d" % i) for i in range(600)] + [("ok", "y")] * 20
    df = spark.createDataFrame(rows, "g string, item string")
    with pytest.raises(Exception, match="for group big"):
        frequent_items_grouped(df, "g", "item", k=4, min_count=50).collect()
