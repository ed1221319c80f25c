"""Batch-4 operators vs independent scalar/brute-force oracles:
table fingerprints (checksum.py), edit-distance join (fuzzy.py),
interval-overlap join (temporal.py), segment snapping (distance.py),
quadkeys (functions/tiles.py), span chunking (docrender.py),
bigram PMI (text.py), per-group sampling (packing.py)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_pbf_spark.operators.checksum import NULL_SENTINEL, SEP, table_fingerprint
from osm_pbf_spark.operators.fuzzy import fuzzy_join


# ---------------- table_fingerprint ----------------


def _row_h(*vals) -> int:
    canon = SEP.join(NULL_SENTINEL if v is None else str(v) for v in vals)
    return int(hashlib.md5(canon.encode()).hexdigest()[:10], 16)


def test_fingerprint_matches_scalar_oracle_and_row_order_free(spark):
    rows = [(i % 3, i, f"s{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "g int, k long, s string")
    got = {r.g: (r.n_rows, r.hash_sum, r.hash_xor)
           for r in table_fingerprint(df, ["g"]).collect()}
    want = {}
    for g, k, s in rows:
        n, hs, hx = want.get(g, (0, 0, 0))
        v = _row_h(k, s)
        want[g] = (n + 1, hs + v, hx ^ v)
    assert got == want
    # row order / partitioning never matters
    shuffled = df.repartition(7).sortWithinPartitions("s")
    got2 = {r.g: (r.n_rows, r.hash_sum, r.hash_xor)
            for r in table_fingerprint(shuffled, ["g"]).collect()}
    assert got2 == want


def test_fingerprint_detects_single_row_change_and_null_vs_empty(spark):
    base = [(1, "x"), (2, "y")]
    a = table_fingerprint(spark.createDataFrame(base, "k long, s string")).collect()[0]
    b = table_fingerprint(
        spark.createDataFrame([(1, "x"), (2, "z")], "k long, s string")
    ).collect()[0]
    assert a.n_rows == b.n_rows == 2
    assert (a.hash_sum, a.hash_xor) != (b.hash_sum, b.hash_xor)
    # NULL and '' must digest differently (the sentinel's whole job)
    c = table_fingerprint(spark.createDataFrame([(1, None)], "k long, s string")).collect()[0]
    d = table_fingerprint(spark.createDataFrame([(1, "")], "k long, s string")).collect()[0]
    assert (c.hash_sum, c.hash_xor) != (d.hash_sum, d.hash_xor)


# ---------------- fuzzy_join ----------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_join_exact_vs_bruteforce(spark):
    rng = np.random.default_rng(5)
    alphabet = "abcd"
    words = [
        (i, "".join(alphabet[int(x)] for x in rng.integers(0, 4, int(rng.integers(1, 6)))))
        for i in range(250)
    ]
    df = spark.createDataFrame(words, "id long, s string")
    got = {(r.id_a, r.id_b, r.dist) for r in fuzzy_join(df).collect()}
    want = {
        (i, j, _lev(si, sj))
        for i, si in words
        for j, sj in words
        if i < j and _lev(si, sj) <= 1
    }
    assert got == want
    assert want  # non-vacuous: the tiny alphabet guarantees near pairs


def test_fuzzy_join_threshold0_and_reject(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, "abc"), (3, "abd")], "id long, s string"
    )
    got = {(r.id_a, r.id_b) for r in fuzzy_join(df, threshold=0).collect()}
    assert got == {(1, 2)}
    with pytest.raises(ValueError, match="threshold"):
        fuzzy_join(df, threshold=2)


# ---------------- interval_join ----------------


def test_interval_join_vs_brute_multiplicity_one(spark):
    from osm_pbf_spark.operators.temporal import interval_join

    rng = np.random.default_rng(11)
    def mk(n, base):
        out = []
        for i in range(n):
            s = int(rng.integers(0, 20_000))
            out.append((base + i, s, s + int(rng.integers(0, 900))))
        return out

    la, lb = mk(300, 0), mk(300, 10_000)
    left = spark.createDataFrame(la, "id long, start_us long, end_us long")
    right = spark.createDataFrame(lb, "id long, start_us long, end_us long")
    # bin far smaller than max duration -> intervals cover MANY bins,
    # exercising the keep-once-in-later-start-bin dedup rule
    rows = interval_join(left, right, bin_micros=64).collect()
    got = [(r.id_a, r.id_b) for r in rows]
    assert len(got) == len(set(got))  # multiplicity exactly 1, no dedup stage
    want = {
        (ia, ib)
        for ia, sa, ea in la
        for ib, sb, eb in lb
        if sa <= eb and sb <= ea
    }
    assert set(got) == want and want


# ---------------- snap_to_segments ----------------


def test_snap_to_segments_vs_brute(spark):
    from osm_pbf_spark.operators.distance import snap_to_segments

    rng = np.random.default_rng(3)
    pts = [(i, float(rng.uniform(0, 20)), float(rng.uniform(0, 20))) for i in range(400)]
    segs = []
    for j in range(60):
        alat, alon = float(rng.uniform(0, 20)), float(rng.uniform(0, 20))
        segs.append((j, alat, alon,
                     alat + float(rng.uniform(-3, 3)), alon + float(rng.uniform(-3, 3))))
    p = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    s = spark.createDataFrame(segs, "seg_id long, alat double, alon double, blat double, blon double")
    got = {r.doc_id: (r.seg_id, r.d2) for r in snap_to_segments(p, s, radius=1.5).collect()}

    def d2_of(plat, plon, alat, alon, blat, blon):
        ux, uy = blon - alon, blat - alat
        vx, vy = plon - alon, plat - alat
        wx, wy = plon - blon, plat - blat
        dot, len2 = ux * vx + uy * vy, ux * ux + uy * uy
        cross = ux * vy - uy * vx
        if len2 == 0 or dot <= 0:
            return vx * vx + vy * vy
        if dot >= len2:
            return wx * wx + wy * wy
        return cross * cross / len2

    for pid, plat, plon in pts:
        cand = sorted(
            (d2_of(plat, plon, *sg[1:]), sg[0])
            for sg in segs
            if d2_of(plat, plon, *sg[1:]) <= 1.5 * 1.5
        )
        if not cand:
            assert pid not in got
        else:
            d2, sid = cand[0]
            assert got[pid][0] == sid
            assert got[pid][1] == pytest.approx(d2, rel=1e-12)


def test_snap_rejects_oversized_segment(spark):
    from osm_pbf_spark.operators.distance import snap_to_segments

    p = spark.createDataFrame([(1, 0.0, 0.0)], "doc_id long, lat double, lon double")
    s = spark.createDataFrame(
        [(1, -50.0, -120.0, 50.0, 120.0)],
        "seg_id long, alat double, alon double, blat double, blon double",
    )
    with pytest.raises(Exception, match="pre-split"):
        snap_to_segments(p, s, radius=2.0).collect()


# ---------------- quadkey ----------------


def _qk_py(lat: float, lon: float, z: int) -> str:
    n = 1 << z
    x = min(max(int(math.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
    y = min(max(int(math.floor((lat + 90.0) / 180.0 * n)), 0), n - 1)
    out = []
    for i in range(1, z + 1):
        s = 1 << (z - i)
        out.append(str((x // s) % 2 + ((y // s) % 2) * 2))
    return "".join(out)


def test_quadkey_matches_python_and_prefix_property(spark):
    from osm_pbf_spark.functions.tiles import quadkey_col

    rng = np.random.default_rng(9)
    rows = [
        (i, float(rng.uniform(-90, 90)), float(rng.uniform(-180, 180)))
        for i in range(500)
    ] + [(1000, 90.0, 180.0), (1001, -90.0, -180.0), (1002, 0.0, 0.0)]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    got = df.select(
        "id", "lat", "lon",
        quadkey_col(F.col("lat"), F.col("lon"), 7).alias("q7"),
        quadkey_col(F.col("lat"), F.col("lon"), 4).alias("q4"),
    ).collect()
    for r in got:
        assert r.q7 == _qk_py(r.lat, r.lon, 7)
        assert r.q4 == _qk_py(r.lat, r.lon, 4)
        assert r.q7.startswith(r.q4)  # ancestor ⟺ prefix


# ---------------- chunk_spans ----------------


def test_chunk_spans_never_splits_and_places_media(spark):
    from osm_pbf_spark.operators.docrender import chunk_spans

    spans = [
        ("text", "a" * 30, None, 0),
        ("media", "", "m/1", 30),   # zero-width media at offset 30 -> chunk 0
        ("text", "b" * 30, None, 30),  # crosses 48 but starts at 30 -> chunk 0
        ("text", "c" * 10, None, 60),  # chunk 1
        ("media", "", "m/2", 70),
        ("text", "d" * 40, None, 70),
        ("text", "e", None, 110),      # chunk 2
    ]
    docs = spark.createDataFrame(
        [("d1", spans)],
        "doc_id string, spans array<struct<kind string, text string, media_ref string, offset int>>",
    )
    got = {r.chunk_idx: (r.n_spans, r.n_text_spans, r.n_media, r.chars)
           for r in chunk_spans(docs, max_chars=48).collect()}
    assert got == {0: (3, 2, 1, 60), 1: (3, 2, 1, 50), 2: (1, 1, 0, 1)}
    with pytest.raises(ValueError):
        chunk_spans(docs, max_chars=0)


# ---------------- bigram_pmi ----------------


def test_bigram_pmi_hand_computed(spark):
    from osm_pbf_spark.operators.text import bigram_pmi

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a  b"), (3, "c")],  # double space + 1-token doc
        "doc_id long, text string",
    )
    rows = bigram_pmi(docs, min_count=2).collect()
    assert len(rows) == 1
    r = rows[0]
    # unigrams a:3 b:3 c:1 (N_tok=7); pairs (a,b):3 (b,a):1 (N_pair=4)
    assert (r.a, r.b, r.c_ab) == ("a", "b", 3)
    want = math.log((3 / 4) / ((3 / 7) * (3 / 7)))
    assert r.pmi == pytest.approx(want, rel=1e-12)


# ---------------- group_sample ----------------


def test_group_sample_exact_k_deterministic_prefilter_exact(spark):
    from osm_pbf_spark.operators.packing import group_sample

    rows = [(i, f"g{i % 5}") for i in range(300)] + [(1000, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = group_sample(df, k=10, group_col="lang").collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r.lang, set()).add(r.doc_id)
    assert {g: len(v) for g, v in by_g.items()} == {
        **{f"g{i}": 10 for i in range(5)}, "tiny": 1,
    }
    # deterministic across partitionings
    got2 = group_sample(df.repartition(11), k=10, group_col="lang").collect()
    assert {(r.doc_id, r.lang) for r in got2} == {(r.doc_id, r.lang) for r in got}
    # generous pre-filter (60 rows/group, keep ~half >> k=10) is exact
    # for the big groups (the 1-row group may fall below the filter,
    # which is precisely the caller-owned bound the docstring states)
    got3 = group_sample(df, k=10, group_col="lang", prefilter_fraction=0.5).collect()
    big = {(r.doc_id, r.lang) for r in got if r.lang != "tiny"}
    big3 = {(r.doc_id, r.lang) for r in got3 if r.lang != "tiny"}
    assert big == big3


# ---------------- pagerank ----------------


def test_pagerank_matches_integer_replay(spark):
    from osm_pbf_spark.operators.graph import pagerank

    rng = np.random.default_rng(17)
    edges = {(int(a), int(b)) for a, b in rng.integers(0, 60, (300, 2)) if a != b}
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    scale, num, den, iters = 10**12, 85, 100, 5
    got = {r.node: r.rank for r in pagerank(df, iterations=iters).repartition(7).collect()}

    nodes = sorted({n for e in edges for n in e})
    outdeg = {}
    for a, _ in edges:
        outdeg[a] = outdeg.get(a, 0) + 1
    base = scale * (den - num) // den
    rank = {n: scale for n in nodes}
    for _ in range(iters):
        s = {n: 0 for n in nodes}
        for a, b in edges:
            s[b] += rank[a] // outdeg[a]
        rank = {n: base + num * s[n] // den for n in nodes}
    assert got == rank
    assert all(v >= base for v in got.values())


# ---------------- content-defined chunking ----------------


def test_cdc_kernel_matches_ring_replay_and_tiles_doc(spark):
    from osm_pbf_spark.operators.cdc import cdc_boundaries_np, cdc_chunks
    from tests import oracle_cdc

    rng = np.random.default_rng(23)
    texts = [
        "".join(chr(int(c)) for c in rng.integers(32, 1000, int(n)))
        for n in rng.integers(0, 2000, 40)
    ]
    for t in texts:
        got = cdc_boundaries_np(t, 16, 0x3F, 32, 512)
        want = oracle_cdc.boundaries(t)
        assert got == want
        # chunks tile the document exactly
        if t:
            assert got[-1] == len(t)
            lens = np.diff([0] + got)
            assert (lens >= 1).all() and (lens <= 512).all()

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = cdc_chunks(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.c_start, r.c_len))
    for i, t in enumerate(texts):
        assert sorted(by_doc.get(i, [])) == oracle_cdc.chunks(t)


def test_cdc_edit_locality():
    """The whole point of CDC: a point edit only moves boundaries near
    the edit — chunks further than window+max_len away are unchanged."""
    from tests import oracle_cdc

    rng = np.random.default_rng(29)
    base = "".join(chr(int(c)) for c in rng.integers(97, 123, 4000))
    edited = base[:2000] + "X" + base[2001:]
    b0 = set(oracle_cdc.boundaries(base))
    b1 = set(oracle_cdc.boundaries(edited))
    horizon = 2000 - (16 + 512), 2000 + (16 + 512)
    assert {b for b in b0 if b < horizon[0]} == {b for b in b1 if b < horizon[0]}
    assert {b for b in b0 if b > horizon[1]} == {b for b in b1 if b > horizon[1]}


# ---------------- repetition stats / triangle count ----------------


def test_repetition_stats_hand_case(spark):
    from osm_pbf_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b"),   # trigrams: abc bca cab abc bca cab -> 6 total, 3 distinct
            (2, "x  y"),              # 2 tokens -> no trigrams; top 1
            (3, ""),                  # empty
            (4, "w w w w"),           # trigram 'w w w' x2 -> dup 1; top 4
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_tokens, r.n_trigrams, r.n_dup_trigrams, r.top_tok_count)
           for r in repetition_stats(docs).collect()}
    assert got[1] == (8, 6, 3, 3)
    assert got[2] == (2, 0, 0, 1)
    assert got[3] == (0, 0, 0, 0)
    assert got[4] == (4, 2, 1, 4)


def test_triangle_count_known_graphs(spark):
    from osm_pbf_spark.operators.graph import triangle_count

    def count(pairs):
        df = spark.createDataFrame(pairs, "src long, dst long")
        return triangle_count(df).collect()[0]

    # K4: 4 triangles; duplicate + reversed + self edges must not matter
    k4 = [(i, j) for i in range(4) for j in range(4) if i != j] + [(0, 0), (1, 2)]
    r = count(k4)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)
    # star graph: no triangles; hub degree must not explode wedge count
    star = [(0, i) for i in range(1, 50)]
    r = count(star)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (50, 49, 0)
    # two disjoint triangles sharing no nodes
    r = count([(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10)])
    assert r.n_triangles == 2


# ---------------- segment-intersection join ----------------


def test_segment_intersect_join_vs_brute(spark):
    from osm_pbf_spark.operators.segjoin import SEG_SNAP_SCALE, segment_intersect_join

    rng = np.random.default_rng(41)
    segs = []
    for j in range(120):
        alat, alon = float(rng.uniform(0, 10)), float(rng.uniform(0, 10))
        segs.append((j, alat, alon,
                     alat + float(rng.uniform(-2, 2)), alon + float(rng.uniform(-2, 2))))
    # engineered degeneracies: shared endpoint, collinear overlap, T-touch
    segs += [
        (200, 0.0, 0.0, 1.0, 1.0), (201, 1.0, 1.0, 2.0, 0.0),   # shared endpoint
        (202, 5.0, 5.0, 5.0, 7.0), (203, 5.0, 6.0, 5.0, 8.0),   # collinear overlap
        (204, 3.0, 3.0, 3.0, 5.0), (205, 2.0, 4.0, 3.0, 4.0),   # T touch
    ]
    df = spark.createDataFrame(
        segs, "seg_id long, alat double, alon double, blat double, blon double"
    )
    out = segment_intersect_join(df, df, level=5).where(F.col("id_a") < F.col("id_b"))
    got = {(r.id_a, r.id_b): r.proper for r in out.collect()}

    def snap(v):
        return math.floor(v * SEG_SNAP_SCALE + 0.5)

    def orient(a, b, c):
        return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])

    def on_seg(a, b, p):
        return (min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
                and min(a[1], b[1]) <= p[1] <= max(a[1], b[1]))

    def inter(s, t):
        p0 = (snap(s[2]), snap(s[1])); p1 = (snap(s[4]), snap(s[3]))
        q0 = (snap(t[2]), snap(t[1])); q1 = (snap(t[4]), snap(t[3]))
        d1, d2 = orient(p0, p1, q0), orient(p0, p1, q1)
        d3, d4 = orient(q0, q1, p0), orient(q0, q1, p1)
        opp = lambda x, y: (x > 0 > y) or (x < 0 < y)
        proper = opp(d1, d2) and opp(d3, d4)
        touch = ((d1 == 0 and on_seg(p0, p1, q0)) or (d2 == 0 and on_seg(p0, p1, q1))
                 or (d3 == 0 and on_seg(q0, q1, p0)) or (d4 == 0 and on_seg(q0, q1, p1)))
        return proper, touch

    want = {}
    for i in range(len(segs)):
        for j in range(i + 1, len(segs)):
            proper, touch = inter(segs[i], segs[j])
            if proper or touch:
                want[(segs[i][0], segs[j][0])] = proper
    assert got == want
    # the engineered touches are present and flagged non-proper
    assert got[(200, 201)] is False
    assert got[(202, 203)] is False
    assert got[(204, 205)] is False


def test_ring_self_intersections(spark):
    from osm_pbf_spark.operators.segjoin import SEG_SNAP_SCALE, ring_self_intersections

    def ring(poly_id, ring_idx, pts):
        return (poly_id, ring_idx, [{"lat": la, "lon": lo} for la, lo in pts])

    rows = [
        # valid convex quad -> no flags
        ring(1, 0, [(0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0)]),
        # bowtie: vertices 2/3 swapped -> segments 1 and 3 cross
        ring(2, 0, [(0.0, 0.0), (2.0, 2.0), (0.0, 2.0), (2.0, 0.0)]),
        # figure-8 pentagon: one crossing
        ring(3, 0, [(0.0, 0.0), (2.0, 2.0), (2.0, 0.0), (0.0, 2.0), (-1.0, 1.0)]),
        # ring that merely TOUCHES itself at a vertex (pinch) -> not proper
        ring(4, 0, [(0.0, 0.0), (1.0, 1.0), (2.0, 0.0), (1.0, 1.0, ), (0.0, 2.0)][:3]
             + [(2.0, 2.0)]),
        # two mutually overlapping valid rings must NOT cross-flag
        ring(5, 0, [(10.0, 10.0), (10.0, 14.0), (14.0, 14.0), (14.0, 10.0)]),
        ring(6, 0, [(11.0, 9.0), (11.0, 13.0), (13.0, 13.0), (13.0, 9.0)]),
        # same poly, two rings (outer + hole) that cross EACH OTHER but
        # not themselves -> ring-scoped check stays silent
        ring(7, 0, [(20.0, 20.0), (20.0, 24.0), (24.0, 24.0), (24.0, 20.0)]),
        ring(7, 1, [(22.0, 18.0), (22.0, 22.0), (26.0, 22.0), (26.0, 18.0)]),
    ]
    df = spark.createDataFrame(
        rows, "poly_id long, ring_idx int, pts array<struct<lat double, lon double>>"
    )
    out = ring_self_intersections(df, level=8)
    got = {(r.poly_id, r.ring_idx, r.seg_i, r.seg_j) for r in out.collect()}

    # brute-force oracle: same integer predicate on every same-ring pair
    def snap(v):
        return math.floor(v * SEG_SNAP_SCALE + 0.5)

    def orient(a, b, c):
        return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])

    want = set()
    for poly_id, ring_idx, pts in rows:
        p = [(snap(d["lon"]), snap(d["lat"])) for d in pts]
        n = len(p)
        segs = [(p[i], p[(i + 1) % n]) for i in range(n)]
        for i in range(n):
            for j in range(i + 1, n):
                (p0, p1), (q0, q1) = segs[i], segs[j]
                d1, d2 = orient(p0, p1, q0), orient(p0, p1, q1)
                d3, d4 = orient(q0, q1, p0), orient(q0, q1, p1)
                opp = lambda x, y: (x > 0 > y) or (x < 0 < y)
                if opp(d1, d2) and opp(d3, d4):
                    want.add((poly_id, ring_idx, i + 1, j + 1))
    assert got == want
    assert (2, 0, 1, 3) in got and (3, 0, 1, 3) in got
    assert not any(pid in (1, 4, 5, 6, 7) for pid, *_ in got)
