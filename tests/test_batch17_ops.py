"""Batch-17 operators: Hilbert layout keys, exact set-similarity join
(prefix filtering), discrete-Frechet trajectory join, BM25 retrieval
scoring, deterministic label propagation. Scalar/brute oracles +
plan-shape pins, the established discipline."""

from __future__ import annotations

import itertools
import math
from collections import Counter

import numpy as np
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


def _n_python_stages(plan: str) -> int:
    return sum(
        1
        for ln in plan.splitlines()
        if "ArrowEvalPython" in ln or "BatchEvalPython" in ln or "InPandas" in ln
    )


# ---------------------------------------------------------------- hilbert

def test_hilbert_grid_exact_and_adjacent(spark):
    from osm_pbf_spark.functions.hilbert import hilbert_py, hilbert_xy2d

    for bits in (1, 2, 3, 4):
        n = 1 << bits
        df = spark.range(n * n).select(
            (F.col("id") % n).alias("qx"),
            (F.col("id") / n).cast("long").alias("qy"),
        )
        got = {
            (r.qx, r.qy): r.hkey
            for r in hilbert_xy2d(df, F.col("qx"), F.col("qy"), bits).collect()
        }
        exp = {(x, y): hilbert_py(x, y, bits) for x in range(n) for y in range(n)}
        assert got == exp
        # keys are a permutation of [0, n^2)
        assert sorted(got.values()) == list(range(n * n))
        # THE Hilbert property Z-order lacks: consecutive keys are
        # always grid neighbors (Manhattan distance exactly 1)
        inv = {d: xy for xy, d in exp.items()}
        for d in range(n * n - 1):
            (x0, y0), (x1, y1) = inv[d], inv[d + 1]
            assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_hilbert_is_pure_codegen(spark):
    from osm_pbf_spark.functions.hilbert import hilbert_key_col

    df = spark.range(100).select(
        (F.col("id") % 10).cast("double").alias("x"),
        (F.col("id") / 10).cast("double").alias("y"),
    )
    out = hilbert_key_col(df, F.col("x"), F.col("y"), (0.0, 0.0), (10.0, 10.0), 8)
    plan = _plan(out)
    assert _no_python(plan), plan
    assert "Exchange" not in plan, plan  # map-only


def test_hilbert_sorted_clusters_better_than_random(spark):
    from osm_pbf_spark.functions.hilbert import hilbert_sorted

    # 32x32 grid of points in random row order -> after hilbert sort,
    # consecutive rows must be spatially close on average (locality)
    n = 32
    df = (
        spark.range(n * n)
        .select(
            F.col("id"),
            (F.xxhash64(F.col("id")) % (n * n)).alias("shuf"),
            (F.col("id") % n).cast("double").alias("x"),
            (F.col("id") / n).cast("long").cast("double").alias("y"),
        )
        .orderBy("shuf")
        .drop("shuf")
    )
    rows = hilbert_sorted(df, "x", "y", bits=5).collect()
    jumps = [
        abs(a.x - b.x) + abs(a.y - b.y) for a, b in zip(rows, rows[1:])
    ]
    # perfect hilbert order over the full grid = all jumps exactly 1
    assert sum(jumps) / len(jumps) <= 1.5
    assert {(r.x, r.y) for r in rows} == {
        (float(i % n), float(i // n)) for i in range(n * n)
    }


# ------------------------------------------------------------- setsim

def _brute_setsim(docs, num, den):
    sets = {i: set(t.split()) - {""} for i, t in docs}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        A, B = sets[a], sets[b]
        if not A or not B:
            continue
        inter = len(A & B)
        un = len(A | B)
        if den * inter >= num * un:
            out[(a, b)] = (inter, un)
    return out


def test_set_similarity_join_matches_brute(spark):
    from osm_pbf_spark.operators.dedup import set_similarity_join

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over a lazy dog"),
        (3, "quick brown foxes jump over lazy dogs"),
        (4, "completely different text about spark engines"),
        (5, "the quick brown fox jumps over the lazy dog today"),
        (6, ""),
        (7, "spark engines about text different completely extra"),
        (8, "single"),
        (9, "single"),
        (10, "a b c d e f g h"),
        (11, "a b c d e f g z"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for num, den in ((6, 10), (9, 10), (1, 1)):
        got = {
            (r.id_a, r.id_b): (r.n_inter, r.n_union)
            for r in set_similarity_join(df, (num, den)).collect()
        }
        assert got == _brute_setsim(docs, num, den), (num, den)


def test_set_similarity_join_randomized(spark):
    from osm_pbf_spark.operators.dedup import set_similarity_join

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(60):
        k = int(rng.integers(3, 15))
        docs.append((i, " ".join(rng.choice(vocab, size=k, replace=True))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): (r.n_inter, r.n_union)
        for r in set_similarity_join(df, (7, 10)).collect()
    }
    assert got == _brute_setsim(docs, 7, 10)


def test_set_similarity_join_validates_threshold(spark):
    from osm_pbf_spark.operators.dedup import set_similarity_join

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        set_similarity_join(df, (0, 10))
    with pytest.raises(ValueError):
        set_similarity_join(df, (11, 10))


# ------------------------------------------------------------- frechet

def test_frechet_diag_kernel_equals_scalar():
    from osm_pbf_spark.operators.distance import _frechet2_diag, frechet_py

    rng = np.random.default_rng(42)
    for _ in range(200):
        na, nb = int(rng.integers(1, 14)), int(rng.integers(1, 14))
        pa = [(int(x), int(y)) for x, y in rng.integers(-60, 60, (na, 2))]
        pb = [(int(x), int(y)) for x, y in rng.integers(-60, 60, (nb, 2))]
        xa = np.array([p[0] for p in pa], dtype=np.int64)
        ya = np.array([p[1] for p in pa], dtype=np.int64)
        xb = np.array([p[0] for p in pb], dtype=np.int64)
        yb = np.array([p[1] for p in pb], dtype=np.int64)
        d2 = (xa[:, None] - xb[None, :]) ** 2 + (ya[:, None] - yb[None, :]) ** 2
        assert _frechet2_diag(d2) == frechet_py(pa, pb)


def test_frechet_join_brute_and_direction_aware(spark):
    from osm_pbf_spark.operators.distance import frechet_join, frechet_py

    # 3 straight tracks: t1 west->east, t2 = t1 shifted 0.01 deg,
    # t3 = t1 REVERSED. Hausdorff(t1, t3) = 0 but Frechet(t1, t3) is
    # the full track length — only (t1, t2) passes the join.
    def mk(tid, pts):
        return (tid, [{"lat": la, "lon": lo} for la, lo in pts])

    t1 = [(10.0, 20.0 + 0.05 * i) for i in range(6)]
    t2 = [(10.01, 20.0 + 0.05 * i) for i in range(6)]
    t3 = list(reversed(t1))
    df = spark.createDataFrame(
        [mk(1, t1), mk(2, t2), mk(3, t3)],
        "track_id long, pts array<struct<lat: double, lon: double>>",
    )
    out = frechet_join(df, df, radius=0.02, level=6)
    got = {
        (r.id_a, r.id_b): r.f2
        for r in out.where(F.col("id_a") < F.col("id_b")).collect()
    }

    def snap(pts):
        return [
            (math.floor(lo * 1e6 + 0.5), math.floor(la * 1e6 + 0.5))
            for la, lo in pts
        ]

    exp_f2 = frechet_py(snap(t1), snap(t2))
    assert got == {(1, 2): exp_f2}
    # the reversed pair is Hausdorff-0 (same point set) yet correctly
    # excluded by the order-aware metric
    assert (1, 3) not in got
    # boundary inclusivity: radius exactly sqrt(f2)/1e6 keeps the pair
    r_edge = math.sqrt(exp_f2) / 1e6
    out2 = frechet_join(df, df, radius=r_edge, level=6)
    pairs2 = {
        (r.id_a, r.id_b)
        for r in out2.where(F.col("id_a") < F.col("id_b")).collect()
    }
    assert (1, 2) in pairs2


def test_frechet_join_one_python_stage(spark):
    from osm_pbf_spark.operators.distance import frechet_join

    df = spark.createDataFrame(
        [(1, [{"lat": 0.0, "lon": 0.0}])],
        "track_id long, pts array<struct<lat: double, lon: double>>",
    )
    plan = _plan(frechet_join(df, df, radius=0.5, level=8))
    assert _n_python_stages(plan) == 1, plan


# ---------------------------------------------------------------- bm25

def test_bm25_scalar_replay(spark):
    from osm_pbf_spark.operators.text import bm25

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat"),
        (3, "cats and dogs"),
        (4, "the the the cat"),
        (5, ""),
    ]
    terms = ["the", "cat"]
    k1, b = 1.2, 0.75
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_hits, r.score) for r in bm25(df, terms).collect()}

    toks = {i: [t for t in txt.split() if t] for i, txt in docs}
    n_docs = len(docs)
    n_toks = sum(len(v) for v in toks.values())
    avgdl = n_toks / n_docs
    dfreq = {
        t: sum(1 for v in toks.values() if t in v) for t in terms
    }
    for i, v in toks.items():
        hits = [t for t in set(terms) if t in v]
        if not hits:
            assert i not in got
            continue
        score = 0.0
        for t in sorted(hits):
            tf = v.count(t)
            idf = math.log((n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
            score += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(v) / avgdl))
        n_hits, got_score = got[i]
        assert n_hits == len(hits)
        assert got_score == pytest.approx(score, rel=1e-12)


def test_bm25_no_python_and_validates(spark):
    from osm_pbf_spark.operators.text import bm25

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = _plan(bm25(df, ["a"]))
    assert _no_python(plan), plan
    with pytest.raises(ValueError):
        bm25(df, [])


# ------------------------------------------------------------ labelprop

def _lpa_py(edges, rounds):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nbrs in adj.items():
            c = Counter(lab[m] for m in nbrs)
            new[n] = max(c.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        lab = new
    return lab


def test_label_propagation_matches_replay(spark):
    from osm_pbf_spark.operators.graph import label_propagation

    edges = [
        (1, 2), (2, 3), (3, 1),          # triangle A
        (10, 11), (11, 12), (12, 10),    # triangle B
        (3, 10),                         # bridge
        (20, 21),                        # pendant pair
        (2, 1),                          # dup reversed edge
        (5, 5),                          # self-loop (dropped entirely)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    for rounds in (0, 1, 2, 4):
        got = {
            r.node: r.label
            for r in label_propagation(df, rounds=rounds).collect()
        }
        assert got == _lpa_py(edges, rounds), rounds
    # communities: after 4 rounds the two triangles carry distinct
    # stable labels
    got4 = {
        r.node: r.label for r in label_propagation(df, rounds=4).collect()
    }
    assert got4[1] == got4[2] == got4[3]
    assert got4[10] == got4[11] == got4[12]
    assert got4[1] != got4[10]


def test_label_propagation_randomized(spark):
    from osm_pbf_spark.operators.graph import label_propagation

    rng = np.random.default_rng(3)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 40, (120, 2))
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.label for r in label_propagation(df, rounds=3).collect()}
    assert got == _lpa_py(edges, 3)
