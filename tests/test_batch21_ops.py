"""Batch-21 operators: Horn slope/aspect raster terrain analysis,
dedup-collapse canonical survivors, DSIR hashed-ngram importance
weights, MMR diversified top-k. Scalar/brute oracles + plan-shape
pins, the established discipline."""

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


# ------------------------------------------------------------ slope/aspect

def _horn_py(cells: dict[tuple[int, int], int]):
    """Independent scalar replay of the slope_aspect spec."""
    out = {}
    coefs = [
        (1, 0, 2, 0), (1, 1, 1, 1), (1, -1, 1, -1),
        (-1, 0, -2, 0), (-1, 1, -1, 1), (-1, -1, -1, -1),
        (0, 1, 0, 2), (0, -1, 0, -2),
    ]
    for (x, y), z in cells.items():
        nb = [(dx, dy, cgx, cgy) for dx, dy, cgx, cgy in coefs if (x + dx, y + dy) in cells]
        if len(nb) != 8:
            continue
        gx = sum(cgx * cells[(x + dx, y + dy)] for dx, dy, cgx, cgy in nb)
        gy = sum(cgy * cells[(x + dx, y + dy)] for dx, dy, cgx, cgy in nb)
        slope_q = math.floor(math.sqrt(gx * gx + gy * gy) + 0.5)
        vx, vy = -gx, -gy
        if gx == 0 and gy == 0:
            a = -1
        elif abs(vx) > abs(vy):
            a = 0 if vx > 0 else 4
        elif abs(vy) > abs(vx):
            a = 6 if vy > 0 else 2
        elif vx > 0:
            a = 7 if vy > 0 else 1
        else:
            a = 3 if vy > 0 else 5
        out[(x, y)] = (z, gx, gy, slope_q, a)
    return out


def test_slope_aspect_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.tiling import slope_aspect

    # deterministic bumpy raster with a flat plateau (aspect -1 rows),
    # axis-aligned ramps, and a ragged (non-rectangular) boundary
    cells = {}
    for x in range(20):
        for y in range(16):
            if (x + 2 * y) % 29 == 27:
                continue  # holes: their neighbors drop out of the output
            if 4 <= x <= 8 and 4 <= y <= 7:
                z = 500  # plateau
            else:
                z = (x * x * 7 + y * 13 + (x * y) % 5) % 997
            cells[(x, y)] = z
    df = spark.createDataFrame(
        [(x, y, z) for (x, y), z in cells.items()], "x long, y long, z long"
    )
    got = {
        (r.x, r.y): (r.z, r.gx, r.gy, r.slope_q, r.aspect8)
        for r in slope_aspect(df).collect()
    }
    assert got == _horn_py(cells)
    # interior plateau cells are flat
    assert got[(6, 5)][4] == -1 and got[(6, 5)][3] == 0


def test_slope_aspect_plan_is_pure_codegen(spark):
    from osm_pbf_spark.operators.tiling import slope_aspect

    df = spark.range(100).select(
        (F.col("id") % 10).alias("x"),
        (F.col("id") / 10).cast("long").alias("y"),
        (F.col("id") * 37 % 97).alias("z"),
    )
    plan = _plan(slope_aspect(df))
    assert _no_python(plan)
    # one scatter aggregate + the join back: exactly 2 exchange kinds
    body = plan.split("== Initial Plan ==")[0]
    assert body.count("Exchange") <= 4  # agg partial/final + join sides


# --------------------------------------------------------- dedup collapse

def test_dedup_canonical_survivors(spark):
    from osm_pbf_spark.operators.graph import dedup_canonical, near_dup_groups

    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (7, 8)], "id_a long, id_b long"
    )
    groups = near_dup_groups(docs, pairs)
    surv = {r.doc_id: r.group_size for r in dedup_canonical(groups).collect()}
    # clusters {1,3,5} -> keep 1 (size 3), {7,8} -> keep 7 (size 2),
    # singletons keep themselves
    assert surv == {0: 1, 1: 3, 2: 1, 4: 1, 6: 1, 7: 2, 9: 1}


# ------------------------------------------------------------------ DSIR

def test_dsir_weights_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.packing import dsir_weights, _dsir_bucket_py

    target = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the lazy dog sleeps"), (3, "quick quick fox")],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (10, "the quick fox runs"),
            (11, "zzz qqq www"),
            (12, "the the the"),
            (13, ""),
        ],
        "doc_id long, text string",
    )
    B = 64
    got = {r.doc_id: (r.n_feats, r.dsir_weight) for r in
           dsir_weights(raw, target, n_buckets=B).collect()}

    # independent scalar replay
    def feats(text):
        toks = [t for t in text.split(" ") if t]
        fs = ["1|" + t for t in toks]
        fs += ["2|" + a + " " + b for a, b in zip(toks, toks[1:])]
        return [_dsir_bucket_py(f, B) for f in fs]

    tcnt: dict[int, int] = {}
    for _, txt in [(1, "the quick brown fox"), (2, "the lazy dog sleeps"), (3, "quick quick fox")]:
        for b in feats(txt):
            tcnt[b] = tcnt.get(b, 0) + 1
    raws = [(10, "the quick fox runs"), (11, "zzz qqq www"), (12, "the the the"), (13, "")]
    pcnt: dict[int, int] = {}
    for _, txt in raws:
        for b in feats(txt):
            pcnt[b] = pcnt.get(b, 0) + 1
    T = sum(tcnt.values())
    P = sum(pcnt.values())
    for did, txt in raws:
        fs = feats(txt)
        if not fs:
            assert got[did] == (0, None)
            continue
        s = 0
        for b in fs:
            lr = math.log((tcnt.get(b, 0) + 1) / (T + B)) - math.log(
                (pcnt.get(b, 0) + 1) / (P + B)
            )
            # HALF-EVEN like Spark F.round on *.5? F.round is HALF_UP;
            # replicate via floor(x + 0.5) on the positive shift trick
            q = math.floor(lr * 1e6 + 0.5) if lr >= 0 else -math.floor(-lr * 1e6 + 0.5)
            s += q
        n, w = got[did]
        assert n == len(fs)
        assert w == pytest.approx(s / 1e6 / len(fs), abs=2e-6)
    # repeated-token doc (12) is over-represented in raw vs target -> low weight
    assert got[12][1] < got[10][1]


def test_dsir_weights_deterministic_and_no_python(spark):
    from osm_pbf_spark.operators.packing import dsir_weights

    target = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    raw = spark.createDataFrame([(9, "a b"), (8, "c d e")], "doc_id long, text string")
    out = dsir_weights(raw, target, n_buckets=32)
    assert _no_python(_plan(out))
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, dsir_weights(raw, target, n_buckets=32).collect()))
    assert a == b


# ------------------------------------------------------------------- MMR

def test_mmr_topk_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.ann import mmr_topk, mmr_topk_py

    # candidate rows: (q_id, doc_id, rel int64, vec array<bigint>)
    cands = [
        # q0: docs 1,2 nearly identical, 3 diverse but less relevant
        (0, 1, 1000, [10, 0, 0]),
        (0, 2, 990, [10, 1, 0]),
        (0, 3, 700, [0, 10, 0]),
        (0, 4, 500, [0, 0, 10]),
        # q1: tie relevance -> smallest doc_id first
        (1, 7, 800, [5, 5, 0]),
        (1, 6, 800, [5, 5, 0]),
    ]
    df = spark.createDataFrame(
        cands, "q_id long, doc_id long, rel long, vec array<bigint>"
    )
    got = [
        (r.q_id, r.rank, r.doc_id, r.mmr_num)
        for r in mmr_topk(df, k=3, lam_num=7, lam_den=10)
        .orderBy("q_id", "rank")
        .collect()
    ]
    exp = []
    for qid in (0, 1):
        rows = [(d, r, v) for (q, d, r, v) in cands if q == qid]
        exp += [(qid, rank, did, num) for rank, did, num in mmr_topk_py(rows, 3, 7, 10)]
    assert got == exp
    # q0: pick 1 (top rel), then 3 (diverse beats near-dup 2)
    q0 = [d for (q, _, d, _) in got if q == 0]
    assert q0[0] == 1 and q0[1] == 3
    # q1 tie -> 6 before 7
    q1 = [d for (q, _, d, _) in got if q == 1]
    assert q1[0] == 6


def test_mmr_topk_one_pandas_stage(spark):
    from osm_pbf_spark.operators.ann import mmr_topk

    df = spark.createDataFrame(
        [(0, 1, 10, [1, 2]), (0, 2, 9, [2, 1])],
        "q_id long, doc_id long, rel long, vec array<bigint>",
    )
    plan = _plan(mmr_topk(df, k=2, lam_num=1, lam_den=2))
    body = plan.split("== Initial Plan ==")[0]
    assert body.count("FlatMapGroupsInPandas") == 1
