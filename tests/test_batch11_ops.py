"""Batch-11 operators: cooldown debounce (temporal.debounce) and the
declarative data-quality checker (dq.check_constraints)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ts(s: int):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


def test_debounce_keeps_cooldown_survivors(spark):
    from osm_pbf_spark.operators.temporal import debounce

    # key 1: events at 0, 30, 60, 61, 130 s with gap 60 -> keep 0, 60, 130
    # (30 is dropped but does NOT restart the clock — the sessionize
    # distinction); key 2: all inside one gap -> keep only the first
    rows = [
        (1, 1, _ts(0)), (2, 1, _ts(30)), (3, 1, _ts(60)), (4, 1, _ts(61)),
        (5, 1, _ts(130)),
        (6, 2, _ts(0)), (7, 2, _ts(10)), (8, 2, _ts(59)),
    ]
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, ts timestamp")
    kept = {r.event_id for r in debounce(df, gap_s=60.0).collect()}
    assert kept == {1, 3, 5, 6}


def test_debounce_tie_break_and_partitioning(spark):
    from osm_pbf_spark.operators.temporal import debounce

    rows = [(i, i % 7, _ts((i * 13) % 500)) for i in range(300)]
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, ts timestamp")

    def brute():
        by = {}
        for e, u, t in rows:
            by.setdefault(u, []).append((t, e))
        out = set()
        for u, evs in by.items():
            last = None
            for t, e in sorted(evs):
                if last is None or (t - last).total_seconds() >= 45:
                    out.add(e)
                    last = t
        return out

    want = brute()
    for parts in (1, 8):
        got = {r.event_id for r in debounce(df.repartition(parts), gap_s=45.0).collect()}
        assert got == want


def test_debounce_validation(spark):
    from osm_pbf_spark.operators.temporal import debounce

    df = spark.createDataFrame([(1, 1, _ts(0))], "event_id bigint, user_id bigint, ts timestamp")
    with pytest.raises(ValueError):
        debounce(df, gap_s=0)


def test_check_constraints_counts(spark):
    from osm_pbf_spark.operators.dq import check_constraints

    df = spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (1, 10.0, "A"),   # duplicate key (1 extra copy)
            (2, -5.0, "B"),   # range + set violation
            (3, None, None),  # null v (range rule skips NULL), null flag
            (9, 2.0, "A"),    # orphan key
        ],
        "k bigint, v double, flag string",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    got = {
        r.rule: r.n_violations
        for r in check_constraints(
            df,
            not_null=["flag"],
            ranges=[("v", 0.0, 100.0)],
            in_set=[("flag", ["A"])],
            unique=[["k"]],
            refs=[("k", parent, "pk")],
        ).collect()
    }
    assert got == {
        "not_null:flag": 1,
        "range:v": 1,       # NULL v is not a range violation
        "in_set:flag": 1,   # NULL flag is not an in_set violation
        "unique:k": 1,
        "ref:k": 1,
    }


def test_check_constraints_all_green_and_empty(spark):
    from osm_pbf_spark.operators.dq import check_constraints

    df = spark.createDataFrame([(1, 5.0)], "k bigint, v double")
    got = {
        r.rule: r.n_violations
        for r in check_constraints(
            df, not_null=["k"], ranges=[("v", 0.0, 10.0)], unique=[["k"]]
        ).collect()
    }
    assert got == {"not_null:k": 0, "range:v": 0, "unique:k": 0}
    with pytest.raises(ValueError):
        check_constraints(df)


# ---------------------------------------------------------------------------
# perceptual-hash media near-dup
# ---------------------------------------------------------------------------


def test_media_neardup_recall_vs_brute(spark):
    import numpy as np

    from osm_pbf_spark.operators.multimodal import (
        dhash64_col,
        near_dup_media_pairs,
    )

    rng = np.random.RandomState(13)
    base = rng.randint(0, 256, (30, 64))
    rows = [(f"g{i}", base[i].tolist()) for i in range(30)]
    # planted variants: bump k random pixels by 1 (k = 1..3)
    for i in range(12):
        p = base[i % 30].copy()
        for pos in rng.choice(64, size=(i % 3) + 1, replace=False):
            p[pos] = min(int(p[pos]) + 1, 255)
        rows.append((f"v{i}", p.tolist()))
    df = spark.createDataFrame(rows, "media_ref string, px array<int>")
    hashed = df.select("media_ref", dhash64_col(F.col("px")).alias("phash"))
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in near_dup_media_pairs(hashed, max_hamming=3).collect()
    }

    # brute replay
    def dh(p):
        v = 0
        for i in range(64):
            if p[i] > p[(i + 1) % 64]:
                v |= 1 << i
        return v

    hs = {ref: dh(p) for ref, p in rows}
    refs = sorted(hs)
    want = set()
    for x in range(len(refs)):
        for y in range(x + 1, len(refs)):
            a, b = refs[x], refs[y]
            ham = bin(hs[a] ^ hs[b]).count("1")
            if ham <= 3:
                want.add((a, b, ham))
    assert got == want
    # exact duplicates pair at hamming 0
    assert any(h == 0 for _, _, h in got) or not any(
        hs[f"v{i}"] == hs[f"g{i % 30}"] for i in range(12)
    )


def test_media_neardup_validation_and_plan(spark):
    from osm_pbf_spark.operators.multimodal import near_dup_media_pairs

    hashed = spark.createDataFrame([("a", 5)], "media_ref string, phash long")
    with pytest.raises(ValueError):
        near_dup_media_pairs(hashed, max_hamming=4)
    plan = near_dup_media_pairs(hashed)._jdf.queryExecution().executedPlan().toString()
    # banding is one native Generate; the verify is native popcount
    assert "Generate posexplode" in plan
    assert "InPandas" not in plan and "EvalPython" not in plan


# ---------------------------------------------------------------------------
# time-weighted average
# ---------------------------------------------------------------------------


def test_twap_step_function(spark):
    import datetime as dt

    from osm_pbf_spark.operators.temporal import twap

    base = dt.datetime(2026, 1, 1)
    rows = [
        # key 1: v=10 for 60 s, v=30 for 30 s, last obs open-ended
        (1, 1, base, 10),
        (2, 1, base + dt.timedelta(seconds=60), 30),
        (3, 1, base + dt.timedelta(seconds=90), 999),
        # key 2: single obs -> NULL twap (no duration)
        (4, 2, base, 5),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, vq bigint"
    )
    got = {r.user_id: (r.n_obs, r.twap) for r in twap(df).collect()}
    assert got[1][0] == 3
    assert got[1][1] == (10 * 60 + 30 * 30) / 90.0
    assert got[2] == (1, None)


def test_audio_frame_plan_windows(spark):
    from osm_pbf_spark.operators.multimodal import audio_frame_plan

    clips = spark.createDataFrame(
        [("a", 1000), ("b", 400), ("c", 399), ("d", 560)],
        "media_ref string, duration_ms int",
    )
    got = {
        (r.media_ref, r.frame_idx, r.start_ms, r.end_ms)
        for r in audio_frame_plan(clips, frame_ms=400, hop_ms=160).collect()
    }
    # a: n = 1 + (1000-400)//160 = 4 frames; b: exactly 1; c: none;
    # d: n = 1 + 160//160 = 2
    want = {("a", i, i * 160, i * 160 + 400) for i in range(4)}
    want |= {("b", 0, 0, 400), ("d", 0, 0, 400), ("d", 1, 160, 560)}
    assert got == want

    import pytest as _pt

    with _pt.raises(ValueError):
        audio_frame_plan(clips, frame_ms=0)
