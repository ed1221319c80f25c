"""asof_join / sessionize vs brute-force scalar oracles, plus plan
shape (single key shuffle, no Python stage, no join node in asof)."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from osm_pbf_spark.operators.temporal import asof_join, sessionize

BASE = dt.datetime(2024, 1, 1)


def _ts(s: float) -> dt.datetime:
    return BASE + dt.timedelta(seconds=float(s))


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_join_matches_bruteforce(spark):
    rng = np.random.default_rng(21)
    left_rows, right_rows = [], []
    for i in range(400):
        left_rows.append((i, int(rng.integers(0, 12)), _ts(rng.integers(0, 5000)), float(i)))
    seen = set()
    for j in range(300):
        k = int(rng.integers(0, 12))
        t = int(rng.integers(0, 5000))
        if (k, t) in seen:  # keep right unique per (key, ts)
            continue
        seen.add((k, t))
        right_rows.append((k, _ts(t), 1000.0 + j))
    left = _mk(spark, left_rows, "event_id long, user_id long, ts timestamp, value double")
    right = _mk(spark, right_rows, "user_id long, ts timestamp, r_value double")
    got = {
        r.event_id: r.r_value
        for r in asof_join(left, right, on="user_id", ts_col="ts").collect()
    }
    for eid, k, t, _ in left_rows:
        cand = [(rt, rv) for rk, rt, rv in right_rows if rk == k and rt <= t]
        want = max(cand)[1] if cand else None
        assert got[eid] == want, (eid, k, t)


def test_asof_join_equal_ts_inclusive_and_no_match(spark):
    left = _mk(spark, [(1, 7, _ts(100), 0.0), (2, 7, _ts(50), 0.0)],
               "event_id long, user_id long, ts timestamp, value double")
    right = _mk(spark, [(7, _ts(100), 42.0)], "user_id long, ts timestamp, r_value double")
    got = {r.event_id: r.r_value for r in asof_join(left, right, on="user_id").collect()}
    assert got[1] == 42.0  # equal ts matches (inclusive)
    assert got[2] is None  # nothing at or before -> null


def test_asof_join_plan_single_shuffle_no_join(spark):
    left = _mk(spark, [(1, 7, _ts(1), 0.0)],
               "event_id long, user_id long, ts timestamp, value double")
    right = _mk(spark, [(7, _ts(1), 1.0)], "user_id long, ts timestamp, r_value double")
    plan = asof_join(left, right, on="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert plan.count("Exchange") == 1  # ONE shuffle on the key
    assert "Join" not in plan  # union+window, never a join explosion


def test_sessionize_matches_bruteforce(spark):
    rng = np.random.default_rng(33)
    rows = []
    for k in range(6):
        t = 0.0
        for _ in range(80):
            t += float(rng.integers(1, 120))
            rows.append((k, _ts(t)))
    df = _mk(spark, rows, "user_id long, ts timestamp")
    gap = 60.0
    got = {
        (r.user_id, r.session_seq): (r.n_events, r.start_ts, r.end_ts, r.duration_s)
        for r in sessionize(df, gap_s=gap).collect()
    }
    # scalar replay
    want = {}
    by_key: dict[int, list[dt.datetime]] = {}
    for k, t in rows:
        by_key.setdefault(k, []).append(t)
    for k, ts_list in by_key.items():
        ts_list.sort()
        seq, start, prev, n = 0, None, None, 0
        for t in ts_list:
            if prev is None or (t - prev).total_seconds() > gap:
                if start is not None:
                    want[(k, seq)] = (n, start, prev, (prev - start).total_seconds())
                seq += 1
                start, n = t, 0
            n += 1
            prev = t
        want[(k, seq)] = (n, start, prev, (prev - start).total_seconds())
    assert got == want


def test_sessionize_ntz_timestamps(spark):
    # parquet tables load as TIMESTAMP_NTZ; the micros helper must work
    df = _mk(spark, [(1, _ts(0)), (1, _ts(10)), (1, _ts(5000))],
             "user_id long, ts timestamp_ntz")
    out = {r.session_seq: r.n_events for r in sessionize(df, gap_s=3600).collect()}
    assert out == {1: 2, 2: 1}


def test_funnel_ordering_constraint(spark):
    from osm_pbf_spark.operators.temporal import funnel

    rows = [
        # u1 completes in order
        (1, "view", _ts(10)), (1, "click", _ts(20)), (1, "purchase", _ts(30)),
        # u2: click BEFORE the first view must not count; no click after
        (2, "click", _ts(5)), (2, "view", _ts(10)), (2, "purchase", _ts(20)),
        # u3: never viewed -> no row at all
        (3, "click", _ts(1)), (3, "purchase", _ts(2)),
        # u4: same-timestamp stage event counts (>=)
        (4, "view", _ts(7)), (4, "click", _ts(7)), (4, "purchase", _ts(6)),
    ]
    e = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r.user_id: (r.stage, r.ts_1, r.ts_2, r.ts_3)
           for r in funnel(e, ["view", "click", "purchase"]).collect()}
    assert set(got) == {1, 2, 4}
    assert got[1] == (3, _ts(10), _ts(20), _ts(30))
    assert got[2] == (1, _ts(10), None, None)  # early click ignored
    assert got[4] == (2, _ts(7), _ts(7), None)  # equal ts counts; purchase too early


def test_resample_gap_fill_and_quantized_sums(spark):
    from osm_pbf_spark.operators.temporal import resample

    rows = [
        (1, _ts(0), 1.25), (1, _ts(5), 2.5),      # bucket 0
        (1, _ts(35), 4.0),                         # bucket 3 (gap 1-2)
        (2, _ts(12), -1.75),                       # single bucket
    ]
    e = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {(r.user_id, r.bucket + 0): (r.n_events, r.value_sum_q)
           for r in resample(e, bucket_s=10).collect()}
    base = {b for (u, b) in got if u == 1}
    assert base == {min(base) + i for i in range(4)}  # contiguous incl. gaps
    b0 = min(base)
    assert got[(1, b0)] == (2, 1250 + 2500)
    assert got[(1, b0 + 1)] == (0, None) and got[(1, b0 + 2)] == (0, None)
    assert got[(1, b0 + 3)] == (1, 4000)
    ((u2b, v2),) = [(b, v) for (u, b), v in got.items() if u == 2]
    assert v2 == (1, -1750)  # floor(-1.75*1000) = -1750 exactly
