"""tfidf vs a scalar Python replay (exact ints; ln compared at 1e-9)."""

from __future__ import annotations

import math

from osm_pbf_spark.operators.text import tfidf


def test_tfidf_matches_scalar_replay(spark):
    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat"),
        (3, "cat dog cat"),
        (4, "completely different words here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.doc_id, r.term): (r.tf, r.tfidf) for r in tfidf(df).collect()}

    n = len(docs)
    tf: dict[tuple[int, str], int] = {}
    df_t: dict[str, set[int]] = {}
    for did, text in docs:
        for t in text.split(" "):
            if t:
                tf[(did, t)] = tf.get((did, t), 0) + 1
                df_t.setdefault(t, set()).add(did)
    want = {
        k: (c, c * (math.log((n + 1) / (len(df_t[k[1]]) + 1)) + 1.0)) for k, c in tf.items()
    }
    assert set(got) == set(want)
    for k, (c, v) in want.items():
        assert got[k][0] == c
        assert abs(got[k][1] - v) <= 1e-9 * max(1.0, abs(v))


def test_tfidf_empty_tokens_dropped(spark):
    df = spark.createDataFrame([(1, "a  b"), (2, "")], "doc_id long, text string")
    rows = tfidf(df).collect()
    assert all(r.term for r in rows)
    assert {r.doc_id for r in rows} == {1}


def test_tfidf_plan_no_python(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = tfidf(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan
