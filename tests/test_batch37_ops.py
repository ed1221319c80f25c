"""Batch-37: rank_metrics, confusion_metrics, ece_calibration."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F  # noqa: F401


# ------------------------------------------------------------ rank_metrics


def _scalar_rank_metrics(rows, k=10):
    """Independent scalar replay: rows = [(query, item, rel, score)]."""
    from osm_pbf_spark.operators.evals import ndcg_discounts

    disc = ndcg_discounts(k)
    out = {}
    byq: dict = {}
    for q, item, rel, score in rows:
        byq.setdefault(q, []).append((item, rel, score))
    for q, docs in byq.items():
        sys_order = sorted(docs, key=lambda d: (-d[2], d[0]))
        ideal_order = sorted(docs, key=lambda d: (-d[1], d[0]))
        dcg = sum(
            rel * disc[i]
            for i, (_, rel, _) in enumerate(sys_order[:k])
        )
        idcg = sum(
            rel * disc[i]
            for i, (_, rel, _) in enumerate(ideal_order[:k])
        )
        n_rel = sum(1 for _, rel, _ in docs if rel > 0)
        n_rel_at_k = sum(1 for _, rel, _ in sys_order[:k] if rel > 0)
        first = next(
            (i + 1 for i, (_, rel, _) in enumerate(sys_order) if rel > 0),
            None,
        )
        out[q] = dict(
            n=len(docs),
            n_rel=n_rel,
            n_rel_at_k=n_rel_at_k,
            dcg_u=dcg,
            idcg_u=idcg,
            ndcg=(dcg / idcg) if idcg > 0 else None,
            first_rel_rank=first,
            rr=(1.0 / first) if first else None,
            p_at_k=n_rel_at_k / float(k),
            recall_at_k=(n_rel_at_k / n_rel) if n_rel else None,
        )
    return out


def test_rank_metrics_scalar_replay(spark):
    from osm_pbf_spark.operators.evals import rank_metrics

    rows = [
        ("qa", i, [0, 0, 1, 0, 2][i % 5], (i * 37) % 23) for i in range(40)
    ] + [
        ("qb", i, 0, i)  # no relevant docs at all
        for i in range(15)
    ] + [
        ("qc", i, 1 if i < 3 else 0, 7)  # ALL scores tie -> item order
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, "query string, item long, rel long, score long"
    )
    got = {
        r.query: r.asDict()
        for r in rank_metrics(df, "query", "item", "rel", "score", k=10)
        .collect()
    }
    want = _scalar_rank_metrics(rows, k=10)
    assert set(got) == set(want)
    for q in want:
        for col, v in want[q].items():
            assert got[q][col] == v, (q, col, got[q][col], v)
    # qb: no relevant -> NULL ndcg/rr/recall
    assert got["qb"]["ndcg"] is None and got["qb"]["rr"] is None
    # qc: score ties broken by item asc -> first 3 items are relevant
    assert got["qc"]["first_rel_rank"] == 1 and got["qc"]["n_rel_at_k"] == 3


def test_ndcg_discount_spec():
    from osm_pbf_spark.operators.evals import DISC_SCALE, ndcg_discounts

    d = ndcg_discounts(10)
    assert d[0] == DISC_SCALE  # rank 1: log2(2) = 1
    assert d == sorted(d, reverse=True)
    assert d[2] == DISC_SCALE // 2  # rank 3: log2(4) = 2 exactly
    for i, v in enumerate(d):
        assert v == int(math.floor(DISC_SCALE / math.log2(i + 2) + 0.5))


# ------------------------------------------------------- confusion_metrics


def test_confusion_scalar_replay(spark):
    from osm_pbf_spark.operators.evals import confusion_metrics

    labs = ["a", "b", "c"]
    rows = [
        (labs[i % 3], labs[(i * 2 + i // 7) % 3]) for i in range(60)
    ] + [("a", "ghost")] * 2  # 'ghost' never a true label
    df = spark.createDataFrame(rows, "label string, pred string")
    got = {r.cls: r for r in confusion_metrics(df, "label", "pred").collect()}
    classes = set(l for l, _ in rows) | set(p for _, p in rows)
    assert set(got) == classes
    for c in classes:
        n_true = sum(1 for l, _ in rows if l == c)
        n_pred = sum(1 for _, p in rows if p == c)
        tp = sum(1 for l, p in rows if l == p == c)
        r = got[c]
        assert (r.n_true, r.n_pred, r.tp) == (n_true, n_pred, tp)
        assert r.fp == n_pred - tp and r.fn == n_true - tp
        assert r.precision == (tp / n_pred if n_pred else None)
        assert r.recall == (tp / n_true if n_true else None)
        assert r.f1 == 2 * tp / (n_true + n_pred)
    assert got["ghost"].recall is None and got["ghost"].precision == 0.0


# ------------------------------------------------------- ece_calibration


def test_ece_scalar_replay(spark):
    from osm_pbf_spark.operators.evals import ece_calibration

    rows = [((i * 104729) % 1000001, 1 if i % 3 == 0 else 0)
            for i in range(500)]
    df = spark.createDataFrame(rows, "score_ppm long, y long")
    out = ece_calibration(df, "score_ppm", "y", n_bins=10).collect()
    bins: dict = {}
    for s, y in rows:
        b = min((s * 10) // 1_000_000, 9)
        n, np_, sp = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, np_ + y, sp + s)
    gaps = {b: abs(sp - np_ * 1_000_000) for b, (n, np_, sp) in bins.items()}
    ece = sum(gaps.values()) // sum(n for n, _, _ in bins.values())
    assert {r.bin for r in out} == set(bins)
    for r in out:
        n, np_, sp = bins[r.bin]
        assert (r.n, r.n_pos, r.sum_score_ppm) == (n, np_, sp)
        assert r.gap_u == gaps[r.bin]
        assert r.ece_ppm == ece


def test_ece_guard_raises(spark):
    from osm_pbf_spark.operators.evals import ece_calibration

    bad = spark.createDataFrame(
        [(500_000, 2)], "score_ppm long, y long"
    )
    with pytest.raises(Exception, match="ece_calibration"):
        ece_calibration(bad, "score_ppm", "y").collect()
    neg = spark.createDataFrame(
        [(-1, 0)], "score_ppm long, y long"
    )
    with pytest.raises(Exception, match="ece_calibration"):
        ece_calibration(neg, "score_ppm", "y").collect()
