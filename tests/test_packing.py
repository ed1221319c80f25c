"""Packing + deterministic-sampling operators (operators/packing.py).

Each op is checked against an INDEPENDENT pure-Python replay of its
spec (fold-style, no numpy vectorization shared with the engine), plus
determinism and plan-shape assertions.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from osm_pbf_spark.operators.packing import (
    bin_pack_ffd,
    concat_chunk_pack,
    stratified_sample,
)


def _docs(spark, n=97):
    # deterministic variable-length texts: i%13+1 whitespace tokens
    rows = [(i, " ".join(f"t{i}w{j}" for j in range((i % 13) + 1))) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _tok(text: str) -> int:
    return len(text.split(" "))


# ---------------- concat_chunk_pack ----------------


def _replay_chunks(rows, budget):
    """Scalar replay: global id order, running offset, per-chunk slices."""
    out = []
    start = 0
    for doc_id, text in sorted(rows):
        toks = _tok(text)
        first_c, last_c = start // budget, (start + toks - 1) // budget
        for c in range(first_c, last_c + 1):
            cs = c * budget
            lo, hi = max(start, cs), min(start + toks, cs + budget)
            out.append((c, doc_id, lo - start, hi - lo, lo - cs))
        start += toks
    return sorted(out)


@pytest.mark.parametrize("budget,n_ranges", [(32, 4), (7, 64), (1000, 2)])
def test_concat_chunk_pack_matches_replay(spark, budget, n_ranges):
    df = _docs(spark)
    rows = [(r.doc_id, r.text) for r in df.collect()]
    got = sorted(
        tuple(r)
        for r in concat_chunk_pack(df, budget, n_ranges=n_ranges)
        .select("chunk_id", "doc_id", "slice_begin", "slice_len", "pos_in_chunk")
        .collect()
    )
    assert got == _replay_chunks(rows, budget)


def test_concat_chunk_invariants(spark):
    budget = 16
    df = _docs(spark, 150)
    out = concat_chunk_pack(df, budget).cache()
    # every chunk except the last is exactly full
    per_chunk = {r.chunk_id: r.s for r in out.groupBy("chunk_id").agg(F.sum("slice_len").alias("s")).collect()}
    last = max(per_chunk)
    assert all(v == budget for c, v in per_chunk.items() if c != last)
    assert 0 < per_chunk[last] <= budget
    # every doc fully placed, contiguously
    per_doc = {r.doc_id: (r.s, r.n) for r in out.groupBy("doc_id")
               .agg(F.sum("slice_len").alias("s"), F.count("*").alias("n")).collect()}
    for r in df.collect():
        assert per_doc[r.doc_id][0] == _tok(r.text)
    out.unpersist()


def test_concat_chunk_pack_prefix_sum_is_distributed(spark):
    # the window must be partitioned by the range id — a global
    # single-partition window (partitionBy()) would serialize at scale
    plan = concat_chunk_pack(_docs(spark), 32, n_ranges=8)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "SinglePartition" not in plan, plan


# ---------------- bin_pack_ffd ----------------


def _replay_ffd(rows, budget, n_groups):
    groups: dict[int, list[tuple[int, int]]] = {}
    for doc_id, text in rows:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % n_groups
        groups.setdefault(h, []).append((doc_id, _tok(text)))
    out = []
    for g, docs in groups.items():
        fill: list[int] = []
        counts: list[int] = []
        for doc_id, tk in sorted(docs, key=lambda dt: (-dt[1], dt[0])):
            placed = -1
            for b, used in enumerate(fill):
                if used + tk <= budget:
                    placed = b
                    break
            if placed < 0:
                placed = len(fill)
                fill.append(0)
                counts.append(0)
            out.append(((g << 32) | placed, doc_id, tk, counts[placed]))
            fill[placed] += tk
            counts[placed] += 1
    return sorted(out)


@pytest.mark.parametrize("budget,n_groups", [(40, 8), (13, 3)])
def test_bin_pack_ffd_matches_replay(spark, budget, n_groups):
    df = _docs(spark, 120)
    rows = [(r.doc_id, r.text) for r in df.collect()]
    got = sorted(tuple(r) for r in bin_pack_ffd(df, budget, n_groups=n_groups)
                 .select("bin_id", "doc_id", "n_tokens", "bin_pos").collect())
    assert got == _replay_ffd(rows, budget, n_groups)


def test_bin_pack_ffd_budget_respected_and_oversize_isolated(spark):
    rows = [(1, "a " * 99), (2, "b"), (3, "c d e"), (4, "x " * 99)]
    df = spark.createDataFrame([(i, t.strip()) for i, t in rows], "doc_id long, text string")
    out = bin_pack_ffd(df, budget=10, n_groups=4)
    fills = out.groupBy("bin_id").agg(F.sum("n_tokens").alias("s"), F.count("*").alias("n")).collect()
    for r in fills:
        assert r.s <= 10 or r.n == 1  # only a single oversize doc may overflow


# ---------------- stratified_sample ----------------


def _keep(stratum, doc_id, rate) -> bool:
    h = hashlib.md5(f"{stratum}:{doc_id}".encode()).hexdigest()[:8]
    t = min(max(int(rate * (1 << 32)), 0), 1 << 32)
    thr = format(t, "08x") if t < (1 << 32) else "ffffffff~"
    return h < thr


def _strat_docs(spark, n=400):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_stratified_sample_matches_hash_replay(spark):
    df = _strat_docs(spark)
    fr = {"en": 0.5, "de": 0.25}
    got = {(r.doc_id, r.lang) for r in stratified_sample(df, fr).collect()}
    want = {(i, l) for i, l in [(r.doc_id, r.lang) for r in df.collect()]
            if l in fr and _keep(l, i, fr[l])}
    assert got == want
    assert all(l != "fr" for _, l in got)  # absent stratum dropped


def test_stratified_sample_edges_and_plan(spark):
    df = _strat_docs(spark, 100)
    assert stratified_sample(df, 0.0).count() == 0
    assert stratified_sample(df, 1.0).count() == 100
    plan = stratified_sample(df, 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure filter: no shuffle
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_stratified_sample_rate_is_approx_right(spark):
    df = _strat_docs(spark, 3000)
    kept = stratified_sample(df, 0.3).count()
    assert abs(kept / 3000 - 0.3) < 0.05
