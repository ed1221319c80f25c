"""Operator batch 13: Mann-Whitney U, robust z-score (median/MAD),
Bloom filter sketch, SCD2 interval build."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import numpy as np


# ---------------------------------------------------------------- mann-whitney


def _mw_brute(a: list[int], b: list[int]):
    """Pure-Python tie-averaged Mann-Whitney U + tie-corrected z."""
    vals = sorted(a + b)
    # average rank per value
    ranks: dict[int, float] = {}
    i = 0
    ties_t = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        t = j - i
        ranks[vals[i]] = (i + 1 + j) / 2.0
        ties_t += t * t * t - t
        i = j
    na, nb, n = len(a), len(b), len(vals)
    ra = sum(ranks[v] for v in a)
    ua = ra - na * (na + 1) / 2.0
    sigma2 = na * nb * (n**3 - n - ties_t) / (12.0 * n * (n - 1))
    z = (ua - na * nb / 2.0) / math.sqrt(sigma2)
    return ua, z


def test_mann_whitney_matches_brute(spark):
    from osm_pbf_spark.operators.stats import mann_whitney_u

    rng = np.random.RandomState(7)
    a = [int(v) for v in rng.randint(0, 40, 300)]
    b = [int(v) for v in rng.randint(5, 45, 250)]  # shifted sample
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    df = spark.createDataFrame(rows, "v bigint, s string")
    r = mann_whitney_u(df, "v", "s").collect()[0]
    ua, z = _mw_brute(a, b)
    assert (r.n_a, r.n_b) == (300, 250)
    assert r.u_a == ua  # exact: doubled rank sums are int64
    assert abs(r.z - z) < 1e-12
    assert r.z < -3  # the shift is detectable


def test_mann_whitney_partitioning_invariant(spark):
    from osm_pbf_spark.operators.stats import mann_whitney_u

    rows = [(i % 13, "a" if i % 3 else "b") for i in range(500)]
    df = spark.createDataFrame(rows, "v bigint, s string")
    r1 = mann_whitney_u(df, "v", "s").collect()[0]
    r2 = mann_whitney_u(df.repartition(7), "v", "s").collect()[0]
    assert (r1.u_a, r1.z) == (r2.u_a, r2.z)  # bit-identical


# ---------------------------------------------------------------- robust z


def _lower_median(xs: list[int]) -> int:
    s = sorted(xs)
    return s[(len(s) + 1) // 2 - 1]


def test_robust_zscore_matches_brute(spark):
    from osm_pbf_spark.operators.stats import robust_zscore

    rng = np.random.RandomState(11)
    base = [int(v) for v in rng.randint(90, 111, 400)]
    outliers = [500, -300, 1000]
    xs = base + outliers
    df = spark.createDataFrame([("g", x) for x in xs], "grp string, x bigint")
    med = _lower_median(xs)
    mad = _lower_median([abs(x - med) for x in xs])
    got = robust_zscore(df, "x", ["grp"]).collect()
    assert len(got) == len(xs)
    for r in got:
        assert r.med == med and r.mad == mad
        assert r.robust_z == (r.x - med) / mad
    # outlier flags: every planted outlier flagged, base values not
    flagged = {
        r.x
        for r in robust_zscore(df, "x", ["grp"], min_dev_mads=10).collect()
    }
    assert set(outliers) <= flagged
    assert not (set(base) & flagged)


def test_robust_zscore_zero_mad_is_null(spark):
    from osm_pbf_spark.operators.stats import robust_zscore

    df = spark.createDataFrame(
        [("g", 5)] * 9 + [("g", 6)], "grp string, x bigint"
    )
    got = robust_zscore(df, "x", ["grp"]).collect()
    assert all(r.mad == 0 and r.robust_z is None for r in got)


# ---------------------------------------------------------------- bloom


def test_bloom_no_false_negatives_and_fp_bounded(spark):
    from osm_pbf_spark.operators.sketch import bloom_build, bloom_probe

    inserted = list(range(0, 4000, 2))  # 2000 even keys
    absent = list(range(1, 4000, 2))  # 2000 odd keys
    df = spark.createDataFrame([(k,) for k in inserted], "k bigint")
    sk = bloom_build(df, "k", n_words=1024, depth=4)
    probes = spark.createDataFrame(
        [(k,) for k in inserted + absent], "k bigint"
    )
    got = {r.k: r.bloom_member for r in bloom_probe(sk, probes, "k", n_words=1024, depth=4).collect()}
    assert all(got[k] for k in inserted)  # NEVER a false negative
    fp = sum(1 for k in absent if got[k]) / len(absent)
    # m=32768 bits, n*d=8000 set bits -> theory ~ (1-e^-0.244)^4 ~ 0.2%
    assert fp < 0.05


def test_bloom_shard_merge_is_bitwise_or(spark):
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.sketch import bloom_build

    a = spark.createDataFrame([(k,) for k in range(500)], "k bigint")
    b = spark.createDataFrame([(k,) for k in range(500, 1000)], "k bigint")
    full = bloom_build(a.union(b), "k", n_words=64, depth=3)
    merged = (
        bloom_build(a, "k", n_words=64, depth=3)
        .union(bloom_build(b, "k", n_words=64, depth=3))
        .groupBy("bloom_word")
        .agg(F.bit_or("bloom_bits").alias("bloom_bits"))
    )
    fw = {r.bloom_word: r.bloom_bits for r in full.collect()}
    mw = {r.bloom_word: r.bloom_bits for r in merged.collect()}
    assert fw == mw  # shard sketches OR into the full sketch exactly


def test_bloom_rejects_bad_params(spark):
    import pytest

    from osm_pbf_spark.operators.sketch import bloom_build

    df = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError):
        bloom_build(df, "k", n_words=0)


# ---------------------------------------------------------------- scd2


def test_scd2_build_collapses_runs(spark):
    from osm_pbf_spark.operators.temporal import scd2_build

    t0 = datetime(2026, 1, 1)
    rows = []
    # key 1: A A B B A  -> intervals A, B, A
    for i, v in enumerate(["A", "A", "B", "B", "A"]):
        rows.append((1, t0 + timedelta(hours=i), v, i))
    # key 2: only one value -> single current row
    rows.append((2, t0, "X", 99))
    # key 3: NULL -> value -> NULL transitions all count as changes
    rows.append((3, t0, None, 100))
    rows.append((3, t0 + timedelta(hours=1), "Y", 101))
    rows.append((3, t0 + timedelta(hours=2), None, 102))
    df = spark.createDataFrame(
        rows, "k bigint, ts timestamp, v string, eid bigint"
    )
    out = scd2_build(df, "k", "ts", ["v"], id_col="eid").collect()
    by_key = {}
    for r in sorted(out, key=lambda r: (r.k, r.valid_from)):
        by_key.setdefault(r.k, []).append(r)
    k1 = by_key[1]
    assert [r.v for r in k1] == ["A", "B", "A"]
    assert k1[0].valid_to == k1[1].valid_from  # half-open tiling
    assert k1[1].valid_to == k1[2].valid_from
    assert k1[2].valid_to is None and k1[2].is_current
    assert not k1[0].is_current and not k1[1].is_current
    assert len(by_key[2]) == 1 and by_key[2][0].is_current
    assert [r.v for r in by_key[3]] == [None, "Y", None]


def test_scd2_partitioning_invariant(spark):
    from osm_pbf_spark.operators.temporal import scd2_build

    t0 = datetime(2026, 1, 1)
    rows = [
        (i % 5, t0 + timedelta(minutes=i), f"v{(i // 7) % 3}", i)
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "k bigint, ts timestamp, v string, eid bigint"
    )
    a = sorted(map(tuple, scd2_build(df, "k", "ts", ["v"], id_col="eid").collect()))
    b = sorted(
        map(
            tuple,
            scd2_build(
                df.repartition(11), "k", "ts", ["v"], id_col="eid"
            ).collect(),
        )
    )
    assert a == b


# ---------------------------------------------------------------- image patches


def test_image_patch_plan_grid_and_drops(spark):
    from osm_pbf_spark.operators.multimodal import image_patch_plan

    rows = [
        ("a", "image", None, 33, 17, 0),  # 2x1 grid of 16px patches
        ("b", "image", None, 15, 64, 0),  # width < patch -> dropped
        ("c", "video", None, 64, 64, 9),  # wrong modality -> dropped
        ("d", "image", None, 32, 32, 0),  # exact 2x2
    ]
    df = spark.createDataFrame(
        rows,
        "media_ref string, modality string, payload binary, "
        "width int, height int, duration_ms int",
    )
    got = sorted(
        map(tuple, image_patch_plan(df, patch=16).collect())
    )
    want = sorted(
        [
            ("a", 0, 0, 0, 0, 0),
            ("a", 1, 0, 1, 0, 16),
            ("d", 0, 0, 0, 0, 0),
            ("d", 1, 0, 1, 0, 16),
            ("d", 2, 1, 0, 16, 0),
            ("d", 3, 1, 1, 16, 16),
        ]
    )
    assert got == want


def test_image_patch_plan_is_map_only(spark):
    from osm_pbf_spark.operators.multimodal import image_patch_plan

    df = spark.createDataFrame(
        [("a", "image", None, 64, 64, 0)],
        "media_ref string, modality string, payload binary, "
        "width int, height int, duration_ms int",
    )
    plan = image_patch_plan(df, patch=16)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure Generate/Project, no shuffle


# ---------------------------------------------------------------- fill forward


def test_fill_forward_carries_last_non_null(spark):
    from osm_pbf_spark.operators.temporal import fill_forward

    rows = [
        ("a", 0, None),
        ("a", 1, 10),
        ("a", 2, None),
        ("a", 3, None),
        ("a", 4, 40),
        ("b", 0, None),
    ]
    df = spark.createDataFrame(rows, "k string, t int, v int")
    got = {
        (r.k, r.t): r.v for r in fill_forward(df, "k", "t", ["v"]).collect()
    }
    assert got == {
        ("a", 0): None,  # leading NULL stays
        ("a", 1): 10,
        ("a", 2): 10,
        ("a", 3): 10,
        ("a", 4): 40,
        ("b", 0): None,  # keys never leak values
    }


# ------------------------------------------------------------ dup substrings


def test_duplicate_substrings_finds_planted_passage(spark):
    from osm_pbf_spark.operators.text import duplicate_substrings

    boiler = "All rights reserved under the Universal License v2."  # 51 chars
    rows = [
        (1, "alpha " * 20 + boiler),
        (2, boiler + " beta " * 20),
        (3, "unique text one with nothing shared at all " * 3),
        (4, "gamma " * 10 + boiler + " delta " * 10),
        (5, "short"),  # sub-gram doc: must not generate (sequence guard)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    dup = duplicate_substrings(df, gram_chars=40, min_count=3).collect()
    # cross-doc: the boilerplate's sliding windows (51-char passage at
    # 40-gram = 12 windows), once per doc in 3 docs
    cross = [r for r in dup if r.n_docs == 3]
    assert len(cross) == 12
    assert all(r.n_occurrences == 3 for r in cross)
    # WITHIN-doc repetition ("alpha " * 20) is a duplicated passage too
    assert any(r.n_docs == 1 and r.n_occurrences >= 3 for r in dup)


def test_duplicate_substrings_stride_still_hits_long_passages(spark):
    from osm_pbf_spark.operators.text import duplicate_substrings

    passage = "x" * 10 + "the quick brown fox jumps over the lazy dog " * 3
    rows = [(i, f"doc{i} " * 5 + passage) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    full = duplicate_substrings(df, gram_chars=40, min_count=4, stride=1)
    strided = duplicate_substrings(df, gram_chars=40, min_count=4, stride=7)
    assert full.count() > 0
    assert 0 < strided.count() <= full.count()  # sampled, never empty


def test_duplicate_substrings_rejects_bad_params(spark):
    import pytest

    from osm_pbf_spark.operators.text import duplicate_substrings

    df = spark.createDataFrame([(1, "abc")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        duplicate_substrings(df, gram_chars=0)


# ---------------------------------------------------------------- bpe train


def test_bpe_train_matches_reference_loop(spark):
    from osm_pbf_spark.operators.text import bpe_train

    corpus = ["low low low lower lowest", "new newer newest low"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], "doc_id bigint, text string")
    got = bpe_train(df, n_merges=6)

    # pure-Python reference replay
    from collections import Counter

    freq: Counter = Counter(w for t in corpus for w in t.split(" ") if w)
    toks = {w: list(w) for w in freq}
    want = []
    for _ in range(6):
        counts: Counter = Counter()
        for w, sym in toks.items():
            for p in zip(sym, sym[1:]):
                counts[p] += freq[w]
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        want.append((a, b, cnt))
        for w, sym in toks.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            toks[w] = out
    assert got == want


def test_bpe_train_feeds_encode_and_compresses(spark):
    from osm_pbf_spark.operators.text import bpe_encode, bpe_train

    df = spark.createDataFrame(
        [(i, "the cat sat on the mat " * 4) for i in range(10)],
        "doc_id bigint, text string",
    )
    merges = [(a, b) for a, b, _ in bpe_train(df, n_merges=10)]
    # the tiny vocab saturates early: every word becomes ONE symbol and
    # training stops when no pair repeats — 7 merges for these 6 words
    assert 1 <= len(merges) <= 10
    enc = bpe_encode(df, merges).collect()
    # fully-merged vocabulary: token count == word count, far below chars
    assert all(r.n_tokens == r.n_words for r in enc)


def test_bpe_merge_fold_equals_scan_on_repeats(spark):
    # "xxxx" with merge (x, x) must give [xx, xx] (non-overlapping scan)
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.text import _apply_merge

    df = spark.createDataFrame([(["x", "x", "x", "x"],)], "toks array<string>")
    out = df.select(_apply_merge(F.col("toks"), "x", "x").alias("m")).collect()
    assert out[0].m == ["xx", "xx"]
