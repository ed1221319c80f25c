"""KMV distinct sketch (operators/sketch.py) and the bigram-LM quality
scorer (operators/text.bigram_lm_score)."""

from __future__ import annotations

import hashlib
import math


def _h40(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:10], 16)


def _q_halfup(v: float) -> int:
    """HALF_UP-away-from-zero micro-nat quantizer (Spark/DuckDB round)."""
    s = 1 if v >= 0 else -1
    return s * int(math.floor(abs(v) * 1e6 + 0.5))


def test_kmv_exact_when_small(spark):
    from osm_pbf_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame(
        [("a", i % 10) for i in range(100)], "grp string, v int"
    )
    r = kmv_distinct(df, ["grp"], "v", k=64).collect()
    assert len(r) == 1
    assert r[0].n_rows == 100 and r[0].kmv_k == 10
    assert r[0].kmv_estimate == 10.0


def test_kmv_estimate_accuracy_and_replay(spark):
    from osm_pbf_spark.operators.sketch import kmv_distinct

    n, k = 2000, 64
    df = spark.createDataFrame([("g", i) for i in range(n)], "grp string, v int")
    r = kmv_distinct(df, ["grp"], "v", k=k).collect()[0]
    assert r.kmv_k == k
    # exact pure-Python replay of the estimator
    hk = sorted({_h40(i) for i in range(n)})[k - 1]
    assert r.kmv_estimate == float((k - 1) * (1 << 40)) / float(hk)
    # statistical sanity: ~1/sqrt(k-2) relative error, allow 4 sigma
    assert abs(r.kmv_estimate - n) / n < 4.0 / math.sqrt(k - 2)


def test_kmv_multi_group_determinism(spark):
    from osm_pbf_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame(
        [(f"g{i % 3}", (i * 17) % 500) for i in range(3000)],
        "grp string, v int",
    )
    a = sorted(map(tuple, kmv_distinct(df, ["grp"], "v", k=32).collect()))
    b = sorted(map(tuple, kmv_distinct(df, ["grp"], "v", k=32).collect()))
    assert a == b and len(a) == 3


def test_bigram_lm_hand_computed(spark):
    from osm_pbf_spark.operators.text import bigram_lm_score

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bigram_lm_score(docs).collect()}
    # c_ab: (a,b)=3 (b,a)=1 (b,c)=1; c_a: a=3 b=2; V=4 (a,b,c,x)
    lp_ab = _q_halfup(math.log(4.0 / 7.0))
    lp_ba = _q_halfup(math.log(2.0 / 6.0))
    lp_bc = _q_halfup(math.log(2.0 / 6.0))
    assert got[1].n_bigrams == 3
    assert got[1].lm_score == (2 * lp_ab + lp_ba) / (3 * 1e6)
    assert got[2].n_bigrams == 2
    assert got[2].lm_score == (lp_ab + lp_bc) / (2 * 1e6)
    assert got[3].n_bigrams == 0 and got[3].lm_score is None


def test_bigram_lm_orders_gibberish_below_normal(spark):
    # repeated natural phrasing scores higher than unique gibberish
    rows = [(i, "the cat sat on the mat") for i in range(20)]
    rows += [(100 + i, f"zq{i} wx{i} kj{i} vb{i}") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from osm_pbf_spark.operators.text import bigram_lm_score

    got = {r.doc_id: r.lm_score for r in bigram_lm_score(docs).collect()}
    assert min(got[i] for i in range(20)) > max(got[100 + i] for i in range(5))
