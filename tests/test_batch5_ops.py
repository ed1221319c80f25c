"""Batch-5 operators: line_dedup, weighted_sample, redact_spans,
rp_reduce."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F


# ---------------- line_dedup ----------------


def test_line_dedup_first_occurrence_wins(spark):
    from osm_pbf_spark.operators.text import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta\ngamma"),
            (2, "beta\ndelta"),  # beta already seen in doc 1
            (3, "alpha\nalpha\nepsilon"),  # 2nd alpha in SAME doc also drops
            (4, "beta"),  # everything drops -> empty doc
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert got[1].text == "alpha\nbeta\ngamma" and got[1].n_kept == 3
    assert got[2].text == "delta" and got[2].n_lines == 2 and got[2].n_kept == 1
    assert got[3].text == "epsilon" and got[3].n_kept == 1
    assert got[4].text == "" and got[4].n_kept == 0 and got[4].n_lines == 1


def test_line_dedup_preserves_order_and_counts(spark):
    from osm_pbf_spark.operators.text import line_dedup

    # doc 10 wins every line (min doc_id); doc 11 shares none
    docs = spark.createDataFrame(
        [(10, "z\ny\nx\nw"), (11, "a\nb"), (12, "w\nx\nq")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert got[10].text == "z\ny\nx\nw"  # original order, not sorted
    assert got[12].text == "q"
    assert sum(r.n_kept for r in got.values()) == 7  # distinct lines total


# ---------------- weighted_sample ----------------


def _aes_key(group, doc_id, w):
    h = int(hashlib.md5(f"{group}:{doc_id}".encode()).hexdigest()[:10], 16)
    return math.log((h + 1) / float(1 << 40)) / w


def test_weighted_sample_matches_replay(spark):
    from osm_pbf_spark.operators.packing import weighted_sample

    rows = [(i, "g", float(1 + i % 9)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w double")
    got = sorted(
        r.doc_id
        for r in weighted_sample(
            df, k=25, weight_col="w", group_col="lang", id_col="doc_id"
        ).collect()
    )
    want = sorted(
        sorted(rows, key=lambda r: (-_aes_key(r[1], r[0], r[2]), r[0]))[:25]
    )
    assert got == sorted(r[0] for r in want)


def test_weighted_sample_is_weight_proportional(spark):
    from osm_pbf_spark.operators.packing import weighted_sample

    # two strata: ids < 500 weight 20, ids >= 500 weight 1 — the heavy
    # stratum should dominate the sample
    rows = [(i, "g", 20.0 if i < 500 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w double")
    picked = weighted_sample(
        df, k=100, weight_col="w", group_col="lang", id_col="doc_id"
    ).collect()
    heavy = sum(1 for r in picked if r.doc_id < 500)
    assert len(picked) == 100
    assert heavy > 80  # E[heavy] ≈ 95; <=80 is a >5-sigma fluke


def test_weighted_sample_rejects_nonpositive(spark):
    from osm_pbf_spark.operators.packing import weighted_sample

    df = spark.createDataFrame(
        [(1, "g", 1.0), (2, "g", 0.0)], "doc_id long, lang string, w double"
    )
    with pytest.raises(Exception, match="non-positive weight"):
        weighted_sample(df, k=1, weight_col="w", group_col="lang").collect()


# ---------------- redact_spans ----------------


def _spans_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )


def test_redact_spans_rewrites_text_and_offsets(spark):
    from osm_pbf_spark.operators.docrender import redact_spans

    docs = _spans_df(
        spark,
        [
            (
                "d1",
                [
                    ("header", "node 12345", None, 0),
                    ("media", "", "img:99", 11),
                    ("tag", "year=2024", None, 11),
                ],
            )
        ],
    )
    out = redact_spans(docs, "[0-9]+", "#").collect()[0].spans
    assert [s.text for s in out] == ["node #", "", "year=#"]
    # offsets: exclusive prefix sum of len+1 -> 0, 7, 8
    assert [s.offset for s in out] == [0, 7, 8]
    assert out[1].media_ref == "img:99" and out[1].kind == "media"


def test_redact_spans_noop_pattern_keeps_offsets_consistent(spark):
    from osm_pbf_spark.operators.docrender import redact_spans

    docs = _spans_df(
        spark, [("d", [("a", "xx", None, 0), ("b", "yyy", None, 3)])]
    )
    out = redact_spans(docs, "zzz", "#").collect()[0].spans
    assert [(s.text, s.offset) for s in out] == [("xx", 0), ("yyy", 3)]


# ---------------- rp_reduce ----------------


def test_rp_reduce_matches_pure_python(spark):
    from osm_pbf_spark.operators.ann import rp_reduce

    dim, out_dim, scale = 8, 4, 256
    vecs = [
        (i, [math.sin(i * 0.7 + j) for j in range(dim)]) for i in range(20)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {r.vec_id: list(r.rvec) for r in rp_reduce(df, dim=dim, out_dim=out_dim).collect()}

    sgn = []
    for j in range(out_dim):
        h = hashlib.blake2b(
            b"rp" + j.to_bytes(4, "little") + (0).to_bytes(4, "little"),
            digest_size=64,
        ).digest()
        bits = [(byte >> (7 - b)) & 1 for byte in h for b in range(8)][:dim]
        sgn.append([2 * b - 1 for b in bits])
    for i, v in vecs:
        q = [math.floor(x * float(scale) + 0.5) for x in v]
        want = [sum(s * qq for s, qq in zip(sgn[j], q)) for j in range(out_dim)]
        assert got[i] == want


def test_rp_reduce_preserves_cosine_ordering(spark):
    from osm_pbf_spark.operators.ann import rp_reduce

    dim = 32

    def unit(seed):
        raw = [
            int.from_bytes(
                hashlib.blake2b(
                    f"{seed}:{j}".encode(), digest_size=8
                ).digest(),
                "little",
            )
            / 2**64
            - 0.5
            for j in range(dim)
        ]
        n = math.sqrt(sum(x * x for x in raw))
        return [x / n for x in raw]

    base = unit("base")
    near = [0.95 * b + 0.05 * p for b, p in zip(base, unit("perturb"))]
    far = unit("far")
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "vec_id long, embedding array<double>"
    )
    got = {r.vec_id: list(r.rvec) for r in rp_reduce(df, dim=dim, out_dim=16).collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / math.sqrt(sum(x * x for x in a) * sum(y * y for y in b))

    assert cos(got[0], got[1]) > cos(got[0], got[2])


# ---------------- mixture_sample ----------------


def test_mixture_sample_quotas_and_shortfall(spark):
    from osm_pbf_spark.operators.packing import mixture_sample

    rows = [(i, "big", "en") for i in range(200)] + [
        (1000 + i, "small", "en") for i in range(5)
    ] + [(2000 + i, "skip", "en") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string")
    out = mixture_sample(
        df, {"big": 500000, "small": 500000}, total=100, group_col="source"
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.doc_id)
    # big: quota 50 met; small: quota 50 but only 5 docs -> all 5, no
    # redistribution; skip: not in targets -> absent
    assert len(by_src["big"]) == 50
    assert sorted(by_src["small"]) == [1000, 1001, 1002, 1003, 1004]
    assert "skip" not in by_src


def test_mixture_sample_is_deterministic_and_validated(spark):
    import pytest

    from osm_pbf_spark.operators.packing import mixture_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 3}", "en") for i in range(90)],
        "doc_id long, source string, lang string",
    )
    t = {"s0": 300000, "s1": 300000}
    a = sorted(r.doc_id for r in mixture_sample(df, t, total=60).collect())
    b = sorted(r.doc_id for r in mixture_sample(df, t, total=60).collect())
    assert a == b and len(a) == 36  # 18 + 18
    with pytest.raises(ValueError):
        mixture_sample(df, {"s0": -1}, total=10)
    with pytest.raises(ValueError):
        mixture_sample(df, t, total=-5)
