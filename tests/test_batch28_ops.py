"""Batch-28 operators: isotonic_fit (PAVA calibration), fs_link
(Fellegi-Sunter record linkage), sniff_media_type (magic bytes)."""

from __future__ import annotations

import math
from fractions import Fraction

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------- isotonic_fit


def _iso_minimax(xs, ns, sys_):
    """Independent minimax-formula isotonic fit (exact Fractions)."""
    m = len(xs)
    cn = [0] * (m + 1)
    cs = [0] * (m + 1)
    for i in range(m):
        cn[i + 1] = cn[i] + ns[i]
        cs[i + 1] = cs[i] + sys_[i]
    fitted = []
    for i in range(m):
        best = None
        for j in range(i + 1):
            worst = min(
                Fraction(cs[k + 1] - cs[j], cn[k + 1] - cn[j])
                for k in range(i, m)
            )
            best = worst if best is None else max(best, worst)
        fitted.append(best)
    out = []
    i = 0
    while i < m:
        j = i
        while j + 1 < m and fitted[j + 1] == fitted[i]:
            j += 1
        ps, pc = cs[j + 1] - cs[i], cn[j + 1] - cn[i]
        for k in range(i, j + 1):
            out.append((xs[k], ns[k], ps, pc, float(ps) / float(pc)))
        i = j + 1
    return out


def test_isotonic_matches_minimax_replay(spark):
    from osm_pbf_spark.operators.stats import isotonic_fit

    rows = [
        ("g", (i * 13) % 20, 1 if (i * 7) % 5 < ((i * 13) % 20) / 4 else 0)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, x long, y int")
    got = sorted(
        (r.x, r.n, r.pool_sum, r.pool_cnt, r.fitted)
        for r in isotonic_fit(df, "x", "y", group_cols=["g"]).collect()
    )
    agg = {}
    for _, x, y in rows:
        d = agg.setdefault(x, [0, 0])
        d[0] += 1
        d[1] += y
    xs = sorted(agg)
    exp = sorted(_iso_minimax(xs, [agg[x][0] for x in xs], [agg[x][1] for x in xs]))
    assert got == exp


def test_isotonic_fitted_is_monotone_and_mean_preserving(spark):
    from osm_pbf_spark.operators.stats import isotonic_fit

    rows = [(i % 30, (i * 17) % 7) for i in range(600)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = sorted(isotonic_fit(df, "x", "y").collect(), key=lambda r: r.x)
    fs = [r.fitted for r in out]
    assert all(fs[i] <= fs[i + 1] + 1e-15 for i in range(len(fs) - 1))
    # weighted sum of fitted == total y (projection preserves the mean)
    tot_fit = sum(Fraction(r.pool_sum, r.pool_cnt) * r.n for r in out)
    assert tot_fit == sum(y for _, y in rows)


def test_isotonic_already_monotone_is_identity(spark):
    from osm_pbf_spark.operators.stats import isotonic_fit

    rows = [(x, x * 2 + j % 1) for x in range(10) for j in range(3)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = isotonic_fit(df, "x", "y").collect()
    for r in out:
        assert (r.pool_cnt, r.fitted) == (3, float(r.x * 2))


# -------------------------------------------------------------- fs_link


def test_fs_link_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.fuzzy import fs_link, fs_weights

    m_u = {"f1": (0.9, 0.1), "f2": (0.8, 0.3)}
    w = fs_weights(m_u)
    left = [(1, "b1", "x", 5), (2, "b1", "y", None), (3, "b2", None, 7)]
    right = [(10, "b1", "x", 5), (11, "b1", "z", 5), (12, "b2", "q", 7)]
    ldf = spark.createDataFrame(left, "id_a long, bk string, f1 string, f2 int")
    rdf = spark.createDataFrame(right, "id_b long, bk string, f1 string, f2 int")
    got = {
        (r.id_a, r.id_b): (r.n_agree, r.n_disagree, r.score_micro)
        for r in fs_link(ldf, rdf, block_on=["bk"], m_u=m_u).collect()
    }
    exp = {}
    for la in left:
        for rb in right:
            if la[1] != rb[1]:
                continue
            na = nd = sc = 0
            for i, f in enumerate(("f1", "f2")):
                a, b = la[2 + i], rb[2 + i]
                if a is None or b is None:
                    continue
                if a == b:
                    na += 1
                    sc += w[f][0]
                else:
                    nd += 1
                    sc += w[f][1]
            exp[(la[0], rb[0])] = (na, nd, sc)
    assert got == exp
    # sanity: full agreement strictly outranks full disagreement
    assert got[(1, 10)][2] > got[(1, 11)][2]


def test_fs_weights_properties_and_validation(spark):
    from osm_pbf_spark.operators.fuzzy import fs_link, fs_weights

    w = fs_weights({"f": (0.9, 0.1)})["f"]
    assert w[0] == int(math.floor(math.log(9.0) * 1e6 + 0.5))
    assert w[1] == -int(math.floor(abs(math.log(0.1 / 0.9)) * 1e6 + 0.5))
    with pytest.raises(ValueError, match="in \\(0, 1\\)"):
        fs_weights({"f": (1.0, 0.1)})
    df = spark.createDataFrame([(1, "b")], "id_a long, bk string")
    with pytest.raises(ValueError, match="block_on"):
        fs_link(df, df.withColumnRenamed("id_a", "id_b"), [], {"bk": (0.5, 0.2)})


# ------------------------------------------------------ sniff_media_type


def test_sniff_known_magics(spark):
    from osm_pbf_spark.operators.multimodal import sniff_media_type

    cases = [
        (0, "89504E470D0A1A0A00", "png"),
        (1, "FFD8FFE000104A46", "jpeg"),
        (2, "474946383761AABB", "gif"),
        (3, "474946383961AABB", "gif"),
        (4, "255044462D312E34", "pdf"),
        (5, "504B030414000000", "zip"),
        (6, "1F8B080000000000", "gzip"),
        (7, "52494646AABBCCDD57415645", "wav"),
        (8, "52494646AABBCCDD57454250", "webp"),
        (9, "0000001866747970697336", "mp4"),
        (10, "DEADBEEF00112233", "unknown"),
        (11, "89504E", "unknown"),  # truncated magic
        (12, "", "unknown"),  # empty payload
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h, _ in cases], "doc_id long, hx string"
    ).select("doc_id", F.to_binary("hx", F.lit("hex")).alias("payload"))
    got = {r.doc_id: r.media_type for r in sniff_media_type(df).collect()}
    for i, _, exp in cases:
        assert got[i] == exp, i


def test_sniff_null_payload_and_plan(spark):
    from osm_pbf_spark.operators.multimodal import sniff_media_type

    df = spark.createDataFrame([(1,)], "doc_id long").select(
        "doc_id", F.lit(None).cast("binary").alias("payload")
    )
    assert sniff_media_type(df).collect()[0].media_type == "unknown"
    plan = (
        sniff_media_type(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "Exchange" not in plan and "Python" not in plan
