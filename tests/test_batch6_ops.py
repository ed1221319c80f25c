"""Batch-6 operators: token_entropy, inverted_index, idw_interpolate."""

from __future__ import annotations

import math


def _q_halfup(v: float) -> int:
    s = 1 if v >= 0 else -1
    return s * int(math.floor(abs(v) * 1e6 + 0.5))


def test_token_entropy_hand_computed(spark):
    from osm_pbf_spark.operators.text import token_entropy

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a a b b"), (4, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in token_entropy(docs).collect()}
    assert got[1].entropy == 0.0 and got[1].n_tokens == 4 and got[1].n_distinct == 1
    # uniform over 4 -> ln(4); uniform over 2 -> ln(2) (micro-nat grid)
    assert got[2].entropy == 4 * _q_halfup(math.log(4.0)) / 4e6
    assert got[3].entropy == 4 * _q_halfup(math.log(2.0)) / 4e6
    assert got[4].n_tokens == 0 and got[4].entropy is None
    assert got[1].entropy < got[3].entropy < got[2].entropy


def test_inverted_index_exact(spark):
    from osm_pbf_spark.operators.text import inverted_index

    docs = spark.createDataFrame(
        [(3, "x y c"), (1, "x c"), (2, "y c r x x")],
        "doc_id long, text string",
    )
    # df: x=3 (docs 1,2,3 — the duplicate x in doc 2 counts once),
    # y=2, c=3, r=1
    rows = {r.token: r for r in inverted_index(docs, min_df=2, max_df=2).collect()}
    assert set(rows) == {"y"}
    assert rows["y"].df == 2 and list(rows["y"].postings) == [2, 3]
    allrows = {r.token: r for r in inverted_index(docs).collect()}
    assert allrows["x"].df == 3 and list(allrows["x"].postings) == [1, 2, 3]
    assert allrows["c"].df == 3 and list(allrows["c"].postings) == [1, 2, 3]
    assert allrows["r"].df == 1 and list(allrows["r"].postings) == [2]


def test_idw_matches_bruteforce(spark):
    from osm_pbf_spark.operators.distance import idw_interpolate

    pts = [(i, float((i * 13) % 7), float((i * 29) % 11)) for i in range(40)]
    sts = [(100 + j, float(j % 7) + 0.5, float((j * 3) % 11) + 0.5, (j * 7) % 23)
           for j in range(25)]
    p_df = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    s_df = spark.createDataFrame(sts, "station_id long, lat double, lon double, v long")
    got = {
        r.doc_id: (r.n_stations, r.idw_value)
        for r in idw_interpolate(p_df, s_df, radius=2.0).collect()
    }
    for (pid, plat, plon) in pts:
        num = den = n = 0
        for (_sid, slat, slon, v) in sts:
            d2 = (plat - slat) ** 2 + (plon - slon) ** 2
            if d2 <= 4.0:
                n += 1
                wq = _q_halfup_w(4.0 / d2 * 1e6)
                num += wq * v
                den += wq
        if n == 0:
            assert pid not in got
        else:
            assert got[pid] == (n, num / den)


def _q_halfup_w(x: float) -> int:
    return int(math.floor(x + 0.5))


def test_idw_exact_hit_takes_station_value(spark):
    from osm_pbf_spark.operators.distance import idw_interpolate

    p_df = spark.createDataFrame([(1, 2.0, 3.0)], "doc_id long, lat double, lon double")
    s_df = spark.createDataFrame(
        [(10, 2.0, 3.0, 42), (11, 2.0, 3.0, 7), (12, 2.5, 3.0, 99)],
        "station_id long, lat double, lon double, v long",
    )
    r = idw_interpolate(p_df, s_df, radius=1.0).collect()[0]
    assert r.n_stations == 3
    assert r.idw_value == 7.0  # MIN coincident value, not a blend
