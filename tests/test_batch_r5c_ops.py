"""Batch r5-C: bearing/destination geodesy, ring_centroid, scrub_text,
flesch_score."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ----------------------------------------------------- bearing / dest
def test_initial_bearing_cardinal_directions(spark):
    from osm_pbf_spark.operators.measures import initial_bearing_mdeg

    rows = [
        (0.0, 0.0, 10.0, 0.0, 0),        # due north
        (0.0, 0.0, 0.0, 10.0, 90_000),   # due east on the equator
        (10.0, 0.0, 0.0, 0.0, 180_000),  # due south
        (0.0, 10.0, 0.0, 0.0, 270_000),  # due west
    ]
    df = spark.createDataFrame(
        [(i, *r[:4]) for i, r in enumerate(rows)],
        "i long, la1 double, lo1 double, la2 double, lo2 double",
    )
    got = {
        r.i: r.b
        for r in df.select(
            "i",
            initial_bearing_mdeg(
                F.col("la1"), F.col("lo1"), F.col("la2"), F.col("lo2")
            ).alias("b"),
        ).collect()
    }
    for i, r in enumerate(rows):
        assert got[i] == r[4], (i, got[i])


def test_destination_roundtrip_bearing_and_distance(spark):
    from osm_pbf_spark.operators.measures import (
        EARTH_RADIUS_M,
        destination_point,
        initial_bearing_mdeg,
    )

    # going 1 degree of arc north from the equator lands at lat 1
    arc1 = EARTH_RADIUS_M * math.pi / 180.0
    df = spark.createDataFrame([(0.0, 20.0)], "la double, lo double")
    (r,) = df.select(
        destination_point(
            F.col("la"), F.col("lo"), F.lit(0.0), F.lit(arc1)
        ).alias("d")
    ).collect()
    assert abs(r.d.lat_e7 - 10_000_000) <= 2 and abs(r.d.lon_e7 - 200_000_000) <= 2
    # east along the 60th parallel: destination bearing back agrees
    (r2,) = df.select(
        destination_point(
            F.lit(60.0), F.lit(0.0), F.lit(90.0), F.lit(100_000.0)
        ).alias("d")
    ).collect()
    la2, lo2 = r2.d.lat_e7 / 1e7, r2.d.lon_e7 / 1e7
    assert la2 < 60.0 and 1.7 < lo2 < 1.85  # great circle dips, ~1.79 deg


# -------------------------------------------------------- ring centroid
def test_ring_centroid_square_with_hole(spark):
    from osm_pbf_spark.operators.measures import ring_centroid

    sq = [(0.0, 0.0), (0.0, 0.1), (0.1, 0.1), (0.1, 0.0)]
    hole = [(0.02, 0.02), (0.02, 0.04), (0.04, 0.04), (0.04, 0.02)]
    rows = [
        ("p", 0, [{"lat": a, "lon": b} for a, b in sq]),
        ("p", 1, [{"lat": a, "lon": b} for a, b in hole]),
        ("q", 0, [{"lat": a, "lon": b} for a, b in sq]),
    ]
    df = spark.createDataFrame(
        rows, "poly_id string, ring_idx int, pts array<struct<lat:double,lon:double>>"
    )
    got = {r.poly_id: (r.area2_q, r.c_lat, r.c_lon)
           for r in ring_centroid(df).collect()}
    # q: plain square -> centroid at (0.05, 0.05), 2A = 2*(1e5)^2
    assert got["q"][0] == 2 * 100_000 * 100_000
    assert abs(got["q"][1] - 0.05) < 1e-9 and abs(got["q"][2] - 0.05) < 1e-9
    # p: hole pulls the centroid away from the hole quadrant
    a_sq, a_h = 0.1 * 0.1, 0.02 * 0.02
    cx = (a_sq * 0.05 - a_h * 0.03) / (a_sq - a_h)
    assert got["p"][0] == 2 * (100_000 * 100_000 - 20_000 * 20_000)
    assert abs(got["p"][1] - cx) < 1e-9 and abs(got["p"][2] - cx) < 1e-9


def test_ring_centroid_orientation_invariance_and_guard(spark):
    from osm_pbf_spark.operators.measures import ring_centroid

    sq = [(0.0, 0.0), (0.0, 0.1), (0.1, 0.1), (0.1, 0.0)]
    rows = [
        ("cw", 0, [{"lat": a, "lon": b} for a, b in sq[::-1]]),
        ("ccw", 0, [{"lat": a, "lon": b} for a, b in sq]),
    ]
    df = spark.createDataFrame(
        rows, "poly_id string, ring_idx int, pts array<struct<lat:double,lon:double>>"
    )
    got = {r.poly_id: (r.area2_q, r.c_lat, r.c_lon)
           for r in ring_centroid(df).collect()}
    assert got["cw"] == got["ccw"]          # orientation-free
    big = spark.createDataFrame(
        [("w", 0, [{"lat": float(a), "lon": float(b)}
                   for a, b in [(-80, -170), (-80, 170), (80, 170), (80, -170)]])],
        "poly_id string, ring_idx int, pts array<struct<lat:double,lon:double>>",
    )
    with pytest.raises(Exception, match="coarser scale"):
        ring_centroid(big).collect()
    # ...and the documented remedy works
    (r,) = ring_centroid(big, scale=1000).collect()
    assert abs(r.c_lat - 0.0) < 1e-6 and abs(r.c_lon - 0.0) < 1e-6


# ------------------------------------------------------------ scrub
def test_scrub_text_controls_whitespace_case(spark):
    from osm_pbf_spark.operators.text import scrub_text

    rows = [
        (1, "  Hello\x00\x1fWorld\t\t spark\n\nrocks  "),
        (2, "plain"),
        (3, "\x07\x08"),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {r.i: (r.s, r.l) for r in df.select(
        "i",
        scrub_text(F.col("t")).alias("s"),
        scrub_text(F.col("t"), lowercase=True).alias("l"),
    ).collect()}
    assert got[1] == ("HelloWorld spark rocks", "helloworld spark rocks")
    assert got[2] == ("plain", "plain")
    assert got[3] == ("", "")


# ------------------------------------------------------------ flesch
def test_flesch_score_matches_hand_count(spark):
    from osm_pbf_spark.operators.text import flesch_score

    rows = [
        (1, "The cat sat. The dog ran!"),
        (2, "one"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_words, r.n_sentences, r.n_syllables, r.flesch)
           for r in flesch_score(df).collect()}
    # doc 1: 6 words, 2 sentences, vowel groups: e,a,a,e,o,a = 6
    w, s, sy = 6, 2, 6
    want = round(206.835 - 1.015 * (w / s) - 84.6 * (sy / w), 6)
    assert got[1] == (6, 2, 6, want)
    # "one": vowel groups o / e (split by the n) -> 2 syllables
    assert got[2] == (1, 1, 2, round(206.835 - 1.015 - 84.6 * 2, 6))
    assert got[3][0] == 0 and got[3][3] is None
