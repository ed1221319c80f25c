"""Batch r4-2: lcss_join, jaro_winkler_join, cidr_join,
stream_threshold_alert."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


# -------------------------------------------------------------- LCSS
def _tracks_df(spark, tracks):
    rows = [
        (tid, [{"lat": la, "lon": lo} for la, lo in pts])
        for tid, pts in tracks.items()
    ]
    return spark.createDataFrame(
        rows, "track_id long, pts array<struct<lat double, lon double>>"
    )


def test_lcss_matches_scalar_dp_and_tolerates_glitch(spark):
    from osm_pbf_spark.operators.distance import lcss_join, lcss_py

    base = [(10.0 + i * 0.1, 20.0 + i * 0.1) for i in range(8)]
    glitch = list(base)
    glitch[3] = (glitch[3][0] + 5.0, glitch[3][1])  # one GPS spike
    far = [(10.0 + i * 0.1, 60.0) for i in range(8)]
    df = _tracks_df(spark, {1: base, 2: glitch, 3: far})
    out = {
        (r.id_a, r.id_b): (r.lcss, r.sim_ppm)
        for r in lcss_join(df, df, radius=0.05, level=6, min_sim_ppm=1)
        .where(F.col("id_a") < F.col("id_b"))
        .collect()
    }
    # glitched twin still matches on 7 of 8 fixes
    assert out[(1, 2)] == (7, 875_000)
    assert (1, 3) not in out and (2, 3) not in out
    # scalar DP replay agrees
    snap = lambda pts: [
        (int(__import__("math").floor(lo * 1e6 + 0.5)),
         int(__import__("math").floor(la * 1e6 + 0.5)))
        for la, lo in pts
    ]
    r2 = int(__import__("math").ceil(0.05 * 1e6)) ** 2
    assert lcss_py(snap(base), snap(glitch), r2) == 7


def test_lcss_rejects_zero_min_sim(spark):
    from osm_pbf_spark.operators.distance import lcss_join

    df = _tracks_df(spark, {1: [(0.0, 0.0)]})
    with pytest.raises(ValueError, match="min_sim_ppm"):
        lcss_join(df, df, radius=0.05, level=6, min_sim_ppm=0)


# ------------------------------------------------------ Jaro-Winkler
def test_jw_kernel_literature_values():
    from osm_pbf_spark.operators.fuzzy import jaro_winkler_ppm_py as jw

    assert jw("MARTHA", "MARHTA") == 961_111
    assert jw("DIXON", "DICKSONX") == 813_333
    assert jw("JELLYFISH", "SMELLYFISH") == 896_296
    assert jw("DWAYNE", "DUANE") == 840_000
    assert jw("abc", "abc") == 1_000_000
    assert jw("abc", "xyz") == 0
    assert jw("", "x") == 0
    assert jw("", "") == 1_000_000  # documented convention


def test_jw_join_blocks_and_scores(spark):
    from osm_pbf_spark.operators.fuzzy import (
        jaro_winkler_join,
        jaro_winkler_ppm_py,
    )

    left = spark.createDataFrame(
        [(1, "martha"), (2, "dwayne"), (3, "zzz")], "id long, name string"
    )
    right = spark.createDataFrame(
        [(10, "marhta"), (20, "duane"), (30, "aaa")], "rid long, rname string"
    )
    got = {
        (r.id, r.rid): r.jw_ppm
        for r in jaro_winkler_join(
            left, right, "name", "rname", min_ppm=800_000
        ).collect()
    }
    assert got[(1, 10)] == jaro_winkler_ppm_py("martha", "marhta")
    # dwayne/duane: above threshold AND same soundex (D500/D500)
    assert got[(2, 20)] == jaro_winkler_ppm_py("dwayne", "duane")
    assert (3, 30) not in got


# -------------------------------------------------------------- CIDR
def test_cidr_join_lpm_and_invalid(spark):
    from osm_pbf_spark.operators.text import cidr_join, ip_to_int

    ips = spark.createDataFrame(
        [(1, "10.1.2.3"), (2, "10.200.0.1"), (3, "192.168.1.1"),
         (4, "999.1.1.1"), (5, "not-an-ip"),
         (6, "01.2.3.4"), (7, " 1.2.3.4"), (8, "+1.2.3.4")],
        "rid long, ip string",
    )
    nets = spark.createDataFrame(
        [("10.0.0.0", 8), ("10.1.0.0", 16), ("10.1.2.0", 24),
         ("192.168.0.0", 16)],
        "base string, masklen int",
    )
    got = {r.rid: (r.net_base, r.net_masklen) for r in cidr_join(ips, nets).collect()}
    i = lambda s: sum(
        int(o) << (8 * (3 - k)) for k, o in enumerate(s.split("."))
    )
    assert got[1] == (i("10.1.2.0"), 24)     # LPM beats /16 and /8
    assert got[2] == (i("10.0.0.0"), 8)      # only the /8 contains it
    assert got[3] == (i("192.168.0.0"), 16)
    assert got[4] == (None, None)            # invalid octet
    assert got[5] == (None, None)            # garbage string
    assert got[6] == (None, None)            # leading-zero octet
    assert got[7] == (None, None)            # whitespace octet
    assert got[8] == (None, None)            # signed octet
    assert len(got) == 8                     # nothing dropped


def test_cidr_join_masks_host_bits_and_guards(spark):
    from osm_pbf_spark.operators.text import cidr_join

    ips = spark.createDataFrame([(1, "10.0.0.7")], "rid long, ip string")
    sloppy = spark.createDataFrame(
        [("10.37.200.9", 8)], "base string, masklen int"  # host bits set
    )
    (r,) = cidr_join(ips, sloppy).collect()
    assert (r.net_base, r.net_masklen) == (10 << 24, 8)
    bad = spark.createDataFrame([("10.0.0.0", 40)], "base string, masklen int")
    with pytest.raises(Exception, match="masklen"):
        cidr_join(ips, bad).collect()


# ----------------------------------------------- stream alert
def test_stream_alert_single_batch_equals_having(spark, tmp_path):
    from osm_pbf_spark.streaming import (
        run_available_now,
        stream_parquet,
        stream_threshold_alert,
    )

    src = str(tmp_path / "ev")
    rows = [(i % 7, "t") for i in range(100)]  # keys 0,1 get 15; 2-6 get 14
    df = spark.createDataFrame(rows, "k long, t string")
    df.write.parquet(src)
    got = {
        (r.k, r.t): r.n_events
        for r in run_available_now(
            stream_threshold_alert(
                stream_parquet(spark, src).select("k", "t"), ["k", "t"], k=15
            ),
            output_mode="append",
            checkpoint_dir=str(tmp_path / "c1"),
        ).collect()
    }
    exp = {
        (r.k, r.t): r.n
        for r in df.groupBy("k", "t").agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 15).collect()
    }
    assert got == exp and len(got) == 2


def test_stream_alert_cross_batch_accumulates_and_fires_once(spark, tmp_path):
    """Batch 1: key A has 2 events (below k=3), B has 3 (fires).
    Batch 2: A gets 1 more (now 3 -> fires with cumulative 3); B gets
    more events but must NOT re-fire."""
    from osm_pbf_spark.streaming import (
        run_available_now,
        stream_parquet,
        stream_threshold_alert,
    )

    d1, d2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [("A",)] * 2 + [("B",)] * 3, "k string"
    ).coalesce(1).write.parquet(d1)
    spark.createDataFrame(
        [("A",)] * 1 + [("B",)] * 5, "k string"
    ).coalesce(1).write.parquet(d2)
    f1 = [f for f in os.listdir(d1) if f.endswith(".parquet")][0]
    f2 = [f for f in os.listdir(d2) if f.endswith(".parquet")][0]
    os.rename(os.path.join(d1, f1), os.path.join(src, "a_" + f1))
    os.rename(os.path.join(d2, f2), os.path.join(src, "b_" + f2))
    os.utime(os.path.join(src, "a_" + f1), (1_700_000_000,) * 2)
    os.utime(os.path.join(src, "b_" + f2), (1_700_000_100,) * 2)

    sdf = stream_parquet(spark, src, max_files_per_trigger=1).select("k")
    got = {
        r.k: r.n_events
        for r in run_available_now(
            stream_threshold_alert(sdf, ["k"], k=3),
            output_mode="append",
            checkpoint_dir=str(tmp_path / "c2"),
        ).collect()
    }
    assert got == {"A": 3, "B": 3}  # B fired in batch 1 only
