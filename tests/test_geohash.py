"""geohash_col vs the pure-Python replay AND a textbook bisection
reference (independent algorithm), plus known published geohash
values and edge clamps."""

from __future__ import annotations

import numpy as np
import pytest

from osm_pbf_spark.functions.geohash import BASE32, geohash_col, geohash_py


def _bisect_geohash(lat: float, lon: float, precision: int) -> str:
    """Textbook interval-bisection geohash (independent of the
    quantize-and-interleave implementation). Interval mids are exact
    dyadic multiples, so this matches the scaled-floor method."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < 5 * precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for k in range(precision):
        v = 0
        for b in bits[5 * k : 5 * k + 5]:
            v = v * 2 + b
        out.append(BASE32[v])
    return "".join(out)


def test_known_geohashes():
    # published examples (geohash.org / Wikipedia)
    assert geohash_py(57.64911, 10.40744, 11) == "u4pruydqqvj"
    assert geohash_py(42.6, -5.6, 5) == "ezs42"
    assert _bisect_geohash(57.64911, 10.40744, 11) == "u4pruydqqvj"


@pytest.mark.parametrize("precision", [1, 2, 5, 8, 12])
def test_py_replay_matches_bisection(precision):
    rng = np.random.default_rng(41)
    for _ in range(300):
        lat = float(rng.uniform(-89.9, 89.9))
        lon = float(rng.uniform(-179.9, 179.9))
        assert geohash_py(lat, lon, precision) == _bisect_geohash(lat, lon, precision)


def test_native_matches_py(spark):
    from pyspark.sql import functions as F

    rng = np.random.default_rng(43)
    rows = [
        (i, float(rng.uniform(-90, 90)), float(rng.uniform(-180, 180))) for i in range(500)
    ] + [(1000, 90.0, 180.0), (1001, -90.0, -180.0), (1002, 0.0, 0.0)]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    for precision in (1, 4, 8, 12):
        got = {
            r.id: r.gh
            for r in df.select("id", geohash_col(F.col("lat"), F.col("lon"), precision).alias("gh")).collect()
        }
        want = {i: geohash_py(la, lo, precision) for i, la, lo in rows}
        assert got == want


def test_native_plan_no_python(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1.0, 2.0)], "lat double, lon double")
    plan = (
        df.select(geohash_col(F.col("lat"), F.col("lon"), 8).alias("gh"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan


def test_bad_precision():
    with pytest.raises(ValueError):
        geohash_py(0.0, 0.0, 0)
    with pytest.raises(ValueError):
        geohash_py(0.0, 0.0, 13)
