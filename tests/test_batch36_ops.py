"""Batch-36: cohens_kappa, areal_interpolate."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401

from osm_pbf_spark.operators.spatial_join import Polygon


def _rect(pid, la0, la1, lo0, lo1):
    return Polygon(
        pid, [np.array([[la0, lo0], [la0, lo1], [la1, lo1], [la1, lo0]])]
    )


# ------------------------------------------------------------ cohens_kappa


def test_kappa_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.stats import cohens_kappa

    rows = [
        (["x", "y", "z"][i % 3], ["x", "y", "z"][(i * 7) % 3])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "ra string, rb string")
    r = cohens_kappa(df, "ra", "rb").collect()[0]
    n = len(rows)
    agree = sum(1 for a, b in rows if a == b)
    ca: dict = {}
    cb: dict = {}
    for a, b in rows:
        ca[a] = ca.get(a, 0) + 1
        cb[b] = cb.get(b, 0) + 1
    pe = sum(ca[k] * cb.get(k, 0) for k in ca)
    assert (r.n, r.agree, r.pe_num) == (n, agree, pe)
    assert r.kappa_num == n * agree - pe and r.kappa_den == n * n - pe
    assert r.kappa == float(n * agree - pe) / float(n * n - pe)


def test_kappa_extremes(spark):
    from osm_pbf_spark.operators.stats import cohens_kappa

    # perfect agreement over 2 labels -> kappa 1
    perf = spark.createDataFrame(
        [("a", "a"), ("b", "b"), ("a", "a")], "ra string, rb string"
    )
    assert cohens_kappa(perf, "ra", "rb").collect()[0].kappa == 1.0
    # both raters constant and identical -> degenerate NULL
    const = spark.createDataFrame([("a", "a")] * 5, "ra string, rb string")
    assert cohens_kappa(const, "ra", "rb").collect()[0].kappa is None
    # chance-level agreement (independent raters) -> kappa ~ 0
    chance = spark.createDataFrame(
        [(["a", "b"][i % 2], ["a", "b"][(i // 2) % 2]) for i in range(400)],
        "ra string, rb string",
    )
    assert abs(cohens_kappa(chance, "ra", "rb").collect()[0].kappa) < 0.05


# -------------------------------------------------------- areal_interpolate


def test_areal_exact_halves(spark):
    """Two 10x10-degree source zones; a target straddling them 50/50
    receives exactly half of each value (micro units, closed form)."""
    from osm_pbf_spark.operators.overlay import areal_interpolate

    src = [_rect("s1", 0.0, 10.0, 0.0, 10.0), _rect("s2", 0.0, 10.0, 10.0, 20.0)]
    tgt = [
        _rect("ta", 0.0, 10.0, 5.0, 15.0),
        _rect("tb", 0.0, 5.0, 0.0, 5.0),
        _rect("tc", 40.0, 45.0, 40.0, 45.0),
    ]
    values = spark.createDataFrame(
        [("s1", 1000), ("s2", 500)], "poly_id string, value long"
    )
    got = {
        r.tgt_id: (r.n_cells, r.est_micro, r.n_src)
        for r in areal_interpolate(spark, src, tgt, values, res=0.5).collect()
    }
    # src zones are 20x20 = 400 cells each at res 0.5
    assert got["ta"] == (400, 500_000_000 + 250_000_000, 2)
    assert got["tb"] == (100, 250_000_000, 1)
    assert got["tc"] == (100, 0, 0)


def test_areal_mass_preserving_partition(spark):
    """Targets that exactly partition the source recover the full
    value (up to the documented DIV floor)."""
    from osm_pbf_spark.operators.overlay import areal_interpolate

    src = [_rect("s", 0.0, 8.0, 0.0, 8.0)]
    tgt = [_rect("t1", 0.0, 8.0, 0.0, 4.0), _rect("t2", 0.0, 8.0, 4.0, 8.0)]
    values = spark.createDataFrame([("s", 777)], "poly_id string, value long")
    got = {
        r.tgt_id: r.est_micro
        for r in areal_interpolate(spark, src, tgt, values, res=0.5).collect()
    }
    total = sum(got.values())
    assert abs(total - 777_000_000) <= 2  # one DIV floor per target
    assert got["t1"] == got["t2"]
    bad = spark.createDataFrame([("s", -1)], "poly_id string, value long")
    with pytest.raises(Exception, match="must be >= 0"):
        areal_interpolate(spark, src, tgt, bad, res=0.5).collect()
