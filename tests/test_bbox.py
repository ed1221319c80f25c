"""bbox_join vs brute-force overlap oracle, candidate multiplicity,
boundary-touch semantics, and plan shape (pure codegen)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_pbf_spark.operators.bbox import bbox_join, pick_bbox_level

SCHEMA = "id long, lat_min double, lat_max double, lon_min double, lon_max double"


def _boxes(rng, n, extent=0.5, lat_span=(30.0, 40.0), lon_span=(-10.0, 10.0), id0=0):
    lat = rng.uniform(*lat_span, n)
    lon = rng.uniform(*lon_span, n)
    h = rng.uniform(0.01, extent, n)
    w = rng.uniform(0.01, extent, n)
    return [
        (id0 + i, float(lat[i]), float(lat[i] + h[i]), float(lon[i]), float(lon[i] + w[i]))
        for i in range(n)
    ]


def _brute(a, b):
    out = set()
    for ia, la0, la1, lo0, lo1 in a:
        for ib, lb0, lb1, mo0, mo1 in b:
            if la0 <= lb1 and lb0 <= la1 and lo0 <= mo1 and mo0 <= lo1:
                out.add((ia, ib))
    return out


@pytest.mark.parametrize("level", [6, 8, 10])
def test_bbox_join_matches_brute(spark, level):
    rng = np.random.default_rng(17)
    a = _boxes(rng, 120)
    b = _boxes(rng, 150, id0=1000)
    da = spark.createDataFrame(a, SCHEMA)
    db = spark.createDataFrame(b, SCHEMA)
    got = {(r.id_a, r.id_b) for r in bbox_join(da, db, level).collect()}
    assert got == _brute(a, b)
    assert got  # non-trivial


def test_bbox_join_multiplicity_exactly_one(spark):
    rng = np.random.default_rng(23)
    a = _boxes(rng, 100, extent=2.0)  # big boxes spanning many level-10 cells
    da = spark.createDataFrame(a, SCHEMA)
    out = bbox_join(da, da, 10)
    dup = out.groupBy("id_a", "id_b").count().where(F.col("count") > 1).count()
    assert dup == 0
    assert {(r.id_a, r.id_b) for r in out.collect()} == _brute(a, a)


def test_bbox_join_boundary_touch_counts(spark):
    # share exactly one edge / one corner -> closed-interval overlap
    a = [(1, 0.0, 1.0, 0.0, 1.0)]
    b = [(2, 1.0, 2.0, 1.0, 2.0), (3, 0.0, 1.0, 1.0, 2.0), (4, 5.0, 6.0, 5.0, 6.0)]
    da = spark.createDataFrame(a, SCHEMA)
    db = spark.createDataFrame(b, SCHEMA)
    got = {(r.id_a, r.id_b) for r in bbox_join(da, db, 8).collect()}
    assert got == {(1, 2), (1, 3)}


def test_bbox_join_plan_pure_codegen(spark):
    da = spark.createDataFrame([(1, 0.0, 1.0, 0.0, 1.0)], SCHEMA)
    plan = bbox_join(da, da, 8)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan
    assert "Generate" in plan


def test_pick_bbox_level():
    lv = pick_bbox_level(0.5)
    from osm_pbf_spark.functions.cells import cell_size_deg

    assert cell_size_deg(lv)[0] >= 0.5 > cell_size_deg(lv + 1)[0]
    with pytest.raises(ValueError):
        pick_bbox_level(0.0)
