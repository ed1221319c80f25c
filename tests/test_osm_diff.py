"""apply_diff: osmChange resolution semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401


def _apply(spark, entities, changes):
    from osm_pbf_spark.plans.diff import apply_diff

    e = spark.createDataFrame(entities, "id long, lat double, lon double")
    c = spark.createDataFrame(
        changes, "id long, lat double, lon double, version long, action string"
    )
    return {
        r.id: (r.lat, r.lon) for r in apply_diff(e, c).collect()
    }


def test_apply_diff_basic_actions(spark):
    ents = [(1, 1.0, 1.0), (2, 2.0, 2.0), (3, 3.0, 3.0)]
    ch = [
        (1, 9.0, 9.0, 2, "modify"),
        (2, 0.0, 0.0, 2, "delete"),
        (7, 7.0, 7.0, 1, "create"),
    ]
    got = _apply(spark, ents, ch)
    assert got == {1: (9.0, 9.0), 3: (3.0, 3.0), 7: (7.0, 7.0)}


def test_apply_diff_version_resolution(spark):
    ents = [(1, 1.0, 1.0), (2, 2.0, 2.0)]
    ch = [
        (1, 5.0, 5.0, 2, "modify"),
        (1, 6.0, 6.0, 3, "modify"),   # higher version wins
        (2, 0.0, 0.0, 4, "delete"),
        (2, 8.0, 8.0, 4, "modify"),   # tie: delete beats modify
    ]
    got = _apply(spark, ents, ch)
    assert got == {1: (6.0, 6.0)}


def test_apply_diff_create_then_delete(spark):
    ents = [(1, 1.0, 1.0)]
    ch = [
        (9, 9.0, 9.0, 1, "create"),
        (9, 0.0, 0.0, 2, "delete"),   # created then deleted -> absent
    ]
    got = _apply(spark, ents, ch)
    assert got == {1: (1.0, 1.0)}


def test_apply_diff_rejects_unknown_action(spark):
    from osm_pbf_spark.plans.diff import apply_diff

    e = spark.createDataFrame([(1, 1.0, 1.0)], "id long, lat double, lon double")
    c = spark.createDataFrame(
        [(1, 1.0, 1.0, 2, "upsert")],
        "id long, lat double, lon double, version long, action string",
    )
    with pytest.raises(Exception, match="unknown action"):
        apply_diff(e, c).collect()


def test_apply_diff_missing_columns_raise(spark):
    from osm_pbf_spark.plans.diff import apply_diff

    e = spark.createDataFrame([(1, 1.0, 1.0)], "id long, lat double, lon double")
    c = spark.createDataFrame([(1, 2, "modify")], "id long, version long, action string")
    with pytest.raises(ValueError, match="missing columns"):
        apply_diff(e, c)


def test_apply_diff_payload_tie_is_deterministic(spark):
    """ADVICE r3: same id/version/action with DIFFERENT payloads must
    pick one winner by payload hash — identical across runs and across
    input orderings, never a partitioning coin flip."""
    ents = [(1, 1.0, 1.0)]
    ch_a = [
        (1, 5.0, 5.0, 2, "modify"),
        (1, 6.0, 6.0, 2, "modify"),
    ]
    got1 = _apply(spark, ents, ch_a)
    got2 = _apply(spark, ents, list(reversed(ch_a)))  # input order flipped
    assert got1 == got2
    assert got1[1] in ((5.0, 5.0), (6.0, 6.0))
