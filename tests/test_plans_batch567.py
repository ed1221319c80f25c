"""Physical-plan pins for the round-3 late operator batches — the
tuned plan shapes must STAY what Catalyst picks (same discipline as
tests/test_plans.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _no_python(plan: str) -> bool:
    return (
        "ArrowEvalPython" not in plan
        and "BatchEvalPython" not in plan
        and "InPandas" not in plan
    )


def _docs(spark, n=40):
    return spark.createDataFrame(
        [(i, f"tok{i % 7} tok{(i * 3) % 5} tok{i % 7}") for i in range(n)],
        "doc_id long, text string",
    )


def test_dbscan_neighbor_join_is_native_single_shuffle_pair(spark):
    from osm_pbf_spark.operators.clustering import dbscan

    pts = spark.createDataFrame(
        [(i, float(i % 10), float(i % 7)) for i in range(50)],
        "id long, x double, y double",
    )
    # pin the candidate stage only (full dbscan runs CC with checkpoints)
    plan = _plan(dbscan(pts, eps=1.0, min_pts=3, cc_rounds=1))
    assert _no_python(plan), plan  # grid join + degree agg all JVM-side
    assert "Generate explode" in plan  # the 9-cell window is one Generate


def test_line_dedup_is_native_and_keyed(spark):
    from osm_pbf_spark.operators.text import line_dedup

    docs = spark.createDataFrame(
        [(i, "a\nb\nc") for i in range(20)], "doc_id long, text string"
    )
    plan = _plan(line_dedup(docs))
    assert _no_python(plan), plan
    # keeper agg + join-back + doc regroup (+ the totals join): the
    # line-keyed and doc-keyed exchanges only — no cartesian anywhere
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_inverted_index_df_agg_is_partial(spark):
    from osm_pbf_spark.operators.text import inverted_index

    plan = _plan(inverted_index(_docs(spark), min_df=1, max_df=100))
    assert _no_python(plan), plan
    # the df count must be a partial (map-side) aggregate pair
    assert "partial_count" in plan, plan


def test_idw_is_native_with_single_point_aggregate(spark):
    from osm_pbf_spark.operators.distance import idw_interpolate

    pts = spark.createDataFrame(
        [(i, float(i % 5), float(i % 3)) for i in range(30)],
        "doc_id long, lat double, lon double",
    )
    st = spark.createDataFrame(
        [(100 + j, float(j % 5) + 0.25, float(j % 3) + 0.25, j % 7) for j in range(10)],
        "station_id long, lat double, lon double, v long",
    )
    plan = _plan(idw_interpolate(pts, st, radius=1.0))
    assert _no_python(plan), plan
    assert "partial_sum" in plan  # weighted sums combine map-side


def test_morans_i_broadcasts_scalars_no_python(spark):
    from osm_pbf_spark.operators.spatialstats import morans_i

    cells = spark.createDataFrame(
        [(i % 6, i % 4, i % 3 + 1) for i in range(24)], "cx long, cy long, x long"
    )
    plan = _plan(morans_i(cells))
    assert _no_python(plan), plan
    assert "BroadcastExchange" in plan  # the 1-row totals ride broadcasts
    assert "CartesianProduct" not in plan


def test_rp_reduce_is_exactly_one_arrow_stage(spark):
    from osm_pbf_spark.operators.ann import rp_reduce

    df = spark.createDataFrame(
        [(i, [float(i + j) for j in range(8)]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    plan = _plan(rp_reduce(df, dim=8, out_dim=4))
    assert plan.count("ArrowEvalPython") == 1, plan


def test_redact_spans_is_pure_projection(spark):
    from osm_pbf_spark.operators.docrender import redact_spans

    docs = spark.createDataFrame(
        [("d", [("k", "t1", None, 0), ("media", "", "m:1", 3)])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    plan = _plan(redact_spans(docs, "[0-9]+", "#"))
    assert _no_python(plan), plan
    assert "Exchange" not in plan  # map-only: no shuffle at all


def test_weighted_sample_single_window_exchange(spark):
    from osm_pbf_spark.operators.packing import weighted_sample

    df = spark.createDataFrame(
        [(i, "g", float(i % 5 + 1)) for i in range(50)],
        "doc_id long, lang string, w double",
    )
    plan = _plan(weighted_sample(df, k=5, weight_col="w", group_col="lang"))
    assert _no_python(plan), plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
