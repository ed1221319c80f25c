"""Physical-plan pins for the batch-15 operators (HLL, STR layout,
points-along, map matching, contours, adaptive cells, LSH join) —
same discipline as tests/test_plans.py."""

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


def _n_exchanges(plan: str) -> int:
    return sum(
        1
        for ln in plan.splitlines()
        if "Exchange" in ln and "ReusedExchange" not in ln
    )


def test_hll_sketch_is_one_bounded_aggregate(spark):
    from osm_pbf_spark.operators.sketch import hll_sketch

    df = spark.range(1000).select(F.col("id").cast("string").alias("v"))
    plan = _plan(hll_sketch(df, "v", p=8))
    assert _no_python(plan), plan
    assert _n_exchanges(plan) == 1, plan


def test_points_along_is_one_window_exchange_no_python(spark):
    from osm_pbf_spark.operators.measures import points_along_lines

    df = spark.createDataFrame(
        [(1, 0, 0.0, 0.0), (1, 1, 0.0, 0.001)],
        "line_id int, seq int, lat double, lon double",
    )
    plan = _plan(points_along_lines(df, 500))
    assert _no_python(plan), plan
    # lag window + cum/total windows share ONE hash-partitioning on
    # line_id (the createDataFrame round-robin source adds none)
    assert _n_exchanges(plan) == 1, plan
    assert "Generate explode" in plan, plan


def test_contour_is_pure_codegen(spark):
    from osm_pbf_spark.operators.tiling import contour_segments

    g = spark.createDataFrame([(0, 0, 1)], "x int, y int, n int")
    plan = _plan(contour_segments(g, 1))
    assert _no_python(plan), plan
    assert _n_exchanges(plan) == 1, plan  # the block aggregate


def test_adaptive_cells_no_python(spark):
    from osm_pbf_spark.operators.tiling import adaptive_cells

    df = spark.createDataFrame(
        [(1, 1.0, 2.0)], "doc_id long, lat double, lon double"
    )
    plan = _plan(adaptive_cells(df, 4, 2, 8))
    assert _no_python(plan), plan


def test_map_match_is_single_pandas_stage(spark):
    from osm_pbf_spark.operators.matching import map_match

    pts = spark.createDataFrame(
        [(1, 0, 0.0, 0.0)], "track_id long, seq long, lat double, lon double"
    )
    segs = spark.createDataFrame(
        [(1, 0.0, 0.0, 0.0, 0.001)],
        "seg_id long, alat double, alon double, blat double, blon double",
    )
    plan = _plan(map_match(pts, segs, 0.004))
    # exactly ONE Python stage: the per-track Viterbi kernel — the
    # candidate join is all native
    assert plan.count("FlatMapGroupsInPandas") == 1, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


def test_stay_points_is_single_pandas_stage(spark):
    from osm_pbf_spark.operators.matching import stay_points

    df = spark.createDataFrame(
        [(1, 0, 0, 0.0, 0.0)],
        "track_id long, seq long, ts_us long, lat double, lon double",
    )
    plan = _plan(stay_points(df, 0.001, 1000))
    assert plan.count("FlatMapGroupsInPandas") == 1, plan


def test_minhash_join_band_join_is_shuffle_hash(spark):
    from osm_pbf_spark.operators.dedup import minhash_lsh_join

    a = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    b = spark.createDataFrame([(2, "x y w")], "doc_id long, text string")
    plan = _plan(minhash_lsh_join(a, b))
    # the band join must stay a shuffle join (broadcast would re-run
    # the corpus signature pass per side)
    assert "ShuffledHashJoin" in plan, plan


def test_fill_interpolate_shares_one_window_exchange(spark):
    from osm_pbf_spark.operators.temporal import fill_interpolate

    df = spark.createDataFrame([(1, 0, 10)], "k int, t int, v long")
    plan = _plan(fill_interpolate(df, "k", "t", "v"))
    assert _no_python(plan), plan
    # the backward and forward carries merge into ONE Window over ONE
    # key Exchange
    assert _n_exchanges(plan) == 1, plan


def test_token_budget_global_is_one_exchange_no_python(spark):
    from osm_pbf_spark.operators.packing import token_budget_sample

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = _plan(token_budget_sample(docs, 10))
    assert _no_python(plan), plan
    assert _n_exchanges(plan) == 1, plan  # the bucketed window
