"""Physical-plan pins for the final round-3 operator batches — the
tuned plan shapes must STAY what Catalyst picks (same discipline as
tests/test_plans.py and test_plans_batch567.py)."""

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


def test_count_min_is_one_bounded_aggregate(spark):
    from osm_pbf_spark.operators.sketch import count_min

    df = spark.range(1000).select((F.col("id") % 97).alias("v"))
    plan = _plan(count_min(df, "v", depth=4, width=64))
    assert _no_python(plan), plan
    # posexplode Generate + ONE partial/final agg exchange
    assert "Generate posexplode" in plan
    assert _n_exchanges(plan) == 1, plan


def test_cms_lookup_broadcasts_the_sketch(spark):
    from osm_pbf_spark.operators.sketch import cms_lookup, count_min

    df = spark.range(1000).select((F.col("id") % 97).alias("v"))
    sk = count_min(df, "v", depth=4, width=64)
    probes = spark.range(10).select(F.col("id").alias("v"))
    plan = _plan(cms_lookup(sk, probes, "v", depth=4, width=64))
    assert "BroadcastHashJoin" in plan, plan


def test_skyline_is_two_pandas_stages(spark):
    from osm_pbf_spark.operators.skyline import skyline

    df = spark.range(500).select(
        (F.col("id") % 37).alias("x"), (F.col("id") % 11).alias("y")
    )
    plan = _plan(skyline(df, ["x", "y"]))
    assert plan.count("FlatMapGroupsInPandas") == 2, plan


def test_profile_table_is_one_native_scan(spark):
    from osm_pbf_spark.operators.checksum import profile_table

    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") % 7).alias("b")
    )
    plan = _plan(profile_table(df, ["a", "b"]))
    assert _no_python(plan), plan
    # multi-count_distinct in one pass plans via Expand, not extra scans
    assert "Expand" in plan
    assert plan.count("Scan ") <= 1 or plan.count("Range") <= 1


def test_stats_are_pure_codegen(spark):
    from osm_pbf_spark.operators.stats import ols_fit, pearson_corr, zscore

    df = spark.range(500).select(
        (F.col("id") % 5).cast("string").alias("g"),
        (F.col("id") % 23).alias("x"),
        (F.col("id") % 17).alias("y"),
    )
    for out in (
        pearson_corr(df, "x", "y", ["g"]),
        ols_fit(df, "x", "y", ["g"]),
    ):
        plan = _plan(out)
        assert _no_python(plan), plan
        assert _n_exchanges(plan) == 1, plan  # one group-agg shuffle
    zplan = _plan(zscore(df, "x", ["g"]))
    assert _no_python(zplan), zplan
    assert "BroadcastHashJoin" in zplan, zplan  # tiny moments join back


def test_bpe_is_single_mapinpandas_no_shuffle(spark):
    from osm_pbf_spark.operators.text import bpe_encode

    df = spark.createDataFrame([(1, "ab ba")], "doc_id bigint, text string")
    plan = _plan(bpe_encode(df, [("a", "b")]))
    assert plan.count("MapInPandas") == 1, plan
    assert _n_exchanges(plan) == 0, plan


def test_phonetic_join_native_with_levenshtein_refine(spark):
    from osm_pbf_spark.operators.fuzzy import phonetic_join

    a = spark.createDataFrame([("table",)], "pa string")
    b = spark.createDataFrame([("tabel",)], "pb string")
    plan = _plan(phonetic_join(a, b, "pa", "pb"))
    assert _no_python(plan), plan
    assert "levenshtein" in plan, plan


def test_debounce_is_one_keyed_pandas_stage(spark):
    from osm_pbf_spark.operators.temporal import debounce

    import datetime as dt

    df = spark.createDataFrame(
        [(1, 1, dt.datetime(2026, 1, 1))], "event_id bigint, user_id bigint, ts timestamp"
    )
    plan = _plan(debounce(df))
    assert plan.count("FlatMapGroupsInPandas") == 1, plan
    assert _n_exchanges(plan) == 1, plan


def test_getis_ord_is_native_scatter(spark):
    from osm_pbf_spark.operators.spatialstats import getis_ord_gi

    cells = spark.createDataFrame(
        [(i, i % 3, 1 + i % 4) for i in range(20)], "cx bigint, cy bigint, x bigint"
    ).select("cx", "cy", "x")
    plan = _plan(getis_ord_gi(cells))
    assert _no_python(plan), plan
    assert "Generate explode" in plan, plan


def test_zorder_key_is_pure_projection(spark):
    from osm_pbf_spark.functions.zorder import zorder_key_col

    df = spark.range(100).select(
        F.col("id").cast("double").alias("a"), (F.col("id") % 7).cast("double").alias("b")
    )
    out = df.select(
        zorder_key_col([F.col("a"), F.col("b")], [0.0, 0.0], [100.0, 7.0]).alias("z")
    )
    plan = _plan(out)
    assert _no_python(plan), plan
    assert _n_exchanges(plan) == 0, plan


def test_graph_ops_stay_native(spark):
    from osm_pbf_spark.operators.graph import clustering_coefficient, kcore

    e = spark.range(200).select(
        (F.col("id") % 23).alias("src"), ((F.col("id") * 7) % 23).alias("dst")
    )
    assert _no_python(_plan(kcore(e, k=2, rounds=2)))
    assert _no_python(_plan(clustering_coefficient(e)))
