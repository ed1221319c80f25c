"""Batch-51: assortativity, harmonic_closeness, anomaly composition,
robust_zscore carry_cols."""

from __future__ import annotations

import math


def test_assortativity_known_graphs(spark):
    from osm_pbf_spark.operators.graph import assortativity

    # star: every edge pairs degree n-1 with degree 1 -> r = -1
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 8)], "src long, dst long"
    )
    r = assortativity(star).collect()[0]
    assert abs(r.corr - (-1.0)) < 1e-12
    # two disjoint cliques of different sizes: within a clique every
    # endpoint has equal degree -> correlation undefined? no: degrees
    # differ ACROSS cliques, equal within -> perfect assortativity
    k3 = [(i, j) for i in range(3) for j in range(i + 1, 3)]
    k4 = [(10 + i, 10 + j) for i in range(4) for j in range(i + 1, 4)]
    r2 = assortativity(
        spark.createDataFrame(k3 + k4, "src long, dst long")
    ).collect()[0]
    assert abs(r2.corr - 1.0) < 1e-12
    # regular graph (cycle): constant degrees -> NULL, not an error
    cyc = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
    )
    assert assortativity(cyc).collect()[0].corr is None


def test_harmonic_closeness_scalar_replay(spark):
    from osm_pbf_spark.operators.graph import harmonic_closeness

    # path graph 0-1-2-3-4 with unit weights, origins {0, 4}
    edges = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(4)], "src long, dst long, w long"
    )
    srcs = spark.createDataFrame([(0,), (4,)], "node long")
    got = {r.node: r for r in harmonic_closeness(edges, srcs).collect()}
    # node 2: d=2 from both -> 2 * (2^40 // 2); node 1: d=1,3
    u = 1 << 40
    assert got[2].harm_u == 2 * (u // 2) and got[2].n_reached == 2
    assert got[1].harm_u == u // 1 + u // 3
    assert got[0].harm_u == u // 4  # own 0-distance row contributes 0
    assert got[1].harm == float(got[1].harm_u) / float(u)


def test_robust_zscore_carry_cols(spark):
    from osm_pbf_spark.operators.stats import robust_zscore

    rows = [(1, 100 + i, v) for i, v in enumerate([5, 6, 5, 7, 6, 500])]
    df = spark.createDataFrame(rows, "g long, rid long, v long")
    out = robust_zscore(df, "v", ["g"], min_dev_mads=8, carry_cols=["rid"])
    flagged = out.collect()
    assert len(flagged) == 1 and flagged[0].rid == 105
    assert flagged[0].x == 500
    # without carry, the column set is the historical one
    legacy = robust_zscore(df, "v", ["g"]).columns
    assert legacy == ["g", "x", "med", "mad", "robust_z"]


def test_anomaly_composition_flags_planted_spike(spark):
    from osm_pbf_spark.operators.stats import robust_zscore
    from osm_pbf_spark.operators.temporal import seasonal_decompose
    from pyspark.sql import functions as F

    rows = [
        (1, i, i % 7, float(10 + (i % 7)) + (900.0 if i == 40 else 0.0))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "key long, seq long, tb long, val double")
    dec = seasonal_decompose(df, period=7, tiebreak_col="tb", scale=100)
    rq = dec.where(F.col("residual").isNotNull()).select(
        "key",
        "seq",
        F.floor(F.col("residual") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("rq"),
    )
    flags = robust_zscore(
        rq, "rq", ["key"], min_dev_mads=8, carry_cols=["seq"]
    ).collect()
    assert any(r.seq == 40 for r in flags)  # the spike is caught
    big = [r for r in flags if r.seq == 40][0]
    assert big.robust_z is not None and math.fabs(big.robust_z) > 8


def test_c4_pipeline_stage_semantics(spark):
    """The composed cleaning pipeline: low-quality OUT, non-English
    OUT, exact copies collapse to the smallest id."""
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.text import lang_id, quality_score

    good = (
        "this is the best of the band and the crowd sang of the day "
        "and the night of the year the end of the show and the tour"
    )
    rows = [
        (1, "a", good),
        (2, "a", good),                      # exact copy -> deduped
        (3, "a", "x! y? z, w. !!!! ???? ,,,, ...."),  # punct-heavy
        (4, "b", "le chat et la maison et le chien et la mer"),  # fr
    ]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    scored = d.select(
        "doc_id",
        "source",
        "text",
        quality_score(F.col("text")).alias("q"),
        lang_id(F.col("text")).alias("lp"),
    )
    filt = scored.where((F.col("q") >= 0.55) & (F.col("lp") == "en"))
    ids = {r.doc_id for r in filt.collect()}
    assert ids == {1, 2}  # fr and punct-heavy dropped
    keeper = filt.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("keep")
    )
    kept = (
        filt.withColumn("fp", F.md5("text"))
        .join(keeper, "fp")
        .where(F.col("doc_id") == F.col("keep"))
    )
    assert {r.doc_id for r in kept.collect()} == {1}
