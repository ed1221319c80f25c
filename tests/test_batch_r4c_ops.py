"""Batch r4-3: kmeans_fit (full distributed Lloyd), sink snapshot tags."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _vecs_df(spark, n=60, d=4, k_planted=3):
    rows = []
    for i in range(n):
        c = i % k_planted
        base = [10.0 * c + j for j in range(d)]
        rows.append((i, [b + 0.001 * ((i * 7 + j) % 5) for j, b in enumerate(base)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), rows


def test_kmeans_fit_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.ann import (
        KMEANS_Q_SCALE,
        kmeans_fit,
        kmeans_fit_py,
    )

    df, rows = _vecs_df(spark)
    got = {r.vec_id: (r.cluster, r.d2) for r in kmeans_fit(df, 3, 4).collect()}

    vecs = [
        tuple(
            int(math.floor(float(__import__("numpy").float32(x)) * KMEANS_Q_SCALE + 0.5))
            for x in emb
        )
        for _, emb in sorted(rows)
    ]
    cents = kmeans_fit_py(vecs, 3, 4)
    for (vid, _), v in zip(sorted(rows), vecs):
        best, bd = 0, None
        for c, cc in enumerate(cents):
            dd = sum((a - b) * (a - b) for a, b in zip(v, cc))
            if bd is None or dd < bd:
                best, bd = c, dd
        assert got[vid] == (best, bd), vid
    # planted structure recovered: each planted mode is one cluster
    by_mode = {}
    for vid, (cl, _) in got.items():
        by_mode.setdefault(vid % 3, set()).add(cl)
    assert all(len(s) == 1 for s in by_mode.values())
    assert len({next(iter(s)) for s in by_mode.values()}) == 3


def test_kmeans_fit_deterministic_and_guards(spark):
    from osm_pbf_spark.operators.ann import kmeans_fit

    df, _ = _vecs_df(spark, n=20)
    a = sorted(map(tuple, kmeans_fit(df, 3, 2).collect()))
    b = sorted(map(tuple, kmeans_fit(df.repartition(7), 3, 2).collect()))
    assert a == b  # partitioning-invariant
    with pytest.raises(ValueError, match="n_clusters"):
        kmeans_fit(df, 0, 2)
    with pytest.raises(ValueError, match="need >="):
        kmeans_fit(df.limit(2), 3, 1).collect()


# ----------------------------------------------------------- sink tags
def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 7 % 1000).alias("cell"),
        F.concat(F.lit("p-"), F.col("id")).alias("text"),
    )


def test_tag_pins_snapshot_and_survives_expiry(spark, tmp_path):
    from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink

    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 50), "base")
    sink.commit_snapshot()
    sink.tag_snapshot("cut-v1")
    want = sorted(tuple(r) for r in sink.read(spark).collect())

    for i in range(3):
        sink.write_split(_docs(spark, 100 + i * 10, 110 + i * 10), f"x{i}")
        sink.commit_snapshot()
    got = sorted(tuple(r) for r in sink.read_tag(spark, "cut-v1").collect())
    assert got == want

    # expiry keeps the tagged snapshot alive, however old
    sink.expire_snapshots(keep_last=1)
    got2 = sorted(tuple(r) for r in sink.read_tag(spark, "cut-v1").collect())
    assert got2 == want


def test_tag_immutability_and_errors(spark, tmp_path):
    from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink

    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    with pytest.raises(ValueError, match="no snapshot"):
        sink.tag_snapshot("early")
    sink.write_split(_docs(spark, 0, 10), "base")
    s1 = sink.commit_snapshot()
    sink.tag_snapshot("a", s1["snapshot_id"])
    with pytest.raises(ValueError, match="immutable"):
        sink.tag_snapshot("a")
    with pytest.raises(KeyError, match="unknown tag"):
        sink.read_tag(spark, "nope")
    sink.delete_tag("a")
    with pytest.raises(KeyError):
        sink.delete_tag("a")
    sink.tag_snapshot("a")  # re-usable after delete
    assert sink.tags()["a"] == s1["snapshot_id"]
