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


# --------------------------------------------------------- node2vec
def test_node2vec_scalar_replay_and_bias(spark):
    import hashlib

    from osm_pbf_spark.operators.graph import node2vec_walks

    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2), (2, 3), (3, 2),
             (3, 4), (4, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r.start, r.rep, r.step): r.node
        for r in node2vec_walks(
            df, n_steps=3, walks_per_node=2, w_return=2, w_in=4, w_out=1
        ).collect()
    }

    def md5_40(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:10], 16)

    eset = set(edges)
    adj = {}
    nodes = set()
    for a, b in eset:
        adj.setdefault(a, []).append(b)
        nodes |= {a, b}
    adj = {k: sorted(v) for k, v in adj.items()}
    want = {}
    for start in nodes:
        for rep in range(2):
            want[(start, rep, 0)] = start
            prev, cur = None, start
            for step in range(1, 4):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                if step == 1:
                    nxt = nbrs[md5_40(f"n2v:{start}:{rep}:1:{cur}") % len(nbrs)]
                else:
                    ws = [2 if x == prev else (4 if (prev, x) in eset else 1)
                          for x in nbrs]
                    r = md5_40(f"n2v:{start}:{rep}:{step}:{cur}:{prev}") % sum(ws)
                    cum = 0
                    for x, w in zip(nbrs, ws):
                        cum += w
                        if cum > r:
                            nxt = x
                            break
                want[(start, rep, step)] = nxt
                prev, cur = cur, nxt
    assert got == want


def test_node2vec_degenerates_to_random_walks_on_uniform_weights(spark):
    """With w_return == w_in == w_out the second-order bias vanishes
    but the DRAW KEY differs from random_walks (prev in the hash), so
    only step-0/1 rows coincide — pin exactly that."""
    from osm_pbf_spark.operators.graph import node2vec_walks, random_walks

    edges = [((i * 3) % 20, (i * 7 + 1) % 20) for i in range(60)]
    df = spark.createDataFrame(edges, "src long, dst long")
    nv = node2vec_walks(df, n_steps=2, seed="w",
                        w_return=1, w_in=1, w_out=1)
    rw = random_walks(df, n_steps=2)
    a = {(r.start, r.rep, r.step): r.node for r in nv.collect() if r.step <= 1}
    b = {(r.start, r.rep, r.step): r.node for r in rw.collect() if r.step <= 1}
    assert a == b


def test_node2vec_guards(spark):
    from osm_pbf_spark.operators.graph import node2vec_walks

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="n_steps"):
        node2vec_walks(df, n_steps=-1)
    with pytest.raises(ValueError, match="w_return"):
        node2vec_walks(df, 2, w_return=-1)
    with pytest.raises(ValueError, match="at least one"):
        node2vec_walks(df, 2, w_return=0, w_in=0, w_out=0)


# --------------------------------------------------- vacuum_orphans
def test_vacuum_orphans_deletes_only_unreferenced(spark, tmp_path):
    import os as _os

    from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink

    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 50), "base")
    sink.commit_snapshot()
    want = sorted(tuple(r) for r in sink.read(spark).collect())

    orphan = str(tmp_path / "t" / "data" / "stray.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    res = sink.vacuum_orphans()
    assert res["deleted_files"] >= 1
    assert not _os.path.exists(orphan)
    assert sorted(tuple(r) for r in sink.read(spark).collect()) == want


def test_vacuum_orphans_respects_min_age_and_rollback_attic(spark, tmp_path):
    import os as _os

    from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink

    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 30), "base")
    s1 = sink.commit_snapshot()
    sink.write_split(_docs(spark, 30, 60), "later")
    sink.commit_snapshot()
    sink.rollback_to(s1["snapshot_id"])
    # 'later' files are only referenced via the atticed manifest +
    # abandoned snapshot — vacuum must NOT touch them
    res = sink.vacuum_orphans()
    assert res["deleted_files"] == 0
    # and a young orphan survives a min_age guard
    young = str(tmp_path / "t" / "data" / "inflight.parquet")
    with open(young, "wb") as f:
        f.write(b"staging")
    assert sink.vacuum_orphans(min_age_s=3600)["deleted_files"] == 0
    assert _os.path.exists(young)
    assert sink.vacuum_orphans()["deleted_files"] == 1


def test_expire_snapshots_age_retention(spark, tmp_path):
    """max_age_s keeps young snapshots beyond keep_last; backdated old
    ones still expire (the Iceberg older_than composition)."""
    import json as _json
    import os as _os

    from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink

    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    snaps = []
    for i in range(4):
        sink.write_split(_docs(spark, i * 10, i * 10 + 10), f"s{i}")
        snaps.append(sink.commit_snapshot({"i": i}))
    # backdate the first two snapshots far into the past
    sdir = str(tmp_path / "t" / "_snapshots")
    for fn in sorted(_os.listdir(sdir))[:2]:
        p = _os.path.join(sdir, fn)
        d = _json.load(open(p))
        d["committed_at_unix"] = 1_000_000
        _json.dump(d, open(p, "w"))
    sink.expire_snapshots(keep_last=1, max_age_s=3600)
    left = {s["snapshot_id"] for s in sink.snapshots()}
    # young 3rd snapshot survived beyond keep_last; old two expired
    assert snaps[3]["snapshot_id"] in left
    assert snaps[2]["snapshot_id"] in left
    assert snaps[0]["snapshot_id"] not in left
    assert snaps[1]["snapshot_id"] not in left
