"""Batch r5-H: interleave_sources ordering."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def test_interleave_sources_round_robin_and_stable(spark):
    from osm_pbf_spark.operators.packing import interleave_sources

    rows = [(i, "s" + str(i % 3)) for i in range(60)] + [
        (100 + i, "rare") for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = interleave_sources(df).collect()
    got = {(r.doc_id): (r.source, r.pos_in_round) for r in out}
    # per-source positions are a dense 0..n_s-1 permutation in md5 order
    md5 = lambda i: hashlib.md5(str(i).encode()).hexdigest()
    for src in ("s0", "s1", "s2", "rare"):
        ids = sorted((i for i, (s, _) in got.items() if s == src),
                     key=lambda i: (md5(i), i))
        assert [got[i][1] for i in ids] == list(range(len(ids)))
    # reading ORDER BY (pos_in_round, source) round-robins sources
    # while they last: the first 4 rounds each contain 'rare'
    order = sorted(got.items(), key=lambda kv: (kv[1][1], kv[1][0]))
    first_rounds = [s for _, (s, p) in order if p < 4]
    assert first_rounds.count("rare") == 4
    for p in range(4):
        round_srcs = [s for _, (s, pp) in order if pp == p]
        assert sorted(round_srcs) == ["rare", "s0", "s1", "s2"]
    # append-stability: adding docs does not move existing positions'
    # RELATIVE per-source order (md5 rank is stable under appends)
    df2 = df.unionAll(
        spark.createDataFrame([(500, "s0")], "doc_id long, source string")
    )
    got2 = {r.doc_id: (r.source, r.pos_in_round)
            for r in interleave_sources(df2).collect()}
    s0_old = [i for i, (s, _) in sorted(got.items(), key=lambda kv: kv[1][1])
              if s == "s0"]
    s0_new = [i for i, (s, _) in sorted(got2.items(), key=lambda kv: kv[1][1])
              if s == "s0" and i != 500]
    assert s0_old == s0_new
