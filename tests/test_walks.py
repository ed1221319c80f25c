"""random_walks / walk_pairs: pure-Python md5 spec replay, sink
truncation, hub truncation via max_degree, determinism, plan pins."""

from __future__ import annotations

import hashlib


def _h(seed, start, rep, step, cur):
    s = f"{seed}:{start}:{rep}:{step}:{cur}"
    return int(hashlib.md5(s.encode()).hexdigest()[:10], 16)


def _walks_py(edges, n_steps, walks_per_node, max_degree=None, seed="w"):
    e = {(a, b) for a, b in edges if a != b}
    adj: dict[int, list[int]] = {}
    for a, b in e:
        adj.setdefault(a, []).append(b)
    for a in adj:
        adj[a] = sorted(adj[a])
        if max_degree is not None:
            adj[a] = adj[a][:max_degree]
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    out = set()
    for n in nodes:
        for r in range(walks_per_node):
            cur = n
            out.add((n, r, 0, cur))
            for t in range(n_steps):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = nbrs[_h(seed, n, r, t, cur) % len(nbrs)]
                out.add((n, r, t + 1, cur))
    return out


def _edges():
    # hub node 0 (many out-neighbors), a sink (node 99 has no out
    # edges), duplicate + self-loop noise
    e = [(0, i) for i in range(1, 30)]
    e += [(i, (i * i + 3) % 30) for i in range(1, 30)]
    e += [(5, 99), (7, 99)]  # 99 is a sink: walks through it stop
    e += [(3, 3), (0, 1), (1, 4), (1, 4)]  # self loop + dups
    return e


def test_random_walks_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.graph import random_walks

    df = spark.createDataFrame(_edges(), "src long, dst long")
    got = {
        (r.start, r.rep, r.step, r.node)
        for r in random_walks(df, n_steps=5, walks_per_node=3).collect()
    }
    assert got == _walks_py(_edges(), 5, 3)


def test_random_walks_max_degree_truncates_hub(spark):
    from osm_pbf_spark.operators.graph import random_walks

    df = spark.createDataFrame(_edges(), "src long, dst long")
    got = {
        (r.start, r.rep, r.step, r.node)
        for r in random_walks(df, n_steps=4, walks_per_node=2, max_degree=5).collect()
    }
    assert got == _walks_py(_edges(), 4, 2, max_degree=5)
    # hub steps must only ever reach its 5 smallest neighbors
    hub_next = {n for s, r, t, n in got if s == 0 and t == 1}
    assert hub_next <= {1, 2, 3, 4, 5}


def test_random_walks_partition_invariant_and_native(spark):
    from osm_pbf_spark.operators.graph import random_walks

    df = spark.createDataFrame(_edges(), "src long, dst long")
    a = sorted(map(tuple, random_walks(df, 3, 1).collect()))
    b = sorted(map(tuple, random_walks(df.repartition(13), 3, 1).collect()))
    assert a == b
    plan = random_walks(df, 3, 1)._jdf.queryExecution().executedPlan().toString()
    assert "InPandas" not in plan and "EvalPython" not in plan


def test_walk_pairs_matches_brute(spark):
    from osm_pbf_spark.operators.graph import random_walks, walk_pairs

    df = spark.createDataFrame(_edges(), "src long, dst long")
    walks = _walks_py(_edges(), 4, 2)
    by_walk: dict[tuple, dict[int, int]] = {}
    for s, r, t, n in walks:
        by_walk.setdefault((s, r), {})[t] = n
    exp: dict[tuple, int] = {}
    for steps in by_walk.values():
        for i, ci in steps.items():
            for j, cj in steps.items():
                if i != j and abs(i - j) <= 2:
                    exp[(ci, cj)] = exp.get((ci, cj), 0) + 1
    got = {
        (r.center, r.context): r.n_pairs
        for r in walk_pairs(random_walks(df, 4, 2), window=2).collect()
    }
    assert got == exp
