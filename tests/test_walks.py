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


# ------------------------------------------------------------------ rrf_fuse

def test_rrf_fuse_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.ann import rrf_fuse

    rows = []
    for s, mod in (("a", 7), ("b", 11), ("c", 13)):
        for q in range(3):
            for d in range(1, 30):
                if (d + q) % (4 if s == "c" else 2) == 0:
                    continue  # partial system coverage
                rows.append((s, q, d, float((d * mod + q) % 17)))  # heavy ties
    df = spark.createDataFrame(rows, "system string, q_id long, doc_id long, score double")

    K, SC = 60, 1 << 40
    by_sys: dict[tuple, list] = {}
    for s, q, d, sc in rows:
        by_sys.setdefault((s, q), []).append((d, sc))
    exp: dict[tuple, list] = {}
    for (s, q), items in by_sys.items():
        # dense rank over (score desc, doc asc): doc in the order key
        # means no true ties, so dense_rank == position
        items.sort(key=lambda x: (-x[1], x[0]))
        for i, (d, _) in enumerate(items):
            exp.setdefault((q, d), []).append(SC // (K + i + 1))
    want = {
        qd: (len(cs), sum(cs), sum(cs) / SC) for qd, cs in exp.items()
    }
    got = {
        (r.q_id, r.doc_id): (r.n_systems, r.rrf_q, r.rrf)
        for r in rrf_fuse(df, k=K).collect()
    }
    assert got == want


def test_rrf_fuse_top_k_and_native(spark):
    from osm_pbf_spark.operators.ann import rrf_fuse

    rows = [("a", 0, d, float(d)) for d in range(1, 50)]
    rows += [("b", 0, d, float(50 - d)) for d in range(1, 50)]
    df = spark.createDataFrame(rows, "system string, q_id long, doc_id long, score double")
    out = rrf_fuse(df, k=10, top_k=5)
    got = out.collect()
    assert len(got) == 5
    assert sorted(r.fused_rank for r in got) == [1, 2, 3, 4, 5]
    # opposite-ordered systems: extremes rank best (1/(k+1) + 1/(k+49)
    # beats the flat middle 1/(k+25)*2)
    top_docs = {r.doc_id for r in got if r.fused_rank <= 2}
    assert top_docs == {1, 49}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InPandas" not in plan and "EvalPython" not in plan
