"""Deterministic synthetic corpus generator (FIXTURES.md §2).

Builds an OSM-PBF file whose decoded+rendered documents form the
engine's interleaved-span input table at bench scale. Seed=42; 50% of
nodes land in ONE hot ~0.2-degree cell cluster (dense-urban skew per
BASELINE.json:6), the rest are uniform world-wide. No external data.
"""

from __future__ import annotations

import os

import numpy as np

from osm_pbf_spark.pbf import encoder as E

SEED = 42
HOT_LAT, HOT_LON = 52.5, 13.4  # the "dense city"
TAG_KEYS = ["amenity", "highway", "name", "shop", "building"]
TAG_VALS = ["cafe", "primary", "alpha", "bakery", "yes", "tower", "stop"]


def _cache_valid(path: str, params: dict) -> bool:
    """Reuse a cached corpus only when its params SIDECAR matches: the
    file content depends on every generation parameter, and a stale
    file at the same path (different hot_fraction/n_rels) would
    silently skew benchmarks. Missing/mismatched sidecar -> regenerate."""
    import json

    if not os.path.exists(path):
        return False
    try:
        with open(path + ".params.json") as f:
            if json.load(f) == params:
                return True
    except (OSError, ValueError):
        pass
    os.remove(path)
    return False


def _write_sidecar(path: str, params: dict) -> None:
    import json

    tmp = path + ".params.json.tmp"
    with open(tmp, "w") as f:
        json.dump(params, f, sort_keys=True)
    os.replace(tmp, path + ".params.json")


def synth_pbf(path: str, n_nodes: int, nodes_per_blob: int = 8000,
              hot_fraction: float = 0.5) -> str:
    """Write a deterministic n-node PBF; returns path (cached if the
    params sidecar matches)."""
    params = {"kind": "nodes", "n_nodes": n_nodes, "nodes_per_blob": nodes_per_blob,
              "hot_fraction": hot_fraction, "seed": SEED}
    if _cache_valid(path, params):
        return path
    rng = np.random.default_rng(SEED)
    n_hot = int(n_nodes * hot_fraction)
    lat = np.empty(n_nodes)
    lon = np.empty(n_nodes)
    lat[:n_hot] = HOT_LAT + rng.uniform(-0.1, 0.1, n_hot)
    lon[:n_hot] = HOT_LON + rng.uniform(-0.1, 0.1, n_hot)
    lat[n_hot:] = rng.uniform(-85.0, 85.0, n_nodes - n_hot)
    lon[n_hot:] = rng.uniform(-180.0, 180.0, n_nodes - n_hot)
    order = rng.permutation(n_nodes)
    lat, lon = lat[order], lon[order]
    ids = np.cumsum(rng.integers(1, 5, n_nodes))  # increasing, gappy ids
    lat_raw = np.round(lat * 1e7).astype(np.int64)  # granularity 100
    lon_raw = np.round(lon * 1e7).astype(np.int64)
    has_tag = rng.random(n_nodes) < 0.3
    tag_k = rng.integers(0, len(TAG_KEYS), n_nodes)
    tag_v = rng.integers(0, len(TAG_VALS), n_nodes)

    blocks = []
    for start in range(0, n_nodes, nodes_per_blob):
        end = min(start + nodes_per_blob, n_nodes)
        st = E.StringTable()
        nodes = []
        for i in range(start, end):
            tags = {TAG_KEYS[tag_k[i]]: TAG_VALS[tag_v[i]]} if has_tag[i] else {}
            nodes.append(
                {"id": int(ids[i]), "lat_raw": int(lat_raw[i]), "lon_raw": int(lon_raw[i]),
                 "tags": tags}
            )
        blocks.append(E.encode_primitive_block([E.encode_dense_nodes(nodes, st)], st))
    tmp = path + ".tmp"
    E.write_pbf(tmp, blocks)
    os.replace(tmp, path)
    _write_sidecar(path, params)
    return path


def corpus_path(n_nodes: int, cache_dir: str = "/tmp/osm_pbf_spark_bench") -> str:
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"corpus_{n_nodes}.osm.pbf")


def synth_pbf_mixed(path: str, n_nodes: int, n_ways: int,
                    nodes_per_blob: int = 8000,
                    hot_fraction: float = 0.0,
                    n_rels: int = 0) -> str:
    """Nodes + ways corpus for decode/assembly coverage at volume.

    Node blobs first (same shape as synth_pbf), then way blobs whose
    refs point at runs of ~10 consecutive node ids; every 5th way is
    CLOSED (first ref == last ref) so it assembles into a polygon.
    ``hot_fraction`` > 0 puts that share of nodes in the dense-city
    cluster (the scaling corpus uses 0.5, matching synth_pbf's skew).
    Deterministic (SEED); cached via a params sidecar.
    """
    params = {"kind": "mixed", "n_nodes": n_nodes, "n_ways": n_ways,
              "nodes_per_blob": nodes_per_blob, "hot_fraction": hot_fraction,
              "n_rels": n_rels, "seed": SEED}
    if _cache_valid(path, params):
        return path
    rng = np.random.default_rng(SEED + 1)
    n_hot = int(n_nodes * hot_fraction)
    lat = np.empty(n_nodes)
    lon = np.empty(n_nodes)
    lat[:n_hot] = HOT_LAT + rng.uniform(-0.1, 0.1, n_hot)
    lon[:n_hot] = HOT_LON + rng.uniform(-0.1, 0.1, n_hot)
    lat[n_hot:] = rng.uniform(-85.0, 85.0, n_nodes - n_hot)
    lon[n_hot:] = rng.uniform(-180.0, 180.0, n_nodes - n_hot)
    perm = rng.permutation(n_nodes)
    lat, lon = lat[perm], lon[perm]
    ids = np.arange(1, n_nodes + 1, dtype=np.int64)
    lat_raw = np.round(lat * 1e7).astype(np.int64)
    lon_raw = np.round(lon * 1e7).astype(np.int64)

    blocks = []
    for start in range(0, n_nodes, nodes_per_blob):
        end = min(start + nodes_per_blob, n_nodes)
        st = E.StringTable()
        nodes = [
            {"id": int(ids[i]), "lat_raw": int(lat_raw[i]), "lon_raw": int(lon_raw[i]),
             "tags": {}}
            for i in range(start, end)
        ]
        blocks.append(E.encode_primitive_block([E.encode_dense_nodes(nodes, st)], st))

    ways_per_blob = 4000
    starts = rng.integers(1, max(2, n_nodes - 12), n_ways)
    for w0 in range(0, n_ways, ways_per_blob):
        st = E.StringTable()
        ways = []
        for w in range(w0, min(w0 + ways_per_blob, n_ways)):
            s = int(starts[w])
            refs = list(range(s, s + 10))
            if w % 5 == 0:
                refs.append(s)  # closed -> polygon
            ways.append({"id": 1_000_000 + w, "refs": refs,
                         "tags": {"highway": "residential"}})
        blocks.append(
            E.encode_primitive_block([b"".join(E.encode_way(w, st) for w in ways)], st)
        )

    # relations: each a type=multipolygon pointing at one CLOSED way
    # (every 5th way) as its outer — relation decode + assembly at
    # volume, not only fixture size
    rels_per_blob = 4000
    n_closed = max(1, n_ways // 5)
    for r0 in range(0, n_rels, rels_per_blob):
        st = E.StringTable()
        rels = []
        for r in range(r0, min(r0 + rels_per_blob, n_rels)):
            closed_way = 1_000_000 + 5 * (r % n_closed)
            rels.append({
                "id": 2_000_000 + r,
                "members": [{"role": "outer", "ref": closed_way, "type": "way"}],
                "tags": {"type": "multipolygon"},
            })
        blocks.append(
            E.encode_primitive_block(
                [b"".join(E.encode_relation(r, st) for r in rels)], st
            )
        )
    tmp = path + ".tmp"
    E.write_pbf(tmp, blocks)
    os.replace(tmp, path)
    _write_sidecar(path, params)
    return path
