"""Golden OSM-PBF fixture builder (FIXTURES.md §3).

Synthesizes byte-exact, spec-valid .osm.pbf files with known contents
using the pure-Python encoder. Deterministic: no timestamps-of-now, no
randomness. Each builder returns the path it wrote.
"""

from __future__ import annotations

import os

from osm_pbf_spark.pbf import encoder as E


def nd(v: float) -> int:
    """degrees -> raw grid units at default granularity 100 (nanodeg/100)."""
    return round(v * 1e9 / 100)


def build_minimal(dirpath: str) -> str:
    """3 dense nodes, 2 tags each; framing/zlib/stringtable/delta basics."""
    st = E.StringTable()
    nodes = [
        {"id": 100, "lat_raw": nd(52.5200), "lon_raw": nd(13.4050),
         "tags": {"name": "berlin-pt", "amenity": "cafe"}},
        {"id": 105, "lat_raw": nd(52.5201), "lon_raw": nd(13.4060),
         "tags": {"name": "berlin-pt2", "amenity": "bar"}},
        {"id": 230, "lat_raw": nd(-33.8688), "lon_raw": nd(151.2093),
         "tags": {"name": "sydney-pt", "tourism": "viewpoint"}},
    ]
    block = E.encode_primitive_block([E.encode_dense_nodes(nodes, st)], st)
    hdr = E.encode_header_block(
        bbox_nanodeg=(13_000_000_000, 152_000_000_000, 53_000_000_000, -34_000_000_000)
    )
    path = os.path.join(dirpath, "minimal.osm.pbf")
    E.write_pbf(path, [block], header_block=hdr)
    return path


def build_granularity(dirpath: str) -> str:
    """Non-default granularity=1000, lat/lon offsets, date_granularity=2000."""
    st = E.StringTable()
    gran, lat_off, lon_off = 1000, 5_000_000, -3_000_000
    def raw(deg, off):
        return round((deg * 1e9 - off) / gran)
    nodes = [
        {"id": 7, "lat_raw": raw(48.8566, lat_off), "lon_raw": raw(2.3522, lon_off),
         "tags": {"name": "paris"},
         "info": {"version": 3, "timestamp": 700_000, "changeset": 42, "uid": 9,
                  "user": "alice", "visible": True}},
        {"id": 8, "lat_raw": raw(48.8570, lat_off), "lon_raw": raw(2.3530, lon_off),
         "tags": {},
         "info": {"version": 1, "timestamp": 700_100, "changeset": 43, "uid": 10,
                  "user": "bob", "visible": False}},
    ]
    block = E.encode_primitive_block(
        [E.encode_dense_nodes(nodes, st, with_info=True)], st,
        granularity=gran, lat_offset=lat_off, lon_offset=lon_off, date_granularity=2000,
    )
    path = os.path.join(dirpath, "granularity.osm.pbf")
    E.write_pbf(path, [block])
    return path


def build_mixed(dirpath: str) -> str:
    """Dense nodes + ways (incl. closed way = polygon) + relation + sparse node."""
    st = E.StringTable()
    nodes = [
        {"id": i, "lat_raw": nd(50.0 + 0.001 * i), "lon_raw": nd(8.0 + 0.001 * i),
         "tags": ({"highway": "crossing"} if i % 2 == 0 else {})}
        for i in range(1, 7)
    ]
    g_dense = E.encode_dense_nodes(nodes, st)
    ways = [
        {"id": 501, "refs": [1, 2, 3], "tags": {"highway": "residential", "name": "A St"}},
        {"id": 502, "refs": [4, 5, 6, 4], "tags": {"building": "yes"}},  # closed = polygon
    ]
    g_ways = b"".join(E.encode_way(w, st) for w in ways)
    rels = [
        {"id": 900, "members": [
            {"role": "outer", "ref": 502, "type": "way"},
            {"role": "admin_centre", "ref": 1, "type": "node"},
            {"role": "subarea", "ref": 901, "type": "relation"},
        ], "tags": {"type": "multipolygon"}},
    ]
    g_rels = b"".join(E.encode_relation(r, st) for r in rels)
    g_sparse = E.encode_sparse_node(
        {"id": 77, "lat_raw": nd(50.5), "lon_raw": nd(8.5),
         "tags": {"man_made": "tower"},
         "info": {"version": 2, "timestamp": 1234, "changeset": 5, "uid": 6,
                  "user": "carol", "visible": True}},
        st,
    )
    block = E.encode_primitive_block([g_dense, g_ways, g_rels, g_sparse], st)
    path = os.path.join(dirpath, "mixed.osm.pbf")
    E.write_pbf(path, [block])
    return path


def build_raw(dirpath: str) -> str:
    """Uncompressed Blob.raw branch."""
    st = E.StringTable()
    nodes = [{"id": 1, "lat_raw": nd(0.5), "lon_raw": nd(0.5), "tags": {"note": "raw"}}]
    block = E.encode_primitive_block([E.encode_dense_nodes(nodes, st)], st)
    path = os.path.join(dirpath, "raw.osm.pbf")
    E.write_pbf(path, [block], compress=False)
    return path


def build_denseinfo(dirpath: str) -> str:
    st = E.StringTable()
    nodes = [
        {"id": 10 + i, "lat_raw": nd(10.0 + i), "lon_raw": nd(20.0 + i), "tags": {},
         "info": {"version": i + 1, "timestamp": 1_000_000 + 17 * i,
                  "changeset": 100 - i, "uid": 5 + i, "user": f"u{i % 2}",
                  "visible": i != 2}}
        for i in range(4)
    ]
    block = E.encode_primitive_block([E.encode_dense_nodes(nodes, st, with_info=True)], st)
    path = os.path.join(dirpath, "denseinfo.osm.pbf")
    E.write_pbf(path, [block])
    return path


def build_multiblob(dirpath: str, blobs: int = 4, nodes_per_blob: int = 50) -> str:
    """Several OSMData blobs; ids span blobs — the distributed-scan fixture."""
    blocks = []
    nid = 1000
    for b in range(blobs):
        st = E.StringTable()
        nodes = []
        for i in range(nodes_per_blob):
            nodes.append({
                "id": nid,
                "lat_raw": nd(40.0 + b + 0.01 * i),
                "lon_raw": nd(-74.0 + b + 0.01 * i),
                "tags": {"blk": str(b)} if i % 5 == 0 else {},
            })
            nid += 3
        blocks.append(E.encode_primitive_block([E.encode_dense_nodes(nodes, st)], st))
    path = os.path.join(dirpath, "multiblob.osm.pbf")
    E.write_pbf(path, blocks)
    return path


def build_empty_strings(dirpath: str) -> str:
    """Stringtable index-0 (empty) referenced by a tag value.

    Spec subtlety: in DenseNodes.keys_vals the 0 index is the per-node
    TERMINATOR, so index 0 may only be referenced from sparse
    Node.keys/vals (and Way/Relation keys/vals), which have no
    terminator convention. The dense node here carries non-empty tags.
    """
    st = E.StringTable()
    g_sparse = E.encode_sparse_node(
        {"id": 3, "lat_raw": nd(1.0), "lon_raw": nd(2.0), "tags": {"fixme": ""}}, st
    )
    g_dense = E.encode_dense_nodes(
        [{"id": 4, "lat_raw": nd(1.5), "lon_raw": nd(2.5), "tags": {"a": "b"}}], st
    )
    block = E.encode_primitive_block([g_sparse, g_dense], st)
    path = os.path.join(dirpath, "empty-strings.osm.pbf")
    E.write_pbf(path, [block])
    return path


def build_sink(dirpath: str) -> str:
    """Multi-blob, mixed-entity fixture for the sink-roundtrip gate:

    - blob 0: dense nodes + ways + relation (way/relation docs carry
      cell = -1 — no point geometry before assembly);
    - blob 1: dense node cluster near (40, -74);
    - blob 2: dense node cluster near (-10, 120).

    Ingested with blobs_per_split=1 this exercises THREE per-split
    manifest commits, the snapshot/manifest-list roll-up, and a
    stats-range pruned read whose range keeps only part of the data.
    """
    st0 = E.StringTable()
    nodes0 = [
        {"id": i, "lat_raw": nd(50.0 + 0.002 * i), "lon_raw": nd(8.0 + 0.003 * i),
         "tags": ({"shop": "bakery"} if i % 3 == 0 else {})}
        for i in range(1, 9)
    ]
    g0_dense = E.encode_dense_nodes(nodes0, st0)
    ways0 = [
        {"id": 701, "refs": [1, 2, 3, 4], "tags": {"highway": "service"}},
        {"id": 702, "refs": [5, 6, 7, 5], "tags": {"building": "hut"}},
    ]
    g0_ways = b"".join(E.encode_way(w, st0) for w in ways0)
    rels0 = [{"id": 950, "members": [{"role": "outer", "ref": 702, "type": "way"}],
              "tags": {"type": "multipolygon"}}]
    g0_rels = b"".join(E.encode_relation(r, st0) for r in rels0)
    block0 = E.encode_primitive_block([g0_dense, g0_ways, g0_rels], st0)

    def node_block(base_id: int, lat0: float, lon0: float, n: int) -> bytes:
        st = E.StringTable()
        nodes = [
            {"id": base_id + 2 * i,
             "lat_raw": nd(lat0 + 0.005 * i), "lon_raw": nd(lon0 + 0.007 * i),
             "tags": ({"k": f"v{i}"} if i % 4 == 0 else {})}
            for i in range(n)
        ]
        return E.encode_primitive_block([E.encode_dense_nodes(nodes, st)], st)

    blocks = [block0, node_block(2000, 40.0, -74.0, 20), node_block(3000, -10.0, 120.0, 20)]
    path = os.path.join(dirpath, "sink.osm.pbf")
    E.write_pbf(path, blocks)
    return path


def build_members(dirpath: str) -> str:
    """Member-reference fixture for the span-resolve query: 30 nodes,
    10 ways, and 40 relations whose members mix node/way/relation refs —
    including DANGLING refs (targets absent from the file) that the
    resolve join must surface as NULLs."""
    st = E.StringTable()
    nodes = [
        {"id": 10 + i, "lat_raw": nd(5.0 + i * 0.25), "lon_raw": nd(-3.0 + i * 0.5),
         "tags": ({"name": f"n{i}"} if i % 3 == 0 else {})}
        for i in range(30)
    ]
    g_dense = E.encode_dense_nodes(nodes, st)
    ways = [
        {"id": 500 + i, "refs": [10 + i, 10 + i + 1, 10 + i + 2], "tags": {"highway": "path"}}
        for i in range(10)
    ]
    g_ways = b"".join(E.encode_way(w, st) for w in ways)
    kinds = ["node", "way", "relation"]
    rels = []
    for i in range(40):
        members = []
        for j in range(2 + i % 4):
            t = kinds[(i + j) % 3]
            if t == "node":
                ref = 10 + ((i * 5 + j * 7) % 36)  # %36 > 30 ids -> some dangling
            elif t == "way":
                ref = 500 + ((i + j) % 13)  # %13 > 10 ways -> some dangling
            else:
                ref = 900 + ((i + j) % 45)  # relations 900..944, 40 exist
            members.append({"role": ["outer", "inner", "stop", ""][j % 4], "ref": ref, "type": t})
        rels.append({"id": 900 + i, "members": members, "tags": {"type": "collection"}})
    g_rels = b"".join(E.encode_relation(r, st) for r in rels)
    block = E.encode_primitive_block([g_dense, g_ways, g_rels], st)
    path = os.path.join(dirpath, "members.osm.pbf")
    E.write_pbf(path, [block])
    return path


ALL_BUILDERS = [
    build_minimal, build_granularity, build_mixed, build_raw,
    build_denseinfo, build_multiblob, build_empty_strings, build_sink,
    build_members,
]


def build_way_pip(dirpath: str) -> str:
    """Closed-way polygon + probe-node grid: the decode->polygons->PIP
    end-to-end fixture (used by tests/test_way_pip.py and the driver
    q_way_pip query)."""
    import numpy as np

    st = E.StringTable()
    ring = [(10.0, 10.0), (10.0, 11.0), (11.0, 11.0), (11.0, 10.0)]
    ring_nodes = [
        {"id": 100 + i, "lat_raw": nd(la), "lon_raw": nd(lo), "tags": {}}
        for i, (la, lo) in enumerate(ring)
    ]
    probes = []
    pid = 1
    for la in np.linspace(9.5, 11.5, 9):
        for lo in np.linspace(9.5, 11.5, 9):
            probes.append(
                {"id": pid, "lat_raw": nd(float(la)), "lon_raw": nd(float(lo)), "tags": {}}
            )
            pid += 1
    g_dense = E.encode_dense_nodes(sorted(ring_nodes + probes, key=lambda n: n["id"]), st)
    ways = [
        {"id": 600, "refs": [100, 101, 102, 103, 100], "tags": {"building": "yes"}},
        {"id": 601, "refs": [1, 2, 3], "tags": {}},  # open way: NOT a polygon
    ]
    g_ways = b"".join(E.encode_way(w, st) for w in ways)
    block = E.encode_primitive_block([g_dense, g_ways], st)
    path = os.path.join(dirpath, "waypip.osm.pbf")
    E.write_pbf(path, [block])
    return path


def build_rel_pip(dirpath: str) -> str:
    """Multipolygon relation fixture: outer square split across TWO open
    ways (exercises ring stitching), a closed inner way as a HOLE, and a
    probe grid with points inside the hole (which PIP must exclude).
    Also a decoy non-multipolygon relation that must be ignored."""
    import numpy as np

    st = E.StringTable()
    outer_coords = [
        (20.0, 20.0), (20.0, 22.0), (20.0, 24.0), (22.0, 24.0), (24.0, 24.0),
        (24.0, 22.0), (24.0, 20.0), (22.0, 20.0),
    ]
    ring_nodes = [
        {"id": 200 + i, "lat_raw": nd(la), "lon_raw": nd(lo), "tags": {}}
        for i, (la, lo) in enumerate(outer_coords)
    ]
    hole_coords = [(21.5, 21.5), (21.5, 22.5), (22.5, 22.5), (22.5, 21.5)]
    hole_nodes = [
        {"id": 210 + i, "lat_raw": nd(la), "lon_raw": nd(lo), "tags": {}}
        for i, (la, lo) in enumerate(hole_coords)
    ]
    probes = []
    pid = 1
    for la in np.linspace(19.25, 24.75, 12):
        for lo in np.linspace(19.25, 24.75, 12):
            probes.append(
                {"id": pid, "lat_raw": nd(float(la)), "lon_raw": nd(float(lo)), "tags": {}}
            )
            pid += 1
    all_nodes = sorted(ring_nodes + hole_nodes + probes, key=lambda n: n["id"])
    g_dense = E.encode_dense_nodes(all_nodes, st)
    ways = [
        # outer ring as two OPEN ways; second runs "backwards" so the
        # stitcher must reverse it
        {"id": 700, "refs": [200, 201, 202, 203, 204], "tags": {}},
        {"id": 701, "refs": [200, 207, 206, 205, 204], "tags": {}},
        {"id": 702, "refs": [210, 211, 212, 213, 210], "tags": {}},  # hole (closed)
        {"id": 703, "refs": [200, 201], "tags": {}},  # decoy route member
    ]
    g_ways = b"".join(E.encode_way(w, st) for w in ways)
    rels = [
        {"id": 950, "members": [
            {"role": "outer", "ref": 700, "type": "way"},
            {"role": "outer", "ref": 701, "type": "way"},
            {"role": "inner", "ref": 702, "type": "way"},
        ], "tags": {"type": "multipolygon", "name": "donut"}},
        {"id": 951, "members": [
            {"role": "", "ref": 703, "type": "way"},
        ], "tags": {"type": "route"}},  # decoy: not a multipolygon
    ]
    g_rels = b"".join(E.encode_relation(r, st) for r in rels)
    block = E.encode_primitive_block([g_dense, g_ways, g_rels], st)
    path = os.path.join(dirpath, "relpip.osm.pbf")
    E.write_pbf(path, [block])
    return path


def build_rel_many(dirpath: str, n_rels: int = 150) -> str:
    """MANY-multipolygon fixture for the distributed ring-stitching
    path: ``n_rels`` donut relations on a grid (outer square split
    across two open ways — the second reversed — plus a closed hole
    way), every 10th relation a DOUBLE-donut (two outer rings -> the
    multi-outer ``relation/<id>/<i>`` naming), and 3 probe nodes per
    relation (in the annulus, in the hole, outside). Deterministic;
    sized past a small ``max_polygons`` bound so the driver broadcast
    path refuses while ``relation_rings`` handles it."""
    st = E.StringTable()
    all_nodes = []
    ways = []
    rels = []
    probe_rows = []

    def add_donut(i: int, base_id: int, b_lat: float, b_lon: float, second_outer: bool):
        # outer square [b, b+0.8], hole [b+0.3, b+0.5]
        oc = [
            (b_lat, b_lon), (b_lat, b_lon + 0.4), (b_lat, b_lon + 0.8),
            (b_lat + 0.4, b_lon + 0.8), (b_lat + 0.8, b_lon + 0.8),
            (b_lat + 0.8, b_lon + 0.4), (b_lat + 0.8, b_lon),
            (b_lat + 0.4, b_lon),
        ]
        on = [
            {"id": base_id + k, "lat_raw": nd(la), "lon_raw": nd(lo), "tags": {}}
            for k, (la, lo) in enumerate(oc)
        ]
        hc = [
            (b_lat + 0.3, b_lon + 0.3), (b_lat + 0.3, b_lon + 0.5),
            (b_lat + 0.5, b_lon + 0.5), (b_lat + 0.5, b_lon + 0.3),
        ]
        hn = [
            {"id": base_id + 10 + k, "lat_raw": nd(la), "lon_raw": nd(lo), "tags": {}}
            for k, (la, lo) in enumerate(hc)
        ]
        all_nodes.extend(on + hn)
        w0 = base_id + 100
        ways.append({"id": w0, "refs": [on[0]["id"], on[1]["id"], on[2]["id"],
                                        on[3]["id"], on[4]["id"]], "tags": {}})
        ways.append({"id": w0 + 1, "refs": [on[0]["id"], on[7]["id"], on[6]["id"],
                                            on[5]["id"], on[4]["id"]], "tags": {}})
        ways.append({"id": w0 + 2, "refs": [hn[0]["id"], hn[1]["id"], hn[2]["id"],
                                            hn[3]["id"], hn[0]["id"]], "tags": {}})
        members = [
            {"role": "outer", "ref": w0, "type": "way"},
            {"role": "outer", "ref": w0 + 1, "type": "way"},
            {"role": "inner", "ref": w0 + 2, "type": "way"},
        ]
        if second_outer:
            # a detached second outer square [b+1.0 .. b+1.2] on lon
            sc = [
                (b_lat, b_lon + 1.0), (b_lat, b_lon + 1.2),
                (b_lat + 0.2, b_lon + 1.2), (b_lat + 0.2, b_lon + 1.0),
            ]
            sn = [
                {"id": base_id + 20 + k, "lat_raw": nd(la), "lon_raw": nd(lo), "tags": {}}
                for k, (la, lo) in enumerate(sc)
            ]
            all_nodes.extend(sn)
            ways.append({"id": w0 + 3,
                         "refs": [sn[0]["id"], sn[1]["id"], sn[2]["id"],
                                  sn[3]["id"], sn[0]["id"]], "tags": {}})
            members.append({"role": "outer", "ref": w0 + 3, "type": "way"})
        rels.append({"id": 5000 + i, "members": members,
                     "tags": {"type": "multipolygon"}})
        # probes: annulus (in), hole-center (out), outside (out)
        probe_rows.extend([
            {"id": base_id + 50, "lat_raw": nd(b_lat + 0.1),
             "lon_raw": nd(b_lon + 0.1), "tags": {}},
            {"id": base_id + 51, "lat_raw": nd(b_lat + 0.4),
             "lon_raw": nd(b_lon + 0.4), "tags": {}},
            {"id": base_id + 52, "lat_raw": nd(b_lat + 0.9),
             "lon_raw": nd(b_lon + 0.9), "tags": {}},
        ])
        if second_outer:  # inside the detached second outer ring
            probe_rows.append(
                {"id": base_id + 53, "lat_raw": nd(b_lat + 0.1),
                 "lon_raw": nd(b_lon + 1.1), "tags": {}}
            )

    for i in range(n_rels):
        row, col = divmod(i, 60)
        b_lat = -80.0 + row * 2.0
        b_lon = -175.0 + col * 2.4  # leaves room for the second outer
        add_donut(i, 1_000_000 + i * 1000, b_lat, b_lon, second_outer=(i % 10 == 0))

    all_nodes.extend(probe_rows)
    all_nodes.sort(key=lambda n: n["id"])
    g_dense = E.encode_dense_nodes(all_nodes, st)
    g_ways = b"".join(E.encode_way(w, st) for w in ways)
    g_rels = b"".join(E.encode_relation(r, st) for r in rels)
    block = E.encode_primitive_block([g_dense, g_ways, g_rels], st)
    path = os.path.join(dirpath, f"relmany{n_rels}.osm.pbf")
    E.write_pbf(path, [block])
    return path


def build_rel_invalid(dirpath: str) -> str:
    """Multipolygon-VALIDITY fixture: five relations exercising each
    audit dimension — (5500) a clean donut control, (5501) a bowtie
    self-intersecting outer, (5502) an unclosable outer chain,
    (5503) a member with a non-spec role, (5504) a member way id that
    does not exist. Deterministic."""
    st = E.StringTable()
    nodes = []
    ways = []
    rels = []

    def node(nid, la, lo):
        nodes.append({"id": nid, "lat_raw": nd(la), "lon_raw": nd(lo), "tags": {}})
        return nid

    # 5500: clean donut at (10, 10)
    sq = [node(100 + k, 10.0 + dl, 10.0 + dn)
          for k, (dl, dn) in enumerate([(0, 0), (0, 1), (1, 1), (1, 0)])]
    hole = [node(110 + k, 10.3 + dl, 10.3 + dn)
            for k, (dl, dn) in enumerate([(0, 0), (0, 0.4), (0.4, 0.4), (0.4, 0)])]
    ways.append({"id": 800, "refs": sq + [sq[0]], "tags": {}})
    ways.append({"id": 801, "refs": hole + [hole[0]], "tags": {}})
    rels.append({"id": 5500, "members": [
        {"role": "outer", "ref": 800, "type": "way"},
        {"role": "inner", "ref": 801, "type": "way"},
    ], "tags": {"type": "multipolygon"}})
    # 5501: bowtie (self-crossing closed outer) at (20, 10)
    bt = [node(200, 20.0, 10.0), node(201, 21.0, 11.0),
          node(202, 20.0, 11.0), node(203, 21.0, 10.0)]
    ways.append({"id": 810, "refs": bt + [bt[0]], "tags": {}})
    rels.append({"id": 5501, "members": [
        {"role": "outer", "ref": 810, "type": "way"},
    ], "tags": {"type": "multipolygon"}})
    # 5502: unclosable open chain at (30, 10)
    oc = [node(300, 30.0, 10.0), node(301, 30.0, 11.0), node(302, 31.0, 11.0)]
    ways.append({"id": 820, "refs": oc, "tags": {}})
    rels.append({"id": 5502, "members": [
        {"role": "outer", "ref": 820, "type": "way"},
    ], "tags": {"type": "multipolygon"}})
    # 5503: bad role (plus a clean square so the relation still renders)
    s3 = [node(400 + k, 40.0 + dl, 10.0 + dn)
          for k, (dl, dn) in enumerate([(0, 0), (0, 1), (1, 1), (1, 0)])]
    ways.append({"id": 830, "refs": s3 + [s3[0]], "tags": {}})
    ways.append({"id": 831, "refs": [s3[0], s3[2]], "tags": {}})
    rels.append({"id": 5503, "members": [
        {"role": "outer", "ref": 830, "type": "way"},
        {"role": "enclave", "ref": 831, "type": "way"},
    ], "tags": {"type": "multipolygon"}})
    # 5504: missing member way (id 999999 never encoded)
    s4 = [node(500 + k, 50.0 + dl, 10.0 + dn)
          for k, (dl, dn) in enumerate([(0, 0), (0, 1), (1, 1), (1, 0)])]
    ways.append({"id": 840, "refs": s4 + [s4[0]], "tags": {}})
    rels.append({"id": 5504, "members": [
        {"role": "outer", "ref": 840, "type": "way"},
        {"role": "inner", "ref": 999999, "type": "way"},
    ], "tags": {"type": "multipolygon"}})

    nodes.sort(key=lambda n: n["id"])
    g_dense = E.encode_dense_nodes(nodes, st)
    g_ways = b"".join(E.encode_way(w, st) for w in ways)
    g_rels = b"".join(E.encode_relation(r, st) for r in rels)
    block = E.encode_primitive_block([g_dense, g_ways, g_rels], st)
    path = os.path.join(dirpath, "relinvalid.osm.pbf")
    E.write_pbf(path, [block])
    return path


def build_all(dirpath: str) -> list[str]:
    os.makedirs(dirpath, exist_ok=True)
    return [b(dirpath) for b in ALL_BUILDERS]
