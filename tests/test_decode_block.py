"""Golden-fixture decode: vectorized decoder vs pure-Python oracle.

Replaces the reference's node/way/relation decode tests (BASELINE.json:6)
with spec-equivalent ones over synthesized fixtures (no Spark here —
this is the kernel layer).
"""

from __future__ import annotations

import math

import pytest

from osm_pbf_spark.pbf.decode import decode_header_block, decode_primitive_block
from osm_pbf_spark.pbf.framing import read_blob_payload, scan_blobs
from tests import oracle_pbf


def decode_file_vectorized(path: str) -> dict:
    """Drive the engine kernels scalar-free: framing -> blocks -> tables."""
    out = {"header": None, "nodes": [], "ways": [], "relations": []}
    for ref in scan_blobs(path):
        raw = read_blob_payload(path, ref.offset, ref.size)
        if ref.blob_type == "OSMHeader":
            out["header"] = decode_header_block(raw)
        else:
            tabs = decode_primitive_block(raw)
            for kind in ("nodes", "ways", "relations"):
                out[kind].extend(tabs[kind].to_pylist())
    return out


def norm_node(n: dict) -> dict:
    return {**n, "tags": dict(n["tags"]) if n["tags"] is not None else {}}


@pytest.mark.parametrize(
    "name",
    ["minimal", "granularity", "mixed", "raw", "denseinfo", "multiblob", "empty-strings"],
)
def test_fixture_matches_oracle(fixtures_dir, name):
    path = f"{fixtures_dir}/{name}.osm.pbf"
    got = decode_file_vectorized(path)
    want = oracle_pbf.decode_file(path)

    assert len(got["nodes"]) == len(want["nodes"])
    for g, w in zip(got["nodes"], want["nodes"]):
        g = norm_node(g)
        assert g["id"] == w["id"]
        # same float64 formula -> bit-identical coordinates
        assert g["lat"] == w["lat"] and g["lon"] == w["lon"]
        assert g["tags"] == w["tags"]
        for k in ("version", "ts_ms", "changeset", "uid", "user", "visible"):
            assert g[k] == w[k], (k, g[k], w[k])

    assert len(got["ways"]) == len(want["ways"])
    for g, w in zip(got["ways"], want["ways"]):
        assert g["id"] == w["id"]
        assert list(g["refs"]) == w["refs"]
        assert dict(g["tags"]) == w["tags"]

    assert len(got["relations"]) == len(want["relations"])
    for g, w in zip(got["relations"], want["relations"]):
        assert g["id"] == w["id"]
        assert [dict(m) for m in g["members"]] == w["members"]
        assert dict(g["tags"]) == w["tags"]


def test_minimal_exact_values(fixtures_dir):
    got = decode_file_vectorized(f"{fixtures_dir}/minimal.osm.pbf")
    n0 = got["nodes"][0]
    assert n0["id"] == 100
    assert math.isclose(n0["lat"], 52.52, abs_tol=1e-7)
    assert math.isclose(n0["lon"], 13.405, abs_tol=1e-7)
    assert dict(n0["tags"]) == {"name": "berlin-pt", "amenity": "cafe"}
    hdr = got["header"]
    assert hdr["required_features"] == ["OsmSchema-V0.6", "DenseNodes"]
    assert math.isclose(hdr["bbox"]["left"], 13.0)


def test_granularity_scaling(fixtures_dir):
    got = decode_file_vectorized(f"{fixtures_dir}/granularity.osm.pbf")
    n = got["nodes"][0]
    assert math.isclose(n["lat"], 48.8566, abs_tol=1e-6)
    assert math.isclose(n["lon"], 2.3522, abs_tol=1e-6)
    assert n["ts_ms"] == 700_000 * 2000
    assert n["user"] == "alice" and n["visible"] is True
    assert got["nodes"][1]["visible"] is False


def test_mixed_ways_and_relations(fixtures_dir):
    got = decode_file_vectorized(f"{fixtures_dir}/mixed.osm.pbf")
    ways = {w["id"]: w for w in got["ways"]}
    assert list(ways[501]["refs"]) == [1, 2, 3]
    assert list(ways[502]["refs"]) == [4, 5, 6, 4]  # closed way
    rel = got["relations"][0]
    assert rel["id"] == 900
    assert [dict(m) for m in rel["members"]] == [
        {"role": "outer", "ref": 502, "type": "way"},
        {"role": "admin_centre", "ref": 1, "type": "node"},
        {"role": "subarea", "ref": 901, "type": "relation"},
    ]
    sparse = [n for n in got["nodes"] if n["id"] == 77]
    assert len(sparse) == 1 and dict(sparse[0]["tags"]) == {"man_made": "tower"}


def test_unsupported_required_feature_rejected():
    from osm_pbf_spark.pbf import encoder as E

    hdr = E.encode_header_block(required_features=("OsmSchema-V0.6", "HistoricalInformation"))
    with pytest.raises(ValueError, match="unsupported required feature"):
        decode_header_block(hdr)


def test_blob_scan_offsets(fixtures_dir):
    refs = scan_blobs(f"{fixtures_dir}/multiblob.osm.pbf")
    assert [r.blob_type for r in refs] == ["OSMHeader"] + ["OSMData"] * 4
    assert all(refs[i].offset < refs[i + 1].offset for i in range(len(refs) - 1))
