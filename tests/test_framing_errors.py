"""Framing robustness: truncated/corrupt files fail AT SCAN TIME, not
as confusing mid-job executor errors. At planet scale a partial upload
is a real failure mode; the light scan is the cheap place to catch it.
"""

from __future__ import annotations

import pytest

from osm_pbf_spark.pbf.framing import scan_blobs
from tests.pbf_fixtures import build_minimal


def _good_file(tmp_path):
    return build_minimal(str(tmp_path))


def test_clean_file_scans(tmp_path):
    refs = scan_blobs(_good_file(tmp_path))
    assert [r.blob_type for r in refs] == ["OSMHeader", "OSMData"]


def test_truncated_length_prefix(tmp_path):
    data = open(_good_file(tmp_path), "rb").read()
    bad = str(tmp_path / "bad1.pbf")
    open(bad, "wb").write(data + b"\x00\x00\x01")
    with pytest.raises(ValueError, match="length prefix"):
        scan_blobs(bad)


def test_truncated_payload(tmp_path):
    data = open(_good_file(tmp_path), "rb").read()
    bad = str(tmp_path / "bad2.pbf")
    open(bad, "wb").write(data[:-10])
    with pytest.raises(ValueError, match="truncated"):
        scan_blobs(bad)


def test_header_length_out_of_range(tmp_path):
    bad = str(tmp_path / "bad3.pbf")
    open(bad, "wb").write(b"\x7f\xff\xff\xff" + b"\x00" * 64)
    with pytest.raises(ValueError, match="out of range"):
        scan_blobs(bad)


def test_lzma_blob_roundtrip(tmp_path):
    """Blob.lzma_data=4 (spec-optional, rare) decodes via stdlib lzma
    to the SAME entities as the zlib framing of the identical blocks —
    a conformant decoder reads all three payload encodings."""
    from osm_pbf_spark.pbf import encoder as E
    from osm_pbf_spark.pbf.decode import decode_primitive_block
    from osm_pbf_spark.pbf.framing import read_blob_payload
    from tests.pbf_fixtures import nd

    st = E.StringTable()
    nodes = [
        {"id": 7, "lat_raw": nd(48.8566), "lon_raw": nd(2.3522),
         "tags": {"name": "paris-pt"}},
        {"id": 9, "lat_raw": nd(48.8570), "lon_raw": nd(2.3530),
         "tags": {"amenity": "cafe"}},
    ]
    block = E.encode_primitive_block([E.encode_dense_nodes(nodes, st)], st)
    lz = str(tmp_path / "lzma.osm.pbf")
    zl = str(tmp_path / "zlib.osm.pbf")
    E.write_pbf(lz, [block], compress="lzma")
    E.write_pbf(zl, [block], compress=True)

    refs_lz = scan_blobs(lz)
    refs_zl = scan_blobs(zl)
    assert [r.blob_type for r in refs_lz] == ["OSMHeader", "OSMData"]
    got_lz = decode_primitive_block(
        read_blob_payload(lz, refs_lz[1].offset, refs_lz[1].size)
    )
    got_zl = decode_primitive_block(
        read_blob_payload(zl, refs_zl[1].offset, refs_zl[1].size)
    )
    assert set(got_lz) == set(got_zl)
    for kind in got_lz:
        assert got_lz[kind].equals(got_zl[kind])
    assert got_lz["nodes"].column("id").to_pylist() == [7, 9]


def test_lzma_raw_size_mismatch_raises(tmp_path):
    """A corrupt raw_size on an lzma blob still fails loudly."""
    import lzma
    import struct

    from osm_pbf_spark.pbf import encoder as E
    from osm_pbf_spark.pbf.framing import read_blob_payload

    payload = b"payload-bytes-here"
    blob = E.field_varint(2, len(payload) + 5) + E.field_bytes(
        4, lzma.compress(payload)
    )
    header = E.field_string(1, "OSMData") + E.field_varint(3, len(blob))
    path = str(tmp_path / "lzma_bad.pbf")
    with open(path, "wb") as f:
        f.write(struct.pack(">i", len(header)) + header + blob)
    (ref,) = scan_blobs(path)
    with pytest.raises(ValueError, match="raw_size"):
        read_blob_payload(path, ref.offset, ref.size)
