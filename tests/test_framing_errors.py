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


def test_lzma_blob_fails_fast(tmp_path):
    """Blob.lzma_data=4 is declared out of scope (SURVEY §1.1, spec-rare)
    — it must raise a CLEAR error, never decode garbage or pass silently."""
    import lzma
    import struct

    from osm_pbf_spark.pbf import encoder as E
    from osm_pbf_spark.pbf.framing import read_blob_payload

    payload = b"not-a-real-block"
    blob = E.field_varint(2, len(payload)) + E.field_bytes(4, lzma.compress(payload))
    header = E.field_string(1, "OSMData") + E.field_varint(3, len(blob))
    path = str(tmp_path / "lzma.pbf")
    with open(path, "wb") as f:
        f.write(struct.pack(">i", len(header)) + header + blob)
    (ref,) = scan_blobs(path)  # scan is fine: framing is valid
    with pytest.raises(ValueError, match="lzma"):
        read_blob_payload(path, ref.offset, ref.size)
