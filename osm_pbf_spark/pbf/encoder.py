"""Pure-Python OSM-PBF *encoder* — builds byte-exact fixture files.

The reference ships decode tests over known PBF inputs (BASELINE.json:6);
with no network and an empty /root/reference we synthesize spec-valid
fixtures ourselves (SURVEY.md §5.2.1). This encoder is intentionally
scalar/simple — it is test infrastructure, not the engine hot path —
and is a fully independent implementation from the decoder it tests.

Wire layout per the public spec: [4-byte BE len][BlobHeader][Blob]...,
BlobHeader{type=1, datasize=3}, Blob{raw=1, raw_size=2, zlib_data=3}.
"""

from __future__ import annotations

import struct
import zlib


def varint(v: int) -> bytes:
    if v < 0:
        v &= 0xFFFFFFFFFFFFFFFF  # two's complement, 10 bytes
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def tag(fno: int, wt: int) -> bytes:
    return varint((fno << 3) | wt)


def field_varint(fno: int, v: int) -> bytes:
    return tag(fno, 0) + varint(v)


def field_bytes(fno: int, data: bytes) -> bytes:
    return tag(fno, 2) + varint(len(data)) + data


def field_string(fno: int, s: str) -> bytes:
    return field_bytes(fno, s.encode("utf-8"))


def packed_varints(fno: int, values: list[int]) -> bytes:
    body = b"".join(varint(v) for v in values)
    return field_bytes(fno, body)


def packed_sints(fno: int, values: list[int]) -> bytes:
    return packed_varints(fno, [zigzag(v) for v in values])


def deltas(values: list[int]) -> list[int]:
    prev = 0
    out = []
    for v in values:
        out.append(v - prev)
        prev = v
    return out


class StringTable:
    """Index 0 is the reserved empty string (spec: delimiter)."""

    def __init__(self) -> None:
        self.strings: list[bytes] = [b""]
        self._index: dict[bytes, int] = {b"": 0}

    def add(self, s: str) -> int:
        b = s.encode("utf-8")
        if b not in self._index:
            self._index[b] = len(self.strings)
            self.strings.append(b)
        return self._index[b]

    def encode(self) -> bytes:
        return b"".join(field_bytes(1, s) for s in self.strings)


def encode_info(info: dict, st: StringTable) -> bytes:
    out = b""
    if "version" in info:
        out += field_varint(1, info["version"])
    if "timestamp" in info:
        out += field_varint(2, info["timestamp"])
    if "changeset" in info:
        out += field_varint(3, info["changeset"])
    if "uid" in info:
        out += field_varint(4, info["uid"])
    if "user" in info:
        out += field_varint(5, st.add(info["user"]))
    if "visible" in info:
        out += field_varint(6, 1 if info["visible"] else 0)
    return out


def encode_dense_nodes(nodes: list[dict], st: StringTable, with_info: bool = False) -> bytes:
    """nodes: [{id, lat_raw, lon_raw, tags:{k:v}, info?:{...}}] — lat/lon
    already in RAW grid units (caller applies granularity/offset)."""
    ids = deltas([n["id"] for n in nodes])
    lats = deltas([n["lat_raw"] for n in nodes])
    lons = deltas([n["lon_raw"] for n in nodes])
    kv: list[int] = []
    for n in nodes:
        for k, v in n.get("tags", {}).items():
            kv.append(st.add(k))
            kv.append(st.add(v))
        kv.append(0)
    body = packed_sints(1, ids)
    if with_info:
        di = (
            packed_varints(1, [n["info"].get("version", 1) for n in nodes])
            + packed_sints(2, deltas([n["info"].get("timestamp", 0) for n in nodes]))
            + packed_sints(3, deltas([n["info"].get("changeset", 0) for n in nodes]))
            + packed_sints(4, deltas([n["info"].get("uid", 0) for n in nodes]))
            + packed_sints(5, deltas([st.add(n["info"].get("user", "")) for n in nodes]))
            + packed_varints(6, [1 if n["info"].get("visible", True) else 0 for n in nodes])
        )
        body += field_bytes(5, di)
    body += packed_sints(8, lats) + packed_sints(9, lons)
    if any(n.get("tags") for n in nodes):
        body += packed_varints(10, kv)
    return field_bytes(2, body)  # PrimitiveGroup.dense = 2


def encode_sparse_node(node: dict, st: StringTable) -> bytes:
    """Non-dense Node{id=1 sint64, keys=2, vals=3, info=4, lat=8, lon=9}."""
    body = field_varint(1, zigzag(node["id"]))
    keys = [st.add(k) for k in node.get("tags", {})]
    vals = [st.add(v) for v in node.get("tags", {}).values()]
    if keys:
        body += packed_varints(2, keys) + packed_varints(3, vals)
    if "info" in node:
        body += field_bytes(4, encode_info(node["info"], st))
    body += field_varint(8, zigzag(node["lat_raw"])) + field_varint(9, zigzag(node["lon_raw"]))
    return field_bytes(1, body)  # PrimitiveGroup.nodes = 1


def encode_way(way: dict, st: StringTable) -> bytes:
    body = field_varint(1, way["id"])
    keys = [st.add(k) for k in way.get("tags", {})]
    vals = [st.add(v) for v in way.get("tags", {}).values()]
    if keys:
        body += packed_varints(2, keys) + packed_varints(3, vals)
    if "info" in way:
        body += field_bytes(4, encode_info(way["info"], st))
    body += packed_sints(8, deltas(way["refs"]))
    return field_bytes(3, body)  # PrimitiveGroup.ways = 3


MEMBER_TYPES = {"node": 0, "way": 1, "relation": 2}


def encode_relation(rel: dict, st: StringTable) -> bytes:
    body = field_varint(1, rel["id"])
    keys = [st.add(k) for k in rel.get("tags", {})]
    vals = [st.add(v) for v in rel.get("tags", {}).values()]
    if keys:
        body += packed_varints(2, keys) + packed_varints(3, vals)
    if "info" in rel:
        body += field_bytes(4, encode_info(rel["info"], st))
    members = rel.get("members", [])
    body += packed_varints(8, [st.add(m["role"]) for m in members])
    body += packed_sints(9, deltas([m["ref"] for m in members]))
    body += packed_varints(10, [MEMBER_TYPES[m["type"]] for m in members])
    return field_bytes(4, body)  # PrimitiveGroup.relations = 4


def encode_primitive_block(
    groups: list[bytes],
    st: StringTable,
    granularity: int = 100,
    lat_offset: int = 0,
    lon_offset: int = 0,
    date_granularity: int = 1000,
) -> bytes:
    out = field_bytes(1, st.encode())
    for g in groups:
        out += field_bytes(2, g)
    if granularity != 100:
        out += field_varint(17, granularity)
    if date_granularity != 1000:
        out += field_varint(18, date_granularity)
    if lat_offset:
        out += field_varint(19, lat_offset)
    if lon_offset:
        out += field_varint(20, lon_offset)
    return out


def encode_header_block(
    bbox_nanodeg: tuple[int, int, int, int] | None = None,
    required_features: tuple[str, ...] = ("OsmSchema-V0.6", "DenseNodes"),
    optional_features: tuple[str, ...] = (),
    writingprogram: str = "osm_pbf_spark-fixtures",
) -> bytes:
    out = b""
    if bbox_nanodeg is not None:
        left, right, top, bottom = bbox_nanodeg
        bb = (
            field_varint(1, zigzag(left))
            + field_varint(2, zigzag(right))
            + field_varint(3, zigzag(top))
            + field_varint(4, zigzag(bottom))
        )
        out += field_bytes(1, bb)
    for f in required_features:
        out += field_string(4, f)
    for f in optional_features:
        out += field_string(5, f)
    out += field_string(16, writingprogram)
    return out


def frame_blob(blob_type: str, payload: bytes, compress: bool | str = True) -> bytes:
    """[len BE][BlobHeader{type, datasize}][Blob{raw|zlib|lzma, raw_size}].

    ``compress`` is True/"zlib" (the common case), False/"raw", or
    "lzma" (Blob field 4 — spec-optional, exercised by the lzma
    roundtrip fixture).
    """
    if compress == "lzma":
        import lzma

        # Spec-faithful legacy LZMA-alone framing (fileformat.proto's
        # lzma_data predates XZ); lzma.compress's default FORMAT_XZ
        # container would be rejected by strict external readers even
        # though Python's decompress auto-detects both.
        blob = field_varint(2, len(payload)) + field_bytes(
            4, lzma.compress(payload, format=lzma.FORMAT_ALONE)
        )
    elif compress and compress != "raw":
        blob = field_varint(2, len(payload)) + field_bytes(3, zlib.compress(payload))
    else:
        blob = field_bytes(1, payload) + field_varint(2, len(payload))
    header = field_string(1, blob_type) + field_varint(3, len(blob))
    return struct.pack(">i", len(header)) + header + blob


def write_pbf(path: str, data_blocks: list[bytes], header_block: bytes | None = None,
              compress: bool | str = True) -> None:
    with open(path, "wb") as f:
        f.write(frame_blob("OSMHeader", header_block if header_block is not None
                           else encode_header_block(), compress=compress))
        for block in data_blocks:
            f.write(frame_blob("OSMData", block, compress=compress))
