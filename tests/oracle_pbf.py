"""Pure-Python ORACLE decoder for OSM-PBF — deliberately independent of
``osm_pbf_spark.pbf`` (scalar loops, own varint reader, no numpy).

Plays the role of the reference's decode tests (BASELINE.json:6): the
Spark engine's output must equal this oracle's output exactly on the
golden fixtures. Keep this file boring and obviously-correct.
"""

from __future__ import annotations

import struct
import zlib


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _zigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _walk(buf: bytes) -> list[tuple[int, int, object]]:
    """[(field_no, wire_type, value)] in order."""
    out = []
    pos = 0
    while pos < len(buf):
        tag, pos = _varint(buf, pos)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = _varint(buf, pos)
        elif wt == 2:
            ln, pos = _varint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        else:
            raise ValueError(f"wire type {wt}")
        out.append((fno, wt, v))
    return out


def _get(items, fno):
    return [v for f, _, v in items if f == fno]


def _packed(chunks, sint=False):
    vals = []
    for c in chunks:
        if isinstance(c, (bytes, bytearray)):
            pos = 0
            while pos < len(c):
                u, pos = _varint(c, pos)
                vals.append(_zigzag(u) if sint else u)
        else:
            vals.append(_zigzag(c) if sint else c)
    return vals


def _delta(vals):
    out = []
    acc = 0
    for v in vals:
        acc += v
        out.append(acc)
    return out


def _info(buf, st, date_gran):
    items = _walk(buf)
    out = {"version": None, "ts_ms": None, "changeset": None, "uid": None,
           "user": None, "visible": None}
    for fno, _, v in items:
        if fno == 1:
            out["version"] = v
        elif fno == 2:
            out["ts_ms"] = v * date_gran
        elif fno == 3:
            out["changeset"] = v
        elif fno == 4:
            out["uid"] = v
        elif fno == 5:
            out["user"] = st[v]
        elif fno == 6:
            out["visible"] = bool(v)
    return out


def decode_file(path: str) -> dict:
    """Full scalar decode: {'header':.., 'nodes':[], 'ways':[], 'relations':[]}.

    Node: {id, lat, lon, tags, version, ts_ms, changeset, uid, user, visible}
    Way:  {id, refs, tags, ...info}
    Rel:  {id, members:[{role, ref, type}], tags, ...info}
    """
    out = {"header": None, "nodes": [], "ways": [], "relations": []}
    with open(path, "rb") as f:
        while True:
            lb = f.read(4)
            if len(lb) < 4:
                break
            (hlen,) = struct.unpack(">i", lb)
            hitems = _walk(f.read(hlen))
            btype = _get(hitems, 1)[0].decode()
            datasize = _get(hitems, 3)[0]
            bitems = _walk(f.read(datasize))
            raw = _get(bitems, 3)
            data = zlib.decompress(raw[0]) if raw else bytes(_get(bitems, 1)[0])
            if btype == "OSMHeader":
                out["header"] = _decode_header(data)
            elif btype == "OSMData":
                _decode_block(data, out)
    return out


def _decode_header(data):
    items = _walk(data)
    hdr = {"required_features": [b.decode() for b in _get(items, 4)],
           "optional_features": [b.decode() for b in _get(items, 5)], "bbox": None}
    bb = _get(items, 1)
    if bb:
        bi = _walk(bb[0])
        hdr["bbox"] = {
            "left": _zigzag(_get(bi, 1)[0]) * 1e-9,
            "right": _zigzag(_get(bi, 2)[0]) * 1e-9,
            "top": _zigzag(_get(bi, 3)[0]) * 1e-9,
            "bottom": _zigzag(_get(bi, 4)[0]) * 1e-9,
        }
    wp = _get(items, 16)
    if wp:
        hdr["writingprogram"] = wp[0].decode()
    return hdr


def _decode_block(data, out):
    items = _walk(data)
    def signed(u):  # plain int32/int64 fields are two's-complement varints
        return u - (1 << 64) if u >= (1 << 63) else u

    st = [b.decode("utf-8") for b in _get(_walk(_get(items, 1)[0]), 1)]
    gran = signed((_get(items, 17) or [100])[0])
    date_gran = signed((_get(items, 18) or [1000])[0])
    lat_off = signed((_get(items, 19) or [0])[0])
    lon_off = signed((_get(items, 20) or [0])[0])

    for g in _get(items, 2):
        gi = _walk(g)
        for dense in _get(gi, 2):
            di = _walk(dense)
            ids = _delta(_packed(_get(di, 1), sint=True))
            lats = _delta(_packed(_get(di, 8), sint=True))
            lons = _delta(_packed(_get(di, 9), sint=True))
            kv = _packed(_get(di, 10))
            infos = _get(di, 5)
            dense_info = _walk(infos[0]) if infos else None
            versions = _packed(_get(dense_info, 1)) if dense_info else None
            tss = _delta(_packed(_get(dense_info, 2), sint=True)) if dense_info else None
            chs = _delta(_packed(_get(dense_info, 3), sint=True)) if dense_info else None
            uids = _delta(_packed(_get(dense_info, 4), sint=True)) if dense_info else None
            usids = _delta(_packed(_get(dense_info, 5), sint=True)) if dense_info else None
            viss = _packed(_get(dense_info, 6)) if dense_info else None
            ki = 0
            for i, nid in enumerate(ids):
                tags = {}
                while ki < len(kv) and kv[ki] != 0:
                    tags[st[kv[ki]]] = st[kv[ki + 1]]
                    ki += 2
                ki += 1  # skip terminator
                node = {
                    "id": nid,
                    "lat": 1e-9 * (lat_off + gran * float(lats[i])),
                    "lon": 1e-9 * (lon_off + gran * float(lons[i])),
                    "tags": tags,
                    "version": versions[i] if versions else None,
                    "ts_ms": tss[i] * date_gran if tss else None,
                    "changeset": chs[i] if chs else None,
                    "uid": uids[i] if uids else None,
                    "user": st[usids[i]] if usids else None,
                    "visible": bool(viss[i]) if viss else None,
                }
                out["nodes"].append(node)
        for nodemsg in _get(gi, 1):
            ni = _walk(nodemsg)
            keys = _packed(_get(ni, 2))
            vals = _packed(_get(ni, 3))
            info_b = _get(ni, 4)
            inf = _info(info_b[0], st, date_gran) if info_b else {
                "version": None, "ts_ms": None, "changeset": None, "uid": None,
                "user": None, "visible": None}
            out["nodes"].append({
                "id": _zigzag(_get(ni, 1)[0]),
                "lat": 1e-9 * (lat_off + gran * float(_zigzag(_get(ni, 8)[0]))),
                "lon": 1e-9 * (lon_off + gran * float(_zigzag(_get(ni, 9)[0]))),
                "tags": {st[k]: st[v] for k, v in zip(keys, vals)},
                **inf,
            })
        for waymsg in _get(gi, 3):
            wi = _walk(waymsg)
            keys = _packed(_get(wi, 2))
            vals = _packed(_get(wi, 3))
            info_b = _get(wi, 4)
            inf = _info(info_b[0], st, date_gran) if info_b else {
                "version": None, "ts_ms": None, "changeset": None, "uid": None,
                "user": None, "visible": None}
            out["ways"].append({
                "id": _get(wi, 1)[0],
                "refs": _delta(_packed(_get(wi, 8), sint=True)),
                "tags": {st[k]: st[v] for k, v in zip(keys, vals)},
                **inf,
            })
        for relmsg in _get(gi, 4):
            ri = _walk(relmsg)
            keys = _packed(_get(ri, 2))
            vals = _packed(_get(ri, 3))
            roles = _packed(_get(ri, 8))
            memids = _delta(_packed(_get(ri, 9), sint=True))
            types = _packed(_get(ri, 10))
            tnames = ["node", "way", "relation"]
            info_b = _get(ri, 4)
            inf = _info(info_b[0], st, date_gran) if info_b else {
                "version": None, "ts_ms": None, "changeset": None, "uid": None,
                "user": None, "visible": None}
            out["relations"].append({
                "id": _get(ri, 1)[0],
                "members": [
                    {"role": st[r], "ref": m, "type": tnames[t]}
                    for r, m, t in zip(roles, memids, types)
                ],
                "tags": {st[k]: st[v] for k, v in zip(keys, vals)},
                **inf,
            })
