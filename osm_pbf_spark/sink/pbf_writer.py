"""Distributed OSM-PBF *writer* — the inverse of sources/pbf_source.

The reference is a decoder; a complete engine also has to EMIT the
format (clipped extracts, filtered re-publishes, test corpora at
scale). ``write_pbf_files`` turns an entity DataFrame in the decoder's
schema back into a fleet of spec-valid ``.osm.pbf`` files — exactly
the multi-extract shape ``read_pbf(list)`` (S9) consumes, closing the
decode -> transform -> encode loop.

Layout contract (the OSM convention, per file): OSMHeader blob first,
then OSMData blocks with nodes before ways before relations, ids
ascending; a global ``repartitionByRange`` on (kind_rank, id) makes
each FILE a contiguous (kind, id) range too. Nodes are encoded as
DenseNodes (delta-coded ids/coords — the compact form; the sparse Node
encoding is an input variant the writer never needs to produce).

Coordinate roundtrip is EXACT at the default granularity: the decoder
computes ``lat = 1e-9 * (100 * raw)`` (one correctly-rounded multiply,
relative error <= 2^-52), so the writer's ``raw = round(lat * 1e7)``
is off the true integer by ~1e-9 units — far below the 0.5 rounding
boundary. decode(write(decode(f))) == decode(f) for every entity
column (pinned by test and by the q_pbf_roundtrip gate).

Metadata: a row carries info iff ``version`` IS NOT NULL. A block
mixing info and no-info rows encodes the missing ones with explicit
zero defaults (version 0, ts 0, changeset 0, uid 0, user '', visible
true) — DenseInfo is all-or-nothing per block in the wire format, so
this is the deterministic documented choice rather than a silent one.

Scale: encoding is embarrassingly parallel — ONE range shuffle to
lay out files, then each task streams its rows through the scalar
encoder into its own file (Arrow-batched input, no driver collect;
manifest rows come back, one per file). Workers write through normal
file IO: on a real cluster point ``out_dir`` at a shared/posix mount
(the same deployment caveat as any non-HDFS sink).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KIND_RANK = {"node": 0, "way": 1, "relation": 2}


def _row_info(r: dict) -> dict:
    return {
        "version": int(r.get("version") or 0),
        "timestamp": int(r.get("ts_ms") or 0) // 1000,
        "changeset": int(r.get("changeset") or 0),
        "uid": int(r.get("uid") or 0),
        "user": r.get("user") or "",
        "visible": True if r.get("visible") is None else bool(r.get("visible")),
    }


def _encode_partition_file(
    rows: list[dict],
    path: str,
    entities_per_block: int,
    header_block: bytes,
    compress: bool,
) -> dict:
    from ..pbf import encoder as E

    blocks: list[bytes] = []
    counts = {"node": 0, "way": 0, "relation": 0}

    def flush(kind: str, batch: list[dict]) -> None:
        if not batch:
            return
        st = E.StringTable()
        if kind == "node":
            with_info = any(r.get("version") is not None for r in batch)
            group = E.encode_dense_nodes(
                [
                    {
                        "id": int(r["id"]),
                        "lat_raw": round(float(r["lat"]) * 1e7),
                        "lon_raw": round(float(r["lon"]) * 1e7),
                        "tags": dict(r.get("tags") or []),
                        "info": _row_info(r),
                    }
                    for r in batch
                ],
                st,
                with_info=with_info,
            )
        elif kind == "way":
            group = b""
            for r in batch:
                w = {
                    "id": int(r["id"]),
                    "tags": dict(r.get("tags") or []),
                    "refs": [int(x) for x in (r.get("refs") or [])],
                }
                if r.get("version") is not None:
                    w["info"] = _row_info(r)
                group += E.encode_way(w, st)
        else:
            group = b""
            for r in batch:
                rel = {
                    "id": int(r["id"]),
                    "tags": dict(r.get("tags") or []),
                    "members": [
                        {"role": m["role"], "ref": int(m["ref"]), "type": m["type"]}
                        for m in (r.get("members") or [])
                    ],
                }
                if r.get("version") is not None:
                    rel["info"] = _row_info(r)
                group += E.encode_relation(rel, st)
        blocks.append(E.encode_primitive_block([group], st))
        counts[kind] += len(batch)

    cur_kind: str | None = None
    batch: list[dict] = []
    for r in rows:
        k = r["kind"]
        if k not in _KIND_RANK:
            raise ValueError(f"write_pbf_files: unknown kind {k!r}")
        if k != cur_kind or len(batch) >= entities_per_block:
            flush(cur_kind, batch)
            cur_kind, batch = k, []
        batch.append(r)
    flush(cur_kind, batch)

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(E.frame_blob("OSMHeader", header_block, compress=compress))
        for b in blocks:
            f.write(E.frame_blob("OSMData", b, compress=compress))
    os.replace(tmp, path)
    return {
        "path": path,
        "n_nodes": counts["node"],
        "n_ways": counts["way"],
        "n_relations": counts["relation"],
        "n_bytes": os.path.getsize(path),
    }


def write_pbf_files(
    entities: DataFrame,
    out_dir: str,
    n_files: int = 1,
    entities_per_block: int = 8000,
    header: dict | None = None,
    compress: bool = True,
) -> list[dict]:
    """Write ``entities`` (the read_pbf schema; missing meta columns are
    treated as NULL) as ``n_files``-ish spec-valid .osm.pbf files under
    ``out_dir``. Returns the manifest (one dict per non-empty file,
    sorted by path): path, n_nodes, n_ways, n_relations, n_bytes.

    ``header``: optional dict like read_pbf's header (required_features
    / optional_features / bbox with left/right/top/bottom degrees);
    every output file carries the same header block.
    """
    import pyarrow as pa

    from ..pbf import encoder as E

    if n_files < 1:
        raise ValueError(f"n_files must be >= 1, got {n_files}")
    os.makedirs(out_dir, exist_ok=True)
    h = header or {}
    bbox = h.get("bbox")
    header_block = E.encode_header_block(
        bbox_nanodeg=(
            None
            if not bbox
            else (
                round(bbox["left"] * 1e9),
                round(bbox["right"] * 1e9),
                round(bbox["top"] * 1e9),
                round(bbox["bottom"] * 1e9),
            )
        ),
        required_features=tuple(
            h.get("required_features") or ("OsmSchema-V0.6", "DenseNodes")
        ),
        optional_features=tuple(h.get("optional_features") or ()),
    )

    cols = entities.columns
    meta_defaults = {
        "tags": "map<string,string>",
        "refs": "array<bigint>",
        "members": "array<struct<role:string,ref:bigint,type:string>>",
        "version": "int",
        "ts_ms": "bigint",
        "changeset": "bigint",
        "uid": "int",
        "user": "string",
        "visible": "boolean",
    }
    df = entities
    for c, typ in meta_defaults.items():
        if c not in cols:
            df = df.withColumn(c, F.lit(None).cast(typ))
    rank = (
        F.when(F.col("kind") == "node", F.lit(0))
        .when(F.col("kind") == "way", F.lit(1))
        .when(F.col("kind") == "relation", F.lit(2))
        .otherwise(
            F.raise_error(
                F.concat(F.lit("write_pbf_files: unknown kind "), F.col("kind"))
            ).cast("int")
        )
    )
    laid = (
        df.withColumn("_rank", rank)
        .repartitionByRange(n_files, "_rank", "id")
        .sortWithinPartitions("_rank", "id")
    )

    out_schema = (
        "path string, n_nodes long, n_ways long, n_relations long, n_bytes long"
    )

    def encode_files(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows: list[dict] = []
        for b in batches:
            rows.extend(b.to_pylist())
        if rows:
            m = _encode_partition_file(
                rows,
                os.path.join(out_dir, f"part-{pid:05d}.osm.pbf"),
                entities_per_block,
                header_block,
                compress,
            )
            yield pa.RecordBatch.from_pylist([m])

    manifest = sorted(
        (r.asDict() for r in laid.mapInArrow(encode_files, out_schema).collect()),
        key=lambda m: m["path"],
    )
    return manifest
