"""The flagship ingest pipeline (SURVEY.md §3.2 entry point 1 + §7 M1):

PBF file -> distributed decode -> interleaved-span documents -> cell id
-> Iceberg-shaped table, committed split-by-split so a killed run
resumes from the last committed split (BASELINE.json:6,14).

Splits are contiguous BLOB RANGES of the input file: lineage for each
split records exactly which byte ranges produced it (C3). At planet
scale a split is O(hundreds) of blobs; here fixtures use small splits
to exercise the protocol.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from ..pbf.decode import decode_header_block
from ..pbf.framing import read_blob_payload, scan_blobs
from ..sink.iceberg_like import IcebergLikeSink
from ..sources.pbf_source import (
    FILE_REPORT_SPARK_SCHEMA,
    _decode_render_partition_factory,
    _decode_render_write_partition_factory,
    _doc_cell_schemas,
)


def _file_sha256(path: str, max_bytes: int = 1 << 24) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while chunk := f.read(1 << 20):
            h.update(chunk)
            if f.tell() >= max_bytes:
                h.update(b"<truncated>")
                break
    return h.hexdigest()


def ingest_pbf(
    spark: SparkSession,
    pbf_path: str,
    table_root: str,
    cell_level: int = 12,
    blobs_per_split: int = 2,
    parallelism: int | None = None,
    fail_before_split: str | None = None,
    layout: str = "sorted",
) -> IcebergLikeSink:
    """Run (or RESUME) the ingest. Returns the sink for reading.

    ``fail_before_split`` injects a crash before that split's manifest
    commit — used by the kill/resume test.

    ``layout``:
      - "sorted" (default): each decode task sorts its docs by cell in
        Arrow before the write — NO shuffle anywhere in the ingest;
        pruning comes from tight per-file/row-group [cell_min, cell_max]
        metrics recorded in the manifest (Iceberg-style). At 60M docs
        the partitionBy shuffle of nested span rows cost ~12x the
        parquet write itself — this layout removes it.
      - "partitioned": hive-style cell_prefix directories via an AQE
        REBALANCE shuffle (skew-splitting, bounded files/dir) — for
        consumers that need directory layout.
    """
    refs = scan_blobs(pbf_path)
    header = None
    data_refs = []
    for r in refs:
        if r.blob_type == "OSMHeader":
            header = decode_header_block(read_blob_payload(pbf_path, r.offset, r.size))
        elif r.blob_type == "OSMData":
            data_refs.append(r)

    splits = [
        (f"{i:06d}", data_refs[i : i + blobs_per_split])
        for i in range(0, len(data_refs), blobs_per_split)
    ]
    sink = IcebergLikeSink(
        table_root,
        partition_by=[] if layout == "sorted" else ["cell_prefix"],
        stats_col="cell",
    )
    file_sha = _file_sha256(pbf_path)
    todo = set(sink.resume_plan([sid for sid, _ in splits]))

    from pyspark.sql import functions as F

    for sid, split_refs in splits:
        if sid not in todo:
            continue
        manifest_df = spark.createDataFrame(
            [(pbf_path, r.seq, r.offset, r.size) for r in split_refs],
            schema="path string, seq long, offset long, size long",
        )
        # 4 task waves per split: the sorted layout's per-task sort is a
        # barrier between the Python kernel and the JVM write, so
        # smaller staggered tasks let wave N's write overlap wave N+1's
        # decode (and bound the per-task Arrow accumulation)
        n = parallelism or min(
            len(split_refs), 4 * spark.sparkContext.defaultParallelism
        ) or 1
        # fused decode -> span render -> Morton cell in ONE mapInArrow
        # pass: entity data crosses the Arrow boundary exactly once
        # (two chained stages would materialize + re-serialize the whole
        # batch as JVM rows in between — measured ~8x the decode cost).
        # cell_prefix (parent cell at level 4) is the directory-pruning
        # partition column; cell/cell_prefix are -1 for docs with no
        # point geometry (ways/relations before geometry assembly).
        lineage = {
            "input_file": os.path.abspath(pbf_path),
            "input_sha256": file_sha,
            "blob_seqs": [r.seq for r in split_refs],
            "byte_range": [split_refs[0].offset, split_refs[-1].offset + split_refs[-1].size],
            "cell_level": cell_level,
            "header_required_features": (header or {}).get("required_features", []),
        }
        if layout == "sorted":
            # workers write their cell-sorted chunks DIRECTLY with
            # pyarrow and return one file-report row each; the span
            # rows never become JVM rows at all. Visibility comes from
            # the manifest commit, not from the write. (On a cluster,
            # data_dir is shared storage — pyarrow writes via fsspec.)
            import shutil
            import time as _time

            data_dir = os.path.join(table_root, "data", f"split={sid}")
            # the split is NOT committed (it is in the todo set), so
            # nothing under its data dir is visible to readers — wipe
            # orphans from failed attempts before re-running, keeping
            # the "a resumed split overwrites its data dir before
            # committing" invariant true and disk usage bounded
            shutil.rmtree(data_dir, ignore_errors=True)
            os.makedirs(data_dir, exist_ok=True)
            t0 = _time.monotonic()
            reports = (
                manifest_df.repartition(n)
                .mapInArrow(
                    _decode_render_write_partition_factory(cell_level, data_dir),
                    FILE_REPORT_SPARK_SCHEMA,
                )
                .collect()
            )
            sink.commit_reported_split(
                sid,
                [r.asDict() for r in reports],
                lineage=lineage,
                fail_before_commit=(sid == fail_before_split),
                wall_s=_time.monotonic() - t0,
            )
        else:
            _, doc_cell_schema = _doc_cell_schemas()
            docs = manifest_df.repartition(n).mapInArrow(
                _decode_render_partition_factory(cell_level), doc_cell_schema
            )
            sink.write_split(
                docs,
                sid,
                lineage=lineage,
                fail_before_commit=(sid == fail_before_split),
            )
    sink.commit_snapshot({"pipeline": "ingest_pbf", "cell_level": str(cell_level)})
    return sink


def read_documents(
    spark: SparkSession, table_root: str, dedup_guard: bool = False
) -> DataFrame:
    """Read the committed table.

    The manifest protocol already guarantees exactly-once visibility
    (readers see only committed files; a resumed split overwrites its
    data dir before committing), so the default read has NO dedup
    shuffle — tests/test_sink_resume.py asserts uniqueness holds
    through kill/resume without it. ``dedup_guard=True`` adds a
    ``dropDuplicates(doc_id)`` belt-and-braces pass for at-least-once
    upstreams.
    """
    return IcebergLikeSink(table_root).read(
        spark, dedup_cols=["doc_id"] if dedup_guard else None
    )
