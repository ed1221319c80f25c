"""Iceberg-shaped sink: snapshot/manifest protocol over parquet
(SURVEY.md §2.6 C1-C3, §7.6).

No Iceberg runtime jar exists in this environment (and no network to
fetch one — SURVEY.md §0), so the sink implements the Iceberg *shape*
itself; the writer interface is isolated so a real
iceberg-spark-runtime catalog can be swapped in without touching
callers. Replaces the reference's Postgres COPY sink (BASELINE.json:6).

Layout:

    root/
      data/split=<split_id>/[<part_col>=<v>/]part-*.parquet
      _manifests/split-<split_id>.json     <- atomic per-split commit
      snapshot.json                        <- atomic table-level snapshot

Protocol (exactly-once restart semantics, BASELINE.json:6,14):

- the job is divided into named SPLITS (e.g. PBF blob ranges). A split
  commits by writing its parquet files THEN atomically renaming its
  manifest JSON into place (os.replace — atomic on POSIX).
- a manifest records the split's files + row/byte counts + LINEAGE
  (input description, operator config, engine version) + METRICS.
- readers list committed manifests and read ONLY the files they name:
  data orphaned by a crash mid-split is invisible, so a restart that
  reprocesses the split cannot double-count.
- ``resume_plan`` = all splits minus committed splits.
- a ``dedup_cols`` guard on read is available as a belt-and-braces
  layer for at-least-once upstreams.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from .. import __version__

_MANIFEST_DIR = "_manifests"


class IcebergLikeSink:
    def __init__(
        self,
        root: str,
        partition_by: list[str] | None = None,
        target_file_bytes: int = 16 * 1024 * 1024,
        stats_col: str | None = "cell",
    ) -> None:
        self.root = root
        self.partition_by = partition_by or []
        # column whose per-file [min, max] is recorded in each manifest
        # (Iceberg-style file metrics). With cell-sorted input (the
        # default ingest layout) these ranges are tight and read() can
        # prune files without any directory partitioning or shuffle.
        self.stats_col = stats_col
        # Without clustering, partitionBy fans every write task out
        # across every partition dir (observed 1800+ tiny files for
        # 64 MB). write_split REBALANCEs on the partition columns with
        # this advisory size, so file count and write parallelism both
        # track data volume. Raise toward 128-512 MB on a real cluster.
        self.target_file_bytes = target_file_bytes
        os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # ---- commit protocol ------------------------------------------------

    def _manifest_path(self, split_id: str) -> str:
        return os.path.join(self.root, _MANIFEST_DIR, f"split-{split_id}.json")

    def completed_splits(self) -> set[str]:
        out = set()
        mdir = os.path.join(self.root, _MANIFEST_DIR)
        for name in os.listdir(mdir):
            if name.startswith("split-") and name.endswith(".json"):
                out.add(name[len("split-") : -len(".json")])
        return out

    def resume_plan(self, all_splits: list[str]) -> list[str]:
        done = self.completed_splits()
        return [s for s in all_splits if s not in done]

    def write_split(
        self,
        df: DataFrame,
        split_id: str,
        lineage: dict | None = None,
        fail_before_commit: bool = False,
    ) -> dict | None:
        """Write one split's data, then atomically commit its manifest.

        Idempotent: an already-committed split is skipped. Crashing
        after the parquet write but before the manifest rename leaves
        orphan files that readers never see (``fail_before_commit``
        exists for the kill-injection test).
        """
        if split_id in self.completed_splits():
            return None
        split_dir = os.path.join(self.root, "data", f"split={split_id}")
        t0 = time.monotonic()
        spark = df.sparkSession
        _ADV = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        old_adv = spark.conf.get(_ADV, None)
        if self.partition_by:
            # AQE REBALANCE: hash-cluster on the partition columns, then
            # split oversized partitions (the hot city prefix) and
            # coalesce tiny ones using runtime shuffle statistics — the
            # measured-salt pattern without an extra counting pass.
            # Files per dir stay bounded and proportional to data size.
            df = df.hint("rebalance", *self.partition_by)
        writer = df.write.mode("overwrite")
        if self.stats_col and not self.partition_by:
            # sorted layout: bound row-group size so cell-sorted files
            # carry many TIGHT [min, max] row-group ranges — Spark's
            # parquet reader then skips row groups on cell predicates
            # even though each task's file spans a wide cell range
            writer = writer.option("parquet.block.size", str(8 * 1024 * 1024))
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        try:
            spark.conf.set(_ADV, str(self.target_file_bytes))
            writer.parquet(split_dir)
        finally:
            if old_adv is None:
                spark.conf.unset(_ADV)
            else:
                spark.conf.set(_ADV, old_adv)

        files = []
        n_bytes = 0
        for dirpath, _dirnames, filenames in os.walk(split_dir):
            for fn in filenames:
                if fn.endswith(".parquet"):
                    full = os.path.join(dirpath, fn)
                    files.append(os.path.relpath(full, self.root))
                    n_bytes += os.path.getsize(full)
        import pyarrow.parquet as pq
        from concurrent.futures import ThreadPoolExecutor

        def _meta(rel: str) -> tuple[int, dict | None]:
            md = pq.read_metadata(os.path.join(self.root, rel))
            stats = None
            if self.stats_col and md.num_row_groups:
                col_j = next(
                    (
                        j
                        for j in range(md.num_columns)
                        if md.row_group(0).column(j).path_in_schema == self.stats_col
                    ),
                    None,
                )
                if col_j is not None and md.num_rows:
                    mins, maxs = [], []
                    for g in range(md.num_row_groups):
                        s = md.row_group(g).column(col_j).statistics
                        if s is None or not s.has_min_max:
                            break
                        mins.append(s.min)
                        maxs.append(s.max)
                    else:
                        stats = {"min": min(mins), "max": max(maxs)}
            return md.num_rows, stats

        file_stats: dict[str, dict] = {}
        n_rows = 0
        with ThreadPoolExecutor(max_workers=16) as ex:
            for rel, (rows, stats) in zip(files, ex.map(_meta, files)):
                n_rows += rows
                if stats is not None:
                    file_stats[rel] = {"rows": rows, **stats}
        manifest = {
            "split_id": split_id,
            "files": sorted(files),
            # per-file [min, max] of stats_col — Iceberg-style file
            # metrics enabling manifest-level pruning in read()
            "file_stats": {k: file_stats[k] for k in sorted(file_stats)},
            "stats_col": self.stats_col,
            "n_rows": n_rows,
            "n_bytes": n_bytes,
            "partition_by": self.partition_by,
            "lineage": {
                "engine_version": __version__,
                **(lineage or {}),
            },
            "metrics": {"write_wall_s": round(time.monotonic() - t0, 3)},
            "committed_at_unix": int(time.time()),
        }
        if fail_before_commit:
            raise RuntimeError(f"injected failure before commit of split {split_id}")
        tmp = self._manifest_path(split_id) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path(split_id))  # THE atomic commit
        return manifest

    def commit_reported_split(
        self,
        split_id: str,
        reports: list[dict],
        lineage: dict | None = None,
        fail_before_commit: bool = False,
        wall_s: float | None = None,
    ) -> dict | None:
        """Commit a split whose data files were written DIRECTLY by the
        workers (pyarrow in the decode kernel) — the workers report
        (path, n_rows, n_bytes, cell_min, cell_max) and only this
        manifest makes them visible. Failed or duplicate task attempts
        leave invisible orphans (Spark returns rows only from the
        winning attempt), so exactly-once semantics are unchanged. The
        driver re-checks each reported file's existence and size before
        committing."""
        if split_id in self.completed_splits():
            return None
        files: list[str] = []
        file_stats: dict[str, dict] = {}
        n_rows = 0
        n_bytes = 0
        for r in reports:
            full = r["path"]
            size = os.path.getsize(full)
            if size != r["n_bytes"]:
                raise OSError(f"reported size mismatch for {full}: {size} != {r['n_bytes']}")
            rel = os.path.relpath(full, self.root)
            files.append(rel)
            file_stats[rel] = {"rows": r["n_rows"], "min": r["cell_min"], "max": r["cell_max"]}
            n_rows += r["n_rows"]
            n_bytes += size
        manifest = {
            "split_id": split_id,
            "files": sorted(files),
            "file_stats": {k: file_stats[k] for k in sorted(file_stats)},
            "stats_col": self.stats_col,
            "n_rows": n_rows,
            "n_bytes": n_bytes,
            "partition_by": [],
            "lineage": {
                "engine_version": __version__,
                **(lineage or {}),
            },
            "metrics": {"write_wall_s": round(wall_s, 3) if wall_s is not None else None},
            "committed_at_unix": int(time.time()),
        }
        if fail_before_commit:
            raise RuntimeError(f"injected failure before commit of split {split_id}")
        tmp = self._manifest_path(split_id) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path(split_id))  # THE atomic commit
        return manifest

    def commit_snapshot(self, properties: dict | None = None) -> dict:
        """Roll committed manifests into a table-level snapshot (atomic).

        Also writes a MANIFEST LIST (Iceberg's manifest-list analog):
        one JSON file holding every committed split's file entries +
        stats, so the read path opens O(1) driver-side files instead of
        one JSON per split (at 100 TB that is ~10^5 splits). The list
        is written first, then the snapshot that references it — both
        via atomic rename."""
        manifests = [self._read_manifest(sid) for sid in sorted(self.completed_splits())]
        snap_id = uuid.uuid4().hex
        mlist = {
            "snapshot_id": snap_id,
            "entries": {
                m["split_id"]: {
                    "files": m["files"],
                    "file_stats": m.get("file_stats", {}),
                }
                for m in manifests
            },
        }
        mlist_name = f"manifest-list-{snap_id}.json"
        tmp = os.path.join(self.root, f".mlist.tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(mlist, f, sort_keys=True)
        os.replace(tmp, os.path.join(self.root, mlist_name))
        snap = {
            "snapshot_id": snap_id,
            "manifest_list": mlist_name,
            "splits": [m["split_id"] for m in manifests],
            "total_rows": sum(m["n_rows"] for m in manifests),
            "total_bytes": sum(m["n_bytes"] for m in manifests),
            "properties": properties or {},
            "engine_version": __version__,
            "committed_at_unix": int(time.time()),
        }
        tmp = os.path.join(self.root, f".snapshot.tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(snap, f, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(self.root, "snapshot.json"))
        return snap

    # ---- read path -------------------------------------------------------

    def _read_manifest(self, split_id: str) -> dict:
        with open(self._manifest_path(split_id)) as f:
            return json.load(f)

    def _manifest_index(self) -> dict[str, dict]:
        """{split_id: {files, file_stats}} from the snapshot's manifest
        list, if one exists — ONE driver-side file read for all splits
        the last snapshot covered. Splits committed after the snapshot
        fall back to their individual manifests in committed_files."""
        snap_path = os.path.join(self.root, "snapshot.json")
        if not os.path.exists(snap_path):
            return {}
        try:
            with open(snap_path) as f:
                snap = json.load(f)
            mlist = snap.get("manifest_list")
            if not mlist:
                return {}
            with open(os.path.join(self.root, mlist)) as f:
                return json.load(f)["entries"]
        except (OSError, KeyError, ValueError):
            return {}

    def committed_files(
        self, stats_range: tuple[int, int] | None = None
    ) -> list[str]:
        """Committed file paths; with ``stats_range=(lo, hi)``, only the
        files whose manifest [min, max] of stats_col overlaps it —
        manifest-level pruning, no file footer ever opened. Reads the
        snapshot's manifest list (one file) for indexed splits and
        falls back to per-split manifests only for splits committed
        after the last snapshot."""
        index = self._manifest_index()
        files = []
        for sid in sorted(self.completed_splits()):
            m = index.get(sid) or self._read_manifest(sid)
            stats = m.get("file_stats", {})
            for rel in m["files"]:
                if stats_range is not None and rel in stats:
                    lo, hi = stats_range
                    if stats[rel]["max"] < lo or stats[rel]["min"] > hi:
                        continue
                files.append(os.path.join(self.root, rel))
        return files

    def read(
        self,
        spark: SparkSession,
        dedup_cols: list[str] | None = None,
        stats_range: tuple[int, int] | None = None,
    ) -> DataFrame:
        """Read ONLY committed files (orphans from crashes are invisible).

        ``stats_range`` prunes files by the manifest's stats_col metrics
        BEFORE Spark ever lists them. NOTE: range pruning is a superset
        read — callers still apply their exact predicate.
        """
        all_files = self.committed_files()
        if not all_files:
            raise FileNotFoundError(f"no committed splits under {self.root}")
        files = self.committed_files(stats_range) if stats_range is not None else all_files
        if not files:
            # fully pruned: empty frame with the table's schema
            schema = spark.read.parquet(all_files[0]).schema
            return spark.createDataFrame([], schema)
        df = spark.read.parquet(*files)
        if dedup_cols:
            df = df.dropDuplicates(dedup_cols)
        return df
