"""Randomized model check of the sink maintenance protocol.

Drives a random (but seeded — deterministic in CI) sequence of
write_split / compact / commit_snapshot / expire_snapshots operations
against a pure-Python model and asserts after EVERY step:

- read() returns exactly the model's live rows;
- every retained snapshot time-travels to exactly the rows it froze;
- expired snapshots raise;
- resume_plan never re-runs a completed split, even after vacuum;
- committed_files never references a missing file (vacuum cannot break
  the current table or any retained snapshot).

Single-op unit tests (test_sink_compact.py) pin each behavior in
isolation; this catches interaction bugs — e.g. expiry deleting a file
an unsnapshot-ed compaction still needs, or a compaction chain
confusing the replaced-set bookkeeping.
"""

from __future__ import annotations

import os
import random

from pyspark.sql import functions as F

from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink


def _mk_docs(spark, ids):
    return spark.createDataFrame(
        [(i, i * 7 % 1000, f"payload-{i}") for i in ids],
        "doc_id long, cell long, text string",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.select("doc_id", "cell", "text").collect())


def test_sink_lifecycle_model(spark, tmp_path):
    rng = random.Random(0xC0FFEE)
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")

    model_rows: dict[str, list[tuple]] = {}  # live split -> rows
    snaps: list[tuple[str, list[tuple]]] = []  # (snapshot_id, frozen rows)
    expired: set[str] = set()
    all_split_ids: list[str] = []
    next_id = 0
    next_split = 0

    def model_live():
        return sorted(t for rows in model_rows.values() for t in rows)

    for step in range(24):
        op = rng.choice(["write", "write", "compact", "snapshot", "expire"])
        if op == "write":
            ids = list(range(next_id, next_id + rng.randint(1, 40)))
            next_id += len(ids)
            sid = f"{next_split:04d}"
            next_split += 1
            sink.write_split(_mk_docs(spark, ids), sid)
            model_rows[sid] = [(i, i * 7 % 1000, f"payload-{i}") for i in ids]
            all_split_ids.append(sid)
        elif op == "compact":
            live = sorted(model_rows)
            m = sink.compact(spark)
            if len(live) < 2:
                assert m is None
            else:
                assert m is not None and m["replaces"] == live
                merged = [t for sid in live for t in model_rows[sid]]
                model_rows = {m["split_id"]: merged}
                all_split_ids.append(m["split_id"])
        elif op == "snapshot":
            s = sink.commit_snapshot()
            assert s["splits"] == sorted(model_rows)
            snaps.append((s["snapshot_id"], model_live()))
        elif op == "expire":
            keep = rng.randint(1, 3)
            sink.expire_snapshots(keep_last=keep)
            if len(snaps) > keep:
                expired.update(sid for sid, _ in snaps[:-keep])
                snaps = snaps[-keep:]

        # ---- invariants after every step ----
        if model_rows:
            assert _rows(sink.read(spark)) == model_live(), f"step {step} ({op})"
        assert sink.live_splits() == set(model_rows), f"step {step} ({op})"
        assert sink.resume_plan(all_split_ids) == [], f"step {step} ({op})"
        for f in sink.committed_files():
            assert os.path.exists(f), f"step {step}: live file vacuumed: {f}"
        for snap_id, frozen in snaps:
            got = _rows(sink.read_snapshot(spark, snap_id))
            assert got == sorted(frozen), f"step {step}: snapshot {snap_id} drifted"
        for snap_id in expired:
            try:
                sink.read_snapshot(spark, snap_id)
                raise AssertionError(f"expired snapshot {snap_id} still readable")
            except ValueError:
                pass
