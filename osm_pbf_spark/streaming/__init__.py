"""Structured Streaming surface.

The batch operators in this package all have a streaming twin shape:
the same declarative plan read from an unbounded source. This module
provides the canonical ones — file-source ingestion, watermarked /
complete-mode windowed aggregation, and a stateful first-seen dedup —
under a BATCH-PARITY discipline: every streaming op is specified as
"equals the batch plan over the union of all micro-batches" (exact for
complete-mode aggregation and for single-batch availableNow runs;
cross-batch semantics of the stateful ops are pinned by multi-batch
tests). That makes the driver gate applicable: a streaming query is
drained with ``availableNow`` into a memory sink and compared against a
plain SQL oracle, exactly like a batch query.

Scale posture: file-source streaming is Spark's production ingestion
path (a 1000-executor cluster tails an object-store prefix); windowed
aggregation is a partial-agg shuffle per micro-batch with state kept in
the HDFS-backed state store, bounded by watermark eviction; the
stateful dedup keys the state store by fingerprint so state is
shuffle-partitioned and incremental. Nothing here collects to the
driver except the memory-sink drain used by the local gate.
"""

from .ops import (
    run_available_now,
    stream_ingest,
    stream_dedup,
    stream_ewma,
    stream_parquet,
    stream_sessionize,
    stream_stream_join,
    stream_threshold_alert,
    stream_upsert,
    stream_windowed_distinct,
    windowed_counts,
)

__all__ = [
    "stream_parquet",
    "stream_ingest",
    "windowed_counts",
    "stream_dedup",
    "stream_ewma",
    "stream_sessionize",
    "stream_stream_join",
    "stream_threshold_alert",
    "stream_upsert",
    "stream_windowed_distinct",
    "run_available_now",
]
