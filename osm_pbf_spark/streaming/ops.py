"""Streaming operators: source, windowed aggregation, stateful dedup.

Every op returns a STREAMING DataFrame (``df.isStreaming``) built from
the same pyspark.sql expressions as its batch twin, so Catalyst plans
the micro-batch increments; ``run_available_now`` is the local drain
used by tests and the driver gate.
"""

from __future__ import annotations

import uuid
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_parquet(
    spark: SparkSession,
    path: str,
    schema=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source parquet stream over ``path`` (a file, directory, or
    glob). Streaming file sources require an explicit schema; when
    ``schema`` is None it is taken from a one-off batch read of the
    same path (driver-side footer read, no data scan).

    ``max_files_per_trigger`` bounds micro-batch size — the knob that
    turns one availableNow drain into a deterministic multi-batch run
    (used by the cross-batch tests).
    """
    if schema is None:
        schema = spark.read.parquet(path).schema
    # The streaming file source requires a DIRECTORY (its basePath);
    # batch sources accept bare files. Shim a local single-file path
    # (the testdata layout) through a symlink dir so the same call
    # works on both — an object-store prefix is already a directory.
    import os

    if os.path.isfile(path):
        d = os.path.join(
            "/tmp",
            "stream_src_" + uuid.uuid5(uuid.NAMESPACE_URL, os.path.abspath(path)).hex,
        )
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, os.path.basename(path))
        if not os.path.exists(link):
            os.symlink(os.path.abspath(path), link)
        path = d
    r = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return r.parquet(path)


def windowed_counts(
    sdf: DataFrame,
    ts_col: str,
    key_cols: list[str],
    window: str,
    watermark: str | None = None,
    val_col: str | None = None,
    val_scale: int = 100,
) -> DataFrame:
    """Event-time tumbling-window counts per key — the canonical
    streaming aggregation. Returns ``(window_start, window_end,
    *key_cols, n[, sum_q])`` where ``sum_q`` is the int64 sum of
    ``floor(val * val_scale + 0.5)`` (exact, order-free — a double sum
    would be partitioning-dependent).

    BATCH PARITY: in complete output mode the result equals the batch
    ``groupBy(window(ts), keys)`` over all input seen so far, bit for
    bit; the watermark (if set) only bounds state in append/update
    modes. Plan: partial agg in each micro-batch + state-store merge —
    the streaming twin of a hash aggregate, keyed state sharded by the
    shuffle partitioning.
    """
    w = F.window(F.col(ts_col), window)
    if watermark is not None:
        sdf = sdf.withWatermark(ts_col, watermark)
    aggs = [F.count(F.lit(1)).alias("n")]
    if val_col is not None:
        aggs.append(
            F.sum(
                F.floor(F.col(val_col) * F.lit(float(val_scale)) + F.lit(0.5)).cast(
                    "bigint"
                )
            ).alias("sum_q")
        )
    out = sdf.groupBy(w, *[F.col(c) for c in key_cols]).agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *key_cols,
        "n",
        *(["sum_q"] if val_col is not None else []),
    )


def stream_dedup(
    sdf: DataFrame,
    fp_col: str,
    id_col: str,
) -> DataFrame:
    """Stateful first-seen exact dedup: one output row per fingerprint
    in the FIRST micro-batch where it appears, carrying the minimum id
    and the within-batch copy count; later batches bump nothing and
    emit nothing for already-seen fingerprints.

    Emission spec (deterministic — no timeout dependence):
      - fp unseen in state, appears in batch -> emit
        ``(fp, keep_id = min id in batch, n_copies = batch count)``
        and record fp in state.
      - fp already in state -> emit nothing.

    Over a SINGLE batch this equals the batch exact-dedup
    ``GROUP BY fp -> (min(id), count(*))`` — the driver-gate oracle;
    cross-batch suppression is pinned by a maxFilesPerTrigger=1 test.

    Plan: groupBy(fp).applyInPandasWithState — state is sharded by the
    fingerprint shuffle, one boolean-sized entry per distinct fp, the
    exact state layout a 10^12-document incremental crawl dedup needs
    (state grows with DISTINCT content, not with input).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{fp_col} string, keep_id long, n_copies long"
    state_schema = "seen boolean"

    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        if state.exists:
            # already emitted in an earlier batch: swallow
            for _ in pdfs:
                pass
            return
        keep, n = None, 0
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf[id_col].min())
                keep = m if keep is None else min(keep, m)
                n += len(pdf)
        state.update((True,))
        yield pd.DataFrame({fp_col: [key[0]], "keep_id": [keep], "n_copies": [n]})

    return (
        sdf.select(fp_col, F.col(id_col).cast("long").alias(id_col))
        .groupBy(fp_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def run_available_now(
    sdf: DataFrame,
    output_mode: str = "complete",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Drain a streaming DataFrame with trigger(availableNow=True) into
    a memory sink and return the sink as a BATCH DataFrame — the local
    gate harness (a cluster deployment would writeStream to the sink
    table instead; the plan is identical).

    The memory-sink temp view outlives the (stopped) query, so the
    returned DataFrame supports repeated actions like any batch result.
    """
    name = "mem_" + uuid.uuid4().hex
    w = sdf.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.trigger(availableNow=True).start()
    q.awaitTermination()
    q.stop()
    return sdf.sparkSession.table(name)


def stream_ingest(
    sdf: DataFrame,
    sink,
    checkpoint_dir: str,
    split_prefix: str = "stream",
    available_now: bool = True,
):
    """Continuous ingestion into the Iceberg-shaped sink: each
    micro-batch appends as split ``{prefix}-{batch_id:08d}`` through
    ``IcebergLikeSink.write_split``'s atomic per-split manifest commit.

    EXACTLY-ONCE end-to-end from two at-least-once halves: Spark's
    streaming checkpoint replays a failed batch with the SAME batch id,
    and the sink's split commit is idempotent by split id (an
    already-committed split is skipped wholesale) — the standard
    foreachBatch + idempotent-sink construction, here landing in the
    engine's own table format so committed_files/read/stats pruning,
    compaction, deletes and incremental scans all apply to streamed
    data. Splits are zero-padded by batch id, so read_incremental
    windows align with arrival order.

    Returns the started StreamingQuery; with ``available_now`` (the
    drain/backfill mode) the caller typically ``awaitTermination()``s.
    ``available_now=False`` starts with Spark's default
    as-fast-as-possible micro-batch trigger for a long-lived tailer;
    a custom cadence (e.g. processingTime) is a few lines of
    writeStream — jobs/stream_ingest_job.py --follow shows it.
    """

    def _write(bdf: DataFrame, bid: int) -> None:
        sink.write_split(
            bdf,
            f"{split_prefix}-{bid:08d}",
            lineage={"stream_batch": int(bid), "mode": "stream_ingest"},
        )

    w = (
        sdf.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_sessionize(
    sdf: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap: str,
    watermark: str | None = None,
) -> DataFrame:
    """Event-time SESSION windows per key — the streaming twin of
    temporal.sessionize, built on ``F.session_window`` so the state
    store does the cross-micro-batch session merging (a session that
    spans two batches is ONE output row).

    Gap semantics (probed, pinned by test): an event exactly ``gap``
    after the previous one still MERGES — a new session starts only
    when the inter-event gap is STRICTLY greater than ``gap``; the
    emitted window is [min ts, max ts + gap).

    Returns ``(session_start, session_end, *key_cols, n_events)``.

    BATCH PARITY: in complete output mode the result equals the batch
    gaps-and-islands sessionization (LAG > gap starts an island) over
    all input seen so far — the driver-gate oracle. The watermark (if
    set) only bounds state in append/update modes, where a session
    finalizes once the watermark passes session_end.

    Plan: one shuffle on the key columns; each micro-batch's partial
    sessions merge with adjacent state-store sessions keyed by the
    same partitioning — state is per LIVE session, not per event.
    """
    if watermark is not None:
        sdf = sdf.withWatermark(ts_col, watermark)
    out = sdf.groupBy(
        F.session_window(F.col(ts_col), gap), *[F.col(c) for c in key_cols]
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *key_cols,
        "n_events",
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    upper: str,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Event-time stream-stream INNER join: pair left/right rows with
    equal ``on`` keys where ``right_ts`` lands in
    ``[left_ts, left_ts + upper]`` — the attribution join (click ->
    purchase, request -> response, ping -> pong) that batch engines
    run over closed days and a streaming engine must answer
    continuously.

    Both sides get a watermark; with the time-range condition that
    bounds each side's join state to the watermark delay + ``upper``
    window (Spark evicts older state), so state is O(arrival rate x
    horizon), not O(stream length).

    BATCH PARITY: every pair whose two events are both on time (within
    the watermark) is emitted exactly once, so an availableNow drain
    over a closed input equals the plain batch join — the driver-gate
    oracle IS the batch join SQL.

    ``how='left_outer'`` adds the attribution-miss rows: a left row
    with NO match emits once with nulls on the right side — but only
    when the watermark passes ``left_ts + upper + watermark`` (state
    expiry). Under an availableNow drain, unmatched lefts still
    inside that horizon at end-of-input stay IN STATE and do not
    emit (probed, pinned by the far-future-flush pytest) — so the
    closed-input == batch-join parity of the gate holds for INNER
    only; the outer mode's contract is the pytest-pinned streaming
    semantics.

    Plan: both sides shuffle on the ``on`` keys into the symmetric
    stateful join operator; the time bound is evaluated post-match.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner or left_outer, got {how!r}")
    lt = left.withWatermark(left_ts, watermark)
    rt = right.withWatermark(right_ts, watermark)
    cond = None
    for c in on:
        e = lt[c] == rt[c]
        cond = e if cond is None else (cond & e)
    cond = cond & (rt[right_ts] >= lt[left_ts]) & (
        rt[right_ts] <= F.expr(f"{left_ts} + INTERVAL {upper}")
    )
    j = lt.join(rt, cond, how)
    # project unambiguous columns: keys from the left, both timestamps
    keep = [lt[c].alias(c) for c in on]
    others = [
        col
        for col in j.columns
        if col not in set(on) and col not in (left_ts, right_ts)
    ]
    return j.select(*keep, lt[left_ts].alias(left_ts), rt[right_ts].alias(right_ts), *others)


def stream_ewma(
    sdf: DataFrame,
    alpha_num: int,
    alpha_den: int,
    key_col: str = "key",
    seq_col: str = "seq",
    val_col: str = "val",
    scale: int = 1_000_000,
) -> DataFrame:
    """Stateful per-key streaming EWMA — the incremental twin of
    :func:`osm_pbf_spark.operators.temporal.ewma`, carrying the SAME
    integer recurrence across micro-batches so a drained stream is
    bit-identical to the batch operator (the batch-parity discipline
    that makes streaming queries gate-comparable):

        y_1 = x_1·scale
        y_i = (αn·x_i·scale + (αd−αn)·y_{i−1}) DIV αd

    State per key = (last_seq, last_y, started) — O(1) per DISTINCT
    key, the layout an always-on metric smoother needs. Rows within a
    batch are sorted by ``seq``; a batch whose first seq is <= the
    state's last_seq is OUT OF ORDER across batches and raises loudly
    (parity would silently break otherwise — the source must deliver
    seq-monotone files, e.g. mtime-ordered landing files).

    Emits every input row with ``ewma_q``/``ewma`` (append mode).
    Values must be non-negative int64 (the batch spec's DIV contract).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if not (0 < alpha_num <= alpha_den):
        raise ValueError(
            f"need 0 < alpha_num <= alpha_den, got {alpha_num}/{alpha_den}"
        )
    num, den, sc = int(alpha_num), int(alpha_den), int(scale)
    out_schema = (
        f"{key_col} long, {seq_col} long, {val_col} long, "
        "ewma_q long, ewma double"
    )
    state_schema = "last_seq long, last_y long, started boolean"

    def fn(key, pdfs, state: GroupState):
        import numpy as np

        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts).sort_values(seq_col, kind="mergesort")
        x = pdf[val_col].to_numpy(dtype=np.int64)
        if len(x) and x.min() < 0:
            raise ValueError("stream_ewma spec requires non-negative values")
        seqs = pdf[seq_col].to_numpy(dtype=np.int64)
        if state.exists:
            last_seq, y, started = state.get
        else:
            last_seq, y, started = 0, 0, False
        if started and int(seqs[0]) <= last_seq:
            raise ValueError(
                f"stream_ewma: key {key[0]!r} batch starts at seq "
                f"{int(seqs[0])} <= state last_seq {last_seq} — "
                "out-of-order input breaks batch parity"
            )
        out = []
        for xi in x:
            xi = int(xi)
            y = xi * sc if not started else (num * xi * sc + (den - num) * y) // den
            started = True
            out.append(y)
        state.update((int(seqs[-1]), int(y), True))
        yield pd.DataFrame(
            {
                key_col: pdf[key_col].to_numpy(dtype=np.int64),
                seq_col: seqs,
                val_col: x,
                "ewma_q": np.array(out, dtype=np.int64),
                "ewma": np.array(out, dtype=np.float64) / float(sc),
            }
        )

    return (
        sdf.select(key_col, seq_col, val_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def stream_threshold_alert(
    sdf: DataFrame,
    key_cols: list[str],
    k: int,
) -> DataFrame:
    """Stateful threshold alerting (r4): one alert row per key, emitted
    in the FIRST micro-batch where the key's CUMULATIVE event count
    reaches ``k`` — the ops-monitoring staple (k failures for a host,
    k abuse reports for an account) with exactly-once alert semantics
    (state remembers both the running count and whether the alert
    already fired, so replays/late batches never re-alert).

    Emission spec (deterministic, no timeout dependence):
      - cumulative count (state + batch rows) first reaches >= k ->
        emit ``(key..., n_events = cumulative count in that batch)``;
      - key already alerted, or still below k -> emit nothing.

    Over a SINGLE availableNow batch this equals the batch
    ``GROUP BY key HAVING count(*) >= k`` with n_events = the full
    count — the driver-gate oracle; cross-batch accumulation and
    alert-once suppression are pinned by a maxFilesPerTrigger=1 test.

    Plan: groupBy(key).applyInPandasWithState — state is ONE
    (count, fired) pair per distinct key, sharded by the key shuffle;
    state grows with key cardinality, never with event volume.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_fields = ", ".join(
        f"{c} {sdf.schema[c].dataType.simpleString()}" for c in key_cols
    )
    out_schema = f"{key_fields}, n_events long"
    state_schema = "n long, fired boolean"

    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        n0, fired = state.get if state.exists else (0, False)
        n = int(n0)
        for pdf in pdfs:
            n += len(pdf)
        if fired:
            state.update((n, True))
            return
        if n >= k:
            state.update((n, True))
            yield pd.DataFrame(
                {**{c: [v] for c, v in zip(key_cols, key)}, "n_events": [n]}
            )
        else:
            state.update((n, False))

    return sdf.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_windowed_distinct(
    sdf: DataFrame,
    ts_col: str,
    key_cols: list[str],
    window: str,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming per-window DISTINCT-key counts (r4) — "unique users
    per hour" over an unbounded source, the built-in-operator
    composition the custom stateful ops don't cover: watermarked
    ``dropDuplicates`` on (window, keys) feeds a windowed count, so
    state holds one row per DISTINCT (window, key) and the watermark
    evicts closed windows.

    Batch parity (the module discipline): an availableNow drain over
    closed input equals ``COUNT(DISTINCT keys) GROUP BY window`` —
    the gate oracle; cross-batch suppression comes from the
    dropDuplicates state store itself.

    ``watermark=None`` (the complete-mode / availableNow-gate path)
    keeps all state; set it for append-mode production streams
    (requires an instant TIMESTAMP column — parquet TIMESTAMP_NTZ is
    rejected by withWatermark, the windowed_counts caveat). The
    watermark path chains TWO stateful operators (dedup state ->
    windowed agg) in append mode, which needs Spark >= 3.5's
    multiple-stateful-operator support (event-time metadata
    propagation between them); tested on 4.1.

    Returns (window_start, window_end, n_distinct).
    """
    src = sdf
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window)
    dedup = (
        src.select(win.alias("_w"), *key_cols, F.col(ts_col))
        .dropDuplicates(["_w", *key_cols])
    )
    return dedup.groupBy("_w").agg(
        F.count(F.lit(1)).alias("n_distinct")
    ).select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        "n_distinct",
    )


def stream_upsert(
    sdf: DataFrame,
    sink,
    key_cols: list[str],
    checkpoint_dir: str,
    split_prefix: str = "cdc",
    dedup_order_col: str | None = None,
    available_now: bool = True,
):
    """Streaming CDC APPLY into the Iceberg-shaped sink (r5) — the
    upsert twin of stream_ingest: every micro-batch MERGES into the
    table by ``key_cols`` (replace-or-append through the sink's
    equality-delete + append composition), so a keyed changelog stream
    materializes as its last-write-wins current state — the Debezium/
    CDC landing pattern.

    Within a batch, multiple rows per key are collapsed FIRST to the
    one with the greatest ``dedup_order_col`` (ties to the physically
    later is nondeterministic — give a total order; None keeps batch
    rows only when keys are already unique, enforced loudly). Across
    batches, later micro-batches replace earlier keys by construction.
    EXACTLY-ONCE: the batch-id-derived split id makes the upsert
    replay idempotent after crash (the sink's resume contract).

    Returns the started query; drain with availableNow for the gate.
    """

    def _apply(bdf: DataFrame, bid: int) -> None:
        from pyspark.sql import Window

        b = bdf
        if dedup_order_col is not None:
            w = Window.partitionBy(*key_cols).orderBy(
                F.col(dedup_order_col).desc()
            )
            b = (
                b.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            dup = (
                b.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_c"))
                .where(F.col("_c") > 1)
            )
            if not dup.isEmpty():
                raise ValueError(
                    "stream_upsert: duplicate keys within a batch and no "
                    "dedup_order_col given"
                )
        sid = f"{split_prefix}-{bid:08d}"
        done = sink.completed_splits()
        if sid in done:
            return  # checkpoint replay of a fully-committed batch
        if not done:
            # first batch into an empty table: nothing to delete —
            # plain append (upsert's delete half would fail loudly)
            sink.write_split(
                b, sid, lineage={"stream_batch": int(bid), "mode": "stream_upsert"}
            )
            return
        sink.upsert(
            b,
            key_cols,
            split_id=sid,
            lineage={"stream_batch": int(bid), "mode": "stream_upsert"},
        )

    w = (
        sdf.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
