"""Temporal operators: as-of join and sessionization (SURVEY.md §2.4
R-family extension, r3).

Both are single-shuffle window plans — the shapes you want at 100 TB:

- ``asof_join`` does NOT join at all in the join-explosion sense. It
  unions the two sides tagged, shuffles ONCE on the key, and carries
  the most recent right-side value forward with
  ``last_value(ignorenulls)`` over an ordered window. A naive
  range-join (left.ts >= right.ts, rank 1) is quadratic per key; this
  is O(n log n) per key and never materializes candidate pairs.
- ``sessionize`` is the classic gap-based session assignment: lag ->
  boundary flag -> running sum, again one shuffle on the key.

Correctness cross-check: DuckDB implements ASOF JOIN natively — a
completely independent algorithm (sorted merge) — so the driver oracle
for q_asof_join is a true independent reimplementation, not a replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "sessionize",
    "interval_join",
    "funnel",
    "resample",
    "retention_cohorts",
    "debounce",
    "twap",
    "scd2_build",
    "fill_forward",
    "max_concurrency",
    "interval_coverage",
    "nearest_event_join",
    "rle_encode",
]


def _epoch_micros(c: "F.Column") -> "F.Column":
    """Microseconds since epoch for TIMESTAMP *and* TIMESTAMP_NTZ
    (parquet loads as NTZ, which plain unix_micros rejects).
    to_utc_timestamp(x, 'UTC') interprets NTZ wall time as UTC — the
    same convention as DuckDB's epoch_us on a naive timestamp — and is
    the identity on instant timestamps, so this is timezone-setting-
    independent for both types."""
    return F.unix_micros(F.to_utc_timestamp(c, "UTC"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For every left row, attach the right row with the largest
    ``ts_col`` <= left's ``ts_col`` within the same ``on`` key
    (inclusive match, like DuckDB ASOF JOIN's default >=). Left rows
    with no prior right row keep nulls.

    Right side should be unique per (on, ts): with duplicates, the
    carried row is the last in (ts, input-order) — deterministic only
    if the caller makes it so.

    Plan: one shuffle (the window partition on ``on``); within each
    key, sort by (ts, side) with right rows BEFORE left rows at equal
    ts so that equal-timestamp matches are included.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts_col)]
    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols}

    lt = left.withColumn("_side", F.lit(1))
    for c in right_cols:
        lt = lt.withColumn(out_names[c], F.lit(None).cast(right.schema[c].dataType))
    rt = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(out_names[c]) for c in right_cols],
    )
    for c in left.columns:
        if c not in (on, ts_col):
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = lt.select(*lt.columns).unionByName(rt.select(*lt.columns))

    w = (
        Window.partitionBy(on)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumns(
        {out_names[c]: F.last(out_names[c], ignorenulls=True).over(w) for c in right_cols}
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    bin_micros: int = 256_000_000,
    left_id: str = "id",
    right_id: str = "id",
    start_col: str = "start_us",
    end_col: str = "end_us",
) -> DataFrame:
    """Interval-overlap join: every (left, right) pair whose
    [start_us, end_us] microsecond intervals overlap (closed ends,
    ``a.start <= b.end AND b.start <= a.end``). Returns
    (id_a, id_b, start_a, end_a, start_b, end_b).

    Scale plan — the 1-D analogue of the cell-cover spatial join
    (operators/distance.py): each interval explodes into its covered
    time bins with a native ``sequence`` Generate (no Python), the
    sides equi-join on the bin, and the exact predicate refines.
    Candidate multiplicity is exactly 1 per true pair because a pair
    is only KEPT in the bin containing max(start_a, start_b) — so no
    distinct/dedup shuffle follows the join.

    ``bin_micros`` trades Generate fan-out (long intervals cover many
    bins) against bin hotness (many intervals per bin); size it near
    the median interval length. Skewed hot bins (rush-hour) are split
    by AQE skew-join like every other equi-join here.
    """
    b = F.lit(int(bin_micros))

    def binned(df: DataFrame, idc: str, tag: str) -> DataFrame:
        return df.select(
            F.col(idc).alias(f"id_{tag}"),
            F.col(start_col).alias(f"start_{tag}"),
            F.col(end_col).alias(f"end_{tag}"),
            F.explode(
                F.sequence(
                    F.floor(F.col(start_col) / b), F.floor(F.col(end_col) / b)
                )
            ).alias("_bin"),
        )

    a = binned(left, left_id, "a")
    c = binned(right, right_id, "b")
    return (
        a.join(c, "_bin")
        .where(
            (F.col("start_a") <= F.col("end_b"))
            & (F.col("start_b") <= F.col("end_a"))
            # keep each pair once: only in the bin of the later start
            & (F.col("_bin") == F.floor(F.greatest("start_a", "start_b") / b))
        )
        .select("id_a", "id_b", "start_a", "end_a", "start_b", "end_b")
    )


def sessionize(
    events: DataFrame,
    gap_s: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization: within each key (ordered by ts), a new
    session starts when the gap since the previous event exceeds
    ``gap_s`` seconds. Returns per-session rows:

      (key, session_seq, n_events, start_ts, end_ts, duration_s)

    ``session_seq`` is the 1-based session index within the key. Two
    narrow shuffles: the per-key window, then the (key, session) hash
    aggregate — both on low-cardinality keys with map-side combine.
    Ties on ts are ordered (ts, monotonic input) only if the caller
    de-duplicates; identical timestamps never open a gap, so session
    assignment is insensitive to tie order.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    flagged = events.withColumn(
        "_new",
        F.when(
            F.lag(ts_col).over(w).isNull()
            | (
                _epoch_micros(F.col(ts_col)) - _epoch_micros(F.lag(ts_col).over(w))
                > F.lit(int(gap_s * 1_000_000))
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("session_seq", F.sum("_new").over(w))
    return flagged.groupBy(key_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (
            (_epoch_micros(F.max(ts_col)) - _epoch_micros(F.min(ts_col)))
            / F.lit(1_000_000.0)
        ).alias("duration_s"),
    )


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Sequential-pattern funnel: for each user, the earliest time each
    stage was reached IN ORDER — stage i+1 counts only at or after the
    user's stage-i time (the classic view→click→purchase analysis).

    Returns (user_col, ts_1..ts_k, stage) where ts_i is the first
    qualifying stage-i event (NULL once the funnel broke) and ``stage``
    is how many stages were completed (>=1 — users who never reached
    stage 1 produce no row).

    Plan: per stage one filtered aggregate + one equi-join — k narrow
    shuffles ALL keyed on user_col, so Spark reuses one partitioning
    (ReuseExchange) instead of re-shuffling the event log; events are
    filtered to the stage's type BEFORE the shuffle. min() makes every
    step deterministic; same-timestamp stage events count (>=, matching
    the oracle)."""
    if not stages:
        raise ValueError("need at least one stage")
    cur = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("ts_1"))
    )
    for i, st in enumerate(stages[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == st)
            .select(user_col, F.col(ts_col).alias("_t"))
            .join(cur.select(user_col, f"ts_{i - 1}"), user_col)
            .where(F.col("_t") >= F.col(f"ts_{i - 1}"))
            .groupBy(user_col)
            .agg(F.min("_t").alias(f"ts_{i}"))
        )
        cur = cur.join(nxt, user_col, "left")
    stage = F.lit(0)
    for i in range(1, len(stages) + 1):
        stage = stage + F.when(F.col(f"ts_{i}").isNotNull(), 1).otherwise(0)
    return cur.withColumn("stage", stage.cast("int"))


def resample(
    events: DataFrame,
    bucket_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    value_quantum: int = 1000,
) -> DataFrame:
    """Fixed-width downsample WITH GAP FILL: per user, aggregate events
    into ``bucket_s``-second buckets, then emit EVERY bucket between
    the user's first and last event (missing buckets appear with
    n_events=0 and NULL sum) — the time-series regularization step
    before windowed models.

    Values are quantized to integers (floor(value*quantum)) BEFORE
    summing so the per-bucket sums are exact under any partitioning /
    engine (a raw double sum's last bits depend on shuffle order —
    ungateable); divide by quantum downstream if the float is wanted.

    Plan: one (user, bucket) hash aggregate, one per-user span
    aggregate, one native sequence-explode Generate for the grid, one
    left join back — all keyed on user/bucket, no Python. Gap rows are
    generated, never stored."""
    if bucket_s <= 0:
        raise ValueError("bucket_s must be positive")
    b = F.floor(
        _epoch_micros(F.col(ts_col)) / F.lit(int(bucket_s) * 1_000_000)
    ).alias("bucket")
    qv = F.floor(F.col(value_col) * F.lit(int(value_quantum)))
    agg = events.select(F.col(user_col), b, qv.alias("_qv")).groupBy(
        user_col, "bucket"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("_qv").alias("value_sum_q"),
    )
    grid = (
        agg.groupBy(user_col)
        .agg(F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1"))
        .select(user_col, F.explode(F.sequence("_b0", "_b1")).alias("bucket"))
    )
    return grid.join(agg, [user_col, "bucket"], "left").select(
        user_col,
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "value_sum_q",
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle — the classic product-analytics rollup:
    a user's COHORT is the Monday-truncated week of their first
    activity; for every (cohort_week, weeks-since-cohort) cell, count
    distinct users active in that week.

    Returns (cohort_week:date, week_n:int, n_users:bigint). week_n is
    exact integer arithmetic: both weeks are Monday-aligned, so the
    day difference is divisible by 7.

    Plan: one (user, week) distinct, one per-user min aggregate (both
    map-side combinable), one equi-join back on user, one final
    count_distinct aggregate — all shuffles keyed on user or the tiny
    (cohort, week_n) space.
    """
    weeks = events.select(
        F.col(user_col).alias("user_id"),
        F.to_date(F.date_trunc("week", F.col(ts_col))).alias("week"),
    ).distinct()
    first = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(first, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_n"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def debounce(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: float = 60.0,
    id_col: str = "event_id",
) -> DataFrame:
    """Cooldown deduplication (debounce/throttle): per key, keep an
    event iff it is at least ``gap_s`` seconds after the LAST KEPT
    event of that key — the standard event-throttling / repeated-click
    dedup. NOT sessionize: the kept set depends on itself (a dropped
    event does not restart the clock), which is inherently sequential
    per key and has no window/join formulation.

    Plan: one keyed shuffle into an Arrow-batched ``applyInPandas``
    kernel (the documented sequential-per-group UDF case, like FFD
    packing); the per-key scan is O(n log n) for the sort + O(n) for
    the sweep on int64 epoch-micros. A key's events must fit one group
    batch — at 10^12 events pre-split pathological keys by coarse time
    range first (each range seeded by its first event, ranges >> gap).

    Deterministic: ties break on (ts, id). Returns the kept rows with
    their original columns.
    """
    import numpy as np
    import pandas as pd

    if gap_s <= 0:
        raise ValueError(f"gap_s must be > 0, got {gap_s}")
    gap_us = int(round(gap_s * 1_000_000))
    schema = events.schema

    def _keep(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col], kind="mergesort")
        s = pdf[ts_col]
        if getattr(s.dtype, "tz", None) is not None:
            # TIMESTAMP_LTZ arrives tz-aware in pandas; normalize to
            # naive UTC so the int64-micros sweep is tz-independent
            s = s.dt.tz_convert("UTC").dt.tz_localize(None)
        ts = s.to_numpy(dtype="datetime64[us]").astype(np.int64)
        keep = np.zeros(len(pdf), dtype=bool)
        last = None
        for i, t in enumerate(ts):
            if last is None or t - last >= gap_us:
                keep[i] = True
                last = t
        return pdf.loc[keep, [f.name for f in schema.fields]]

    return events.groupBy(key_col).applyInPandas(
        lambda key, pdf: _keep(pdf), schema=schema
    )


def twap(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "vq",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average (TWAP) per key over step-function values:
    each observation holds from its timestamp to the NEXT one, so

        twap = Σ v_i · Δt_i / Σ Δt_i       (last observation: no Δt)

    ``value_col`` must be INTEGER-quantized by the caller (the
    engine-exactness discipline: both sums are exact int64, the final
    division is one correctly-rounded IEEE op ⇒ gate-hashable bits —
    a raw double Σ v·Δt would be shuffle-order-dependent). Δt is in
    whole SECONDS (micros DIV 1e6) to keep v·Δt sums far from int64
    overflow at month-long gaps.

    Plan: one lead() window per key ((ts, id) tie-break) + one hash
    aggregate — two narrow key shuffles, pure codegen, the standard
    financial/telemetry downsampling primitive.

    Returns (key, n_obs, twap:double); keys with fewer than 2
    observations yield NULL twap (zero total duration).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    tu = _epoch_micros(F.col(ts_col))
    d = events.select(
        F.col(key_col),
        F.col(value_col).cast("bigint").alias("_v"),
        ((F.lead(tu).over(w) - tu) / F.lit(1_000_000)).cast("bigint").alias("_dt"),
    )
    return d.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        (
            F.sum(F.col("_v") * F.col("_dt")).cast("double")
            / F.sum("_dt").cast("double")
        ).alias("twap"),
    )


def scd2_build(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    tracked_cols: list[str],
    id_col: str | None = None,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 table from a change
    event stream: one validity interval per run of unchanged tracked
    values per key —

        (key, tracked..., valid_from, valid_to, is_current)

    with ``valid_to`` = the next CHANGE's timestamp (half-open
    [from, to) intervals that tile each key's history) and NULL on the
    current row. Consecutive events whose tracked columns are all
    unchanged are collapsed into the earlier row's interval — the
    dimension-table build step of a warehouse ingest, and the
    entity-history primitive for an event log at scale.

    Change detection compares each tracked column to its lag() with
    null-safe equality (a NULL -> value transition IS a change).
    Ordering per key is (ts, id_col) — pass ``id_col`` whenever
    (key, ts) is not unique, or runs are nondeterministic.

    Plan: ONE key shuffle — both windows (lag for change flags, lead
    for interval close) share the same partitioning/ordering so
    Catalyst plans a single Exchange; everything else is codegen.
    """
    order = [F.col(ts_col)] + ([F.col(id_col)] if id_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = F.lit(False)
    for c in tracked_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    flagged = events.select(
        key_col,
        ts_col,
        *tracked_cols,
        *( [id_col] if id_col else [] ),
        (F.lag(ts_col).over(w).isNull() | changed).alias("_chg"),
    )
    runs = flagged.where(F.col("_chg"))
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return runs.select(
        key_col,
        *tracked_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def fill_forward(
    grid: DataFrame,
    key_col: str,
    order_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Carry the last non-NULL observation forward along ``order_col``
    within each key — the imputation companion to :func:`resample`'s
    gap rows (a missing bucket inherits the prior bucket's value, the
    step-function reading ``twap`` also assumes).

    ONE key shuffle (a single window partitioning serves every value
    column); leading NULLs (no prior observation) stay NULL.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.withColumns(
        {c: F.last(c, ignorenulls=True).over(w) for c in value_cols}
    )


def fill_interpolate(
    grid: DataFrame,
    key_col: str,
    order_col: str,
    val_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Linear-interpolation imputation — the two-sided companion to
    :func:`fill_forward`'s step function: a NULL observation takes the
    straight line between its nearest non-NULL neighbors,

        v = prev + (next - prev) * (t - t_prev) / (t_next - t_prev)

    with ``order_col`` numeric (exact ints — the resample grid's epoch
    keys). Rows before the first or after the last observation stay
    NULL (compose with fill_forward for the edges). The interpolation
    is ONE fixed chain of IEEE ops on exact integers — bit-identical
    across engines, gate-hashable.

    ONE key shuffle: the backward- and forward-looking windows share
    the same partitioning, so both carries ride a single Exchange.
    """
    out_col = out_col or val_col
    cand = F.when(
        F.col(val_col).isNotNull(),
        F.struct(F.col(order_col).alias("t"), F.col(val_col).alias("v")),
    )
    wb = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev = F.last(cand, ignorenulls=True).over(wb)
    nxt = F.first(cand, ignorenulls=True).over(wf)
    interp = prev["v"].cast("double") + (
        nxt["v"] - prev["v"]
    ).cast("double") * (
        (F.col(order_col) - prev["t"]).cast("double")
        / (nxt["t"] - prev["t"]).cast("double")
    )
    filled = (
        F.when(F.col(val_col).isNotNull(), F.col(val_col).cast("double"))
        .when(prev.isNotNull() & nxt.isNotNull(), interp)
        .otherwise(F.lit(None).cast("double"))
    )
    return grid.withColumn(out_col, filled)


def lttb_downsample(
    series: DataFrame,
    k: int,
    key_col: str = "series_id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013)
    — THE time-series decimation that keeps visual shape (peaks,
    troughs, slope changes) where uniform striding flattens them: per
    series, keep the first and last points, split the interior into
    k-2 equal buckets, and from each bucket keep the point forming the
    largest triangle with the PREVIOUSLY KEPT point and the NEXT
    bucket's centroid.

    Exact-integer spec (gate-replayable): x and y must be integral;
    the next bucket's centroid (sx/m, sy/m) is never divided —
    the doubled triangle area is multiplied through by m, so the
    argmax compares A = |(x_p*m - sx)*(y_c - y_p) - (x_p - x_c)*
    (sy - y_p*m)| in pure int64; ties keep the EARLIEST point. The
    selection is therefore a pure function of the ordered series —
    partitioning/engine invariant.

    Plan: one keyed shuffle into an Arrow-batched ``applyInPandas``
    kernel (the debounce/FFD sequential-per-group class: each bucket's
    choice depends on the previous selection, so the cross-bucket scan
    is inherently ordered; within a bucket the candidate areas are one
    vectorized numpy expression). Series are independent — the 100-TB
    posture is millions of series in parallel, and k rows per series
    come back out.

    Returns (key, x, y) of the kept points; series with <= k points
    pass through whole.
    """
    import numpy as np
    import pandas as pd

    if k < 3:
        raise ValueError(f"k must be >= 3, got {k}")

    def dsample(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([x_col, y_col], kind="mergesort")
        n = len(pdf)
        if n <= k:
            return pdf[[key_col, x_col, y_col]]
        xs = pdf[x_col].to_numpy(dtype=np.int64)
        ys = pdf[y_col].to_numpy(dtype=np.int64)
        # bucket b (0-based, b in [0, k-2)) spans interior indices
        # [1 + b*(n-2)//(k-2), 1 + (b+1)*(n-2)//(k-2)) — exact integer
        # DIV edges (the concat_chunk_pack chunking discipline)
        edges = [1 + (b * (n - 2)) // (k - 2) for b in range(k - 1)]
        keep = [0]
        prev = 0
        for b in range(k - 2):
            lo, hi = edges[b], edges[b + 1]
            if lo >= hi:
                continue
            if b + 1 < k - 2:
                nlo, nhi = edges[b + 1], edges[b + 2]
                if nlo >= nhi:
                    nlo, nhi = n - 1, n
            else:
                nlo, nhi = n - 1, n
            m = nhi - nlo
            sx = int(xs[nlo:nhi].sum())
            sy = int(ys[nlo:nhi].sum())
            xp, yp = int(xs[prev]), int(ys[prev])
            a = np.abs(
                (xp * m - sx) * (ys[lo:hi] - yp)
                - (xp - xs[lo:hi]) * (sy - yp * m)
            )
            prev = lo + int(np.argmax(a))  # argmax ties -> earliest
            keep.append(prev)
        keep.append(n - 1)
        return pdf.iloc[keep][[key_col, x_col, y_col]]

    base = series.select(
        F.col(key_col).alias(key_col),
        F.col(x_col).cast("bigint").alias(x_col),
        F.col(y_col).cast("bigint").alias(y_col),
    )
    from pyspark.sql.types import StructType

    out_schema = StructType(
        [base.schema[key_col], base.schema[x_col], base.schema[y_col]]
    )
    return base.groupBy(key_col).applyInPandas(dsample, out_schema)


def max_concurrency(
    intervals: DataFrame,
    key_col: str = "key",
    start_col: str = "start_us",
    end_col: str = "end_us",
) -> DataFrame:
    """Peak concurrent intervals per key — the capacity-planning
    staple (max simultaneous sessions / connections / jobs): scatter
    each HALF-OPEN [start, end) interval into (+1 at start, -1 at
    end) deltas, running-sum per key in (time, delta) order — the -1
    sorts first at equal timestamps, so back-to-back intervals never
    double-count — and keep the maximum with the EARLIEST time it is
    reached (deterministic).

    Returns ``(key, max_concurrent:bigint, peak_us:bigint)``; empty
    and end<=start intervals are rejected loudly (a silent negative-
    length interval corrupts the running sum with no error anywhere
    downstream).

    Plan: one 2x Generate scatter, ONE window shuffle (the running
    sum and the argmin share the key partition), one aggregate. All
    native; events per key bound the window sort, the usual
    sessionize-class skew posture.
    """
    from pyspark.sql import Window

    s, e = F.col(start_col).cast("bigint"), F.col(end_col).cast("bigint")
    base = intervals.select(
        F.col(key_col).alias("_k"), s.alias("_s"), e.alias("_e")
    ).where(
        F.when(F.col("_s") < F.col("_e"), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("max_concurrency: interval with start >= end ("),
                    F.col("_s").cast("string"), F.lit(", "),
                    F.col("_e").cast("string"), F.lit(")"),
                )
            )
        )
    )
    deltas = base.select(
        "_k",
        F.explode(
            F.array(
                F.struct(F.col("_s").alias("t"), F.lit(1).alias("d")),
                F.struct(F.col("_e").alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("_x"),
    ).select("_k", F.col("_x.t").alias("_t"), F.col("_x.d").alias("_d"))
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = deltas.select(
        "_k", "_t", F.sum("_d").over(w).alias("_run")
    )
    return (
        run.groupBy("_k")
        .agg(
            F.max(
                F.struct(F.col("_run").alias("c"), (-F.col("_t")).alias("negt"))
            ).alias("_b")
        )
        .select(
            F.col("_k").alias(key_col),
            F.col("_b.c").alias("max_concurrent"),
            (-F.col("_b.negt")).alias("peak_us"),
        )
    )


def ewma(
    series: DataFrame,
    alpha_num: int,
    alpha_den: int,
    key_col: str = "key",
    seq_col: str = "seq",
    val_col: str = "val",
    scale: int = 1_000_000,
) -> DataFrame:
    """Exponentially-weighted moving average per key — the smoothing
    pass behind rate dashboards, anomaly baselines and trend features.

    INTEGER recurrence spec (gate-hashable where float EWMA's
    associativity-free product chain drifts by partitioning):

        y_1 = x_1 * scale
        y_i = (alpha_num * x_i * scale + (alpha_den - alpha_num) * y_{i-1})
              DIV alpha_den          (integer division)

    with alpha = alpha_num/alpha_den in (0, 1]. Spec contract: values
    are NON-NEGATIVE int64 (so DIV's floor-vs-truncate ambiguity never
    arises — Spark DIV truncates toward zero, Python // floors; on
    nonnegative operands they are the same function, enforced here) and
    ``seq`` is unique per key (the total order). The quantization error
    vs float EWMA is < 1/scale per step.

    Returns the input columns plus ``ewma_q`` (int64, scaled) and
    ``ewma`` (double, ONE division by scale).

    Plan: one keyed shuffle into applyInPandas — the documented
    sequential-per-group case (a linear recurrence with per-step
    integer floor has no window/closed form; same class as debounce /
    stay_points). Parallel across keys; per-key cost O(n). Oracle =
    a DuckDB WITH RECURSIVE chain evaluating the identical recurrence
    (the engine's own recursion — independent plumbing).
    """
    import numpy as np
    import pandas as pd

    if not (0 < alpha_num <= alpha_den):
        raise ValueError(f"need 0 < alpha_num <= alpha_den, got {alpha_num}/{alpha_den}")
    num, den, sc = int(alpha_num), int(alpha_den), int(scale)
    schema = f"{key_col} long, {seq_col} long, {val_col} long, ewma_q long, ewma double"

    def _ew(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq_col, kind="mergesort")
        x = pdf[val_col].to_numpy(dtype=np.int64)
        if len(x) and x.min() < 0:
            raise ValueError("ewma spec requires non-negative values")
        y = 0
        out = []
        for i, xi in enumerate(x):
            xi = int(xi)
            y = xi * sc if i == 0 else (num * xi * sc + (den - num) * y) // den
            out.append(y)
        return pd.DataFrame(
            {
                key_col: pdf[key_col].to_numpy(dtype=np.int64),
                seq_col: pdf[seq_col].to_numpy(dtype=np.int64),
                val_col: x,
                "ewma_q": np.array(out, dtype=np.int64),
                "ewma": np.array(out, dtype=np.float64) / float(sc),
            }
        )

    return (
        series.select(key_col, seq_col, val_col)
        .groupBy(key_col)
        .applyInPandas(_ew, schema)
    )


def acf(
    series: DataFrame,
    max_lag: int,
    key_col: str = "key",
    order_col: str = "seq",
    val_col: str = "val",
    tiebreak_col: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """Sample autocorrelation function per key at lags 1..max_lag —
    the seasonality/periodicity probe behind time-series feature
    pipelines (lag picking for forecasting, duplicate-telemetry
    detection, sensor health).

    EXACT-INTEGER discipline (the stats.py pearson pattern applied to
    lagged pairs): values quantize to ``q = floor(val * scale + 0.5)``
    int64; for each lag h the pairs are (q_t, q_{t+h}) over the per-key
    order; all six pair sums (n, Sx, Sy, Sxy, Sxx, Syy) are exact int64
    aggregates, the Pearson numerator/denominator terms

        num = n*Sxy - Sx*Sy,  d1 = n*Sxx - Sx^2,  d2 = n*Syy - Sy^2

    are exact int64, and the ONLY floating-point is the final fixed
    chain ``r = num / sqrt(double(d1) * double(d2))`` — cast, multiply,
    sqrt, divide, each correctly rounded, so every engine that
    implements IEEE-754 produces the same bits. Overflow contract:
    |q| < 2^19 and per-key n < 2^24 keep every product below 2^62.

    Plan: ONE keyed shuffle total. The per-key sequence is a
    row_number window (order_col, tiebreak_col); each of the max_lag
    lagged values rides the SAME window spec (Catalyst evaluates all
    lags in one Window node over one sort), the (lag, x, y) triples
    explode map-side, and the groupBy(key, lag) partial-aggregates
    before the exchange — no self-join, no second shuffle on a
    different key. max_lag rows out per key. For mega-keys whose sort
    exceeds one task, assign seq with the two-pass prefix-sum rank
    discipline (layout.str_partition) first and pass it as order_col.

    r is NULL where a constant series makes d1*d2 zero (undefined).
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    from pyspark.sql import Window

    order = [F.col(order_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    qv = F.floor(F.col(val_col) * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
    base = series.select(F.col(key_col).alias("key"), *order, qv.alias("qy"))
    # every lag over the one window spec -> a single Window node; the
    # Generate must live in a SEPARATE select (Catalyst rejects window
    # expressions inside a generator's input)
    lagged = base.select(
        "key",
        F.col("qy").alias("y"),
        *[F.lag("qy", h).over(w).alias(f"_l{h}") for h in range(1, max_lag + 1)],
    )
    pairs = lagged.select(
        "key",
        F.posexplode(
            F.array(*[F.col(f"_l{h}") for h in range(1, max_lag + 1)])
        ).alias("lag0", "x"),
        "y",
    ).select(
        "key",
        (F.col("lag0") + 1).cast("int").alias("lag"),
        "x",
        "y",
    ).filter(F.col("x").isNotNull())
    agg = pairs.groupBy("key", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    d1 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.select(
        "key",
        "lag",
        "n",
        num.alias("num"),
        d1.alias("d1"),
        d2.alias("d2"),
        F.when(
            (d1 > 0) & (d2 > 0),
            num.cast("double") / F.sqrt(d1.cast("double") * d2.cast("double")),
        ).alias("r"),
    )


def ccf(
    series: DataFrame,
    max_lag: int,
    key_col: str = "key",
    order_col: str = "seq",
    x_col: str = "x",
    y_col: str = "y",
    tiebreak_col: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """Sample cross-correlation between two aligned series per key at
    lags -max_lag..max_lag — the lead/lag detector (does x move before
    y?) behind causal feature screening, sensor alignment and
    upstream/downstream telemetry attribution. Lag h pairs
    ``(x_t, y_{t+h})``: a peak at POSITIVE h means x LEADS y by h.

    Same EXACT-INTEGER discipline as :func:`acf` (which is
    ``ccf(x=x, y=x)`` restricted to h >= 1): both values quantize to
    int64, the six pair sums are exact, num/d1/d2 are exact int64, and
    the only floating-point is the final fixed cast/mul/sqrt/div chain
    — r is gate-hashable. r is NULL where either side is constant over
    the overlap. Overflow contract: |q| < 2^19, per-key n < 2^24.

    Plan: ONE keyed shuffle — each of the 2*max_lag+1 shifted y values
    rides the same window spec (one Window node, one per-key sort; a
    negative shift is lag(-h) = lead), the (lag, x, y) triples explode
    map-side and partial-aggregate before the exchange. No self-join.
    """
    if max_lag < 0:
        raise ValueError(f"max_lag must be >= 0, got {max_lag}")
    from pyspark.sql import Window

    order = [F.col(order_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    qx = F.floor(F.col(x_col) * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
    qy = F.floor(F.col(y_col) * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
    base = series.select(
        F.col(key_col).alias("key"), *order, qx.alias("qx"), qy.alias("qy")
    )
    lags = list(range(-max_lag, max_lag + 1))
    shifted = base.select(
        "key",
        F.col("qx").alias("x"),
        # y_{t+h} = lead(qy, h) = lag(qy, -h); all on ONE window spec
        *[F.lag("qy", -h).over(w).alias(f"_s{h + max_lag}") for h in lags],
    )
    pairs = (
        shifted.select(
            "key",
            F.posexplode(
                F.array(*[F.col(f"_s{h + max_lag}") for h in lags])
            ).alias("lag0", "y"),
            "x",
        )
        .select(
            "key",
            (F.col("lag0") - max_lag).cast("int").alias("lag"),
            "x",
            "y",
        )
        .filter(F.col("y").isNotNull())
    )
    agg = pairs.groupBy("key", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    d1 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.select(
        "key",
        "lag",
        "n",
        num.alias("num"),
        d1.alias("d1"),
        d2.alias("d2"),
        F.when(
            (d1 > 0) & (d2 > 0),
            num.cast("double") / F.sqrt(d1.cast("double") * d2.cast("double")),
        ).alias("r"),
    )


def seasonal_decompose(
    series: DataFrame,
    period: int,
    key_col: str = "key",
    order_col: str = "seq",
    val_col: str = "val",
    tiebreak_col: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """Classical additive decomposition per key: value = trend +
    seasonal + residual — the first pass of any seasonality analysis
    (deseasonalized KPIs, holiday-effect isolation, forecast
    baselining).

    EXACT-INTEGER spec (all in quantized units q = floor(val*scale +
    0.5); divide by ``scale`` outside if real units are wanted):

      - trend is the centered moving average over one period: for odd
        p a plain p-window, for even p the standard half-weighted
        (2p)-denominator window (ends weight 1, interior weight 2).
        The integer numerator ``trend2p`` (denominator 2p in BOTH
        cases — odd windows carry weight 2 throughout) is exact int64;
        NULL where the window is incomplete (first/last h rows).
      - detrended numerator ``detr2p = 2p*q - trend2p`` — exact int64.
      - seasonal index per (key, phase = position mod p): the mean of
        detr2p kept as the exact pair ``(s_num, s_cnt)``.
      - the ONLY floats are three fixed chains on exact ints:
        ``trend = double(trend2p)/double(2p)``,
        ``seasonal = double(s_num)/double(s_cnt*2p)``,
        ``residual = (double(q) - trend) - seasonal`` — every op
        correctly rounded in a pinned order, so the doubles are
        gate-hashable.

    Position is assigned internally (row_number over order_col,
    tiebreak_col, 0-based) so phases are gap-free regardless of the
    order column's values.

    Returns ``(key, seq, phase, q, trend2p, s_num, s_cnt, trend,
    seasonal, residual)``.

    Plan: ONE keyed shuffle — the ranged window, the lag/lead ends and
    the row_number all ride one per-key sort; the phase aggregate is a
    p-bounded partial agg and joins back broadcast-small. For
    mega-keys assign positions with the two-pass prefix-sum rank
    discipline first.
    """
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    from pyspark.sql import Window

    p = int(period)
    h = p // 2
    even = p % 2 == 0
    order = [F.col(order_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    wo = Window.partitionBy(key_col).orderBy(*order)
    wr = wo.rowsBetween(-h, h)
    qv = F.floor(F.col(val_col) * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
    base = series.select(
        F.col(key_col).alias("key"), *order, qv.alias("q")
    ).select(
        "key",
        (F.row_number().over(wo) - F.lit(1)).cast("bigint").alias("seq"),
        "q",
        F.sum("q").over(wr).alias("_s"),
        F.count(F.lit(1)).over(wr).alias("_cnt"),
        F.lag("q", h).over(wo).alias("_lo"),
        F.lag("q", -h).over(wo).alias("_hi"),
    )
    full = F.col("_cnt") == F.lit(2 * h + 1)
    if even:
        trend2p = F.when(full, F.lit(2) * F.col("_s") - F.col("_lo") - F.col("_hi"))
    else:
        trend2p = F.when(full, F.lit(2) * F.col("_s"))
    rows = base.select(
        "key",
        "seq",
        F.pmod(F.col("seq"), F.lit(p)).alias("phase"),
        "q",
        trend2p.alias("trend2p"),
    ).withColumn("detr2p", F.lit(2 * p) * F.col("q") - F.col("trend2p"))
    seas = rows.groupBy("key", "phase").agg(
        F.sum("detr2p").alias("s_num"),
        F.count("detr2p").alias("s_cnt"),
    )
    out = rows.join(seas, ["key", "phase"])
    trend = F.col("trend2p").cast("double") / F.lit(float(2 * p))
    seasonal = F.col("s_num").cast("double") / (
        F.col("s_cnt") * F.lit(2 * p)
    ).cast("double")
    return out.select(
        "key",
        "seq",
        "phase",
        "q",
        "trend2p",
        "s_num",
        "s_cnt",
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        ((F.col("q").cast("double") - trend) - seasonal).alias("residual"),
    )


def ohlc_resample(
    events: DataFrame,
    bucket: str,
    key_col: str = "key",
    ts_col: str = "ts",
    val_col: str = "val",
    tiebreak_col: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """OHLC (open/high/low/close) bar resampling per key — the
    canonical telemetry/market downsample: one row per (key, time
    bucket) carrying the first, max, min and last quantized value plus
    the row count and exact value sum.

    EXACT-INTEGER spec: values quantize to ``q = floor(val*scale +
    0.5)`` int64; open/close are min/max over ``struct(ts[, tiebreak],
    q)`` (the idempotent argmin/argmax aggregate — deterministic when
    (ts, tiebreak) is unique per key, which the caller owes exactly as
    in asof_join), high/low plain min/max, ``sum_q`` the order-free
    exact sum. No floats anywhere — every column gate-hashable.

    ``bucket`` is a duration string for ``F.window`` (e.g. '1 hour').

    Returns ``(key, bucket_start, open, high, low, close, n, sum_q)``.

    Plan: ONE hash aggregate on (key, window) — min/max/sum all
    partial-aggregate map-side, one narrow shuffle; the streaming twin
    is the same expression under windowed_counts' state-store merge.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    qv = F.floor(F.col(val_col) * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
    tagged = events.select(
        F.col(key_col).alias("key"),
        F.window(F.col(ts_col), bucket).alias("_w"),
        F.struct(*order, qv.alias("q")).alias("_o"),
        qv.alias("q"),
    )
    agg = tagged.groupBy("key", "_w").agg(
        F.min("_o").alias("_first"),
        F.max("_o").alias("_last"),
        F.max("q").alias("high"),
        F.min("q").alias("low"),
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sum_q"),
    )
    return agg.select(
        "key",
        F.col("_w.start").alias("bucket_start"),
        F.col("_first.q").alias("open"),
        "high",
        "low",
        F.col("_last.q").alias("close"),
        "n",
        "sum_q",
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Kaplan–Meier survival curve per group — THE nonparametric
    time-to-event estimator (churn, hardware failure, time-to-
    conversion) under right censoring: at each distinct event time t,

        S(t) = prod_{t_i <= t} (1 - d_i / n_i)

    with d_i = events at t_i and n_i = subjects still at risk
    (duration >= t_i; censored rows leave the risk set without
    counting as events).

    EXACTNESS discipline (the bigram_lm micro-nat posture): d_i and
    n_i are exact int64 (risk set via a cumulative window over
    distinct durations — no per-row scan), each factor contributes
    ``q(ln((n_i - d_i)/n_i))`` micro-nats under the HALF-UP-away-from-
    zero rule, and the survival log is the exact int64 CUMULATIVE SUM
    ``log_micro`` (order-pinned by the time window — partitioning-
    independent); survival is reported PPM-QUANTIZED —
    ``survival_ppm = floor(exp(log_micro/1e6) * 1e6 + 0.5)`` — because
    exp() is only ~1-ulp accurate across engines (not correctly
    rounded like +,*,/,sqrt); ppm rounding absorbs that drift outside
    a measure-zero band, keeping the column gate-hashable. When a
    group's last time has d = n (everyone dies), survival_ppm is
    exactly 0 and log_micro NULL. ``event_col`` must be 0/1 (WHERE
    guard).

    Returns one row per (group, distinct duration with d > 0 or
    censoring): ``(group..., t, n_risk, d, c, log_micro,
    survival_ppm)`` where c = censored at t.

    Plan: one distinct-(group, t) hash aggregate + one per-group
    cumulative window (distinct times, not rows) — the ks_test scale
    class.
    """
    g = list(group_cols or [])
    ev = F.col(event_col).cast("bigint")
    df = df.where(
        F.when(ev.isin(0, 1), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"kaplan_meier: {event_col} must be 0/1, got "),
                    F.col(event_col).cast("string"),
                )
            )
        )
    )
    from pyspark.sql import Window

    per = df.groupBy(*g, F.col(duration_col).alias("t")).agg(
        F.sum(ev).alias("d"),
        F.sum(F.lit(1) - ev).alias("c"),
    )
    part = [F.col(c) for c in g] if g else [F.lit(0)]
    w_after = (
        Window.partitionBy(*part)
        .orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w_cum = (
        Window.partitionBy(*part)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cnt = F.col("d") + F.col("c")
    risk = per.select(
        *g, "t", "d", "c", F.sum(cnt).over(w_after).alias("n_risk")
    )
    ln_term = F.log(
        (F.col("n_risk") - F.col("d")).cast("double")
        / F.col("n_risk").cast("double")
    )
    q = (
        F.when(F.col("d") == 0, F.lit(0))
        .when(
            ln_term >= 0, F.floor(ln_term * 1e6 + F.lit(0.5))
        )  # ln <= 0 always here; kept for spec symmetry
        .otherwise(-F.floor(-ln_term * 1e6 + F.lit(0.5)))
        .cast("bigint")
    )
    # d == n_risk => factor 0 => survival exactly 0 from here on
    dead = F.col("d") == F.col("n_risk")
    out = risk.select(
        *g,
        "t",
        "n_risk",
        "d",
        "c",
        F.when(dead, F.lit(None)).otherwise(q).alias("_q"),
    ).select(
        *g,
        "t",
        "n_risk",
        "d",
        "c",
        F.sum("_q").over(w_cum).alias("log_micro"),
        F.max(dead.cast("int")).over(w_cum).alias("_dead"),
    )
    return out.select(
        *g,
        "t",
        "n_risk",
        "d",
        "c",
        F.when(F.col("_dead") == 1, F.lit(None)).otherwise(
            F.col("log_micro")
        ).alias("log_micro"),
        F.when(F.col("_dead") == 1, F.lit(0).cast("bigint")).otherwise(
            F.floor(
                F.exp(F.col("log_micro").cast("double") / F.lit(1e6)) * F.lit(1e6)
                + F.lit(0.5)
            ).cast("bigint")
        ).alias("survival_ppm"),
    )


def holt_linear(
    series: DataFrame,
    alpha_num: int,
    alpha_den: int,
    beta_num: int,
    beta_den: int,
    key_col: str = "key",
    seq_col: str = "seq",
    val_col: str = "val",
    scale: int = 1_000_000,
) -> DataFrame:
    """Holt's linear-trend double exponential smoothing per key — the
    trend-aware sibling of :func:`ewma` (level + slope, one-step
    forecast = level + trend).

    INTEGER recurrence spec, TRUNCATING division (tdiv = toward zero —
    the trend term goes negative, where Python ``//`` floors but
    DuckDB ``//`` truncates; the spec pins truncation and the Python
    kernel implements it explicitly):

        l_1 = x_1·scale,  b_1 = 0
        l_i = tdiv(αn·x_i·scale + (αd−αn)·(l_{i−1}+b_{i−1}), αd)
        b_i = tdiv(βn·(l_i − l_{i−1}) + (βd−βn)·b_{i−1}, βd)

    Values must be NON-NEGATIVE int64 and ``seq`` unique per key.
    Returns input columns + ``level_q, trend_q, forecast_q`` (int64,
    scaled; forecast_q = level_q + trend_q) and ``level, trend``
    (doubles, ONE division each).

    Plan: one keyed shuffle into applyInPandas (the ewma/debounce
    sequential-recurrence class; parallel across keys). Oracle = a
    DuckDB WITH RECURSIVE chain of the identical recurrence.
    """
    import numpy as np
    import pandas as pd

    if not (0 < alpha_num <= alpha_den) or not (0 < beta_num <= beta_den):
        raise ValueError("need 0 < num <= den for alpha and beta")
    an, ad = int(alpha_num), int(alpha_den)
    bn, bd = int(beta_num), int(beta_den)
    sc = int(scale)

    def _tdiv(a: int, d: int) -> int:
        return -((-a) // d) if a < 0 else a // d

    schema = (
        f"{key_col} long, {seq_col} long, {val_col} long, "
        "level_q long, trend_q long, forecast_q long, "
        "level double, trend double"
    )

    def _holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq_col, kind="mergesort")
        x = pdf[val_col].to_numpy(dtype=np.int64)
        if len(x) and x.min() < 0:
            raise ValueError("holt_linear spec requires non-negative values")
        ls, bs = [], []
        l_prev = b_prev = 0
        for i, xi in enumerate(x):
            xi = int(xi)
            if i == 0:
                l_cur, b_cur = xi * sc, 0
            else:
                l_cur = _tdiv(an * xi * sc + (ad - an) * (l_prev + b_prev), ad)
                b_cur = _tdiv(bn * (l_cur - l_prev) + (bd - bn) * b_prev, bd)
            ls.append(l_cur)
            bs.append(b_cur)
            l_prev, b_prev = l_cur, b_cur
        larr = np.array(ls, dtype=np.int64)
        barr = np.array(bs, dtype=np.int64)
        return pd.DataFrame(
            {
                key_col: pdf[key_col].to_numpy(dtype=np.int64),
                seq_col: pdf[seq_col].to_numpy(dtype=np.int64),
                val_col: x,
                "level_q": larr,
                "trend_q": barr,
                "forecast_q": larr + barr,
                "level": larr.astype(np.float64) / float(sc),
                "trend": barr.astype(np.float64) / float(sc),
            }
        )

    return (
        series.select(key_col, seq_col, val_col)
        .groupBy(key_col)
        .applyInPandas(_holt, schema)
    )


def frequent_sequences(
    df: DataFrame,
    key_col: str,
    order_col: str,
    item_col: str,
    k: int = 3,
    min_support: int = 2,
    sep: str = ">",
) -> DataFrame:
    """Frequent CONTIGUOUS k-item episodes across ordered per-key
    event streams (the clickstream-mining staple: which 3-step paths
    recur?): every length-k window of each key's item sequence is a
    candidate; support = number of windows showing it (a key
    repeating a pattern counts each occurrence — the episode-count
    convention; dedup per key upstream if set semantics are wanted).

    Ordering must be total per key (order_col unique per key); items
    join with ``sep`` into the portable episode string. Exact counts,
    no floats anywhere. A NULL item anywhere in a window drops that
    window entirely (every slot must be present — otherwise concat_ws
    would silently shorten a k-episode to k−1 items and miscount);
    items containing ``sep`` raise, since the episode string would be
    ambiguous (pass a sep the item alphabet cannot contain).

    Plan: one per-key window with k−1 lead() columns (ONE shuffle +
    sort), then a map-side-combinable episode aggregate. Returns
    (episode, support) with support >= min_support.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    # sep collision guard: an item containing sep would make two
    # different episodes concat to the same string (ADVICE r3)
    item_s = F.col(item_col).cast("string")
    df = df.where(
        F.when(
            item_s.isNull() | ~item_s.contains(sep), F.lit(True)
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"frequent_sequences: item contains sep {sep!r}: "),
                    item_s,
                )
            )
        )
    )
    w = Window.partitionBy(key_col).orderBy(order_col)
    cols = [F.col(item_col).cast("string")] + [
        F.lead(F.col(item_col).cast("string"), i).over(w)
        for i in range(1, k)
    ]
    ep = F.concat_ws(sep, *cols)
    # EVERY slot must be non-null, not just the last lead: a NULL item
    # mid-window is dropped by concat_ws, which would count a
    # shortened (k-1)-episode as a valid k-episode (ADVICE r3)
    full = cols[0].isNotNull()
    for c in cols[1:]:
        full = full & c.isNotNull()
    rows = df.select(ep.alias("episode"), full.alias("_ok")).where("_ok")
    out = rows.groupBy("episode").agg(F.count(F.lit(1)).alias("support"))
    return out.where(F.col("support") >= min_support)


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Nelson–Aalen cumulative hazard per group — Kaplan–Meier's
    additive sibling (H(t) = Σ_{t_i<=t} d_i/n_i; preferred when
    hazards are compared or modeled):

    Exactness (the kaplan_meier discipline, minus the ln/exp pair —
    hazard needs only a division): d_i and the risk set n_i are exact
    int64; each increment ``q(d_i/n_i)`` is micro-quantized HALF-UP
    (one correctly-rounded division then the floor chain — fully
    deterministic, no ulp caveat), and the cumulative hazard is the
    exact int64 running sum over the per-group time order. Censored
    rows leave the risk set without contributing. event_col must be
    0/1 (WHERE guard).

    Returns (group..., t, n_risk, d, c, hazard_micro, hazard) with
    hazard = hazard_micro / 10^6. Plan: identical to kaplan_meier —
    one distinct-time aggregate + one per-group cumulative window.
    """
    g = list(group_cols or [])
    ev = F.col(event_col).cast("bigint")
    df = df.where(
        F.when(ev.isin(0, 1), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"nelson_aalen: {event_col} must be 0/1, got "),
                    F.col(event_col).cast("string"),
                )
            )
        )
    )
    per = df.groupBy(*g, F.col(duration_col).alias("t")).agg(
        F.sum(ev).alias("d"), F.sum(F.lit(1) - ev).alias("c")
    )
    part = [F.col(c) for c in g] if g else [F.lit(0)]
    w_after = (
        Window.partitionBy(*part)
        .orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w_cum = (
        Window.partitionBy(*part)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = per.select(
        *g,
        "t",
        "d",
        "c",
        F.sum(F.col("d") + F.col("c")).over(w_after).alias("n_risk"),
    )
    term = F.col("d").cast("double") / F.col("n_risk").cast("double")
    q = F.floor(term * F.lit(1_000_000.0) + F.lit(0.5)).cast("bigint")
    out = risk.withColumn("_q", q).select(
        *g,
        "t",
        "n_risk",
        "d",
        "c",
        F.sum("_q").over(w_cum).alias("hazard_micro"),
    )
    return out.withColumn(
        "hazard",
        F.col("hazard_micro").cast("double") / F.lit(1_000_000.0),
    )


def interval_coverage(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key measure of the UNION of half-open integer intervals
    [start, end) (r4) — the sweep-line coverage primitive behind SLA
    uptime, sensor-online time, and merged-busy-window accounting
    (``max_concurrency`` answers "how many at once"; this answers
    "how long was anything active, with overlaps collapsed").

    Exact spec (all int64, no floats): intervals with end <= start
    raise (WHERE-guarded — a silent drop would under-report and a
    negative length would corrupt the sum). Per key, sort by
    (start, end); an interval STARTS a new component when its start is
    > the running max of all previous ends (strict: touching intervals
    [0,5)+[5,9) merge — half-open adjacency). covered_us = sum over
    components of (component max end - component start);
    n_components counts them; n_intervals the inputs.

    Plan: ONE key shuffle + sort feeding two stacked windows (running
    max of lagged end -> component flag -> component id via running
    sum), then one hash aggregate per component and one per key. No
    Python; the per-key state is the window sort, exactly the
    sessionize shape — scales by key cardinality, not interval count.

    Returns ``(key, n_intervals, n_components, covered)``.
    """
    s = F.col(start_col).cast("bigint")
    e = F.col(end_col).cast("bigint")
    d = df.where(
        F.when(e > s, F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("interval_coverage: end <= start for key "),
                    F.col(key_col).cast("string"),
                )
            )
        )
    ).select(F.col(key_col).alias("key"), s.alias("_s"), e.alias("_e"))
    w = Window.partitionBy("key").orderBy("_s", "_e")
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    prev_max_end = F.max("_e").over(w_prev)
    flagged = d.select(
        "key",
        "_s",
        "_e",
        F.when(
            prev_max_end.isNull() | (F.col("_s") > prev_max_end), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("_new"),
    )
    comp = flagged.select(
        "key",
        "_s",
        "_e",
        F.sum("_new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("_cid"),
    )
    per_comp = comp.groupBy("key", "_cid").agg(
        F.min("_s").alias("_cs"),
        F.max("_e").alias("_ce"),
        F.count(F.lit(1)).alias("_n"),
    )
    return per_comp.groupBy("key").agg(
        F.sum("_n").alias("n_intervals"),
        F.count(F.lit(1)).alias("n_components"),
        F.sum(F.col("_ce") - F.col("_cs")).alias("covered"),
    )


def nearest_event_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Absolute-NEAREST temporal join (r4): for every left row, attach
    the right row (same ``on`` key) minimizing |left ts - right ts| —
    the sensor-alignment sibling of ``asof_join`` (asof answers "the
    latest at-or-before"; this answers "the closest in either
    direction": nearest calibration reading, nearest price print).

    Spec: distances compare on exact epoch-micros int64; an exact
    distance tie breaks toward the EARLIER right row (the at-or-before
    candidate). Like asof_join, the right side should be unique per
    (on, ts) — with duplicates the carried row follows asof's
    last-in-input-order caveat. Left rows with no key match keep
    NULLs. Returns the left columns + each right column as
    ``{col}{suffix}`` + ``nearest_ts_us{suffix}`` (epoch micros of the
    matched right row).

    Plan: ONE key shuffle feeding two stacked windows over the same
    union — an ascending pass carrying the latest right at-or-before
    (asof's shape) and a descending pass carrying the earliest right
    at-or-after — then a native per-row pick of the closer candidate.
    No theta join, no per-left-row window over the full right side
    (that |l|x|r|-per-key shape is the oracle, not the engine).
    """
    rc = right_cols or [c for c in right.columns if c not in (on, ts_col)]
    lcols = left.columns
    l2 = left.select(
        *lcols,
        _epoch_micros(F.col(ts_col)).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in rc],
    )
    r2 = right.select(
        F.col(on),
        _epoch_micros(F.col(ts_col)).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_rv_{c}") for c in rc],
    )
    for c in lcols:
        if c != on:
            r2 = r2.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l2.select(*l2.columns).unionByName(r2.select(*l2.columns))
    rt = F.when(F.col("_side") == 0, F.col("_t"))
    # right rows sort BEFORE left rows at equal ts in BOTH passes
    # (side 0 < 1 ascending on _side), so a distance-0 match is seen
    wb = (
        Window.partitionBy(on)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(on)
        .orderBy(F.col("_t").desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumns(
        {
            "_bt": F.last(rt, ignorenulls=True).over(wb),
            "_ft": F.last(rt, ignorenulls=True).over(wf),
            **{
                f"_b_{c}": F.last(f"_rv_{c}", ignorenulls=True).over(wb)
                for c in rc
            },
            **{
                f"_f_{c}": F.last(f"_rv_{c}", ignorenulls=True).over(wf)
                for c in rc
            },
        }
    ).filter(F.col("_side") == 1)
    d_b = F.when(F.col("_bt").isNotNull(), F.col("_t") - F.col("_bt"))
    d_f = F.when(F.col("_ft").isNotNull(), F.col("_ft") - F.col("_t"))
    use_b = (
        F.when(d_f.isNull(), F.lit(True))
        .when(d_b.isNull(), F.lit(False))
        .otherwise(d_b <= d_f)  # tie -> earlier (backward) row
    )
    out = [F.col(c) for c in lcols]
    for c in rc:
        out.append(
            F.when(use_b, F.col(f"_b_{c}"))
            .otherwise(F.col(f"_f_{c}"))
            .alias(f"{c}{suffix}")
        )
    out.append(
        F.when(use_b, F.col("_bt"))
        .otherwise(F.col("_ft"))
        .alias(f"nearest_ts_us{suffix}")
    )
    return carried.select(*out)


def dtw_py(a: list, b: list, band: int | None = None) -> int:
    """Scalar DTW replay (oracle kernel): exact int64 squared-delta
    costs, optional Sakoe-Chiba band (|i-j| <= band)."""
    n, m = len(a), len(b)
    INF = float("inf")
    prev = [INF] * (m + 1)
    prev[0] = 0
    for i in range(1, n + 1):
        cur = [INF] * (m + 1)
        lo = 1 if band is None else max(1, i - band)
        hi = m if band is None else min(m, i + band)
        for j in range(lo, hi + 1):
            d = a[i - 1] - b[j - 1]
            c = d * d
            best = min(prev[j], cur[j - 1], prev[j - 1])
            cur[j] = c + best
        prev = cur
    if prev[m] == INF:
        return -1  # band disconnects the corner (engine drops the pair)
    return int(prev[m])


def dtw_join(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_cost: int | None = None,
    band: int | None = None,
) -> DataFrame:
    """Dynamic-time-warping distance over CANDIDATE series pairs (r4)
    — the elastic 1-D similarity the trajectory family's Frechet/LCSS
    are the 2-D versions of (sensor traces, load curves, price paths
    that run at different speeds). Inputs are int64-quantized value
    arrays (quantize upstream, the module discipline); cost is the
    exact int64 sum of squared deltas along the optimal monotone
    alignment, so every output bit is engine-reproducible.

    The caller supplies the candidate pairs (block upstream on length
    / mean buckets, the jaro_winkler_join posture — DTW has no cheap
    sound cover; LB-pruning lower bounds are future work and would
    compose as an extra WHERE before this operator). ``band`` is the
    Sakoe-Chiba radius (|i-j| <= band; None = full DP); ``max_cost``
    filters the output.

    Plan: ONE Arrow-batched mapInPandas DP (rolling-row numpy kernel,
    O(na*nb) per pair — inherent to exact DTW), map-only over the
    caller's pair frame. Returns pairs.* minus the arrays + ``dtw``.
    """
    import numpy as np
    import pandas as pd

    keep = [c for c in pairs.columns if c not in (a_col, b_col)]
    bd = None if band is None else int(band)

    BIG = np.int64(1) << 62  # unreachable sentinel; adds never wrap

    def _dtw_diag(d2):
        """Exact int64 DTW cost via ANTI-DIAGONAL vectorization (the
        _frechet2_diag scheme with + for max):
        dp[i,j] = d2[i,j] + min(dp[i-1,j], dp[i,j-1], dp[i-1,j-1])."""
        na, nb = d2.shape
        prev2 = prev = None
        o_prev2 = o_prev = 0
        cur = None
        for sdiag in range(na + nb - 1):
            i0 = max(0, sdiag - nb + 1)
            i1 = min(na - 1, sdiag)
            idx = np.arange(i0, i1 + 1)
            vals = d2[idx, sdiag - idx]
            if sdiag == 0:
                cur = vals.copy()
            else:
                def pull(diag, off, want_i, allow):
                    out = np.full(len(idx), BIG, dtype=np.int64)
                    if diag is None:
                        return out
                    pos = want_i - off
                    ok = allow & (pos >= 0) & (pos < len(diag))
                    out[ok] = diag[pos[ok]]
                    return out

                j = sdiag - idx
                up = pull(prev, o_prev, idx - 1, (idx > 0))        # dp[i-1, j]
                lf = pull(prev, o_prev, idx, (j > 0))              # dp[i, j-1]
                dg = pull(prev2, o_prev2, idx - 1, (idx > 0) & (j > 0))
                mn = np.minimum(np.minimum(up, lf), dg)
                cur = np.where(
                    (mn >= BIG) | (vals >= BIG), BIG, vals + mn
                )
            prev2, o_prev2 = prev, o_prev
            prev, o_prev = cur, i0
        return int(cur[-1])

    def refine(it):
        for pdf in it:
            out = {k: [] for k in keep}
            costs = []
            for idx in range(len(pdf)):
                a = np.asarray(pdf[a_col].iloc[idx], dtype=np.int64)
                b = np.asarray(pdf[b_col].iloc[idx], dtype=np.int64)
                n, m = len(a), len(b)
                if n == 0 or m == 0:
                    continue
                # loud-failure guard: (a-b)**2 in int64 silently wraps
                # negative once |a-b| > ~3.037e9 (sqrt(2^63-1)) and the
                # cost would diverge from the dtw_py oracle — quantize
                # coarser upstream instead
                span = max(
                    abs(int(a.max()) - int(b.min())),
                    abs(int(b.max()) - int(a.min())),
                )
                if span > 3_037_000_499:
                    raise ValueError(
                        "dtw_join: |a-b| up to %d exceeds the int64 "
                        "squared-delta bound 3037000499; rescale the "
                        "quantization upstream" % span
                    )
                d2 = (a[:, None] - b[None, :]) ** 2
                if bd is not None:
                    mask = np.abs(
                        np.arange(n)[:, None] - np.arange(m)[None, :]
                    ) > bd
                    d2[mask] = BIG
                c = _dtw_diag(d2)
                if c >= BIG:
                    continue  # band disconnects the corner
                if max_cost is not None and c > max_cost:
                    continue
                for k in keep:
                    out[k].append(pdf[k].iloc[idx])
                costs.append(c)
            out["dtw"] = costs
            if costs:
                yield pd.DataFrame(out)

    schema_parts = [
        f"{f.name} {f.dataType.simpleString()}"
        for f in pairs.schema.fields
        if f.name in keep
    ]
    schema_parts.append("dtw bigint")
    return pairs.mapInPandas(refine, schema=", ".join(schema_parts))


def rle_encode(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Run-length encoding of ordered per-key sequences (r4) — the
    SCD2 change-run machinery exposed generically (state timelines,
    sensor plateaus, label spans): consecutive equal values collapse
    to one row per run.

    Spec: runs break where the value IS DISTINCT FROM the previous
    row's (NULL-safe — a run of NULLs is a run, the SCD2 convention);
    ordering must be total per key (order_col unique). Exact row
    bookkeeping: run_seq is the 1-based run index, run_len the row
    count, start_ord/end_ord the first/last order values.

    Plan: the sessionize shape — ONE key shuffle feeding a lag +
    running-sum window pair, then one (key, run) hash aggregate.
    Decode is ``explode(sequence(1, run_len))`` — exact inverse for
    integer-dense order columns.

    Returns (key, run_seq, value, run_len, start_ord, end_ord).
    """
    w = Window.partitionBy(key_col).orderBy(order_col)
    prev = F.lag(value_col).over(w)
    first_row = F.row_number().over(w) == 1
    new_run = F.when(
        first_row | ~F.col(value_col).eqNullSafe(prev), F.lit(1)
    ).otherwise(F.lit(0))
    flagged = df.select(
        F.col(key_col).alias("key"),
        F.col(order_col).alias("_ord"),
        F.col(value_col).alias("value"),
        new_run.alias("_nw"),
    )
    runs = flagged.select(
        "key",
        "_ord",
        "value",
        F.sum("_nw")
        .over(
            Window.partitionBy("key")
            .orderBy("_ord")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("bigint")
        .alias("run_seq"),
    )
    return runs.groupBy("key", "run_seq").agg(
        F.first("value").alias("value"),
        F.count(F.lit(1)).alias("run_len"),
        F.min("_ord").alias("start_ord"),
        F.max("_ord").alias("end_ord"),
    )


def attribution_last_touch(
    events: DataFrame,
    conv_pred: "F.Column",
    touch_pred: "F.Column",
    lookback: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """LAST-TOUCH attribution (r5) — the marketing/causality staple the
    temporal family lacked (funnel orders steps; asof_join pairs
    streams; this CREDITS conversions): for every conversion event,
    find the most recent touch event of the same user within
    ``lookback`` strictly before-or-at the conversion; conversions
    with no qualifying touch attribute to NULL (organic).

    Ties (same timestamp) break to the LARGEST touch ``id_col``
    (the later-logged touch — deterministic, engine-replayable).

    Plan: the asof_join shape — touches and conversions shuffle once
    on the user key; per user a sort + last-before scan via a
    max(struct) aggregate per conversion (candidate join bounded by
    the lookback interval, the interval_join discipline). Returns
    (conversion id/ts/user, touch_id, touch_ts — NULLs when organic).
    """
    conv = events.where(conv_pred).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("conv_id"),
        F.col(ts_col).alias("conv_ts"),
    )
    touch = events.where(touch_pred).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("_tid"),
        F.col(ts_col).alias("_tts"),
    )
    j = conv.join(touch, "_u", "left").where(
        F.col("_tts").isNull()
        | (
            (F.col("_tts") <= F.col("conv_ts"))
            & (F.col("_tts") >= F.col("conv_ts") - F.expr(f"INTERVAL {lookback}"))
        )
    )
    best = j.groupBy("_u", "conv_id", "conv_ts").agg(
        F.max(
            F.when(
                F.col("_tts").isNotNull(),
                F.struct(F.col("_tts").alias("ts"), F.col("_tid").alias("id")),
            )
        ).alias("_b")
    )
    # conversions whose every candidate fell outside the window drop
    # out of j entirely — restore them as organic via a left join back
    out = conv.join(
        best.select("conv_id", "_b"), "conv_id", "left"
    )
    return out.select(
        F.col("_u").alias(user_col),
        "conv_id",
        "conv_ts",
        F.col("_b.id").alias("touch_id"),
        F.col("_b.ts").alias("touch_ts"),
    )
