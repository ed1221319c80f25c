"""HMM / Viterbi map matching — tracks onto a road-segment graph.

``snap_to_segments`` (operators/distance.py) answers "nearest segment
per point"; real GPS matching needs the SEQUENCE decoded jointly — a
single noisy fix must not teleport the vehicle onto a parallel street
it immediately leaves (Newson & Krumm 2009). ``map_match`` is the
distributed version of that HMM decode:

1. candidate lattice (all native, the snap_to_segments join shape):
   points explode their 3x3 cell window, segments their bbox cover,
   one cell equi-join, exact point-to-segment distance refine keeps
   every segment within ``radius`` (not just the nearest);
2. ONE applyInPandas stage, grouped by track, runs the Viterbi DP —
   the documented sequential-per-group UDF case (like FFD packing and
   debounce): the recurrence over time steps is inherently ordered,
   but tracks are independent, so the stage is embarrassingly
   parallel across the corpus — the 100-TB posture is "millions of
   tracks x thousands of points", never "one track per cluster".

Exactness contract (what makes the gate hash the output):

- coordinates snap to the micro-degree integer grid; the point-to-
  segment d2 is the same fixed IEEE chain as snap_to_segments
  (products and one correctly-rounded division on int-valued doubles);
- emission cost  = floor(sqrt(d2) + 0.5)            [int64 units]
- transition cost = 0 when staying on the same segment, else
  switch_penalty + floor(sqrt(dmid2) + 0.5) where dmid2 is the squared
  distance between the segments' DOUBLED midpoints (a+b is exact
  int64 — no halving, so no fraction; the doubling is part of the
  spec);
- DP sums are int64 (emissions <= ~2^31, tracks of 10^5 points stay
  < 2^50 — far from overflow); ties pick the smallest segment id at
  every argmin (candidates are sorted by seg id, argmin takes the
  first), so the decode is deterministic across engines, partitions
  and reruns. ``map_match_py`` replays the whole spec in pure Python
  for the gate oracle and property tests.

Points with NO candidate within radius are absent from the output
(same convention as snap_to_segments); the DP bridges across them —
transitions connect consecutive PRESENT points of the track.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import MAX_LEVEL, _quant_col, cell_size_deg, xy_to_cell_col
from .distance import pick_distance_level

__all__ = [
    "map_match",
    "map_match_py",
    "stay_points",
    "stay_points_py",
    "MM_SNAP_SCALE",
]

MM_SNAP_SCALE = 1_000_000.0  # micro-degree grid


def map_match(
    points: DataFrame,
    segments: DataFrame,
    radius: float,
    switch_penalty: int = 2000,
    level: int | None = None,
    track_col: str = "track_id",
    seq_col: str = "seq",
    max_seg_cells: int = 64,
) -> DataFrame:
    """Viterbi-match each track's points onto road segments.

    points:   (track_col, seq_col, lat, lon) — seq orders the track
    segments: (seg_id, alat, alon, blat, blon) — SHORT road edges
              (same max_seg_cells contract as snap_to_segments)
    radius:   candidate search radius in DEGREES
    switch_penalty: integer cost (micro-degree units) added whenever
              consecutive points sit on DIFFERENT segments — the knob
              that keeps one noisy fix from visiting a parallel street

    Returns (track_col, seq_col, seg_id, emit) — the decoded segment
    per matched point and its emission cost in grid units.
    """
    if switch_penalty < 0:
        raise ValueError(f"switch_penalty must be >= 0, got {switch_penalty}")
    if level is None:
        level = pick_distance_level(radius, "euclid2_deg")
    if not 2 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [2, {MAX_LEVEL}], got {level}")
    n = 1 << level
    dlat, dlon = cell_size_deg(level)
    if dlat < radius or dlon < radius:
        raise ValueError(f"level {level} cells are smaller than radius {radius} deg")
    snap = lambda c: F.floor(c * F.lit(MM_SNAP_SCALE) + F.lit(0.5)).cast("long")  # noqa: E731

    window = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    pts = (
        points.select(
            F.col(track_col).alias("_tid"),
            F.col(seq_col).alias("_seq"),
            snap(F.col("lon")).alias("_px"),
            snap(F.col("lat")).alias("_py"),
            _quant_col(F.col("lon"), 180.0, 360.0, level).alias("_x"),
            _quant_col(F.col("lat"), 90.0, 180.0, level).alias("_y"),
        )
        .withColumn("_d", F.explode(window))
        .withColumn("_ny", F.col("_y") + F.col("_d.dy"))
        .where((F.col("_ny") >= 0) & (F.col("_ny") < n))
        .withColumn("_nx", F.pmod(F.col("_x") + F.col("_d.dx"), F.lit(n)))
        .select(
            "_tid", "_seq", "_px", "_py",
            xy_to_cell_col(F.col("_nx"), F.col("_ny"), level).alias("_cell"),
        )
    )

    seg = segments.select(
        F.col("seg_id").alias("_sid"),
        snap(F.col("alon")).alias("_sax"),
        snap(F.col("alat")).alias("_say"),
        snap(F.col("blon")).alias("_sbx"),
        snap(F.col("blat")).alias("_sby"),
        _quant_col(F.least("alon", "blon"), 180.0, 360.0, level).alias("_x0"),
        _quant_col(F.greatest("alon", "blon"), 180.0, 360.0, level).alias("_x1"),
        _quant_col(F.least("alat", "blat"), 90.0, 180.0, level).alias("_y0"),
        _quant_col(F.greatest("alat", "blat"), 90.0, 180.0, level).alias("_y1"),
    )
    fanout = (F.col("_x1") - F.col("_x0") + 1) * (F.col("_y1") - F.col("_y0") + 1)
    # the guard must live in a WHERE — a pruned projection never runs
    seg = seg.where(
        F.when(fanout <= F.lit(int(max_seg_cells)), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("map_match: segment "),
                    F.col("_sid").cast("string"),
                    F.lit(f" covers > {max_seg_cells} cells at level {level}; "
                          "pre-split long segments"),
                )
            )
        )
    )
    seg = (
        seg.withColumn("_sx", F.explode(F.sequence(F.col("_x0"), F.col("_x1"))))
        .withColumn("_sy", F.explode(F.sequence(F.col("_y0"), F.col("_y1"))))
        .select(
            "_sid", "_sax", "_say", "_sbx", "_sby",
            xy_to_cell_col(F.col("_sx"), F.col("_sy"), level).alias("_cell"),
        )
    )

    j = pts.join(seg, "_cell")
    ux = (F.col("_sbx") - F.col("_sax")).cast("double")
    uy = (F.col("_sby") - F.col("_say")).cast("double")
    vx = (F.col("_px") - F.col("_sax")).cast("double")
    vy = (F.col("_py") - F.col("_say")).cast("double")
    wx = (F.col("_px") - F.col("_sbx")).cast("double")
    wy = (F.col("_py") - F.col("_sby")).cast("double")
    dot = ux * vx + uy * vy
    len2 = ux * ux + uy * uy
    cross = ux * vy - uy * vx
    d2 = (
        F.when((len2 == F.lit(0.0)) | (dot <= F.lit(0.0)), vx * vx + vy * vy)
        .when(dot >= len2, wx * wx + wy * wy)
        .otherwise(cross * cross / len2)
    )
    r_units = float(radius) * MM_SNAP_SCALE
    cand = j.select(
        "_tid",
        "_seq",
        "_sid",
        F.floor(F.sqrt(d2) + F.lit(0.5)).cast("long").alias("_emit"),
        (F.col("_sax") + F.col("_sbx")).alias("_mx2"),
        (F.col("_say") + F.col("_sby")).alias("_my2"),
        d2.alias("_d2"),
    ).where(F.col("_d2") <= F.lit(r_units * r_units))
    # a (point, segment) pair may arrive once per shared cover cell;
    # the kernel dedups (duplicates carry identical emit/mid) — no
    # extra shuffle
    penalty = int(switch_penalty)
    schema = (
        f"{track_col} {points.schema[track_col].dataType.simpleString()}, "
        f"{seq_col} {points.schema[seq_col].dataType.simpleString()}, "
        "seg_id bigint, emit bigint"
    )

    def _decode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop_duplicates(["_seq", "_sid"]).sort_values(["_seq", "_sid"])
        seqs = pdf["_seq"].to_numpy()
        sids = pdf["_sid"].to_numpy(dtype=np.int64)
        emits = pdf["_emit"].to_numpy(dtype=np.int64)
        mx = pdf["_mx2"].to_numpy(dtype=np.int64)
        my = pdf["_my2"].to_numpy(dtype=np.int64)
        tid = pdf["_tid"].iloc[0]
        # slice the lattice into per-seq state blocks
        bounds = np.flatnonzero(np.r_[True, seqs[1:] != seqs[:-1], True])
        steps = [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]
        prev_cost = None
        prev_slice = None
        backs: list[np.ndarray] = []
        for lo, hi in steps:
            e = emits[lo:hi]
            if prev_cost is None:
                cost = e.copy()
                backs.append(np.full(hi - lo, -1, dtype=np.int64))
            else:
                plo, phi = prev_slice
                # subtract in int64 FIRST (exact), convert the diff —
                # the replay does float(pmx - mx), keep the same chain
                dx = (mx[plo:phi, None] - mx[None, lo:hi]).astype(np.float64)
                dy = (my[plo:phi, None] - my[None, lo:hi]).astype(np.float64)
                dmid = np.floor(np.sqrt(dx * dx + dy * dy) + 0.5).astype(np.int64)
                trans = np.where(
                    sids[plo:phi, None] == sids[None, lo:hi],
                    np.int64(0),
                    np.int64(penalty) + dmid,
                )
                total = prev_cost[:, None] + trans
                bp = np.argmin(total, axis=0)  # first minimum = smallest seg id
                cost = total[bp, np.arange(hi - lo)] + e
                backs.append(bp)
            prev_cost = cost
            prev_slice = (lo, hi)
        # backtrack from the best terminal state (first minimum)
        out_seq, out_sid, out_emit = [], [], []
        j_state = int(np.argmin(prev_cost))
        for (lo, hi), bp in zip(reversed(steps), reversed(backs)):
            k = lo + j_state
            out_seq.append(seqs[k])
            out_sid.append(sids[k])
            out_emit.append(emits[k])
            j_state = int(bp[j_state])
        return pd.DataFrame(
            {
                track_col: tid,
                seq_col: list(reversed(out_seq)),
                "seg_id": list(reversed(out_sid)),
                "emit": list(reversed(out_emit)),
            }
        )

    return cand.groupBy("_tid").applyInPandas(_decode, schema)


def map_match_py(
    points: list[tuple],
    segments: list[tuple],
    radius: float,
    switch_penalty: int = 2000,
) -> list[tuple]:
    """Pure-Python replay of the full map_match spec (candidates by
    brute force — the cell join is exact, so the candidate SETS agree
    by construction; the IEEE chains mirror the engine op-for-op).

    points: (track_id, seq, lat, lon); segments: (seg_id, alat, alon,
    blat, blon). Returns sorted (track_id, seq, seg_id, emit).
    """
    S = MM_SNAP_SCALE

    def sn(c: float) -> int:
        return math.floor(c * S + 0.5)

    segs = [
        (sid, sn(alon), sn(alat), sn(blon), sn(blat))
        for sid, alat, alon, blat, blon in segments
    ]
    r2 = (float(radius) * S) ** 2
    tracks: dict = {}
    for tid, seq, lat, lon in points:
        px, py = sn(lon), sn(lat)
        cands = []
        for sid, sax, say, sbx, sby in segs:
            ux, uy = float(sbx - sax), float(sby - say)
            vx, vy = float(px - sax), float(py - say)
            wx, wy = float(px - sbx), float(py - sby)
            dot, len2 = ux * vx + uy * vy, ux * ux + uy * uy
            cross = ux * vy - uy * vx
            if len2 == 0.0 or dot <= 0.0:
                d2 = vx * vx + vy * vy
            elif dot >= len2:
                d2 = wx * wx + wy * wy
            else:
                d2 = cross * cross / len2
            if d2 <= r2:
                cands.append(
                    (sid, math.floor(math.sqrt(d2) + 0.5), sax + sbx, say + sby)
                )
        if cands:
            tracks.setdefault(tid, []).append((seq, sorted(cands)))
    out = []
    for tid in tracks:
        steps = sorted(tracks[tid])
        prev = None  # list of (cost, sid, emit, mx2, my2)
        backs = []
        for _, cands in steps:
            if prev is None:
                prev = [(e, sid, e, mx, my) for sid, e, mx, my in cands]
                backs.append([-1] * len(cands))
            else:
                cur, bp = [], []
                for sid, e, mx, my in cands:
                    best, besti = None, -1
                    for i, (pc, psid, _, pmx, pmy) in enumerate(prev):
                        dx, dy = float(pmx - mx), float(pmy - my)
                        dmid = math.floor(math.sqrt(dx * dx + dy * dy) + 0.5)
                        t = 0 if psid == sid else switch_penalty + dmid
                        v = pc + t
                        if best is None or v < best:
                            best, besti = v, i
                    cur.append((best + e, sid, e, mx, my))
                    bp.append(besti)
                prev, backs = cur, backs + [bp]
        j = min(range(len(prev)), key=lambda i: prev[i][0])
        rev = []
        for (seq, cands), bp in zip(reversed(steps), reversed(backs)):
            sid, e, _, _ = cands[j]
            rev.append((tid, seq, sid, e))
            j = bp[j]
        out.extend(reversed(rev))
    return sorted(out)


# ---------------- stay-point detection ----------------


def stay_points(
    points: DataFrame,
    radius: float,
    min_duration_us: int,
    track_col: str = "track_id",
    seq_col: str = "seq",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Dwell detection over GPS tracks (Li et al. 2008 "Mining user
    similarity based on location history", the anchor-window spec): a
    stay point is a maximal run of consecutive points all within
    ``radius`` degrees of the run's FIRST point (the anchor) lasting at
    least ``min_duration_us`` microseconds — home/work/POI visits, the
    trajectory-mining primitive between raw fixes and semantic places.

    The scan is kept-state-dependent (whether a run ends depends on
    where the previous run started), i.e. the same inherently
    sequential-per-group class as temporal.debounce — ONE applyInPandas
    stage grouped by track, embarrassingly parallel across tracks.

    Exactness: coords snap to the micro-degree grid; the window test is
    an INT64 compare d2 <= floor((radius*1e6)^2) (squared snapped
    distance vs squared snapped radius); durations are int64 micros;
    the reported centroid is an integer DIV. Every engine and the pure
    replay (``stay_points_py``) agree on all bits.

    points: (track_col, seq_col, ts_col:int64 micros, lat, lon).
    Returns (track_col, start_seq, end_seq, n_pts, dur_us, cx, cy) —
    cx/cy the integer-DIV centroid in grid units.
    """
    if min_duration_us < 0:
        raise ValueError(f"min_duration_us must be >= 0, got {min_duration_us}")
    r2 = int(math.floor(float(radius) * MM_SNAP_SCALE) ** 2)
    snap = lambda c: F.floor(c * F.lit(MM_SNAP_SCALE) + F.lit(0.5)).cast("long")  # noqa: E731
    base = points.select(
        F.col(track_col).alias("_tid"),
        F.col(seq_col).alias("_seq"),
        F.col(ts_col).cast("long").alias("_ts"),
        snap(F.col("lon")).alias("_x"),
        snap(F.col("lat")).alias("_y"),
    )
    seq_t = points.schema[seq_col].dataType.simpleString()
    tid_t = points.schema[track_col].dataType.simpleString()
    schema = (
        f"{track_col} {tid_t}, start_seq {seq_t}, end_seq {seq_t}, "
        "n_pts bigint, dur_us bigint, cx bigint, cy bigint"
    )
    mdur = int(min_duration_us)

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_seq")
        tid = pdf["_tid"].iloc[0]
        seqs = pdf["_seq"].to_list()
        ts = pdf["_ts"].to_numpy(dtype=np.int64)
        xs = pdf["_x"].to_numpy(dtype=np.int64)
        ys = pdf["_y"].to_numpy(dtype=np.int64)
        n = len(pdf)
        rows = []
        i = 0
        while i < n:
            j = i + 1
            while j < n:
                dx = int(xs[j]) - int(xs[i])
                dy = int(ys[j]) - int(ys[i])
                if dx * dx + dy * dy > r2:
                    break
                j += 1
            # run is [i, j); emit iff it dwells long enough
            if int(ts[j - 1]) - int(ts[i]) >= mdur and j - i >= 2:
                cnt = j - i
                rows.append(
                    (
                        tid,
                        seqs[i],
                        seqs[j - 1],
                        cnt,
                        int(ts[j - 1]) - int(ts[i]),
                        int(xs[i:j].sum()) // cnt,
                        int(ys[i:j].sum()) // cnt,
                    )
                )
                i = j
            else:
                i += 1
        return pd.DataFrame(
            rows,
            columns=[track_col, "start_seq", "end_seq", "n_pts", "dur_us", "cx", "cy"],
        )

    return base.groupBy("_tid").applyInPandas(_scan, schema)


def stay_points_py(
    points: list[tuple], radius: float, min_duration_us: int
) -> list[tuple]:
    """Pure-Python replay of the stay_points spec. points:
    (track_id, seq, ts_us, lat, lon); returns sorted result tuples."""
    r2 = int(math.floor(float(radius) * MM_SNAP_SCALE) ** 2)

    def sn(c: float) -> int:
        return math.floor(c * MM_SNAP_SCALE + 0.5)

    tracks: dict = {}
    for tid, seq, ts, lat, lon in points:
        tracks.setdefault(tid, []).append((seq, int(ts), sn(lon), sn(lat)))
    out = []
    for tid in tracks:
        pts = sorted(tracks[tid])
        n = len(pts)
        i = 0
        while i < n:
            j = i + 1
            while j < n:
                dx = pts[j][2] - pts[i][2]
                dy = pts[j][3] - pts[i][3]
                if dx * dx + dy * dy > r2:
                    break
                j += 1
            if pts[j - 1][1] - pts[i][1] >= min_duration_us and j - i >= 2:
                cnt = j - i
                out.append(
                    (
                        tid,
                        pts[i][0],
                        pts[j - 1][0],
                        cnt,
                        pts[j - 1][1] - pts[i][1],
                        sum(p[2] for p in pts[i:j]) // cnt,
                        sum(p[3] for p in pts[i:j]) // cnt,
                    )
                )
                i = j
            else:
                i += 1
    return sorted(out)


RAD2DEG = 57.29577951308232  # closest float64 to 180/pi — keep literal


def trajectory_kinematics(
    fixes: DataFrame,
    track_col: str = "track_id",
    ts_col: str = "ts",
    lat_col: str = "lat",
    lon_col: str = "lon",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-fix kinematics — the standard trajectory-enrichment pass
    (speed / heading / dwell between consecutive fixes) that precedes
    stay-point detection or map matching.

    For every fix after its track's first, emits:

    - ``dist_m``  bigint — round(haversine meters) to the previous fix
      (METER granularity, the measures.py gate posture: the trig chain
      crosses JVM Math vs libm at ~1 ulp; integer meters absorb it);
    - ``dt_us``   bigint — exact epoch-microsecond delta;
    - ``speed_mps`` double — dist_m * 1e6 / dt_us, a fixed two-op IEEE
      chain on exact integers (NULL when dt_us <= 0: duplicate or
      out-of-order timestamps never divide by zero);
    - ``bearing_deg`` double — initial great-circle bearing from the
      previous fix, normalized to [0, 360) and rounded to 1e-6 deg
      (the ln()/atan2 micro-quantization posture). NULL when
      dist_m = 0: sub-meter jitter has no meaningful heading, and the
      atan2 x-argument's sign is ulp-unstable at zero distance — the
      NULL is the deterministic spec, not a cop-out.

    ``order_cols`` extends the per-track ORDER BY past ``ts_col`` when
    timestamps alone are not a total order (the q_rolling lesson: a
    non-unique frame order hashes differently across engines).

    Plan: ONE window shuffle (partitionBy track, orderBy ts) and a
    native projection — no Python, no join; map-side codegen end to
    end at any corpus size. Tracks are independent; skew = the longest
    single track, the same posture as map_match.
    """
    from pyspark.sql import Window

    from .measures import _hav_m
    from .temporal import _epoch_micros

    w = Window.partitionBy(track_col).orderBy(ts_col, *order_cols)
    la, lo = F.col(lat_col), F.col(lon_col)
    pla = F.lag(lat_col).over(w)
    plo = F.lag(lon_col).over(w)
    base = fixes.select(
        F.col(track_col),
        F.col(ts_col),
        la.alias("_la"),
        lo.alias("_lo"),
        pla.alias("_pla"),
        plo.alias("_plo"),
        (_epoch_micros(F.col(ts_col)) - _epoch_micros(F.lag(ts_col).over(w)))
        .alias("dt_us"),
    ).where(F.col("_pla").isNotNull())
    d2r = F.lit(0.017453292519943295)
    dist_m = F.round(
        _hav_m(F.col("_pla"), F.col("_plo"), F.col("_la"), F.col("_lo"))
    ).cast("bigint")
    dlon = (F.col("_lo") - F.col("_plo")) * d2r
    y = F.sin(dlon) * F.cos(F.col("_la") * d2r)
    x = F.cos(F.col("_pla") * d2r) * F.sin(F.col("_la") * d2r) - F.sin(
        F.col("_pla") * d2r
    ) * F.cos(F.col("_la") * d2r) * F.cos(dlon)
    brg = F.atan2(y, x) * F.lit(RAD2DEG)
    brg = brg - F.lit(360.0) * F.floor(brg / F.lit(360.0))
    out = base.withColumn("dist_m", dist_m).select(
        track_col,
        ts_col,
        "dist_m",
        "dt_us",
        F.when(
            F.col("dt_us") > 0,
            F.col("dist_m").cast("double") * F.lit(1000000.0)
            / F.col("dt_us").cast("double"),
        ).alias("speed_mps"),
        F.when(F.col("dist_m") > 0, F.round(brg, 6)).alias("bearing_deg"),
    )
    return out
