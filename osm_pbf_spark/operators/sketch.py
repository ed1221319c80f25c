"""Cardinality sketches (SURVEY.md §2.6 companion, r3).

``kmv_distinct`` estimates per-group distinct counts with the
K-Minimum-Values sketch (Bar-Yossef et al. 2002 / the theta-sketch
family): hash every value to a uniform point in [0, 1), keep the k
smallest DISTINCT hashes per group; if the k-th smallest is h_k the
unbiased estimate is (k-1) / h_k. Relative error ~ 1/sqrt(k-2).

Unlike ``count_distinct`` (exact, but its distinct shuffle carries
every distinct value) or ``approx_count_distinct`` (HLL — fast but
not independently replayable), KMV here is built for the gate: the
hash is the project-standard deterministic 40-bit md5 prefix
(operators/checksum.py), so DuckDB replays the whole estimator
bit-for-bit and the driver can verify a sketch an independent engine
computed.

Plan shape: one partial-aggregatable distinct on (group, hash) —
map-side combine collapses duplicates before the shuffle — then a
per-group rank window that keeps only k rows per group, then a tiny
final aggregate. The window sort is spillable and sorts only the
DISTINCT hashes of each group; for groups whose distinct count is so
large that even that sort hurts, pre-filter ``hash < t * 2^40`` with
any t safely above k / D_lower — the k minima survive any such cut.

Returns (group..., n_rows, kmv_k, kmv_estimate:double) where
``kmv_estimate`` is EXACT distinct count when a group has fewer than
k distinct hashes (the sketch degenerates to the exact set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "kmv_distinct",
    "kmv_sketch",
    "kmv_set_estimate",
    "count_min",
    "cms_lookup",
    "bloom_build",
    "bloom_probe",
    "bloom_semi_reduce",
    "histogram_fixed",
    "binned_quantiles",
    "hll_sketch",
    "hll_estimate",
    "frequent_items",
    "frequent_items_grouped",
    "ams_f2",
]

_HASH_SPACE = 1 << 40


def _hash40(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 10), 16, 10).cast(
        "bigint"
    )


def _hash40_seeded(col: F.Column, seed: int) -> F.Column:
    """Seeded 40-bit md5 prefix: hash of '<seed>:<value>'."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col.cast("string"))), 1, 10),
        16,
        10,
    ).cast("bigint")


def count_min(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of ``value_col``.

    Returns the sketch TABLE itself — at most ``depth * width`` rows of
    (cms_row:int, cms_bucket:bigint, cms_count:bigint) — not an opaque
    binary blob: every hash is the deterministic seeded 40-bit md5
    prefix mod ``width``, so an independent engine (the DuckDB gate)
    can rebuild the identical sketch from the raw table and a resumed
    job can verify a sketch a previous run persisted.

    Plan shape: one native posexplode Generate (depth rows per input
    row, all hashing in whole-stage codegen) feeding ONE hash aggregate
    whose key space is bounded by depth*width — map-side combine
    collapses each task to <= depth*width partial rows no matter how
    many input rows it scanned, so the single shuffle carries O(tasks *
    depth * width) rows at any corpus size. That partial-agg bound is
    the whole point of sketching at 100 TB: the reduce side never sees
    the raw frequency distribution.

    ``weight_col`` (optional, bigint-castable) turns it into a weighted
    frequency sketch. Estimates are upper bounds: for any item,
    min_i sketch[i][h_i(item)] >= true count, with the classic
    (e/width)-overestimate-at-depth-confidence guarantee.
    """
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col is not None
        else F.lit(1).cast("bigint")
    )
    buckets = F.array(
        *[_hash40_seeded(F.col(value_col), i) % width for i in range(depth)]
    )
    e = df.select(F.posexplode(buckets).alias("cms_row", "cms_bucket"), w.alias("_w"))
    return e.groupBy("cms_row", "cms_bucket").agg(F.sum("_w").alias("cms_count"))


def cms_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query a ``count_min`` sketch for every row of ``probes``.

    ``depth``/``width`` must match the sketch's build parameters (they
    are part of the hash spec, not recoverable from the table). The
    sketch is tiny by construction (<= depth*width rows) so the lookup
    join is a broadcast hash join; absent buckets read as 0.

    Returns probes' columns plus ``cms_estimate`` (bigint, >= the true
    count of ``value_col`` in the sketched table).
    """
    buckets = F.array(
        *[_hash40_seeded(F.col(value_col), i) % width for i in range(depth)]
    )
    keys = [c for c in probes.columns]
    p = probes.select(
        *keys, F.posexplode(buckets).alias("cms_row", "cms_bucket")
    )
    j = p.join(F.broadcast(sketch), ["cms_row", "cms_bucket"], "left")
    return j.groupBy(*keys).agg(
        F.min(F.coalesce(F.col("cms_count"), F.lit(0))).alias("cms_estimate")
    )


def bloom_build(
    df: DataFrame,
    value_col: str,
    n_words: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Bloom filter of ``value_col`` as a TABLE of 32-bit words — the
    membership twin of :func:`count_min` (Bloom 1970): never a false
    negative, tunable false-positive rate ~(1 − e^{−d·n/m})^d with
    m = n_words·32 bits.

    Like every sketch in this module the hashes are deterministic
    seeded 40-bit md5 prefixes, so an independent engine (the DuckDB
    gate) rebuilds the identical words from the raw table, a resumed
    job can verify a persisted filter bit-for-bit, and two filters
    built over different shards MERGE by bit_or-ing words — compute
    once per shard, OR forever, never re-scan.

    Words are 32-bit (bit index 0..31 inside a BIGINT word) so no
    engine has to reason about sign bits or 1<<63 overflow.

    Plan: one native posexplode Generate (depth rows per input, all
    hashing in codegen) into ONE hash aggregate whose keyspace is
    bounded by n_words — map-side combine caps every task's shuffle
    output at n_words rows no matter how many rows it scanned.

    Returns <= n_words rows of (bloom_word:int, bloom_bits:bigint);
    unset words are simply absent.
    """
    if n_words < 1 or depth < 1:
        raise ValueError(f"n_words/depth must be >= 1, got {n_words}/{depth}")
    m = n_words * 32
    pos = F.array(*[_hash40_seeded(F.col(value_col), i) % m for i in range(depth)])
    e = df.select(F.explode(pos).alias("_p"))
    # F.shiftleft takes a literal shift only; the SQL form shifts by a column
    words = e.select(
        (F.col("_p") / 32).cast("bigint").alias("bloom_word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 32 AS INT))").alias("_bit"),
    )
    return words.groupBy("bloom_word").agg(
        F.bit_or("_bit").alias("bloom_bits")
    )


def bloom_probe(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    n_words: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Test every row of ``probes`` against a :func:`bloom_build`
    filter. ``n_words``/``depth`` are part of the hash spec and must
    match the build. The filter is tiny by construction, so the lookup
    is a broadcast join; a probe is a member iff ALL depth bits are
    set (an absent word row means those bits are 0).

    Returns probes' columns plus ``bloom_member:boolean`` — true for
    every value actually inserted (no false negatives, pinned by
    test), possibly true for a bounded fraction of others.
    """
    m = n_words * 32
    pos = F.array(*[_hash40_seeded(F.col(value_col), i) % m for i in range(depth)])
    keys = list(probes.columns)
    p = probes.select(*keys, F.explode(pos).alias("_p")).select(
        *keys,
        (F.col("_p") / 32).cast("bigint").alias("bloom_word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 32 AS INT))").alias("_bit"),
    )
    j = p.join(F.broadcast(sketch), ["bloom_word"], "left")
    hit = (
        F.coalesce(F.col("bloom_bits"), F.lit(0)).bitwiseAND(F.col("_bit")) != 0
    ).cast("int")
    return j.groupBy(*keys).agg((F.min(hit) == 1).alias("bloom_member"))


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """KMV distinct-count estimate of ``value_col`` per group."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    g = [F.col(c) for c in group_cols]
    h = df.select(*g, _hash40(F.col(value_col)).alias("_h"))
    counts = h.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    dh = h.distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    kept = dh.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") <= k)
    sk = kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("kmv_k"),
        F.max("_h").alias("_hk"),
    )
    # n_kept < k -> we saw every distinct hash: exact. Otherwise
    # (k-1) * 2^40 / h_k, one exact-integer division to double.
    est = F.when(F.col("kmv_k") < k, F.col("kmv_k").cast("double")).otherwise(
        F.lit(float((k - 1) * _HASH_SPACE)) / F.col("_hk").cast("double")
    )
    return counts.join(sk, group_cols).select(
        *group_cols, "n_rows", "kmv_k", est.alias("kmv_estimate")
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Materialize the KMV sketch ITSELF per group: the sorted array of
    the k smallest distinct 40-bit hashes — (group..., kmv_k, hashes).

    This is the mergeable form (a theta sketch with fixed k): sketches
    of partitions/tables/days union into the sketch of their union via
    :func:`kmv_set_estimate` WITHOUT rescanning data — the property
    that makes sketching work at 100 TB (compute once per shard, merge
    k-sized states). Same deterministic md5 hash as kmv_distinct, so
    any engine replays it.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = df.select(*[F.col(c) for c in group_cols], _hash40(F.col(value_col)).alias("_h"))
    dh = h.distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    kept = dh.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") <= k)
    return kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("kmv_k"),
        F.sort_array(F.collect_list("_h")).alias("hashes"),
    )


def _kmv_est(arr, k: int):
    """Estimate from a sorted k-min hash array: exact when the sketch
    saw fewer than k distinct hashes, else (k-1) * 2^40 / h_k."""
    return F.when(
        F.size(arr) < k, F.size(arr).cast("double")
    ).otherwise(
        F.lit(float((k - 1) * _HASH_SPACE)) / F.element_at(arr, k).cast("double")
    )


def kmv_set_estimate(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str],
    k: int = 256,
) -> DataFrame:
    """Set-operation estimates from two :func:`kmv_sketch` tables
    (theta-sketch semantics): per group,

        est_union     from the merged sketch (k smallest of Ha ∪ Hb —
                      itself a valid KMV sketch of A ∪ B)
        est_intersect by inclusion-exclusion  est_a + est_b - est_union
        jaccard       est_intersect / est_union

    The merge is pure native array arithmetic on two k-length arrays
    (array_union -> array_sort -> slice) riding ONE group-keyed join —
    no re-scan of either input, which is the entire point: shard
    sketches merge into exact-semantics estimates at any scale.
    Deterministic: same md5 hash space, fixed-order IEEE arithmetic —
    DuckDB replays every bit (q_kmv_setops uses an independent
    window-rank formulation instead of arrays).
    """
    an = a.select(
        *group_cols,
        F.col("hashes").alias("_ha"),
    )
    bn = b.select(*group_cols, F.col("hashes").alias("_hb"))
    j = an.join(bn, group_cols)
    merged = F.slice(F.array_sort(F.array_union(F.col("_ha"), F.col("_hb"))), 1, k)
    est_a = _kmv_est(F.col("_ha"), k)
    est_b = _kmv_est(F.col("_hb"), k)
    est_u = _kmv_est(merged, k)
    est_i = (est_a + est_b) - est_u
    return j.select(
        *group_cols,
        est_a.alias("est_a"),
        est_b.alias("est_b"),
        est_u.alias("est_union"),
        est_i.alias("est_intersect"),
        (est_i / est_u).alias("jaccard_est"),
    )


def bloom_semi_reduce(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    n_words: int = 65536,
    depth: int = 3,
) -> DataFrame:
    """Runtime-filter join reduction: pre-filter ``probe`` rows through
    a Bloom filter of ``build``'s keys BEFORE an expensive join — the
    pattern that turns "shuffle 100 TB of lineitems to join 1 GB of
    selected orders" into "shuffle only the ~matching sliver".
    Spark's own runtime row-group filters stop at the scan; this one
    composes anywhere in a plan (post-UDF, post-union, mid-pipeline).

    SEMANTICS: lossless for the subsequent join. Every probe row whose
    key IS in build survives (a Bloom filter has no false negatives —
    pinned by test); a bounded fraction of non-matching rows also
    survive and are eliminated by the real join. Output schema ==
    probe schema.

    Plan: the <= ``n_words``-row filter table broadcasts; each of the
    ``depth`` probes is a broadcast hash join on the word id followed
    by a native bit test — map-only, no shuffle of the probe side, no
    Python. The default 65536 words (256 KiB of bits) holds ~50k keys
    at depth=3 under 1% false-positive rate; size n_words >= keys/3.
    """
    bk = build_key or probe_key
    sk = bloom_build(build, bk, n_words=n_words, depth=depth)
    m = n_words * 32
    out = probe
    for i in range(depth):
        p = _hash40_seeded(F.col(probe_key), i) % m
        ski = F.broadcast(
            sk.select(
                F.col("bloom_word").alias(f"_bw{i}"),
                F.col("bloom_bits").alias(f"_bb{i}"),
            )
        )
        out = (
            out.withColumn(f"_bp{i}", p)
            .join(ski, (F.col(f"_bp{i}") / 32).cast("bigint") == F.col(f"_bw{i}"), "left")
            .where(
                F.coalesce(F.col(f"_bb{i}"), F.lit(0)).bitwiseAND(
                    F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_bp{i} % 32 AS INT))")
                )
                != 0
            )
            .drop(f"_bp{i}", f"_bw{i}", f"_bb{i}")
        )
    return out


def histogram_fixed(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: int,
    hi: int,
    n_bins: int = 128,
) -> DataFrame:
    """Fixed-range equi-width histogram over an INTEGER column — the
    mergeable distribution sketch beside count_min (frequencies), KMV
    (cardinality), and Bloom (membership): histograms of shards ADD
    (sum counts per bin) into the histogram of the union.

    Bin assignment is exact integer arithmetic, replayable anywhere:

        bin = clamp( (v − lo) · n_bins DIV (hi − lo), 0, n_bins−1 )

    (values outside [lo, hi) clamp into the edge bins, so the sketch
    is total — no dropped rows). Overflow: |v − lo| · n_bins must fit
    int64.

    Plan: ONE hash aggregate whose keyspace is bounded by n_bins per
    group — map-side combine caps every task's shuffle output no
    matter how many rows it scanned (the count_min property).

    Returns (group..., hist_bin:bigint, hist_count:bigint).
    """
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    v = F.col(value_col).cast("bigint")
    # all-integer bin arithmetic (DIV) — no float division anywhere, so
    # any engine replays the exact bin of every row; negative (v-lo)
    # truncates toward 0 but the clamp absorbs the difference
    scaled = df.withColumn("_hraw", (v - F.lit(int(lo))) * F.lit(int(n_bins)))
    raw = F.expr(f"_hraw div {int(hi - lo)}")
    bin_ = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(F.lit(int(n_bins - 1)).cast("bigint"), raw),
    )
    return scaled.groupBy(*group_cols, bin_.alias("hist_bin")).agg(
        F.count(F.lit(1)).alias("hist_count")
    )


def binned_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: int,
    hi: int,
    n_bins: int = 128,
    qs: list[tuple[int, int]] = ((1, 2), (9, 10), (99, 100)),
) -> DataFrame:
    """Approximate per-group quantiles from a :func:`histogram_fixed`
    sketch — bin-resolution accuracy ((hi−lo)/n_bins), but the shuffle
    carries n_bins rows per group instead of every distinct value
    (q_percentiles' exact path), which is the trade you take on a
    100-TB continuous column.

    Quantiles are given as exact fractions (num, den): the selected
    bin is the first with cum_count · den >= num · n, an ALL-INTEGER
    ceil(q·n) comparison — no float boundary anywhere, so any engine
    replays it. The reported estimate is the bin's lower edge
    ``lo + bin·(hi−lo) DIV n_bins`` (int).

    Returns (group..., q_num:int, q_den:int, hist_bin, q_est:bigint).
    """
    h = histogram_fixed(df, value_col, group_cols, lo, hi, n_bins)
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy("hist_bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*[F.col(c) for c in group_cols])
    cum = h.select(
        *group_cols,
        "hist_bin",
        F.sum("hist_count").over(w).alias("_cum"),
        F.sum("hist_count").over(wn).alias("_n"),
    )
    qdf = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(int(a)).alias("q_num"), F.lit(int(b)).alias("q_den")
                )
                for a, b in qs
            ]
        )
    )
    x = cum.select(*group_cols, "hist_bin", "_cum", "_n", qdf.alias("_q")).select(
        *group_cols,
        "hist_bin",
        "_cum",
        "_n",
        F.col("_q.q_num").alias("q_num"),
        F.col("_q.q_den").alias("q_den"),
    )
    hit = x.where(F.col("_cum") * F.col("q_den") >= F.col("q_num") * F.col("_n"))
    first = hit.groupBy(*group_cols, "q_num", "q_den").agg(
        F.min("hist_bin").alias("hist_bin")
    )
    est = F.lit(int(lo)) + F.expr(f"(hist_bin * {int(hi - lo)}) div {int(n_bins)}")
    return first.select(
        *group_cols, "q_num", "q_den", "hist_bin", est.alias("q_est")
    )


# ---------------- HyperLogLog distinct sketch ----------------

# alpha_m bias constants (Flajolet et al. 2007 §4) for the supported
# register counts; p must be a multiple of 4 so the bucket is a whole
# md5 hex prefix (keeps the DuckDB replay a plain substring).
_HLL_ALPHA = {16: 0.673, 256: 0.7213 / (1 + 1.079 / 256.0), 4096: 0.7213 / (1 + 1.079 / 4096.0)}
_HLL_RHO_BITS = 40  # rho read from a 40-bit md5 suffix -> register <= 41


def hll_sketch(
    df: DataFrame,
    value_col: str,
    p: int = 8,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007) — the
    canonical mergeable distinct-count sketch beside KMV (set algebra)
    and CMS/Bloom (frequency/membership).

    Every value hashes to md5('hll:'||v); the first p/4 hex chars pick
    a register (m = 2^p of them), the next 10 hex chars are a 40-bit
    suffix whose leading-zero count sets rho = 41 - bit_length(v40)
    (v40 = 0 caps at 41). The register keeps max(rho). All of it is
    engine-replayable: bit_length is length(bin(v)) in BOTH Spark and
    DuckDB, so the gate rebuilds identical registers from the raw
    table — Spark's own approx_count_distinct is HLL too, but its
    registers are opaque and unverifiable, which is why this exists.

    Plan: one projection (hashing in codegen) into ONE hash aggregate
    whose keyspace is bounded by m — map-side combine caps every
    task's shuffle output at m rows regardless of scan size. Sketches
    over different shards MERGE by max(register) per bucket (pinned by
    test): compute once per shard, max forever, never re-scan.

    Returns <= m rows (hll_bucket:int, hll_register:int); buckets no
    value hashed into are absent (register 0). With ``group_cols`` the
    sketch is per group (group..., hll_bucket, hll_register) — the
    shuffle keyspace is then |groups| * m, still map-side combined
    (the per-group twin of kmv_distinct's surface).
    """
    if (1 << p) not in _HLL_ALPHA:
        raise ValueError(f"p must be one of 4/8/12 (m in 16/256/4096), got {p}")
    bh = p // 4  # bucket hex chars
    # NULLs carry no distinct value (standard COUNT DISTINCT semantics);
    # without the filter they would ride through md5(NULL)=NULL into a
    # junk NULL-bucket row
    df = df.where(F.col(value_col).isNotNull())
    h = F.md5(F.concat(F.lit("hll:"), F.col(value_col).cast("string")))
    bucket = F.conv(F.substring(h, 1, bh), 16, 10).cast("int")
    v40 = F.conv(F.substring(h, bh + 1, 10), 16, 10).cast("bigint")
    rho = F.when(v40 == 0, F.lit(_HLL_RHO_BITS + 1)).otherwise(
        F.lit(_HLL_RHO_BITS + 1) - F.length(F.bin(v40))
    )
    g = list(group_cols or [])
    return (
        df.select(*g, bucket.alias("hll_bucket"), rho.alias("_rho"))
        .groupBy(*g, "hll_bucket")
        .agg(F.max("_rho").cast("int").alias("hll_register"))
    )


def hll_estimate(
    sketch: DataFrame,
    p: int = 8,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fold a :func:`hll_sketch` register table into one estimate row.

    The harmonic sum is EXACT integer arithmetic: with registers
    capped at 41, sum_j 2^-M_j scaled by 2^41 is
    s_scaled = (m - observed)*2^41 + sum(1 << (41 - M_j)) — at
    m = 4096 the sum is < 2^53, exact int64, so every engine agrees on
    every bit and the gate can hash it. est_raw = alpha_m * m^2 * 2^41
    / s_scaled is then ONE IEEE division of exact ints (bit-identical
    cross-engine); est_floor = floor(est_raw) is the gate-stable form.

    ``est`` additionally applies the small-range linear-counting
    correction (m*ln(m/zeros) when est_raw <= 2.5m and zeros > 0) —
    the estimate a user should read. ln() is libm and may differ by
    1 ulp across engines, so ``est`` is NOT hash-gated; the exact
    columns are.

    Returns (hll_m, hll_observed, s_scaled, est_floor, est) — one row
    per group when ``group_cols`` is given, one row total otherwise.
    """
    m = 1 << p
    if m not in _HLL_ALPHA:
        raise ValueError(f"p must be one of 4/8/12, got {p}")
    top = _HLL_RHO_BITS + 1
    g = list(group_cols or [])
    agg = sketch.groupBy(*g).agg(
        F.count("*").cast("bigint").alias("hll_observed"),
        F.coalesce(
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {top} - hll_register)")),
            F.lit(0),
        )
        .cast("bigint")
        .alias("_s_obs"),
    )
    s = (
        (F.lit(m) - F.col("hll_observed")) * F.lit(1 << top) + F.col("_s_obs")
    ).cast("bigint")
    num = float(_HLL_ALPHA[m]) * float(m) * float(m) * float(1 << top)
    est_raw = F.lit(num) / s.cast("double")
    zeros = (F.lit(m) - F.col("hll_observed")).cast("double")
    est = F.when(
        (est_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(est_raw)
    return agg.select(
        *g,
        F.lit(m).cast("int").alias("hll_m"),
        "hll_observed",
        s.alias("s_scaled"),
        F.floor(est_raw).cast("bigint").alias("est_floor"),
        est.alias("est"),
    )


def frequent_items(
    df: DataFrame,
    col: str,
    k: int = 256,
    min_count: int | None = None,
) -> DataFrame:
    """EXACT heavy hitters without shuffling the long tail — the
    Misra-Gries summary (Misra & Gries 1982, the space-saving family)
    used the way a 100-TB engine should use it: as a CANDIDATE
    generator whose guaranteed superset is then recounted exactly.

    Returns ``(item:string, n:bigint)`` for every non-NULL item whose
    exact count is >= ``min_count`` — deterministic and
    partitioning-invariant, because the final counts are exact and the
    MG candidate set is a superset of the answer under ANY batching:
    per Arrow batch the exact value counts are MG-compressed to <= k
    weighted counters (subtract t = the (k+1)-th largest count, drop
    non-positives — every unit of per-item undercount is paid for by
    >= k+1 units of total decrement), so summed across batches each
    item's retained weight w satisfies  true - N/(k+1) <= w <= true.
    Candidates keep  w + ceil(N/(k+1)) >= min_count  (superset-safe),
    then one broadcast semi-join recounts them exactly.

    ``min_count`` must exceed N/(k+1) (N = non-NULL rows) or the
    candidate set is unbounded — raises loudly with the measured N
    rather than silently exploding the broadcast; raise k or
    min_count. Defaults to ceil(N/(k+1)) + 1 when None (the tightest
    sound threshold).

    Plan: one Arrow-batched MG pass (numpy value counts — the
    vectorized-kernel posture, never per-row Python) emitting <= k
    counter rows + 1 size-marker row per batch, one narrow hash
    aggregate over those counters, then a second scan recounting only
    the (small, broadcast) candidate set. The tail never shuffles:
    a groupBy(col).count() at 10^12 rows moves every distinct value
    through the exchange; this moves <= k rows per Arrow batch.
    """
    import numpy as np
    import pyarrow as pa

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    vals = df.select(F.col(col).cast("string").alias("item")).where(
        F.col("item").isNotNull()
    )
    # MG runs over NATIVE 64-bit hashes, not the item strings: the
    # Arrow stage then ships 8 bytes/row to Python instead of the
    # payload (measured ~4x on string items — on one box the stage is
    # memory-bandwidth-bound, on a cluster it's less IPC either way).
    # A hash collision merges two items' counts, which only RAISES the
    # merged weight — the candidate set stays a superset and the exact
    # per-ITEM recount below is what's returned, so collisions cost a
    # false candidate, never a wrong answer.
    hashed = vals.select(F.xxhash64("item").alias("h"))

    out_schema = "h long, w long"

    def mg_batches(batches):
        for b in batches:
            arr = b.column(0)
            n = len(arr)
            if n == 0:
                continue
            hs, counts = np.unique(
                arr.to_numpy(zero_copy_only=False), return_counts=True
            )
            if len(hs) > k:
                t = np.partition(counts, len(counts) - (k + 1))[
                    len(counts) - (k + 1)
                ]
                keep = counts > t
                hs, counts = hs[keep], counts[keep] - t
            yield pa.RecordBatch.from_arrays(
                [
                    pa.concat_arrays(
                        [
                            pa.array(hs, type=pa.int64()),
                            pa.array([None], type=pa.int64()),
                        ]
                    ),
                    pa.array(
                        list(counts.astype(np.int64)) + [int(n)],
                        type=pa.int64(),
                    ),
                ],
                names=["h", "w"],
            )

    partials = hashed.mapInArrow(mg_batches, out_schema)
    agg = partials.groupBy(
        F.col("h").isNull().alias("_is_n"), "h"
    ).agg(F.sum("w").alias("w"))
    # ceil(N/(k+1)) as exact integer arithmetic
    loss_bound = F.floor(
        (F.col("_n") + F.lit(k)).cast("bigint") / F.lit(k + 1)
    ).cast("bigint")
    n_total = (
        agg.where(F.col("_is_n"))
        .agg(F.coalesce(F.sum("w"), F.lit(0)).cast("bigint").alias("_n"))
        .withColumn("_lb", loss_bound)
    )
    if min_count is None:
        mc = F.col("_lb") + F.lit(1)
    else:
        mc = F.lit(int(min_count)).cast("bigint")
    cand = (
        agg.where(~F.col("_is_n"))
        .crossJoin(F.broadcast(n_total))
        .where(F.col("w") + F.col("_lb") >= mc)
        .select("h", mc.alias("_mc"))
    )
    result = (
        vals.withColumn("h", F.xxhash64("item"))
        .join(F.broadcast(cand), "h")
        .groupBy("item", "_mc")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= F.col("_mc"))
        .select("item", "n")
    )
    # CORRECTNESS guard: an item MG dropped entirely has no candidate
    # row at all, so min_count <= N/(k+1) silently loses answers. The
    # guard must evaluate even when the candidate set is EMPTY — a
    # WHERE on the candidate/recount path gets removed by AQE's
    # empty-relation propagation — so it rides the output as a union
    # branch over the always-present 1-row N aggregate: zero rows when
    # sound, raise_error when violated.
    guard = n_total.where(mc <= F.col("_lb")).select(
        F.raise_error(
            F.concat(
                F.lit("frequent_items: min_count "),
                mc.cast("string"),
                F.lit(" <= N/(k+1) loss bound "),
                F.col("_lb").cast("string"),
                F.lit(" — completeness broken; raise k or min_count"),
            )
        ).cast("string").alias("item"),
        F.lit(None).cast("bigint").alias("n"),
    )
    return result.unionByName(guard)


def frequent_items_grouped(
    df: DataFrame,
    group_col: str,
    col: str,
    k: int = 256,
    min_count: int | None = None,
) -> DataFrame:
    """Per-GROUP exact heavy hitters — ``frequent_items``' surface
    twin for 'top tokens per language / per domain': the same
    Misra-Gries candidate + exact-recount construction applied within
    each group, so per group g the guarantee is
    true - N_g/(k+1) <= w <= true under any batching and the output
    is EXACT counts of every item with count >= min_count in g.

    ``min_count`` must exceed every present group's N_g/(k+1) loss
    bound (default: each group's own bound + 1 — the tightest sound
    per-group threshold); a violating group raises loudly through the
    output-union guard (the AQE empty-relation lesson, same as the
    ungrouped form).

    Plan: the MG Arrow stage sorts each batch once by (group, hash)
    (lexsort) and compresses per group segment — <= k+1 rows per
    (batch, group present in it) shuffle; groups are independent, so
    the candidate/recount shuffles stay narrow. Groups-per-batch is
    the kernel's inner loop: fine for the realistic hundreds-of-
    groups shape, pre-partition by group first if you have millions.
    """
    import numpy as np
    import pyarrow as pa

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    vals = df.select(
        F.col(group_col).cast("string").alias("g"),
        F.col(col).cast("string").alias("item"),
    ).where(F.col("item").isNotNull() & F.col("g").isNotNull())
    hashed = vals.select("g", F.xxhash64("item").alias("h"))

    out_schema = "g string, h long, w long"

    def mg_batches(batches):
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            genc = b.column(0).dictionary_encode()
            gidx = genc.indices.to_numpy(zero_copy_only=False)
            hs = b.column(1).to_numpy(zero_copy_only=False)
            order = np.lexsort((hs, gidx))
            gs, hs = gidx[order], hs[order]
            # segment boundaries where (group, hash) changes
            change = np.empty(len(gs), dtype=bool)
            change[0] = True
            np.logical_or(
                gs[1:] != gs[:-1], hs[1:] != hs[:-1], out=change[1:]
            )
            starts = np.nonzero(change)[0]
            counts = np.diff(np.append(starts, len(gs)))
            seg_g, seg_h = gs[starts], hs[starts]
            out_g: list[str] = []
            out_h: list = []
            out_w: list[int] = []
            gdict = genc.dictionary.to_pylist()
            gb = np.empty(len(seg_g), dtype=bool)
            gb[0] = True
            gb[1:] = seg_g[1:] != seg_g[:-1]
            gstarts = np.nonzero(gb)[0]
            gends = np.append(gstarts[1:], len(seg_g))
            for s, e in zip(gstarts, gends):
                gname = gdict[int(seg_g[s])]
                c = counts[s:e]
                hh = seg_h[s:e]
                if len(c) > k:
                    t = np.partition(c, len(c) - (k + 1))[len(c) - (k + 1)]
                    keep = c > t
                    hh, c = hh[keep], c[keep] - t
                out_g += [gname] * (len(hh) + 1)
                out_h += list(hh) + [None]
                out_w += list(c.astype(np.int64)) + [int(np.sum(counts[s:e]))]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_g, type=pa.string()),
                    pa.array(out_h, type=pa.int64()),
                    pa.array(out_w, type=pa.int64()),
                ],
                names=["g", "h", "w"],
            )

    partials = hashed.mapInArrow(mg_batches, out_schema)
    agg = partials.groupBy("g", F.col("h").isNull().alias("_is_n"), "h").agg(
        F.sum("w").alias("w")
    )
    loss_bound = F.floor(
        (F.col("_n") + F.lit(k)).cast("bigint") / F.lit(k + 1)
    ).cast("bigint")
    n_total = (
        agg.where(F.col("_is_n"))
        .groupBy("g")
        .agg(F.coalesce(F.sum("w"), F.lit(0)).cast("bigint").alias("_n"))
        .withColumn("_lb", loss_bound)
    )
    if min_count is None:
        mc = F.col("_lb") + F.lit(1)
    else:
        mc = F.lit(int(min_count)).cast("bigint")
    cand = (
        agg.where(~F.col("_is_n"))
        .join(F.broadcast(n_total), "g")
        .where(F.col("w") + F.col("_lb") >= mc)
        .select("g", "h", mc.alias("_mc"))
    )
    result = (
        vals.withColumn("h", F.xxhash64("item"))
        .join(F.broadcast(cand), ["g", "h"])
        .groupBy("g", "item", "_mc")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= F.col("_mc"))
        .select(F.col("g").alias(group_col), F.col("item").alias(col), "n")
    )
    guard = n_total.where(mc <= F.col("_lb")).select(
        F.raise_error(
            F.concat(
                F.lit("frequent_items_grouped: min_count "),
                mc.cast("string"),
                F.lit(" <= loss bound "),
                F.col("_lb").cast("string"),
                F.lit(" for group "),
                F.col("g"),
                F.lit(" — completeness broken; raise k or min_count"),
            )
        ).cast("string").alias(group_col),
        F.lit(None).cast("string").alias(col),
        F.lit(None).cast("bigint").alias("n"),
    )
    return result.unionByName(guard)


def ams_f2(
    df: DataFrame,
    value_col: str,
    n_sketches: int = 16,
) -> DataFrame:
    """AMS second-moment (F2) sketch (r5; Alon-Matias-Szegedy 1996) —
    the mergeable self-join-size / skew estimator the sketch family
    lacked: F2 = sum over distinct values of count^2 predicts join
    output sizes and flags heavy-hitter skew with O(n_sketches) ints
    of state, mergeable by plain addition (shard sketches sum).

    EXACT-INTEGER spec: sign sigma(s, v) = +1 iff the first hex nibble
    of md5('<s>:<v>') is odd (conv(substr, 1, 1) % 2), else -1; each
    sketch's ``x = sum(sigma)`` over ROWS is an exact int64 and
    ``x^2`` is an unbiased F2 estimate; the returned per-sketch rows
    are the mergeable state AND the gate surface (an engine replays
    every bit). Row count is guarded below 2^31 so x^2 cannot
    overflow. Use the lower-median of x^2 across sketches as the
    robust point estimate (exact_quantiles composes).

    Plan: ONE n_sketches-way Generate + one (sketch) hash aggregate —
    map-side combinable to n_sketches rows total. Returns
    (sketch, x, x2).
    """
    if n_sketches < 1:
        raise ValueError("n_sketches must be >= 1")
    v = F.col(value_col).cast("string")
    rows = df.select(
        F.explode(
            F.array(*[F.lit(s) for s in range(int(n_sketches))])
        ).alias("sketch"),
        v.alias("_v"),
    )
    nib = F.conv(
        F.substring(
            F.md5(F.concat(F.col("sketch").cast("string"), F.lit(":"), F.col("_v"))),
            1,
            1,
        ),
        16,
        10,
    ).cast("bigint")
    sig = F.when(nib % 2 == 1, F.lit(1)).otherwise(F.lit(-1))
    agg = rows.groupBy("sketch").agg(
        F.sum(sig).alias("x"), F.count(F.lit(1)).alias("_n")
    )
    guard = F.when(F.col("_n") < F.lit(1 << 31), F.col("x")).otherwise(
        F.raise_error(F.lit("ams_f2: row count >= 2^31 — x^2 would overflow"))
    )
    return agg.select(
        F.col("sketch").cast("int").alias("sketch"),
        guard.alias("x"),
        (F.col("x") * F.col("x")).alias("x2"),
    ).orderBy("sketch")
