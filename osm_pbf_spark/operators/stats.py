"""Exact-integer descriptive statistics (SURVEY.md §2.4 companion, r3).

Pearson correlation, simple OLS regression, and per-row z-scores over
INTEGER-valued columns, computed with the same exactness discipline as
``spatialstats.morans_i`` / ``getis_ord_gi``: clear denominators first —

    num   = n*Σxy − Σx*Σy          (exact int64)
    var_x = n*Σx² − (Σx)²          (exact int64)
    var_y = n*Σy² − (Σy)²          (exact int64)

so the statistic is a FIXED-ORDER chain of correctly-rounded IEEE ops
(int→double casts, sqrt, *, /) on exact integers — any engine
reproduces the bits, which is what makes these gateable (naive
avg/stddev sum doubles in shuffle order; their last bits are
nondeterministic).

Overflow posture: ANSI mode THROWS on int64 overflow — keep
n * max|x| * max|y| and n * Σy² under 2^63 (rescale/floor-divide the
inputs beyond; the q_corr/q_ols gate queries floor prices for this).

Plans: one hash aggregate per group (map-side partial, one narrow
shuffle); z-scores add a broadcast join of the tiny per-group moments
back onto the rows. Pure whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "pearson_corr",
    "ols_fit",
    "zscore",
    "spearman_corr",
    "ks_test",
    "chi2_test",
    "mann_whitney_u",
    "robust_zscore",
    "cusum_changepoints",
    "roc_auc",
    "isotonic_fit",
    "kruskal_wallis",
    "welch_ttest",
    "cramers_v",
    "mutual_information",
    "decision_stump",
    "psi_drift",
    "mcnemar_test",
    "cochran_armitage",
    "quantile_normalize",
    "youden_threshold",
    "bh_fdr",
    "fisher_exact",
    "perm_test",
]


def _moments(df: DataFrame, x: str, y: str | None, group_cols: list[str]):
    xc = F.col(x).cast("bigint")
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.sum(xc).alias("_sx"),
        F.sum(xc * xc).alias("_sxx"),
    ]
    if y is not None:
        yc = F.col(y).cast("bigint")
        aggs += [
            F.sum(yc).alias("_sy"),
            F.sum(yc * yc).alias("_syy"),
            F.sum(xc * yc).alias("_sxy"),
        ]
    keys = group_cols if group_cols else [F.lit(0).alias("_all")]
    out = df.groupBy(*keys).agg(*aggs)
    return out.drop("_all") if not group_cols else out


def _num_varx_vary():
    num = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("bigint")
    vx = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("bigint")
    vy = (F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast("bigint")
    return num, vx, vy


def pearson_corr(
    df: DataFrame, x_col: str, y_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """(group..., n, corr) — Pearson r of two integer columns per group."""
    g = list(group_cols or [])
    m = _moments(df, x_col, y_col, g)
    num, vx, vy = _num_varx_vary()
    corr = F.when(  # degenerate (constant) column -> NULL, not an
        (vx > 0) & (vy > 0),  # ANSI divide-by-zero error
        num.cast("double")
        / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
    )
    return m.select(*g, F.col("_n").alias("n"), corr.alias("corr"))


def ols_fit(
    df: DataFrame, x_col: str, y_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """(group..., n, slope, intercept) — least-squares line y = a·x + b
    per group; slope is a ratio of exact integers, intercept the fixed
    chain (Σy − slope·Σx)/n."""
    g = list(group_cols or [])
    m = _moments(df, x_col, y_col, g)
    num, vx, _vy = _num_varx_vary()
    slope = num.cast("double") / vx.cast("double")
    intercept = (
        F.col("_sy").cast("double") - slope * F.col("_sx").cast("double")
    ) / F.col("_n").cast("double")
    return m.select(
        *g, F.col("_n").alias("n"), slope.alias("slope"), intercept.alias("intercept")
    )


def zscore(
    df: DataFrame, x_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Every input row plus its per-group sample z-score of ``x_col``:

        z = (n·x − Σx) / sqrt((n·Σx² − (Σx)²) · (n / (n−1)))

    (= (x − mean)/s with the denominators cleared). The per-group
    moments are a tiny aggregate broadcast back onto the rows — the
    standard outlier-flagging shape at any scale."""
    g = list(group_cols or [])
    m = _moments(df, x_col, None, g)
    j = df.join(F.broadcast(m), g) if g else df.crossJoin(F.broadcast(m))
    xc = F.col(x_col).cast("bigint")
    num = (F.col("_n") * xc - F.col("_sx")).cast("bigint")
    a = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("bigint")
    z = num.cast("double") / F.sqrt(
        a.cast("double")
        * (F.col("_n").cast("double") / (F.col("_n") - F.lit(1)).cast("double"))
    )
    return j.select(*df.columns, z.alias("z"))


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    tie_cols: list[str],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Spearman rank correlation = Pearson r on integer ranks — monotone
    association, robust to outliers/nonlinearity.

    Ranks are UNIQUE row_number()s over (value, *tie_cols), so the
    whole computation inherits :func:`pearson_corr`'s exact-integer /
    fixed-IEEE-chain bit-reproducibility. ``tie_cols`` MUST complete a
    strict total order (typically the row's key columns) — with a
    genuine tie left unresolved, rank assignment (and therefore the
    statistic) would be engine/partitioning-dependent. This is the
    unique-rank variant; for heavily tied data use average ranks (not
    offered: fractional ranks forfeit the exactness contract).

    Overflow: n * Σrank² ~ n⁴/3 must stay under 2^63 → n per group up
    to ~55k; sample larger groups first.

    Plan: two ranking windows + pearson_corr's single aggregate — three
    narrow shuffles on the group key, pure codegen.
    """
    g = list(group_cols or [])
    part = [F.col(c) for c in g] if g else [F.lit(0)]
    wx = Window.partitionBy(*part).orderBy(x_col, *tie_cols)
    wy = Window.partitionBy(*part).orderBy(y_col, *tie_cols)
    ranked = df.select(
        *g,
        F.row_number().over(wx).alias("_rx"),
        F.row_number().over(wy).alias("_ry"),
    )
    return pearson_corr(ranked, "_rx", "_ry", g).withColumnRenamed(
        "corr", "spearman"
    )


def ks_test(
    df: DataFrame,
    value_col: str,
    side_col: str,
    sides: tuple[str, str] = ("a", "b"),
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance — THE distribution-drift
    check for a training-data pipeline (did today's shard drift from
    yesterday's?):

        D = sup_v |F_a(v) − F_b(v)| = max_v |c_a(v)·n_b − c_b(v)·n_a|
                                        / (n_a · n_b)

    with c_s(v) = #{side-s values <= v}. The numerator is an exact
    int64 at every distinct value (c·n <= n_a·n_b), so D is ONE
    correctly-rounded division — bit-reproducible under any shuffle
    order, unlike a floating CDF difference.

    Plan: one (value) hash aggregate of per-side counts (map-side
    combinable — the shuffle carries distinct values, not rows), one
    global cumulative window over distinct values, a broadcast 1-row
    totals join, one max aggregate. The single global window sorts
    only DISTINCT values; pre-bin continuous data if that cardinality
    is itself at scale.

    Returns one row (n_a, n_b, ks_d:double).
    """
    sa, sb = sides
    per = df.groupBy(F.col(value_col).alias("_v")).agg(
        F.sum((F.col(side_col) == sa).cast("bigint")).alias("_na"),
        F.sum((F.col(side_col) == sb).cast("bigint")).alias("_nb"),
    )
    w = (
        Window.partitionBy(F.lit(0))
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per.select(
        F.sum("_na").over(w).alias("_ca"), F.sum("_nb").over(w).alias("_cb")
    )
    tot = df.agg(
        F.sum((F.col(side_col) == sa).cast("bigint")).alias("n_a"),
        F.sum((F.col(side_col) == sb).cast("bigint")).alias("n_b"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    num = F.abs(F.col("_ca") * F.col("n_b") - F.col("_cb") * F.col("n_a"))
    return j.groupBy("n_a", "n_b").agg(
        (
            F.max(num).cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double")
        ).alias("ks_d")
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    side_col: str,
    sides: tuple[str, str] = ("a", "b"),
) -> DataFrame:
    """Two-sample Mann–Whitney U rank test — the NONPARAMETRIC numeric
    drift check beside :func:`ks_test` (sensitive to location shift
    where KS reacts to any CDF gap).

    Exactness discipline: with ties, a value v occupying sorted ranks
    lo..hi contributes the average rank (lo+hi)/2 — always a multiple
    of 1/2 — so this computes DOUBLED rank sums as exact int64:

        R2_a = Σ_v n_a(v) · (2·cum_before(v) + cnt(v) + 1)
        U2_a = R2_a − n_a·(n_a + 1)            (= 2·U_a, exact int64)

    The tie-corrected normal approximation is then one FIXED chain of
    correctly-rounded IEEE ops on exact integers (gate-hashable):

        σ² = (n_a·n_b) · (n³ − n − T) / (12·n·(n−1)),  T = Σ_ties t³−t
        z  = (U2_a − n_a·n_b) / (2·σ)

    Overflow posture (ANSI throws on wrap): n³ must stay under 2^63 —
    keep n under ~2 × 10⁶ rows, or pre-sample/bin.

    Plan (identical shape to ks_test): one distinct-value hash
    aggregate (map-side combinable — the shuffle carries distinct
    values, not rows), one global cumulative window over distinct
    values, a broadcast 1-row totals join, one final aggregate.

    Returns one row (n_a, n_b, u_a:double, z:double).
    """
    sa, sb = sides
    per = df.groupBy(F.col(value_col).alias("_v")).agg(
        F.sum((F.col(side_col) == sa).cast("bigint")).alias("_na"),
        F.sum((F.col(side_col) == sb).cast("bigint")).alias("_nb"),
    )
    w = (
        Window.partitionBy(F.lit(0))
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cnt = F.col("_na") + F.col("_nb")
    cum = per.select(
        "_na",
        cnt.alias("_cnt"),
        (F.sum(cnt).over(w) - cnt).alias("_before"),
    )
    contrib = cum.agg(
        F.sum(
            F.col("_na")
            * (F.lit(2) * F.col("_before") + F.col("_cnt") + F.lit(1))
        ).alias("_r2a"),
        F.sum(F.col("_cnt") * F.col("_cnt") * F.col("_cnt") - F.col("_cnt")).alias(
            "_ties"
        ),
    )
    tot = df.agg(
        F.sum((F.col(side_col) == sa).cast("bigint")).alias("n_a"),
        F.sum((F.col(side_col) == sb).cast("bigint")).alias("n_b"),
    )
    j = contrib.crossJoin(F.broadcast(tot))
    n = F.col("n_a") + F.col("n_b")
    u2a = (F.col("_r2a") - F.col("n_a") * (F.col("n_a") + F.lit(1))).cast("bigint")
    t1 = (n * n * n - n - F.col("_ties")).cast("bigint")
    sigma2 = (
        (F.col("n_a") * F.col("n_b")).cast("double")
        * t1.cast("double")
        / (F.lit(12) * n * (n - F.lit(1))).cast("double")
    )
    z = (u2a - F.col("n_a") * F.col("n_b")).cast("double") / (
        F.lit(2.0) * F.sqrt(sigma2)
    )
    return j.select(
        "n_a",
        "n_b",
        (u2a.cast("double") / F.lit(2.0)).alias("u_a"),
        z.alias("z"),
    )


def _lower_median(df: DataFrame, group_cols: list[str], col: str, out: str) -> DataFrame:
    """Per-group lower median (percentile_disc(0.5) semantics): the
    smallest value whose cumulative count reaches ceil(n/2). Exact for
    integer inputs and independently replayable — no interpolation.

    Plan: one distinct-value count aggregate (map-side combinable — the
    per-group window sorts DISTINCT values only), one cumulative window,
    one min aggregate.
    """
    per = df.groupBy(*group_cols, F.col(col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*[F.col(c) for c in group_cols])
    cum = per.select(
        *group_cols,
        "_v",
        F.sum("_c").over(w).alias("_cum"),
        F.sum("_c").over(wn).alias("_n"),
    )
    # ceil(n/2) = floor((n+1)/2), exact below 2^52
    hit = cum.where(F.col("_cum") >= F.floor((F.col("_n") + F.lit(1)) / F.lit(2)))
    return hit.groupBy(*group_cols).agg(F.min("_v").alias(out))


def robust_zscore(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    min_dev_mads: float | None = None,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Median/MAD robust z-score per row — the outlier/quality filter
    that survives heavy tails where mean/stddev z-scores (``zscore``)
    are dragged by the outliers themselves.

    Requires an INTEGER-valued column (caller quantizes, same contract
    as the rest of this module): the lower median and the MAD
    (lower median of |x − med|) are then exact int64, and the score

        robust_z = (x − med) / mad          (NULL when mad = 0)

    is ONE correctly-rounded division — bit-reproducible anywhere. The
    conventional 1.4826 normal-consistency factor is deliberately NOT
    baked in (non-dyadic literal; callers can scale the threshold
    instead).

    ``min_dev_mads``: if set, only rows with |x − med| >= k·mad are
    returned (the flagged outliers) — the filter is exact integer
    arithmetic when k is integral.

    Plan: two distinct-value median passes (each one map-side-combining
    aggregate + a per-group window over DISTINCT values) + two broadcast
    joins of the tiny per-group stats back onto the rows. No Python.
    """
    carry = list(carry_cols or [])  # row-identity passthrough columns
    xc = F.col(value_col).cast("bigint")
    base = df.select(*group_cols, *carry, xc.alias("_x"))
    med = _lower_median(
        base.select(*group_cols, "_x"), group_cols, "_x", "_med"
    )
    with_med = base.join(F.broadcast(med), group_cols)
    dev = with_med.select(
        *group_cols,
        *carry,
        "_x",
        F.abs(F.col("_x") - F.col("_med")).alias("_dev"),
    )
    mad = _lower_median(
        dev.select(*group_cols, "_dev"), group_cols, "_dev", "_mad"
    )
    out = dev.join(F.broadcast(med), group_cols).join(F.broadcast(mad), group_cols)
    if min_dev_mads is not None:
        out = out.where(
            F.col("_dev").cast("double")
            >= F.lit(float(min_dev_mads)) * F.col("_mad").cast("double")
        )
    rz = F.when(
        F.col("_mad") > 0,
        (F.col("_x") - F.col("_med")).cast("double") / F.col("_mad").cast("double"),
    )
    return out.select(
        *group_cols,
        *carry,
        F.col("_x").alias("x"),
        F.col("_med").alias("med"),
        F.col("_mad").alias("mad"),
        rz.alias("robust_z"),
    )


def chi2_test(
    df: DataFrame,
    cat_col: str,
    side_col: str,
    sides: tuple[str, str] = ("a", "b"),
) -> DataFrame:
    """Two-sample chi-square homogeneity test over a categorical column
    — the CATEGORICAL drift check beside :func:`ks_test`'s numeric one
    (did the language/source mix of today's shard move?).

        chi2 = Σ_ij (o_ij − e_ij)² / e_ij,   e_ij = r_i·c_j / N
             = Σ_ij (o_ij·N − r_i·c_j)² / (N·r_i·c_j)

    Exactness: per term, o·N − r·c and N·r·c are exact int64
    (N·r·c <= N³: keep N under ~2M rows, or pre-sample); the term's
    double square/divide is a FIXED chain both engines round
    identically, and terms are quantized to MICRO units (HALF-UP,
    exact for term < 2^43) before the int64 sum — order-free, so the
    statistic is gate-hashable (a raw double Σ of terms would be
    shuffle-order-dependent). chi2 resolves micro-unit granularity.

    Plan: one (category) hash aggregate (map-side combinable), a
    broadcast 1-row totals join, one sum — two narrow shuffles, pure
    codegen. Returns one row (n_total, dof, chi2:double).
    """
    sa, sb = sides
    per = df.groupBy(F.col(cat_col).alias("_c")).agg(
        F.sum((F.col(side_col) == sa).cast("bigint")).alias("_oa"),
        F.sum((F.col(side_col) == sb).cast("bigint")).alias("_ob"),
    )
    tot = df.agg(
        F.sum((F.col(side_col) == sa).cast("bigint")).alias("_ca"),
        F.sum((F.col(side_col) == sb).cast("bigint")).alias("_cb"),
    )
    j = per.crossJoin(F.broadcast(tot)).select(
        "_oa",
        "_ob",
        "_ca",
        "_cb",
        (F.col("_oa") + F.col("_ob")).alias("_r"),
        (F.col("_ca") + F.col("_cb")).alias("_n"),
    )

    def term_q(o, c):
        num = (F.col(o) * F.col("_n") - F.col("_r") * F.col(c)).cast("bigint")
        den = (F.col("_n") * F.col("_r") * F.col(c)).cast("bigint")
        t = (num.cast("double") * num.cast("double")) / den.cast("double")
        return F.floor(t * F.lit(1_000_000.0) + F.lit(0.5)).cast("bigint")

    rows = j.select(
        "_n",
        (term_q("_oa", "_ca") + term_q("_ob", "_cb")).alias("_tq"),
    )
    return rows.groupBy(F.col("_n").alias("n_total")).agg(
        (F.count(F.lit(1)) - 1).alias("dof"),
        (F.sum("_tq").cast("double") / F.lit(1_000_000.0)).alias("chi2"),
    )


def cusum_changepoints(
    df: DataFrame,
    key_col: str,
    order_col: str,
    val_col: str,
    drift: int,
    threshold: int,
) -> DataFrame:
    """Two-sided CUSUM mean-shift detection over an INTEGER-valued
    series, per key (SURVEY.md §2.4 companion — the drift-detection
    family next to ks_test / chi2_test, but SEQUENTIAL: it localizes
    WHERE the shift happens, not just that two samples differ).

    The textbook recurrence S_i = max(0, S_{i-1} + x_i - drift) is
    sequentially dependent, which would force a per-key sequential
    kernel. It is eliminated with the prefix identity

        S_i = C_i - min(0, min_{j<=i} C_j),   C_i = cumsum(x_i - drift)

    so the whole operator is two native window aggregates (running sum
    + running min) per side — one key shuffle, whole-stage codegen, no
    Python, no iteration. All arithmetic is exact int64 (caller
    pre-quantizes ``val_col``; ANSI throws on overflow rather than
    corrupting), so any engine reproduces the bits.

    Emits one row per UPWARD-crossing of ``threshold`` (S goes from
    <= h to > h) on either side: (key, order, side 'up'/'down', stat).
    No post-alarm reset — every crossing of the un-reset statistic is
    reported, a deterministic, restart-friendly spec (reset CUSUM is
    kept-state-dependent like temporal.debounce; this variant stays
    distributed-friendly).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = F.col(val_col).cast("bigint")
    up_c = F.sum(x - F.lit(drift)).over(w)
    dn_c = F.sum((-x) + F.lit(drift)).over(w)
    stats = df.select(
        F.col(key_col).alias("key"),
        F.col(order_col).alias("ord"),
        (up_c - F.least(F.lit(0).cast("bigint"), F.min(up_c).over(w))).alias("s_up"),
        (dn_c - F.least(F.lit(0).cast("bigint"), F.min(dn_c).over(w))).alias("s_dn"),
    )
    wl = Window.partitionBy("key").orderBy("ord")
    h = F.lit(threshold).cast("bigint")
    zero = F.lit(0).cast("bigint")
    flagged = stats.select(
        "key",
        "ord",
        ((F.col("s_up") > h) & (F.lag("s_up", 1, 0).over(wl) <= h)).alias("_fu"),
        ((F.col("s_dn") > h) & (F.lag("s_dn", 1, 0).over(wl) <= h)).alias("_fd"),
        "s_up",
        "s_dn",
    )
    up = flagged.where("_fu").select(
        "key", "ord", F.lit("up").alias("side"), F.col("s_up").alias("stat")
    )
    dn = flagged.where("_fd").select(
        "key", "ord", F.lit("down").alias("side"), F.col("s_dn").alias("stat")
    )
    return up.unionAll(dn)


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    qs: list[tuple[int, int]],
    labels: list[str] | None = None,
) -> DataFrame:
    """EXACT per-group quantiles at 100-TB scale — percentile_disc
    (type-1) semantics: for q = num/den, the smallest value whose
    cumulative count reaches ceil(q·n), i.e. cum·den >= num·n in pure
    int64 arithmetic. Generalizes ``_lower_median`` (q = 1/2) to any
    rational list of quantiles in ONE pass.

    Why not approx_percentile / a t-digest: those are engine-specific
    and not independently replayable; why not a global sort: this
    shuffles only the DISTINCT values of each group (map-side combine
    collapses duplicates), the per-group window sorts distinct values,
    and every quantile reads the same cumulative table. For columns
    with bounded value domains (quantized metrics, token counts,
    scores) the shuffle is domain-sized, not corpus-sized.

    Requires an INTEGER-valued column (caller quantizes — the module
    contract); quantiles as (num, den) int fractions keep everything
    exact. Returns one row per group with a bigint column per
    quantile, named by ``labels`` (default ``q_<num>_<den>``).

    Plan: one distinct-value count aggregate, one cumulative window,
    one min-aggregate computing ALL quantiles together. No Python.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    for num, den in qs:
        if not (0 < num <= den):
            raise ValueError(f"quantile {num}/{den} out of (0, 1]")
    if labels is None:
        labels = [f"q_{num}_{den}" for num, den in qs]
    if len(labels) != len(qs):
        raise ValueError("labels must match qs")
    xc = F.col(value_col).cast("bigint")
    per = df.groupBy(*group_cols, xc.alias("_v")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*[F.col(c) for c in group_cols])
    cum = per.select(
        *group_cols,
        "_v",
        F.sum("_c").over(w).alias("_cum"),
        F.sum("_c").over(wn).alias("_n"),
    )
    aggs = [
        F.min(
            F.when(
                F.col("_cum") * F.lit(int(den)) >= F.lit(int(num)) * F.col("_n"),
                F.col("_v"),
            )
        ).alias(lbl)
        for (num, den), lbl in zip(qs, labels)
    ]
    return cum.groupBy(*group_cols).agg(*aggs)


def roc_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact ROC-AUC per group — the standard evaluation of any binary
    scorer the engine trains or applies (nb_classify quality labels,
    near-dup thresholds, retrieval rankers): the probability a random
    positive outranks a random negative, ties counted half.

    Exactness discipline (the mann_whitney_u doubled-rank machine):
    ranking ascending by score with average ranks for ties,

        R2_pos = sum over distinct scores of n_pos(v) * (2*cum_before(v) + cnt(v) + 1)
        U2     = R2_pos - n_pos*(n_pos + 1)          (= 2*U, exact int64)
        AUC    = U2 / (2 * n_pos * n_neg)            (ONE IEEE division)

    so ``u2`` is exact int64 under ANY partitioning and ``auc`` is one
    correctly-rounded division — gate-hashable. Scores compare as
    stored (no quantization: only their ORDER matters, and equal
    doubles are equal in every engine). ``label_col`` must be 0/1.
    AUC is NULL when a group lacks positives or negatives.

    Plan: one distinct-(group, score) hash aggregate (the shuffle
    carries distinct scores, not rows — map-side combinable), one
    per-group cumulative window over distinct scores, one final group
    aggregate. At 100 TB the window cost is |distinct scores| per
    group; quantized model scores keep that bounded.

    Returns ``(group..., n_pos, n_neg, u2, auc)``.
    """
    g = list(group_cols or [])
    lab = F.col(label_col).cast("bigint")
    # domain guard in a WHERE (a pruned projection never fires)
    df = df.where(
        F.when(lab.isin(0, 1), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"roc_auc: {label_col} must be 0/1, got "),
                    F.col(label_col).cast("string"),
                )
            )
        )
    )
    per = df.groupBy(*g, F.col(score_col).alias("_v")).agg(
        F.sum(lab).alias("_np"),
        F.sum(F.lit(1) - lab).alias("_nn"),
    )
    w = (
        Window.partitionBy(*(g if g else [F.lit(0)]))
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cnt = F.col("_np") + F.col("_nn")
    cum = per.select(
        *g,
        "_np",
        "_nn",
        cnt.alias("_cnt"),
        (F.sum(cnt).over(w) - cnt).alias("_before"),
    )
    keys = g if g else [F.lit(0).alias("_all")]
    agg = cum.groupBy(*keys).agg(
        F.sum("_np").alias("n_pos"),
        F.sum("_nn").alias("n_neg"),
        F.sum(
            F.col("_np") * (F.lit(2) * F.col("_before") + F.col("_cnt") + F.lit(1))
        ).alias("_r2p"),
    )
    if not g:
        agg = agg.drop("_all")
    u2 = (F.col("_r2p") - F.col("n_pos") * (F.col("n_pos") + F.lit(1))).cast("bigint")
    return agg.select(
        *g,
        "n_pos",
        "n_neg",
        u2.alias("u2"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            u2.cast("double")
            / (F.lit(2) * F.col("n_pos") * F.col("n_neg")).cast("double"),
        ).alias("auc"),
    )


def isotonic_fit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Isotonic regression per group via PAVA (pool-adjacent-violators)
    — the standard score-calibration curve (pairs with :func:`roc_auc`:
    AUC says the ranking is good, isotonic turns raw scores into
    monotone probabilities), also the shape-constrained trend fit.

    EXACT-RATIONAL discipline: ``y_col`` must be integer-valued (0/1
    labels or pre-quantized); per distinct x the (sum_y, cnt) pair is
    an exact int64 aggregate, and PAVA pools are merged by CROSS-
    MULTIPLIED comparison (``sum_i * cnt_j >= sum_j * cnt_i``) — no
    float enters a pooling decision, so the blocks are deterministic
    under any partitioning; ``fitted`` is ONE final IEEE division per
    block, gate-hashable. Pooling uses the classical stack algorithm,
    merging while the previous block mean is >= the current: equal-
    mean neighbors merge too, so blocks are the MAXIMAL level sets of
    the (unique) L2 isotonic solution — reconstructible from fitted
    values alone, which is what the independent minimax-formula gate
    oracle does.

    Returns one row per distinct x: ``(group..., x, n, pool_sum,
    pool_cnt, fitted)`` where pool_sum/pool_cnt describe the block the
    x fell into (equal for every x of one block) and ``n`` is the x's
    own count.

    Plan: one distinct-(group, x) hash aggregate (shuffle carries
    distinct x values — quantized model scores keep it bounded), then
    ONE applyInPandas per group (PAVA is inherently sequential in x —
    the debounce class; parallel across groups, and the stack pass is
    O(|distinct x|)).
    """
    import pandas as pd

    g = list(group_cols or [])
    yc = F.col(y_col).cast("bigint")
    per = df.groupBy(*g, F.col(x_col).alias("x")).agg(
        F.count(F.lit(1)).alias("n"), F.sum(yc).alias("_sy")
    )
    xf = df.schema[x_col].dataType.simpleString()
    gf = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in g
    )
    schema = (gf + ", " if gf else "") + (
        f"x {xf}, n bigint, pool_sum bigint, pool_cnt bigint, fitted double"
    )

    def _pava(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("x", kind="mergesort").reset_index(drop=True)
        sums, cnts, sizes = [], [], []  # block stack
        for sy, n in zip(pdf["_sy"].astype(object), pdf["n"].astype(object)):
            cs, cc, sz = int(sy), int(n), 1
            # merge while previous block mean >= current block mean
            while sums and sums[-1] * cc >= cs * cnts[-1]:
                cs += sums.pop()
                cc += cnts.pop()
                sz += sizes.pop()
            sums.append(cs)
            cnts.append(cc)
            sizes.append(sz)
        ps, pc = [], []
        for s, c, z in zip(sums, cnts, sizes):
            ps.extend([s] * z)
            pc.extend([c] * z)
        out = pdf[[*g, "x", "n"]].copy()
        out["pool_sum"] = ps
        out["pool_cnt"] = pc
        out["fitted"] = [float(s) / float(c) for s, c in zip(ps, pc)]
        return out

    keyed = per.groupBy(*(g if g else [F.lit(0).alias("_all")]))
    return keyed.applyInPandas(_pava, schema)


def concentration(
    df: DataFrame,
    val_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Gini coefficient + Herfindahl–Hirschman index per group — the
    two standard concentration measures a corpus pipeline runs on its
    domain/source/language distribution (is the crawl dominated by a
    few hosts? is the token budget spread or spiked?).

    EXACT-INTEGER spec over a NONNEGATIVE integer ``val_col`` (guarded
    in a WHERE — negative values make Gini ill-defined):

        gini_num = 2*sum(i * x_(i)) - (n+1)*S     (i = ascending rank)
        gini     = gini_num / (n*S)               (ONE IEEE division)
        hhi      = sum(x^2) / S^2                 (ONE division of
                                                   exact ints)

    Rank ties resolve arbitrarily but sum(i*x) is TIE-INVARIANT (equal
    x values swap ranks without changing the sum), so the output is
    deterministic under any partitioning. hhi is the sum of squared
    shares in [1/n, 1]; gini in [0, 1-1/n].

    Returns ``(group..., n, total, sumsq, gini_num, gini, hhi)``; gini
    NULL when S = 0 or n < 2, hhi NULL when S = 0.

    Plan: one per-group ranking window + one hash aggregate — two
    narrow keyed shuffles, pure codegen. The window sorts full groups;
    for billion-row groups pre-aggregate equal values first (ranks of
    collapsed (value, count) runs can be reconstructed — not offered
    here; profile first).
    """
    g = list(group_cols or [])
    xc = F.col(val_col).cast("bigint")
    df = df.where(
        F.when(xc >= 0, F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"concentration: {val_col} must be >= 0, got "),
                    F.col(val_col).cast("string"),
                )
            )
        )
    )
    part = [F.col(c) for c in g] if g else [F.lit(0)]
    w = Window.partitionBy(*part).orderBy(xc)
    ranked = df.select(*g, xc.alias("_x"), F.row_number().over(w).alias("_i"))
    keys = g if g else [F.lit(0).alias("_all")]
    agg = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("total"),
        F.sum(F.col("_x") * F.col("_x")).alias("sumsq"),
        F.sum(F.col("_i") * F.col("_x")).alias("_ix"),
    )
    if not g:
        agg = agg.drop("_all")
    gini_num = (
        F.lit(2) * F.col("_ix") - (F.col("n") + F.lit(1)) * F.col("total")
    ).cast("bigint")
    return agg.select(
        *g,
        "n",
        "total",
        "sumsq",
        gini_num.alias("gini_num"),
        F.when(
            (F.col("total") > 0) & (F.col("n") > 1),
            gini_num.cast("double") / (F.col("n") * F.col("total")).cast("double"),
        ).alias("gini"),
        F.when(
            F.col("total") > 0,
            F.col("sumsq").cast("double")
            / (F.col("total") * F.col("total")).cast("double"),
        ).alias("hhi"),
    )


def prop_test(
    df: DataFrame,
    group_col: str,
    success_col: str,
    sides: tuple = ("a", "b"),
) -> DataFrame:
    """Two-proportion z-test — the A/B experimentation primitive (did
    variant b convert better than a?): pooled-variance z on the
    success rates of two groups.

    EXACT-INTEGER discipline: counts (n_a, s_a, n_b, s_b) are exact;
    clear denominators —

        num   = s_a*n_b - s_b*n_a                 (exact int64)
        s     = s_a + s_b,  n = n_a + n_b
        var_n = s*(n - s)*n_a*n_b                 (exact int64)
        z     = double(num) * sqrt(double(n)) / sqrt(double(var_n))

    derived from z = (p_a - p_b)/sqrt(p(1-p)(1/n_a + 1/n_b)) =
    num*sqrt(n)/sqrt(s(n-s)n_a n_b): every float op is one of four
    correctly-rounded steps on exact ints — gate-hashable.
    ``success_col`` must be 0/1 (WHERE guard); diff_num = num (with
    denominator n_a*n_b) stays exact. Overflow: s(n-s)n_a n_b ~ n^4/16
    needs n under ~55k — PRE-AGGREGATE per shard first and pass counts
    through ``prop_test_counts`` for big experiments.

    Returns one row: (n_a, s_a, n_b, s_b, diff_num, z) — z NULL when
    either group is empty or the pooled rate is 0 or 1.

    Plan: one 2-row hash aggregate pivot — one tiny shuffle.
    """
    sa, sb = sides
    ev = F.col(success_col).cast("bigint")
    df = df.where(
        F.when(ev.isin(0, 1), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"prop_test: {success_col} must be 0/1, got "),
                    F.col(success_col).cast("string"),
                )
            )
        )
    )
    agg = df.agg(
        F.sum((F.col(group_col) == sa).cast("bigint")).alias("n_a"),
        F.sum(F.when(F.col(group_col) == sa, ev).otherwise(0)).alias("s_a"),
        F.sum((F.col(group_col) == sb).cast("bigint")).alias("n_b"),
        F.sum(F.when(F.col(group_col) == sb, ev).otherwise(0)).alias("s_b"),
    )
    return prop_test_counts(agg)


def prop_test_counts(agg: DataFrame) -> DataFrame:
    """The z computation over a pre-aggregated (n_a, s_a, n_b, s_b)
    row — the scale path: aggregate counts however the experiment is
    sharded, then run the exact chain here."""
    num = (F.col("s_a") * F.col("n_b") - F.col("s_b") * F.col("n_a")).cast("bigint")
    s = F.col("s_a") + F.col("s_b")
    n = F.col("n_a") + F.col("n_b")
    var_n = (s * (n - s) * F.col("n_a") * F.col("n_b")).cast("bigint")
    z = (
        num.cast("double")
        * F.sqrt(n.cast("double"))
        / F.sqrt(var_n.cast("double"))
    )
    return agg.select(
        "n_a",
        "s_a",
        "n_b",
        "s_b",
        num.alias("diff_num"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0) & (var_n > 0), z
        ).alias("z"),
    )


def logreg_train(
    df: DataFrame,
    x_cols: list[str],
    label_col: str,
    iters: int = 20,
    lr: tuple = (1, 10),
    w0_micro: list[int] | None = None,
) -> DataFrame:
    """Deterministic distributed logistic regression (batch gradient
    descent) — the in-engine binary trainer beside nb_classify (NB is
    the generative baseline; this is the discriminative one every
    quality-filter pipeline eventually reaches for). Features must be
    INTEGER-valued (quantize first — the repo convention); label 0/1
    (WHERE guard); an intercept is the caller's constant-1 column.

    EXACT-INTEGER spec (replayable to the bit):
      - weights live as micro-unit int64 ``w_micro``;
      - per row: ``dot = sum_j w_micro_j * x_j`` is EXACT int64;
        ``z = double(dot)/1e6``; ``p = 1/(1 + exp(-z))`` (exp is the
        single ~1-ulp op — immediately absorbed by the next step);
        ``s_q = HALF-UP((p - y) * 1e6)`` exact int64;
      - gradient components ``G_j = sum_rows s_q * x_j`` are exact
        int64 sums — partitioning-independent (a float gradient sum is
        not);
      - driver update ``w_j -= (lr_num * G_j) // (lr_den * n)`` with
        PYTHON FLOOR division — part of the spec, replayed verbatim by
        the oracle.

    ``iters`` driver-side aggregate jobs (one narrow map-side-combined
    shuffle each, d+1 int64 columns) — the kmeans-training shape: the
    only driver traffic is d+1 integers per iteration, independent of
    data size.

    Returns ``(feature, w_micro)`` — one row per x_col, in order.

    Overflow: |w_micro * x| summed over d must stay < 2^62 — rescale
    features (|x| < 2^20 with d <= 16 is safe for |w| < 2^35).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    lr_num, lr_den = int(lr[0]), int(lr[1])
    if lr_num < 1 or lr_den < 1:
        raise ValueError(f"lr must be a positive fraction, got {lr}")
    d = len(x_cols)
    if d < 1:
        raise ValueError("x_cols must be non-empty")
    yc = F.col(label_col).cast("bigint")
    df = df.where(
        F.when(yc.isin(0, 1), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"logreg_train: {label_col} must be 0/1, got "),
                    F.col(label_col).cast("string"),
                )
            )
        )
    )
    slim = df.select(
        *[F.col(c).cast("bigint").alias(f"_x{j}") for j, c in enumerate(x_cols)],
        yc.alias("_y"),
    )
    slim = slim.persist()
    try:
        w = list(w0_micro) if w0_micro is not None else [0] * d
        if len(w) != d:
            raise ValueError("w0_micro length must match x_cols")
        for _ in range(iters):
            dot = F.lit(0).cast("bigint")
            for j in range(d):
                dot = dot + F.lit(int(w[j])) * F.col(f"_x{j}")
            z = dot.cast("double") / F.lit(1e6)
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            diff = (p - F.col("_y").cast("double")) * F.lit(1e6)
            s_q = (
                F.when(diff >= 0, F.floor(diff + F.lit(0.5)))
                .otherwise(-F.floor(-diff + F.lit(0.5)))
                .cast("bigint")
            )
            row = slim.select(
                s_q.alias("_s"), *[F.col(f"_x{j}") for j in range(d)]
            ).agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum(F.col("_s") * F.col(f"_x{j}")).alias(f"_g{j}")
                    for j in range(d)
                ],
            ).collect()[0]
            n = row["_n"]
            if n == 0:
                raise ValueError("logreg_train: empty input")
            for j in range(d):
                w[j] = w[j] - (lr_num * row[f"_g{j}"]) // (lr_den * n)
    finally:
        slim.unpersist()
    spark = df.sparkSession
    return spark.createDataFrame(
        [(x_cols[j], int(w[j])) for j in range(d)],
        "feature string, w_micro long",
    )


def logreg_predict(
    df: DataFrame,
    x_cols: list[str],
    w_micro: list[int],
) -> DataFrame:
    """Map-only scoring with a trained micro-unit weight vector:
    adds ``dot`` (exact int64), and ``score_ppm = HALF-UP(p * 1e6)``
    (quantized — exp is the one ~1-ulp op). Zero shuffle."""
    if len(w_micro) != len(x_cols):
        raise ValueError("w_micro length must match x_cols")
    dot = F.lit(0).cast("bigint")
    for j, c in enumerate(x_cols):
        dot = dot + F.lit(int(w_micro[j])) * F.col(c).cast("bigint")
    z = dot.cast("double") / F.lit(1e6)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    ppm = F.floor(p * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    return df.select(*df.columns, dot.alias("dot"), ppm.alias("score_ppm"))


def theil_sen(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    max_n: int = 3000,
) -> DataFrame:
    """Theil–Sen robust trend per key: the LOWER MEDIAN of all
    pairwise slopes (y_j - y_i)/(x_j - x_i) over x_i < x_j — the
    slope estimator that shrugs off ~29% outliers where OLS breaks
    (sensor drift, noisy KPI trends).

    EXACT-RATIONAL spec over INTEGER x/y: slopes are compared by
    CROSS-MULTIPLICATION (no float enters the selection) and the
    chosen slope is returned as the REDUCED fraction ``(slope_num,
    slope_den)`` with slope_den > 0 — equal slopes from different
    pairs reduce identically, so the output is deterministic under
    any partitioning; ``slope`` adds the ONE IEEE division.
    Vertical pairs (x_i = x_j) are excluded (documented); groups with
    < 2 distinct x yield NULL slope. Coordinate deltas must stay
    within 2^26 (loud guard) — that is what makes the double-quotient
    presort EXACTLY the rational order (distinct small-int rationals
    differ by more than both quotients' rounding error).

    Returns ``(group..., n, n_pairs, slope_num, slope_den, slope)``.

    Plan: ONE applyInPandas per group (the all-pairs slope set is
    O(n^2) — inherently per-group; numpy builds the pair matrices,
    exact integer cross-sort picks the median). ``max_n`` guards the
    quadratic kernel LOUDLY (sample or pre-aggregate above it);
    groups parallelize.
    """
    import math

    import numpy as np
    import pandas as pd

    g = list(group_cols or [])
    gf = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in g)
    schema = (gf + ", " if gf else "") + (
        "n bigint, n_pairs bigint, slope_num bigint, slope_den bigint, "
        "slope double"
    )
    slim = df.select(
        *g,
        F.col(x_col).cast("bigint").alias("_x"),
        F.col(y_col).cast("bigint").alias("_y"),
    )

    def _ts(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        if n > max_n:
            raise ValueError(
                f"theil_sen: group of {n} rows exceeds max_n={max_n} "
                "(O(n^2) pairs) — sample or pre-aggregate first"
            )
        x = pdf["_x"].to_numpy(dtype=np.int64)
        y = pdf["_y"].to_numpy(dtype=np.int64)
        i, j = np.triu_indices(n, k=1)
        dx = x[j] - x[i]
        dy = y[j] - y[i]
        flip = dx < 0
        dx = np.where(flip, -dx, dx)
        dy = np.where(flip, -dy, dy)
        keep = dx > 0
        dx, dy = dx[keep], dy[keep]
        head = pdf.iloc[:1][[*g]].copy() if g else pd.DataFrame([{}])
        if len(dx) == 0:
            head["n"] = n
            head["n_pairs"] = 0
            head["slope_num"] = None
            head["slope_den"] = None
            head["slope"] = None
            return head
        # |dy|, dx <= 2^26 makes the double quotient order EXACT:
        # distinct rationals differ by >= 1/(dx1*dx2) > 2^-52 while
        # each quotient is within half an ulp (~2^-53 * |q|) — so the
        # double sort is the exact rational order up to ties of equal
        # VALUE (which reduce to the same fraction). Guarded loudly.
        if int(np.abs(dy).max()) > (1 << 26) or int(dx.max()) > (1 << 26):
            raise ValueError(
                "theil_sen: |dx| or |dy| exceeds 2^26 — rescale/quantize "
                "inputs (the exact-median-order contract)"
            )
        approx = dy.astype(np.float64) / dx.astype(np.float64)
        order = np.argsort(approx, kind="mergesort")
        dy, dx = dy[order], dx[order]
        m = (len(dx) - 1) // 2
        # doubles of small-int reduced rationals collide only for
        # EQUAL rationals, so the double sort IS the exact order up to
        # ties of equal value — the median VALUE is exact
        num, den = int(dy[m]), int(dx[m])
        gg = math.gcd(abs(num), den)
        if gg:
            num, den = num // gg, den // gg
        head["n"] = n
        head["n_pairs"] = len(dx)
        head["slope_num"] = num
        head["slope_den"] = den
        head["slope"] = float(num) / float(den)
        return head

    keyed = slim.groupBy(*(g if g else [F.lit(0).alias("_all")]))
    return keyed.applyInPandas(_ts, schema)


def cohens_kappa(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two raters
    over the same items (human annotators, an annotator vs an
    LLM-judge, two model versions): kappa = (p_o - p_e)/(1 - p_e).

    EXACT-INTEGER spec with cleared denominators: over n paired
    labels, ``agree`` = matching rows, ``pe_num = sum_k a_k * b_k``
    (a_k, b_k = per-label marginal counts), and

        kappa_num = n*agree - pe_num,   kappa_den = n*n - pe_num,
        kappa     = kappa_num / kappa_den      (ONE IEEE division)

    — both numerators exact int64 (n under ~3e9), NULL kappa when
    kappa_den = 0 (both raters constant and identical — agreement is
    degenerate, the standard convention).

    Returns one row ``(n, agree, pe_num, kappa_num, kappa_den,
    kappa)``.

    Plan: one label-pair hash aggregate (bounded by |labels|^2), one
    per-rater marginal aggregate each, a 3-way tiny cross join — all
    map-side combinable, label-bounded shuffles.
    """
    pairs = df.select(
        F.col(a_col).alias("_a"), F.col(b_col).alias("_b")
    )
    tot = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum((F.col("_a") == F.col("_b")).cast("bigint")), F.lit(0)
        ).alias("agree"),
    )
    ma = pairs.groupBy("_a").agg(F.count(F.lit(1)).alias("_ca"))
    mb = pairs.groupBy("_b").agg(F.count(F.lit(1)).alias("_cb"))
    pe = (
        ma.join(mb, ma["_a"] == mb["_b"])
        .agg(F.coalesce(F.sum(F.col("_ca") * F.col("_cb")), F.lit(0)).alias("pe_num"))
    )
    j = tot.crossJoin(pe)
    knum = (F.col("n") * F.col("agree") - F.col("pe_num")).cast("bigint")
    kden = (F.col("n") * F.col("n") - F.col("pe_num")).cast("bigint")
    return j.select(
        "n",
        "agree",
        "pe_num",
        knum.alias("kappa_num"),
        kden.alias("kappa_den"),
        F.when(kden != 0, knum.cast("double") / kden.cast("double")).alias(
            "kappa"
        ),
    )


def kruskal_wallis(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """Kruskal–Wallis H test — the k-group generalization of
    :func:`mann_whitney_u` (did the quality-score distribution differ
    across sources/shards?).

        H = 12/(n(n+1)) · Σ_g R_g²/n_g − 3(n+1),
        H_tie = H / (1 − ΣT/(n³−n)),   T = Σ_ties t³−t

    Exactness: per-group DOUBLED rank sums R2_g are exact int64 (the
    mann_whitney tie-average trick: a value at sorted positions lo..hi
    contributes (lo+hi)/2 each). R2_g² can exceed int64, so each
    group's term R2_g²/(4·n_g) is a FIXED per-group double chain, and
    the k terms are summed by a RUNNING window over groups ordered by
    the group key (order-pinned left fold — the module-header running-
    sum convention), never a shuffle-order double Σ. H and H_tie are
    then one fixed chain each — gate-hashable.

    Overflow: n³ under 2^63 ⇒ n under ~2×10⁶ rows (pre-bin beyond).
    Plan: one (group, value) aggregate, one distinct-value global
    window (ks_test class — distinct values, not rows), one k-row
    group window, broadcast totals. Returns one row
    (n, k, ties_t, h, h_tie).
    """
    v = F.col(value_col)
    gv = df.groupBy(F.col(group_col).alias("_g"), v.alias("_v")).agg(
        F.count(F.lit(1)).alias("_ngv")
    )
    per_v = gv.groupBy("_v").agg(F.sum("_ngv").alias("_cnt"))
    w = (
        Window.partitionBy(F.lit(0))
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = per_v.select(
        "_v",
        "_cnt",
        (F.sum("_cnt").over(w) - F.col("_cnt")).alias("_before"),
    )
    joined = gv.join(ranked, "_v")
    per_g = joined.groupBy("_g").agg(
        F.sum(
            F.col("_ngv")
            * (F.lit(2) * F.col("_before") + F.col("_cnt") + F.lit(1))
        ).alias("_r2"),
        F.sum("_ngv").alias("_ng"),
    )
    term = (F.col("_r2").cast("double") * F.col("_r2").cast("double")) / (
        F.lit(4) * F.col("_ng")
    ).cast("double")
    wg = (
        Window.partitionBy(F.lit(0))
        .orderBy("_g")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wk = Window.partitionBy(F.lit(0))
    folded = per_g.select(
        F.sum(term).over(wg).alias("_s"),
        F.row_number().over(Window.partitionBy(F.lit(0)).orderBy("_g")).alias(
            "_rn"
        ),
        F.count(F.lit(1)).over(wk).alias("k"),
    ).where(F.col("_rn") == F.col("k"))
    ties = per_v.agg(
        F.sum(
            F.col("_cnt") * F.col("_cnt") * F.col("_cnt") - F.col("_cnt")
        ).alias("ties_t"),
        F.sum("_cnt").alias("n"),
    )
    j = folded.crossJoin(F.broadcast(ties))
    n = F.col("n")
    h = (F.col("_s") * F.lit(12.0)) / (n * (n + F.lit(1))).cast("double") - (
        F.lit(3) * (n + F.lit(1))
    ).cast("double")
    denom = F.lit(1.0) - F.col("ties_t").cast("double") / (
        n * n * n - n
    ).cast("double")
    return j.select(
        "n",
        "k",
        "ties_t",
        h.alias("h"),
        F.when(denom != 0.0, h / denom).alias("h_tie"),
    )


def welch_ttest(
    df: DataFrame,
    value_col: str,
    side_col: str,
    sides: tuple[str, str] = ("a", "b"),
) -> DataFrame:
    """Welch's unequal-variance t test + Cohen's d over an INTEGER
    value column — the parametric companion of :func:`mann_whitney_u`.

    From exact int64 moments (n, Σx, Σx² per side):

        v_num  = n·Σx² − (Σx)²                 (exact int64)
        s²/n   = v_num / (n²·(n−1))            (one division)
        t      = (Σx_a·n_b − Σx_b·n_a)/(n_a·n_b) / sqrt(A + B)
        ν      = (A+B)² / (A²/(n_a−1) + B²/(n_b−1))   (Welch–Satterthwaite)
        d      = mean_diff / sqrt(((v_a/n_a) + (v_b/n_b)) / (n_a+n_b−2))

    with A = s_a²/n_a, B = s_b²/n_b — every statistic is ONE fixed
    chain of correctly-rounded IEEE ops on exact integers
    (gate-hashable). Overflow: n·Σx² under 2^63 (floor/rescale inputs).

    Plan: a single map-side-combinable 1-row aggregate. Returns
    (n_a, n_b, mean_diff, t, df_welch, cohens_d) — NULLs when a side
    has fewer than 2 rows.
    """
    sa, sb = sides
    x = F.col(value_col).cast("bigint")
    isa = (F.col(side_col) == sa).cast("bigint")
    isb = (F.col(side_col) == sb).cast("bigint")
    m = df.agg(
        F.sum(isa).alias("na"),
        F.sum(isa * x).alias("sxa"),
        F.sum(isa * x * x).alias("sxxa"),
        F.sum(isb).alias("nb"),
        F.sum(isb * x).alias("sxb"),
        F.sum(isb * x * x).alias("sxxb"),
    )
    na, nb = F.col("na"), F.col("nb")
    va = (na * F.col("sxxa") - F.col("sxa") * F.col("sxa")).cast("bigint")
    vb = (nb * F.col("sxxb") - F.col("sxb") * F.col("sxb")).cast("bigint")
    a = va.cast("double") / (na * na * (na - F.lit(1))).cast("double")
    b = vb.cast("double") / (nb * nb * (nb - F.lit(1))).cast("double")
    mean_diff = (F.col("sxa") * nb - F.col("sxb") * na).cast("double") / (
        na * nb
    ).cast("double")
    t = mean_diff / F.sqrt(a + b)
    dfw = ((a + b) * (a + b)) / (
        (a * a) / (na - F.lit(1)).cast("double")
        + (b * b) / (nb - F.lit(1)).cast("double")
    )
    # pooled variance for Cohen's d: ((n_a−1)s_a² + (n_b−1)s_b²)/(n_a+n_b−2)
    # with (n_a−1)s_a² = v_num_a/n_a
    sp2 = (
        va.cast("double") / na.cast("double")
        + vb.cast("double") / nb.cast("double")
    ) / (na + nb - F.lit(2)).cast("double")
    ok = (na >= 2) & (nb >= 2)
    return m.select(
        "na",
        "nb",
        F.when(ok, mean_diff).alias("mean_diff"),
        F.when(ok, t).alias("t"),
        F.when(ok, dfw).alias("df_welch"),
        F.when(ok & (na + nb > 2), mean_diff / F.sqrt(sp2)).alias(
            "cohens_d"
        ),
    ).withColumnsRenamed({"na": "n_a", "nb": "n_b"})


def _contingency(
    df: DataFrame, a_col: str, b_col: str, full_grid: bool = False
) -> DataFrame:
    """(_a, _b, _o, _r, _c, _n, _ra, _cb): contingency cells with row/
    column margins and totals. Margins are broadcast — categorical
    columns are bounded-cardinality by contract (the CMS keyspace
    posture); the cell aggregate itself is map-side combinable.

    ``full_grid=True`` returns every (row-margin × col-margin) cell
    with _o = 0 where unobserved — REQUIRED for chi-square (a zero
    cell still contributes (r·c)²/(n·r·c) = r·c/n); MI keeps observed
    cells only (0·ln 0 = 0 by convention)."""
    cells = df.groupBy(
        F.col(a_col).alias("_a"), F.col(b_col).alias("_b")
    ).agg(F.count(F.lit(1)).alias("_o"))
    rm = cells.groupBy("_a").agg(F.sum("_o").alias("_r"))
    cm = cells.groupBy("_b").agg(F.sum("_o").alias("_c"))
    tot = cells.agg(
        F.sum("_o").alias("_n"),
        F.count_distinct(F.col("_a")).alias("_ra"),
        F.count_distinct(F.col("_b")).alias("_cb"),
    )
    if full_grid:
        grid = rm.crossJoin(F.broadcast(cm))
        base = grid.join(F.broadcast(cells), ["_a", "_b"], "left").select(
            "_a", "_b", F.coalesce("_o", F.lit(0)).alias("_o"), "_r", "_c"
        )
        return base.crossJoin(F.broadcast(tot))
    return (
        cells.join(F.broadcast(rm), "_a")
        .join(F.broadcast(cm), "_b")
        .crossJoin(F.broadcast(tot))
    )


def cramers_v(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Chi-square independence test + Cramér's V effect size over a
    general r×c contingency table (are language and source
    independent?). Generalizes :func:`chi2_test`'s 2-column
    homogeneity form.

        chi2 = Σ_ij (o_ij·N − r_i·c_j)² / (N·r_i·c_j)
        V    = sqrt(chi2 / (N·min(r−1, c−1)))

    Exactness (the chi2_test discipline): o·N − r·c and N·r·c exact
    int64 (N³ under 2^63 ⇒ N under ~2M rows), each cell's term
    MICRO-quantized HALF-UP before the order-free int64 sum; V is one
    more fixed sqrt/divide chain. Unobserved (a,b) cells are
    materialized from the margin grid — they contribute r·c/n each.
    Returns one row (n, r_card, c_card, chi2, v).
    """
    j = _contingency(df, a_col, b_col, full_grid=True)
    num = (F.col("_o") * F.col("_n") - F.col("_r") * F.col("_c")).cast(
        "bigint"
    )
    den = (F.col("_n") * F.col("_r") * F.col("_c")).cast("bigint")
    t = (num.cast("double") * num.cast("double")) / den.cast("double")
    tq = F.floor(t * F.lit(1_000_000.0) + F.lit(0.5)).cast("bigint")
    agg = j.groupBy(
        F.col("_n").alias("n"),
        F.col("_ra").alias("r_card"),
        F.col("_cb").alias("c_card"),
    ).agg(F.sum(tq).alias("_chi2q"))
    chi2 = F.col("_chi2q").cast("double") / F.lit(1_000_000.0)
    m = F.least(F.col("r_card") - 1, F.col("c_card") - 1).cast("bigint")
    return agg.select(
        "n",
        "r_card",
        "c_card",
        chi2.alias("chi2"),
        F.when(m > 0, F.sqrt(chi2 / (F.col("n") * m).cast("double"))).alias(
            "v"
        ),
    )


def mutual_information(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Mutual information (nats) between two categorical columns —
    the feature-relevance / redundancy screen beside
    :func:`cramers_v` (V measures departure from independence; MI
    measures shared information).

        MI = Σ_ij (n_ij/N) · ln(N·n_ij / (r_i·c_j))

    Exactness (the kaplan_meier ln posture): each cell's term
    ``n_ij · ln((N·n_ij)/(r_i·c_j))`` is a fixed chain — exact-int64
    division then one ln (~1-ulp across engines) — quantized to MICRO
    units HALF-UP-away-from-zero (terms can be negative) before the
    order-free int64 sum; the micro grid absorbs the ln drift outside
    a measure-zero band. Returns one row
    (n, n_cells, mi_micro_rows, mi_nats) with
    ``mi_nats = mi_micro_rows / (10^6 · N)``.
    """
    j = _contingency(df, a_col, b_col)
    arg = (F.col("_n") * F.col("_o")).cast("double") / (
        F.col("_r") * F.col("_c")
    ).cast("double")
    t = F.col("_o").cast("double") * F.log(arg)
    tq = F.when(
        t >= 0, F.floor(t * F.lit(1_000_000.0) + F.lit(0.5))
    ).otherwise(-F.floor(-t * F.lit(1_000_000.0) + F.lit(0.5))).cast(
        "bigint"
    )
    agg = j.groupBy(F.col("_n").alias("n")).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(tq).alias("mi_micro_rows"),
    )
    return agg.select(
        "n",
        "n_cells",
        "mi_micro_rows",
        (
            F.col("mi_micro_rows").cast("double")
            / F.lit(1_000_000.0)
            / F.col("n").cast("double")
        ).alias("mi_nats"),
    )


def decision_stump(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Best single-feature binary split by Gini impurity — the
    depth-1 decision tree (the classic quality-filter baseline: one
    interpretable threshold on an integer feature vs a 0/1 label).

    Minimizing weighted Gini ``n_L·g_L + n_R·g_R`` is equivalent to
    MAXIMIZING ``score = (p_L²+q_L²)/n_L + (p_R²+q_R²)/n_R`` (p/q =
    positive/negative counts — all exact int64 from one cumulative
    window over DISTINCT feature values). Each candidate's score is a
    fixed per-row double chain; the argmax breaks score ties by the
    SMALLEST threshold via max(struct(score, -v)) — deterministic
    cross-engine. Candidate t splits x <= t / x > t; the max value is
    not a candidate (empty right side).

    Overflow: p² under 2^63 ⇒ n under ~3×10⁹ rows. Plan: ks_test
    class — one distinct-value aggregate, one cumulative window,
    broadcast totals, one max. Returns one row (threshold, score,
    wgini, n_left, n_right, pos_left, pos_right, pred_left,
    pred_right).
    """
    y = F.col(y_col).cast("bigint")
    df = df.where(
        F.when(y.isin(0, 1), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"decision_stump: {y_col} must be 0/1, got "),
                    y.cast("string"),
                )
            )
        )
    )
    pv = df.groupBy(F.col(x_col).alias("_v")).agg(
        F.sum(y).alias("_pos"), F.count(F.lit(1)).alias("_n")
    )
    w = (
        Window.partitionBy(F.lit(0))
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = pv.select(
        "_v",
        F.sum("_n").over(w).alias("_nl"),
        F.sum("_pos").over(w).alias("_pl"),
    )
    tot = df.agg(
        F.count(F.lit(1)).alias("_tn"), F.sum(y).alias("_tp")
    )
    cand = cum.crossJoin(F.broadcast(tot)).where(F.col("_nl") < F.col("_tn"))
    pl, nl = F.col("_pl"), F.col("_nl")
    ql = nl - pl
    nr = F.col("_tn") - nl
    pr = F.col("_tp") - pl
    qr = nr - pr
    score = (pl * pl + ql * ql).cast("double") / nl.cast("double") + (
        pr * pr + qr * qr
    ).cast("double") / nr.cast("double")
    best = cand.select(
        F.struct(
            score.alias("s"),
            (-F.col("_v")).alias("negv"),
            F.col("_v").alias("v"),
            nl.alias("nl"),
            nr.alias("nr"),
            pl.alias("pl"),
            pr.alias("pr"),
            F.col("_tn").alias("tn"),
        ).alias("_c")
    ).agg(F.max("_c").alias("_b"))
    b = F.col("_b")
    return best.select(
        b["v"].alias("threshold"),
        b["s"].alias("score"),
        ((b["tn"].cast("double") - b["s"]) / b["tn"].cast("double")).alias(
            "wgini"
        ),
        b["nl"].alias("n_left"),
        b["nr"].alias("n_right"),
        b["pl"].alias("pos_left"),
        b["pr"].alias("pos_right"),
        (F.lit(2) * b["pl"] >= b["nl"]).cast("int").alias("pred_left"),
        (F.lit(2) * b["pr"] >= b["nr"]).cast("int").alias("pred_right"),
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    side_col: str,
    sides: tuple[str, str] = ("a", "b"),
    lo: int = 0,
    hi: int = 1000,
    n_bins: int = 10,
) -> DataFrame:
    """Population stability index between two sides over fixed-range
    integer bins — THE standard ML-monitoring drift score beside
    :func:`ks_test` (numeric CDF gap) and :func:`chi2_test`
    (categorical):

        PSI = Σ_bins (p_a − p_b) · ln(p_a / p_b)

    with ADD-ONE smoothing (the bigram_lm posture): ``c' = c+1,
    n' = n+n_bins`` — zero bins are defined and EVERY bin contributes
    (the bin spine is materialized from spark.range, not from
    observed data). Bin = ``(v−lo)·n_bins DIV (hi−lo)`` clamped to
    [0, n_bins) — all-integer, out-of-range values land in the edge
    bins.

    Exactness (kaplan_meier ln posture): per bin,
    ``d = (c_a'·n_b' − c_b'·n_a')/(n_a'·n_b')`` and
    ``l = ln((c_a'·n_b')/(c_b'·n_a'))`` are fixed chains on exact
    int64; ``d·l >= 0`` is micro-quantized HALF-UP then int64-summed
    (order-free). Returns one row (n_a, n_b, n_bins, psi_micro, psi).

    Plan: one n_bins-bounded aggregate + an n_bins-row spine join —
    nothing scales with rows except the map-side partials.
    """
    sa, sb = sides
    binc = F.least(
        F.greatest(
            F.expr(f"(({value_col} - {lo}) * {n_bins}) DIV ({hi} - {lo})"),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    ).cast("bigint")
    per = df.groupBy(binc.alias("_bin")).agg(
        F.sum((F.col(side_col) == sa).cast("bigint")).alias("_ca"),
        F.sum((F.col(side_col) == sb).cast("bigint")).alias("_cb"),
    )
    spine = df.sparkSession.range(n_bins).select(
        F.col("id").alias("_bin")
    )
    full = spine.join(F.broadcast(per), "_bin", "left").select(
        "_bin",
        F.coalesce("_ca", F.lit(0)).alias("_ca"),
        F.coalesce("_cb", F.lit(0)).alias("_cb"),
    )
    tot = df.agg(
        F.sum((F.col(side_col) == sa).cast("bigint")).alias("n_a"),
        F.sum((F.col(side_col) == sb).cast("bigint")).alias("n_b"),
    )
    j = full.crossJoin(F.broadcast(tot))
    ca1 = F.col("_ca") + 1
    cb1 = F.col("_cb") + 1
    na1 = F.col("n_a") + n_bins
    nb1 = F.col("n_b") + n_bins
    d = (ca1 * nb1 - cb1 * na1).cast("double") / (na1 * nb1).cast("double")
    ln = F.log((ca1 * nb1).cast("double") / (cb1 * na1).cast("double"))
    t = d * ln
    tq = F.floor(t * F.lit(1_000_000.0) + F.lit(0.5)).cast("bigint")
    out = j.groupBy("n_a", "n_b").agg(F.sum(tq).alias("psi_micro"))
    return out.select(
        "n_a",
        "n_b",
        F.lit(n_bins).alias("n_bins"),
        "psi_micro",
        (F.col("psi_micro").cast("double") / F.lit(1_000_000.0)).alias(
            "psi"
        ),
    )


def kendall_tau(
    df: DataFrame, x_col: str, y_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Kendall's tau-b rank correlation per group — the
    concordance-based companion of :func:`spearman_corr` (robust to
    monotone transforms, has the cleanest tie story).

        tau_b = (nc − nd) / (sqrt(n0 − n1) · sqrt(n0 − n2))

    with nc/nd = concordant/discordant pairs, n0 = n(n−1)/2, n1/n2 =
    pairs tied in x / in y (both-tied counts in BOTH). All counts are
    exact int64 from ONE brute pairwise self-join (the theil_sen
    posture: the documented EXACT verifier, O(n²) per group — sample
    or bin beyond ~10⁴ rows/group); tau_b is one fixed
    sqrt·sqrt/divide chain. Requires a unique ``id_col``-free total
    order — pairs are formed on a row-id inequality derived from
    (x, y, monotonic id), so the caller passes rows with a unique
    ``_rid`` column OR we synthesize one from the natural key columns.

    Returns (group..., n, nc, nd, n0, n1, n2, tau_b); tau_b NULL when
    a side is entirely tied.
    """
    g = list(group_cols or [])
    w = Window.partitionBy(*([F.col(c) for c in g] or [F.lit(0)])).orderBy(
        "_x", "_y"
    )
    base = df.select(
        *g,
        F.col(x_col).cast("bigint").alias("_x"),
        F.col(y_col).cast("bigint").alias("_y"),
    ).withColumn("_rid", F.row_number().over(w))
    a = base.alias("a")
    b = base.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in g] + [
        F.col("a._rid") < F.col("b._rid")
    ]
    dx = F.col("b._x") - F.col("a._x")
    dy = F.col("b._y") - F.col("a._y")
    pairs = a.join(b, cond).select(
        *[F.col(f"a.{c}") for c in g],
        dx.alias("_dx"),
        dy.alias("_dy"),
    )
    keys = [F.col(c) for c in g] if g else [F.lit(0).alias("_all")]
    agg = pairs.groupBy(*keys).agg(
        F.sum(
            (
                ((F.col("_dx") > 0) & (F.col("_dy") > 0))
                | ((F.col("_dx") < 0) & (F.col("_dy") < 0))
            ).cast("bigint")
        ).alias("nc"),
        F.sum(
            (
                ((F.col("_dx") > 0) & (F.col("_dy") < 0))
                | ((F.col("_dx") < 0) & (F.col("_dy") > 0))
            ).cast("bigint")
        ).alias("nd"),
        F.sum(((F.col("_dx") == 0) & (F.col("_dy") != 0)).cast("bigint")).alias("_tx"),
        F.sum(((F.col("_dx") != 0) & (F.col("_dy") == 0)).cast("bigint")).alias("_ty"),
        F.sum(((F.col("_dx") == 0) & (F.col("_dy") == 0)).cast("bigint")).alias("_txy"),
    )
    if not g:
        agg = agg.drop("_all")
    nkeys = [F.col(c) for c in g] if g else [F.lit(0).alias("_all")]
    ns = base.groupBy(*nkeys).agg(F.count(F.lit(1)).alias("n"))
    if not g:
        ns = ns.drop("_all")
        j = agg.crossJoin(F.broadcast(ns))
    else:
        j = agg.join(ns, g)
    n0 = (F.col("n") * (F.col("n") - 1)).cast("bigint") / F.lit(2)
    n0 = F.floor(n0).cast("bigint")
    n1 = (F.col("_tx") + F.col("_txy")).cast("bigint")
    n2 = (F.col("_ty") + F.col("_txy")).cast("bigint")
    den = F.sqrt((n0 - n1).cast("double")) * F.sqrt((n0 - n2).cast("double"))
    return j.select(
        *g,
        "n",
        "nc",
        "nd",
        n0.alias("n0"),
        n1.alias("n1"),
        n2.alias("n2"),
        F.when(
            (n0 > n1) & (n0 > n2),
            (F.col("nc") - F.col("nd")).cast("double") / den,
        ).alias("tau_b"),
    )


def binseg_split(
    df: DataFrame,
    seq_col: str,
    val_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Best single changepoint per series by SSE reduction (binary
    segmentation, depth 1) — the mean-shift detector beside
    :func:`cusum_changepoints` (CUSUM flags drift online; binseg finds
    THE split retrospectively).

    Minimizing SSE_left + SSE_right is equivalent to MAXIMIZING
    ``score = S_L²/n_L + S_R²/n_R`` (S = exact int64 prefix sums from
    one cumulative window over the seq order; squares taken in double
    — the decision_stump discipline). Ties broken by the SMALLEST
    split seq via max(struct(score, -seq)). ``gain = score − S²/n``
    (the between-segments sum of squares — 0 when the series is
    flat). ``seq`` must be unique per group.

    Plan: one per-group cumulative window + one max aggregate — the
    cusum scale class. Returns one row per group: (group...,
    split_seq, n_left, n_right, sum_left, sum_right, score, gain) —
    the split is AFTER split_seq.
    """
    g = list(group_cols or [])
    part = [F.col(c) for c in g] if g else [F.lit(0)]
    x = F.col(val_col).cast("bigint")
    w = (
        Window.partitionBy(*part)
        .orderBy("_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*part)
    cum = df.select(*g, F.col(seq_col).alias("_seq"), x.alias("_x")).select(
        *g,
        "_seq",
        F.sum("_x").over(w).alias("_sl"),
        F.row_number()
        .over(Window.partitionBy(*part).orderBy("_seq"))
        .alias("_nl"),
        F.sum("_x").over(wall).alias("_st"),
        F.count(F.lit(1)).over(wall).alias("_nt"),
    )
    cand = cum.where(F.col("_nl") < F.col("_nt"))
    sl, nl = F.col("_sl"), F.col("_nl")
    sr = F.col("_st") - sl
    nr = F.col("_nt") - nl
    score = (sl.cast("double") * sl.cast("double")) / nl.cast("double") + (
        sr.cast("double") * sr.cast("double")
    ) / nr.cast("double")
    best = cand.select(
        *g,
        F.struct(
            score.alias("s"),
            (-F.col("_seq")).alias("negseq"),
            F.col("_seq").alias("seq"),
            nl.alias("nl"),
            nr.alias("nr"),
            sl.alias("sl"),
            sr.alias("sr"),
            F.col("_st").alias("st"),
            F.col("_nt").alias("nt"),
        ).alias("_c"),
    )
    keys = [F.col(c) for c in g] if g else [F.lit(0).alias("_all")]
    agg = best.groupBy(*keys).agg(F.max("_c").alias("_b"))
    if not g:
        agg = agg.drop("_all")
    b = F.col("_b")
    base_score = (b["st"].cast("double") * b["st"].cast("double")) / b[
        "nt"
    ].cast("double")
    return agg.select(
        *g,
        b["seq"].alias("split_seq"),
        b["nl"].alias("n_left"),
        b["nr"].alias("n_right"),
        b["sl"].alias("sum_left"),
        b["sr"].alias("sum_right"),
        b["s"].alias("score"),
        (b["s"] - base_score).alias("gain"),
    )


def moments_profile(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Central moments m2/m3/m4 + skewness and excess kurtosis per
    group — the distribution-shape profiler beside
    :func:`profile_table` (is the quality-score column symmetric?
    heavy-tailed?).

    Exactness: raw power sums Σx..Σx⁴ are EXACT int64 (bound: keep
    n·max(x)⁴ under 2^53 — floor/rescale inputs beyond; the double
    conversion of each sum is then exact), and every central moment is
    ONE fixed left-associative chain of correctly-rounded IEEE ops on
    those exact sums:

        m2 = (n·Σx² − S²) / n²                       (numerator int64)
        m3 = (n²Σx³ − 3nSΣx² + 2S³) / n³             (chain in double)
        m4 = (n³Σx⁴ − 4n²SΣx³ + 6nS²Σx² − 3S⁴) / n⁴  (chain in double)

    skew = m3/(sqrt(m2)·m2), kurtosis_ex = m4/(m2·m2) − 3. NOTE the
    earlier draft folded per-value double terms through a running
    window — DuckDB evaluates cumulative window sums with a segment
    tree, so the summation ORDER differs from Spark's and the last
    ulp drifts; raw integer sums have no order at all.

    Plan: ONE map-side-combinable aggregate per group — nothing else.
    Returns (group..., n, mean, m2, m3, m4, skewness, kurtosis_ex);
    shape stats NULL when m2 = 0.
    """
    g = list(group_cols or [])
    x = F.col(value_col).cast("bigint")
    keys = [F.col(c) for c in g] if g else [F.lit(0).alias("_all")]
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(x).alias("_s1"),
        F.sum(x * x).alias("_s2"),
        F.sum(x * x * x).alias("_s3"),
        F.sum(x * x * x * x).alias("_s4"),
    )
    if not g:
        agg = agg.drop("_all")
    nd = F.col("_n").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    s3 = F.col("_s3").cast("double")
    s4 = F.col("_s4").cast("double")
    a_int = (F.col("_n") * F.col("_s2") - F.col("_s1") * F.col("_s1")).cast(
        "bigint"
    )
    m2 = a_int.cast("double") / (nd * nd)
    b = nd * nd * s3 - F.lit(3.0) * nd * s1 * s2 + F.lit(2.0) * s1 * s1 * s1
    m3 = b / (nd * nd * nd)
    c = (
        nd * nd * nd * s4
        - F.lit(4.0) * nd * nd * s1 * s3
        + F.lit(6.0) * nd * s1 * s1 * s2
        - F.lit(3.0) * s1 * s1 * s1 * s1
    )
    m4 = c / (nd * nd * nd * nd)
    return agg.select(
        *g,
        F.col("_n").alias("n"),
        (s1 / nd).alias("mean"),
        m2.alias("m2"),
        m3.alias("m3"),
        m4.alias("m4"),
        F.when(m2 > 0, m3 / (F.sqrt(m2) * m2)).alias("skewness"),
        F.when(m2 > 0, m4 / (m2 * m2) - F.lit(3.0)).alias("kurtosis_ex"),
    )


def jsd_divergence(
    df: DataFrame,
    cat_col: str,
    side_col: str,
    sides: tuple[str, str] = ("a", "b"),
) -> DataFrame:
    """Jensen–Shannon divergence (nats) between two sides over a
    categorical column — the SYMMETRIC, bounded (≤ ln 2) drift score
    beside :func:`psi_drift` (PSI blows up on vanishing bins; JSD
    saturates).

        JSD = ½·Σ p_a·ln(p_a/m) + ½·Σ p_b·ln(p_b/m),
        m = (p_a + p_b)/2

    ADD-ONE smoothing per side (c' = c+1 over the union category set,
    n' = n+K — the psi_drift posture) keeps every term defined. Per
    category the two half-terms are fixed chains on exact int64 —
    ``p_a/m = 2·c_a'·n_b' / (c_a'·n_b' + c_b'·n_a')`` — quantized to
    MICRO-nats HALF-UP-away-from-zero and int64-summed (order-free).
    Returns one row (n_a, n_b, n_cats, jsd_micro, jsd).

    Plan: one category aggregate + broadcast totals (chi2_test class).
    """
    sa, sb = sides
    per = df.groupBy(F.col(cat_col).alias("_c")).agg(
        F.sum((F.col(side_col) == sa).cast("bigint")).alias("_ca"),
        F.sum((F.col(side_col) == sb).cast("bigint")).alias("_cb"),
    )
    tot = df.agg(
        F.sum((F.col(side_col) == sa).cast("bigint")).alias("n_a"),
        F.sum((F.col(side_col) == sb).cast("bigint")).alias("n_b"),
        F.count_distinct(F.col(cat_col)).alias("n_cats"),
    )
    j = per.crossJoin(F.broadcast(tot))
    ca1 = F.col("_ca") + 1
    cb1 = F.col("_cb") + 1
    na1 = F.col("n_a") + F.col("n_cats")
    nb1 = F.col("n_b") + F.col("n_cats")
    cross_a = ca1 * nb1
    cross_b = cb1 * na1
    mden = (cross_a + cross_b).cast("double")
    ta = (ca1.cast("double") / na1.cast("double")) * F.log(
        (F.lit(2) * cross_a).cast("double") / mden
    )
    tb = (cb1.cast("double") / nb1.cast("double")) * F.log(
        (F.lit(2) * cross_b).cast("double") / mden
    )

    def _q(t):
        return (
            F.when(t >= 0, F.floor(t * F.lit(1_000_000.0) + F.lit(0.5)))
            .otherwise(-F.floor(-t * F.lit(1_000_000.0) + F.lit(0.5)))
            .cast("bigint")
        )

    agg = j.groupBy("n_a", "n_b", "n_cats").agg(
        F.sum(_q(ta) + _q(tb)).alias("_s2")
    )
    # the ½ factor: exact integer halving of the micro-nat sum
    return agg.select(
        "n_a",
        "n_b",
        "n_cats",
        F.expr("_s2 DIV 2").alias("jsd_micro"),
        (
            F.expr("_s2 DIV 2").cast("double") / F.lit(1_000_000.0)
        ).alias("jsd"),
    )


def ransac_line(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_candidates: int = 32,
    tol: int = 5,
) -> DataFrame:
    """Deterministic RANSAC line fit over integer points — the
    outlier-immune alternative to :func:`ols_fit` when the data is
    mostly-line + contamination (:func:`theil_sen` is exact but
    O(n²); RANSAC is linear with a fixed candidate budget).

    NO RNG: candidate c ∈ [0, K) samples the rows ranked
    ``md5_40('r:c:a') % n + 1`` and ``... 'r:c:b' ... `` in the
    (x, y) row_number order (the stratified_sample md5 posture —
    both engines reproduce the draw). Degenerate candidates
    (same row, or Δx = 0) are dropped. A point is an inlier of
    candidate (p1, p2) iff

        |dy·(x − x1) − dx·(y − y1)| <= tol·|dx|      (all exact int64)

    i.e. vertical distance <= tol. Winner = max inliers, ties to the
    smallest candidate id. slope/intercept are one division each on
    the exact winner ints.

    Plan: one ranking window + two rid equi-joins (K rows) + one
    broadcast candidates × rows scan (K·n, K fixed) + one max — the
    scan dominates and is embarrassingly parallel. Overflow: |dy·x|
    under 2^63.

    Returns one row: (cand_id, n_inliers, x1, y1, x2, y2, slope,
    intercept).
    """
    if n_candidates < 1:
        raise ValueError("n_candidates must be >= 1")
    spark = df.sparkSession
    pts = df.select(
        F.col(x_col).cast("bigint").alias("_x"),
        F.col(y_col).cast("bigint").alias("_y"),
    )
    w = Window.partitionBy(F.lit(0)).orderBy("_x", "_y")
    ranked = pts.withColumn("_rid", F.row_number().over(w))
    nrow = pts.agg(F.count(F.lit(1)).alias("_n"))

    def _h(tag: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("r:"), F.col("id").cast("string"), F.lit(f":{tag}")
                    )
                ),
                1,
                10,
            ),
            16,
            10,
        ).cast("bigint")

    cands = (
        spark.range(n_candidates)
        .crossJoin(F.broadcast(nrow))
        .select(
            F.col("id").alias("cand_id"),
            (F.pmod(_h("a"), F.col("_n")) + 1).alias("_i1"),
            (F.pmod(_h("b"), F.col("_n")) + 1).alias("_i2"),
        )
        .where(F.col("_i1") != F.col("_i2"))
    )
    p1 = ranked.select(
        F.col("_rid").alias("_i1"),
        F.col("_x").alias("x1"),
        F.col("_y").alias("y1"),
    )
    p2 = ranked.select(
        F.col("_rid").alias("_i2"),
        F.col("_x").alias("x2"),
        F.col("_y").alias("y2"),
    )
    lines = (
        cands.join(p1, "_i1")
        .join(p2, "_i2")
        .where(F.col("x2") != F.col("x1"))
        .select(
            "cand_id",
            "x1",
            "y1",
            "x2",
            "y2",
            (F.col("x2") - F.col("x1")).alias("_dx"),
            (F.col("y2") - F.col("y1")).alias("_dy"),
        )
    )
    joined = pts.crossJoin(F.broadcast(lines))
    resid = F.abs(
        F.col("_dy") * (F.col("_x") - F.col("x1"))
        - F.col("_dx") * (F.col("_y") - F.col("y1"))
    )
    inl = joined.where(resid <= F.lit(int(tol)) * F.abs(F.col("_dx")))
    per = inl.groupBy(
        "cand_id", "x1", "y1", "x2", "y2", "_dx", "_dy"
    ).agg(F.count(F.lit(1)).alias("n_inliers"))
    best = per.select(
        F.struct(
            F.col("n_inliers").alias("ni"),
            (-F.col("cand_id")).alias("negc"),
            F.col("cand_id").alias("cand_id"),
            F.col("x1").alias("x1"),
            F.col("y1").alias("y1"),
            F.col("x2").alias("x2"),
            F.col("y2").alias("y2"),
            F.col("_dx").alias("dx"),
            F.col("_dy").alias("dy"),
        ).alias("_c")
    ).agg(F.max("_c").alias("_b"))
    b = F.col("_b")
    return best.select(
        b["cand_id"].alias("cand_id"),
        b["ni"].alias("n_inliers"),
        b["x1"].alias("x1"),
        b["y1"].alias("y1"),
        b["x2"].alias("x2"),
        b["y2"].alias("y2"),
        (b["dy"].cast("double") / b["dx"].cast("double")).alias("slope"),
        (
            (b["y1"] * b["dx"] - b["dy"] * b["x1"]).cast("double")
            / b["dx"].cast("double")
        ).alias("intercept"),
    )


def conformal_threshold(
    df: DataFrame,
    score_col: str,
    alpha_num: int,
    alpha_den: int,
) -> DataFrame:
    """Split-conformal prediction threshold over INTEGER nonconformity
    scores: the ⌈(n+1)·(1−α)⌉-th smallest calibration score — new
    examples whose score is <= threshold get coverage >= 1−α
    (distribution-free, the modern ML uncertainty primitive).

        r = ceil((n+1)·(αd−αn) / αd)   (exact integer ceil-DIV)
        threshold = r-th order statistic (exact, type-1)

    r > n (tiny calibration sets / tiny α) yields a NULL threshold —
    the honest "predict everything" answer — with the rank still
    reported. Plan: the exact_quantiles shape — one distinct-value
    aggregate + one cumulative window over DISTINCT values + one min.
    Returns one row (n, rank_r, threshold, coverage_target).
    """
    if not (0 < alpha_num < alpha_den):
        raise ValueError("need 0 < alpha_num < alpha_den")
    an, ad = int(alpha_num), int(alpha_den)
    s = F.col(score_col).cast("bigint")
    pv = df.groupBy(s.alias("_v")).agg(F.count(F.lit(1)).alias("_c"))
    w = (
        Window.partitionBy(F.lit(0))
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = pv.select("_v", F.sum("_c").over(w).alias("_cum"))
    tot = df.agg(F.count(F.lit(1)).alias("n"))
    r = F.expr(f"((n + 1) * {ad - an} + {ad} - 1) DIV {ad}")
    j = cum.crossJoin(F.broadcast(tot.select("n", r.alias("rank_r"))))
    hit = j.where(F.col("_cum") >= F.col("rank_r"))
    th = hit.groupBy("n", "rank_r").agg(F.min("_v").alias("threshold"))
    base = tot.select(
        "n",
        r.alias("rank_r"),
        F.lit(float(ad - an) / float(ad)).alias("coverage_target"),
    )
    return base.join(th.select("n", "threshold"), "n", "left").select(
        "n", "rank_r", "threshold", "coverage_target"
    )


def target_encode(
    df: DataFrame, cat_col: str, y_col: str, k: int = 20
) -> DataFrame:
    """Smoothed target encoding of a categorical column — the classic
    high-cardinality feature transform (category → shrunk mean
    target), with the empirical-Bayes prior weight ``k``:

        enc_c = (Σy_c + k·μ) / (n_c + k)
              = (Σy_c·n + k·Σy) / (n·(n_c + k))     (cleared)

    The numerator/denominator are exact int64 (bound: Σy_c·n under
    2^63 — floor/rescale y beyond) and enc is ONE division —
    gate-hashable. Rare categories shrink toward the global mean;
    k = 0 is the raw per-category mean.

    Plan: one category aggregate + a broadcast 1-row global — nothing
    scales beyond |categories|. Returns (cat, n_c, sum_y, enc).
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    y = F.col(y_col).cast("bigint")
    per = df.groupBy(F.col(cat_col).alias("cat")).agg(
        F.count(F.lit(1)).alias("n_c"), F.sum(y).alias("sum_y")
    )
    tot = df.agg(F.count(F.lit(1)).alias("_n"), F.sum(y).alias("_sy"))
    j = per.crossJoin(F.broadcast(tot))
    num = (F.col("sum_y") * F.col("_n") + F.lit(int(k)) * F.col("_sy")).cast(
        "bigint"
    )
    den = (F.col("_n") * (F.col("n_c") + F.lit(int(k)))).cast("bigint")
    return j.select(
        "cat",
        "n_c",
        "sum_y",
        (num.cast("double") / den.cast("double")).alias("enc"),
    )


def sprt_llr_micro(
    p0_num: int, p0_den: int, p1_num: int, p1_den: int
) -> tuple[int, int]:
    """Per-observation SPRT log-likelihood-ratio contributions in
    micro-nats (success, failure), quantized HALF-UP-away-from-zero at
    plan time (the fs_weights posture — shared by operator and
    oracle so they cannot drift)."""
    import math

    if not (0 < p0_num < p0_den and 0 < p1_num < p1_den):
        raise ValueError("need 0 < p < 1 for both hypotheses")

    def q(x: float) -> int:
        return int(math.floor(abs(x) * 1e6 + 0.5)) * (1 if x >= 0 else -1)

    p0 = p0_num / p0_den
    p1 = p1_num / p1_den
    return q(math.log(p1 / p0)), q(math.log((1.0 - p1) / (1.0 - p0)))


def sprt_decision(
    df: DataFrame,
    exp_col: str,
    seq_col: str,
    y_col: str,
    p0: tuple[int, int],
    p1: tuple[int, int],
    upper_micro: int,
    lower_micro: int,
) -> DataFrame:
    """Wald's Sequential Probability Ratio Test per experiment — the
    always-valid A/B stopping rule: walk the observations in order,
    accumulate the Bernoulli log-likelihood ratio, stop at the FIRST
    crossing of either bound.

    Exactness: contributions are the :func:`sprt_llr_micro` INT
    literals, the cumulative LLR is an exact int64 running sum over
    the (unique-per-experiment) seq order, and the first crossing is
    min(seq) among crossers — all integer, gate-hashable. decision ∈
    {'accept_h1' (llr >= upper), 'accept_h0' (llr <= lower),
    'continue'} with n_obs and llr_micro AT the decision point (the
    final row for 'continue').

    Plan: one keyed window (cumulative sum) + one min-struct
    aggregate per experiment. Returns (exp, decision, n_obs,
    llr_micro).
    """
    wa, wd = sprt_llr_micro(*p0, *p1)
    y = F.col(y_col).cast("bigint")
    df = df.where(
        F.when(y.isin(0, 1), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"sprt_decision: {y_col} must be 0/1, got "),
                    y.cast("string"),
                )
            )
        )
    )
    contrib = F.when(y == 1, F.lit(wa)).otherwise(F.lit(wd)).cast("bigint")
    w = (
        Window.partitionBy(exp_col)
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wr = Window.partitionBy(exp_col).orderBy(seq_col)
    cum = df.select(
        F.col(exp_col).alias("exp"),
        F.col(seq_col).alias("_seq"),
        F.sum(contrib).over(w).alias("_llr"),
        F.row_number().over(wr).alias("_n"),
    )
    crossed = F.when(F.col("_llr") >= upper_micro, F.lit(1)).when(
        F.col("_llr") <= lower_micro, F.lit(2)
    )
    marked = cum.withColumn("_c", crossed)
    first = marked.where(F.col("_c").isNotNull()).groupBy("exp").agg(
        F.min(F.struct("_seq", "_n", "_llr", "_c")).alias("_f")
    )
    last = marked.groupBy("exp").agg(
        F.max(F.struct("_seq", "_n", "_llr")).alias("_l")
    )
    j = last.join(first, "exp", "left")
    dec = (
        F.when(F.col("_f").isNull(), F.lit("continue"))
        .when(F.col("_f")["_c"] == 1, F.lit("accept_h1"))
        .otherwise(F.lit("accept_h0"))
    )
    return j.select(
        "exp",
        dec.alias("decision"),
        F.coalesce(F.col("_f")["_n"], F.col("_l")["_n"]).alias("n_obs"),
        F.coalesce(F.col("_f")["_llr"], F.col("_l")["_llr"]).alias(
            "llr_micro"
        ),
    )


def bootstrap_ci(
    df: DataFrame,
    value_col: str,
    n_replicas: int = 200,
    alpha_num: int = 5,
    alpha_den: int = 100,
) -> DataFrame:
    """Percentile-bootstrap confidence interval for the MEAN of an
    integer column — RNG-free: replica b's i-th draw is the row ranked
    ``md5_40(b:i) % n + 1`` in the value order (the ransac_line seeded
    index posture; the k-th rank's VALUE is deterministic even with
    duplicate values). Each replica mean keeps its EXACT int64 sum;
    the CI endpoints are exact order statistics of the replica sums —
    the ⌈B·α/2⌉-th and ⌈B·(1−α/2)⌉-th smallest (type-1) — so every
    output bit is engine-reproducible.

    Returns one row (n, n_replicas, mean_obs, lo_sum, hi_sum,
    lo_mean, hi_mean). Cost: B·n draw rows through one equi-join —
    bootstrap the SAMPLE, not the table, beyond ~10⁷·B rows.
    """
    if n_replicas < 2:
        raise ValueError("n_replicas must be >= 2")
    if not (0 < alpha_num < alpha_den):
        raise ValueError("need 0 < alpha < 1")
    spark = df.sparkSession
    v = F.col(value_col).cast("bigint")
    w = Window.partitionBy(F.lit(0)).orderBy("_v")
    ranked = df.select(v.alias("_v")).withColumn(
        "_rid", F.row_number().over(w)
    )
    tot = df.agg(F.count(F.lit(1)).alias("_n"), F.sum(v).alias("_sv"))
    b_i = (
        spark.range(n_replicas)
        .select(F.col("id").alias("_b"))
        .crossJoin(F.broadcast(tot))
        # empty input: sequence(0, -1) DESCENDS to [0, -1] and
        # pmod(h, 0) errors/nulls — short-circuit to a clean empty
        # result instead (ADVICE r3)
        .where(F.col("_n") >= 1)
        .select(
            "_b",
            "_n",
            "_sv",
            F.explode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("_i"),
        )
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("_b").cast("string"),
                    F.lit(":"),
                    F.col("_i").cast("string"),
                )
            ),
            1,
            10,
        ),
        16,
        10,
    ).cast("bigint")
    draws = b_i.select(
        "_b", "_n", "_sv", (F.pmod(h, F.col("_n")) + 1).alias("_rid")
    )
    means = (
        draws.join(ranked, "_rid")
        .groupBy("_b", "_n", "_sv")
        .agg(F.sum("_v").alias("_s"))
    )
    # order statistics of replica sums via a distinct-sum window
    pv = means.groupBy("_n", "_sv", F.col("_s").alias("_sum")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    wc = (
        Window.partitionBy(F.lit(0))
        .orderBy("_sum")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = pv.select("_n", "_sv", "_sum", F.sum("_c").over(wc).alias("_cm"))
    b_ = int(n_replicas)
    k_lo = -((-b_ * alpha_num) // (2 * alpha_den))  # ceil(B*a/2)
    k_hi = -((-b_ * (2 * alpha_den - alpha_num)) // (2 * alpha_den))
    lo = cum.where(F.col("_cm") >= k_lo).groupBy("_n", "_sv").agg(
        F.min("_sum").alias("lo_sum")
    )
    hi = cum.where(F.col("_cm") >= k_hi).groupBy("_n", "_sv").agg(
        F.min("_sum").alias("hi_sum")
    )
    j = lo.join(hi, ["_n", "_sv"])
    nd = F.col("_n").cast("double")
    return j.select(
        F.col("_n").alias("n"),
        F.lit(b_).alias("n_replicas"),
        (F.col("_sv").cast("double") / nd).alias("mean_obs"),
        "lo_sum",
        "hi_sum",
        (F.col("lo_sum").cast("double") / nd).alias("lo_mean"),
        (F.col("hi_sum").cast("double") / nd).alias("hi_mean"),
    )


def woe_iv(df: DataFrame, cat_col: str, y_col: str) -> DataFrame:
    """Weight-of-evidence encoding + information value per category —
    the credit-scoring / feature-screening classic beside
    :func:`target_encode` (WoE is the log-odds version; IV summarizes
    a feature's predictive power).

        woe_c = ln( (pos_c'/P') / (neg_c'/N') )
        iv    = Σ_c (pos_c'/P' − neg_c'/N') · woe_c

    with ADD-ONE smoothing per category (the psi_drift posture:
    ``pos' = pos+1, P' = P+K``) so zero cells stay defined. Exactness
    (kaplan_meier ln posture): ``woe_micro = q(ln((pos'·N')/(neg'·P')))``
    micro-nats HALF-UP-away-from-zero; each category's IV term is the
    fixed chain ``(pos'·N' − neg'·P')/(P'·N') · ln(...)`` quantized
    the same way and int64-summed (order-free). The same ``iv_micro``
    rides every row (broadcast 1-row cross join).

    Returns per category: (cat, n, n_pos, n_neg, woe_micro, woe,
    iv_micro). Plan: one category aggregate + broadcast totals —
    chi2_test class. y must be 0/1 (WHERE guard).
    """
    y = F.col(y_col).cast("bigint")
    df = df.where(
        F.when(y.isin(0, 1), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"woe_iv: {y_col} must be 0/1, got "),
                    y.cast("string"),
                )
            )
        )
    )
    per = df.groupBy(F.col(cat_col).alias("cat")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("n_pos"),
        F.sum(F.lit(1) - y).alias("n_neg"),
    )
    tot = per.agg(
        F.sum("n_pos").alias("_p"),
        F.sum("n_neg").alias("_q"),
        F.count(F.lit(1)).alias("_k"),
    )
    j = per.crossJoin(F.broadcast(tot))
    pos1 = F.col("n_pos") + 1
    neg1 = F.col("n_neg") + 1
    p1 = F.col("_p") + F.col("_k")
    q1 = F.col("_q") + F.col("_k")
    ln = F.log((pos1 * q1).cast("double") / (neg1 * p1).cast("double"))

    def _q(t):
        return (
            F.when(t >= 0, F.floor(t * F.lit(1_000_000.0) + F.lit(0.5)))
            .otherwise(-F.floor(-t * F.lit(1_000_000.0) + F.lit(0.5)))
            .cast("bigint")
        )

    d = (pos1 * q1 - neg1 * p1).cast("double") / (p1 * q1).cast("double")
    rows = j.withColumn("_wq", _q(ln)).withColumn("_ivq", _q(d * ln))
    iv = rows.agg(F.sum("_ivq").alias("iv_micro"))
    return rows.crossJoin(F.broadcast(iv)).select(
        "cat",
        "n",
        "n_pos",
        "n_neg",
        F.col("_wq").alias("woe_micro"),
        (F.col("_wq").cast("double") / F.lit(1_000_000.0)).alias("woe"),
        "iv_micro",
    )


def best_split_multi(
    df: DataFrame, feature_cols: list[str], y_col: str
) -> DataFrame:
    """Best Gini split across MULTIPLE integer features — the feature
    selector a tree root performs: run :func:`decision_stump` per
    feature (the per-feature plans are independent and run in
    parallel), return every feature's best split ranked by score, with
    ``is_best`` marking the winner (ties: lexicographically smallest
    feature name — deterministic).

    Returns one row per feature: (feature, rank, is_best, threshold,
    score, wgini, n_left, n_right, pos_left, pos_right, pred_left,
    pred_right).
    """
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    parts = []
    for c in feature_cols:
        parts.append(
            decision_stump(
                df.select(F.col(c).alias("_x"), F.col(y_col)), "_x", y_col
            ).select(F.lit(c).alias("feature"), "*")
        )
    allf = parts[0]
    for p in parts[1:]:
        allf = allf.unionByName(p)
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.col("score").desc(), F.col("feature").asc()
    )
    return allf.withColumn("rank", F.row_number().over(w)).withColumn(
        "is_best", (F.col("rank") == 1).cast("int")
    )


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    side_col: str,
    sides: tuple[str, str] = ("a", "b"),
) -> DataFrame:
    """Two-group log-rank test — THE Kaplan–Meier companion (did the
    two survival curves come from the same hazard?):

        z = Σ_t (O1_t − E1_t) / sqrt(Σ_t V_t),  chi2 = z²
        E1_t = d_t·n1_t/n_t,
        V_t  = d_t·n1_t·n2_t·(n_t − d_t) / (n_t²·(n_t − 1))

    Exactness (kaplan_meier discipline): per-side event/censor counts
    and risk sets are exact int64 (one distinct-time aggregate + one
    suffix window carrying BOTH sides); each time's O−E and V terms
    are fixed chains on exact ints, micro-quantized (O−E HALF-UP-
    away-from-zero, V HALF-UP) and int64-summed order-free. Times
    with n_t <= 1 contribute V = 0. event_col must be 0/1.

    Returns one row (n_a, n_b, oe_micro, v_micro, z, chi2); z NULL
    when v_micro = 0. Plan: ks_test class.
    """
    sa, sb = sides
    ev = F.col(event_col).cast("bigint")
    df = df.where(
        F.when(ev.isin(0, 1), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"logrank_test: {event_col} must be 0/1, got "),
                    F.col(event_col).cast("string"),
                )
            )
        )
    )
    isa = (F.col(side_col) == sa).cast("bigint")
    isb = (F.col(side_col) == sb).cast("bigint")
    per = df.groupBy(F.col(duration_col).alias("_t")).agg(
        F.sum(isa * ev).alias("_d1"),
        F.sum(isa * (1 - ev)).alias("_c1"),
        F.sum(isb * ev).alias("_d2"),
        F.sum(isb * (1 - ev)).alias("_c2"),
    )
    w_after = (
        Window.partitionBy(F.lit(0))
        .orderBy("_t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    r = per.select(
        "_t",
        "_d1",
        "_d2",
        F.sum(F.col("_d1") + F.col("_c1")).over(w_after).alias("_n1"),
        F.sum(F.col("_d2") + F.col("_c2")).over(w_after).alias("_n2"),
    )
    d = F.col("_d1") + F.col("_d2")
    n = F.col("_n1") + F.col("_n2")
    oe = (F.col("_d1") * n - d * F.col("_n1")).cast("double") / n.cast(
        "double"
    )
    v = F.when(
        n > 1,
        (d * F.col("_n1") * F.col("_n2")).cast("double")
        * (n - d).cast("double")
        / (n * n).cast("double")
        / (n - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    oe_q = (
        F.when(oe >= 0, F.floor(oe * F.lit(1_000_000.0) + F.lit(0.5)))
        .otherwise(-F.floor(-oe * F.lit(1_000_000.0) + F.lit(0.5)))
        .cast("bigint")
    )
    v_q = F.floor(v * F.lit(1_000_000.0) + F.lit(0.5)).cast("bigint")
    agg = r.where(d > 0).agg(
        F.sum(oe_q).alias("oe_micro"), F.sum(v_q).alias("v_micro")
    )
    tot = df.agg(F.sum(isa).alias("n_a"), F.sum(isb).alias("n_b"))
    j = tot.crossJoin(agg)
    z = (F.col("oe_micro").cast("double") / F.lit(1_000_000.0)) / F.sqrt(
        F.col("v_micro").cast("double") / F.lit(1_000_000.0)
    )
    return j.select(
        "n_a",
        "n_b",
        "oe_micro",
        "v_micro",
        F.when(F.col("v_micro") > 0, z).alias("z"),
        F.when(F.col("v_micro") > 0, z * z).alias("chi2"),
    )


def anova_f(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """One-way ANOVA F over an integer value column — the parametric
    k-group companion of :func:`kruskal_wallis`:

        F = (SSB/(k−1)) / (SSW/(n−k))
        SSW_g = (n_g·Σx²_g − (Σx_g)²)/n_g
        SSB_g = (Σx_g·n − S·n_g)² / (n²·n_g)

    Per-group terms are fixed chains on exact int64 moments,
    MICRO-quantized HALF-UP (both are >= 0) and int64-summed
    order-free (the chi2_test discipline — a double Σ over groups is
    shuffle-order-dependent); F is one more fixed chain (the micro
    units cancel). Returns one row (n, k, ssb_micro, ssw_micro, f);
    f NULL when k < 2, n <= k, or SSW = 0. Overflow: keep
    n·max(x)·Σ|x| under 2^63 (rescale inputs beyond).

    Plan: one group-moment aggregate + broadcast totals.
    """
    x = F.col(value_col).cast("bigint")
    per = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("_ng"),
        F.sum(x).alias("_sg"),
        F.sum(x * x).alias("_ssg"),
    )
    tot = per.agg(
        F.sum("_ng").alias("_n"),
        F.sum("_sg").alias("_s"),
        F.count(F.lit(1)).alias("_k"),
    )
    j = per.crossJoin(F.broadcast(tot))
    ssw = (
        (F.col("_ng") * F.col("_ssg") - F.col("_sg") * F.col("_sg"))
        .cast("bigint")
        .cast("double")
        / F.col("_ng").cast("double")
    )
    a = (F.col("_sg") * F.col("_n") - F.col("_s") * F.col("_ng")).cast(
        "bigint"
    )
    ssb = (a.cast("double") * a.cast("double")) / (
        F.col("_n").cast("double")
        * F.col("_n").cast("double")
        * F.col("_ng").cast("double")
    )

    def _qq(t):
        return F.floor(t * F.lit(1_000_000.0) + F.lit(0.5)).cast("bigint")

    agg = j.groupBy("_n", "_k").agg(
        F.sum(_qq(ssb)).alias("ssb_micro"),
        F.sum(_qq(ssw)).alias("ssw_micro"),
    )
    fstat = (
        F.col("ssb_micro").cast("double") / (F.col("_k") - 1).cast("double")
    ) / (
        F.col("ssw_micro").cast("double")
        / (F.col("_n") - F.col("_k")).cast("double")
    )
    return agg.select(
        F.col("_n").alias("n"),
        F.col("_k").alias("k"),
        "ssb_micro",
        "ssw_micro",
        F.when(
            (F.col("_k") > 1)
            & (F.col("_n") > F.col("_k"))
            & (F.col("ssw_micro") > 0),
            fstat,
        ).alias("f"),
    )


def poisson_rate_test(
    df: DataFrame,
    count_col: str,
    exposure_col: str,
    side_col: str,
    sides: tuple[str, str] = ("a", "b"),
) -> DataFrame:
    """Two-sample Poisson rate test (Wald, unconditional) over integer
    event counts and integer exposures — the events-per-unit-time
    companion of :func:`prop_test` (defects/hour, crashes/device-day):

        rate_i = X_i / T_i
        z = (X1·T2 − X2·T1) / (T1·T2) / sqrt(X1/T1² + X2/T2²)

    Numerator cleared to exact int64; the variance term is a fixed
    chain of two exact divisions and one add; z is one more
    divide/sqrt chain — gate-hashable. Returns one row (x_a, t_a,
    x_b, t_b, rate_a, rate_b, z); z NULL when either count is 0
    (Wald variance degenerate — use the exact conditional test
    upstream for tiny counts). Plan: one 1-row aggregate.
    """
    sa, sb = sides
    x = F.col(count_col).cast("bigint")
    t = F.col(exposure_col).cast("bigint")
    isa = (F.col(side_col) == sa).cast("bigint")
    isb = (F.col(side_col) == sb).cast("bigint")
    m = df.agg(
        F.sum(isa * x).alias("x_a"),
        F.sum(isa * t).alias("t_a"),
        F.sum(isb * x).alias("x_b"),
        F.sum(isb * t).alias("t_b"),
    )
    xa, ta, xb, tb = (F.col(c) for c in ("x_a", "t_a", "x_b", "t_b"))
    num = (xa * tb - xb * ta).cast("bigint").cast("double") / (
        ta * tb
    ).cast("double")
    var = xa.cast("double") / (ta * ta).cast("double") + xb.cast(
        "double"
    ) / (tb * tb).cast("double")
    return m.select(
        "x_a",
        "t_a",
        "x_b",
        "t_b",
        (xa.cast("double") / ta.cast("double")).alias("rate_a"),
        (xb.cast("double") / tb.cast("double")).alias("rate_b"),
        F.when((xa > 0) & (xb > 0), num / F.sqrt(var)).alias("z"),
    )


def rare_collapse(
    df: DataFrame,
    cat_col: str,
    min_count: int,
    other_label: str = "__other__",
    out_col: str | None = None,
) -> DataFrame:
    """Collapse categories with fewer than ``min_count`` rows into a
    single ``other_label`` bucket — the standard high-cardinality
    guard BEFORE :func:`target_encode` / :func:`woe_iv` / one-hot
    (rare categories otherwise memorize noise and blow up feature
    widths).

    Deterministic and exact: the frequency table is one aggregate;
    the collapse is a broadcast semi-map (keep-set join). Returns the
    input rows with ``out_col`` (default ``{cat}_collapsed``) added.
    Plan: one aggregate + one broadcast join — the keep set is
    bounded by the number of FREQUENT categories (≤ n/min_count).
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    out = out_col or f"{cat_col}_collapsed"
    freq = df.groupBy(F.col(cat_col).alias("_cat")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    keep = freq.where(F.col("_n") >= min_count).select(
        F.col("_cat"), F.lit(True).alias("_keep")
    )
    j = df.join(
        F.broadcast(keep), df[cat_col] == keep["_cat"], "left"
    ).drop("_cat")
    return j.withColumn(
        out,
        F.when(F.col("_keep"), F.col(cat_col)).otherwise(
            F.lit(other_label)
        ),
    ).drop("_keep")


def mcnemar_test(
    df: DataFrame,
    a_col: str,
    b_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """McNemar's paired-proportion test (r4) — THE A/B eval for two
    classifiers/models scored on the SAME examples (did model B's
    per-example wins outnumber model A's, beyond coin-flip noise?).
    Standard model-eval tooling next to roc_auc / confusion_metrics.

    Exact spec: a_col/b_col are 0/1 correctness indicators
    (WHERE-guarded raise otherwise). Only the DISCORDANT counts enter:
    b = #(a=1, b=0), c = #(a=0, b=1). chi2 = (b-c)^2 / (b+c) with
    continuity correction OFF (documented; the CC variant subtracts 1
    from |b-c| — callers comparing to statsmodels exact=False,
    correction=False match this). All counts exact int64; the
    statistic is ONE division of exact ints — engine-reproducible to
    the bit. b+c = 0 (no discordant pairs) yields NULL, the
    degenerate-input convention. n_concordant carried for context.

    Plan: one map-side-combinable hash aggregate (4-cell keyspace per
    group); nothing scales beyond |groups|.

    Returns (group..., n, n_b, n_c, n_concordant, chi2).
    """
    g = list(group_cols or [])
    a = F.col(a_col).cast("bigint")
    b = F.col(b_col).cast("bigint")
    guarded = df.where(
        F.when(a.isin(0, 1) & b.isin(0, 1), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"mcnemar_test: {a_col}/{b_col} must be 0/1, got "),
                    a.cast("string"), F.lit("/"), b.cast("string"),
                )
            )
        )
    )
    agg = guarded.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when((a == 1) & (b == 0), 1).otherwise(0)).alias("n_b"),
        F.sum(F.when((a == 0) & (b == 1), 1).otherwise(0)).alias("n_c"),
    )
    diff = F.col("n_b") - F.col("n_c")
    tot = F.col("n_b") + F.col("n_c")
    return agg.select(
        *g,
        "n",
        "n_b",
        "n_c",
        (F.col("n") - tot).alias("n_concordant"),
        F.when(
            tot > 0, (diff * diff).cast("double") / tot.cast("double")
        ).alias("chi2"),
    )


def cochran_armitage(
    df: DataFrame,
    score_col: str,
    event_col: str,
) -> DataFrame:
    """Cochran–Armitage trend test (r4): is event rate MONOTONE in an
    ordered exposure score? The dose-response / cohort-drift test
    (e.g. does defect rate trend across ordered build generations,
    does click rate trend across ranked slots).

    Exact spec: rows are Bernoulli outcomes (event_col 0/1,
    WHERE-guarded) at integer scores w (score_col, exact int64 —
    caller assigns the ordered category weights). With per-score
    event/total counts, N total rows, R total events:

        T   = N * Σ_i w_i d_i  −  R * Σ_i w_i n_i          (exact int)
        V*  = N * Σ w²n − (Σ w n)²                          (exact int)
        z   = T / sqrt( R/N * (1−R/N) * N * V* )  — evaluated as the
        FIXED chain T / sqrt( (R*(N−R)/N ... )): num = T * sqrt(N),
        den = sqrt(R) * sqrt(N−R) * sqrt(V*) — three correctly-rounded
        sqrts of exact int64s and two multiplies in a pinned order, so
        z hashes identically cross-engine (the getis_ord posture).

    Degenerate inputs (R=0, R=N, or V*=0 — constant score) yield NULL.
    Bounds: exact while N*Σw²n < 2^63 and intermediate products
    < 2^53 in the double chain — caller keeps scores small (category
    codes, not raw micros).

    Plan: one per-score hash aggregate (|scores| keyspace) + one
    1-row reduce; map-side combinable throughout.

    Returns 1 row (n, n_events, n_scores, t_num, v_star, z).
    """
    ev = F.col(event_col).cast("bigint")
    w = F.col(score_col).cast("bigint")
    guarded = df.where(
        F.when(ev.isin(0, 1), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"cochran_armitage: {event_col} must be 0/1, got "),
                    ev.cast("string"),
                )
            )
        )
    ).select(w.alias("_w"), ev.alias("_d"))
    per = guarded.groupBy("_w").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_d").alias("_dd")
    )
    tot = per.agg(
        F.sum("_n").alias("n"),
        F.sum("_dd").alias("n_events"),
        F.count(F.lit(1)).alias("n_scores"),
        F.sum(F.col("_w") * F.col("_dd")).alias("_swd"),
        F.sum(F.col("_w") * F.col("_n")).alias("_swn"),
        F.sum(F.col("_w") * F.col("_w") * F.col("_n")).alias("_sw2n"),
    )
    n = F.col("n")
    r = F.col("n_events")
    t_num = n * F.col("_swd") - r * F.col("_swn")
    v_star = n * F.col("_sw2n") - F.col("_swn") * F.col("_swn")
    z = (
        t_num.cast("double")
        * F.sqrt(n.cast("double"))
        / (
            F.sqrt(r.cast("double"))
            * F.sqrt((n - r).cast("double"))
            * F.sqrt(v_star.cast("double"))
        )
    )
    return tot.select(
        "n",
        "n_events",
        "n_scores",
        t_num.alias("t_num"),
        v_star.alias("v_star"),
        F.when((r > 0) & (r < n) & (v_star > 0), z).alias("z"),
    )


def quantile_normalize(
    df: DataFrame,
    id_col: str,
    feature_col: str,
    value_col: str,
) -> DataFrame:
    """Quantile normalization (r4) — the cross-feature distribution
    equalizer (microarray/omics canon, feature preprocessing for
    rank-sensitive models): every feature's values are replaced by the
    rank-wise REFERENCE distribution pooled across all features, so
    all features end up exactly identically distributed.

    Exact-integer spec: values are int64 (quantize upstream); within
    each feature, ranks are ``row_number`` over (value, id) — a total
    order, so ties are deterministic under any partitioning; the
    reference value at rank r is the SUM of each feature's rank-r
    value (exact int64 — divide by ``n_features`` outside for the
    conventional mean; a floor-div mean here would hide remainders).
    RAGGED feature sets raise loudly (rank r present in only some
    features would silently skew the reference — classic QN assumes
    equal counts).

    Plan: ONE per-feature rank window + ONE rank-keyed aggregate
    (|rows/feature| keyspace) + one join back on (feature is NOT in
    the ref key — ranks align features) — two narrow shuffles, all
    codegen. Returns (id, feature, value, rank, qn_sum, n_features).
    """
    v = F.col(value_col).cast("bigint")
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(feature_col).alias("feature"),
        v.alias("value"),
    )
    n_feat = base.select("feature").distinct().count()
    w = Window.partitionBy("feature").orderBy("value", "id")
    ranked = base.withColumn("rank", F.row_number().over(w))
    ref = ranked.groupBy("rank").agg(
        F.sum("value").alias("qn_sum"), F.count(F.lit(1)).alias("_nf")
    )
    out = ranked.join(ref, "rank")
    return out.where(
        F.when(F.col("_nf") == F.lit(n_feat), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("quantile_normalize: ragged features — rank "),
                    F.col("rank").cast("string"),
                    F.lit(f" present in only some of the {n_feat} features"),
                )
            )
        )
    ).select(
        "id",
        "feature",
        "value",
        "rank",
        "qn_sum",
        F.lit(n_feat).cast("int").alias("n_features"),
    )


def youden_threshold(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Youden-J optimal decision threshold (r4) — the standard
    operating-point picker after roc_auc says a score ranks well:
    choose t maximizing J = TPR − FPR for the rule "positive iff
    score >= t".

    Exact spec (no floats until the last projection): scores are int64
    (quantize upstream); candidate thresholds are the DISTINCT scores;
    with P/N total positives/negatives and (tp, fp) the counts at
    threshold t, maximize the exact integer ``j_num = tp*N − fp*P``
    (== J * P * N); ties break toward the SMALLEST threshold (the more
    sensitive operating point — deterministic, engine-replayable).
    0/1 labels are WHERE-guarded; P == 0 or N == 0 yields an empty
    result (J undefined).

    Plan: one distinct-score aggregate (|scores| keyspace), then the
    cumulative (tp, fp) as a DISTRIBUTED two-pass prefix sum — 1024
    fixed-width score-range buckets, per-bucket totals -> tiny driver
    exclusive prefix (<= 1024 rows) -> within-bucket window partitioned
    by bucket — never a single-partition global window (the
    str_partition/token_budget discipline; micro-quantized float
    scores make |distinct| ~ n, where a global Window.orderBy would
    move every distinct score to ONE task). Then one min-struct argmax
    reduce.

    Returns 1 row (threshold, tp, fp, fn, tn, j_num, j) with
    j = j_num / (P*N) as one final division.
    """
    sc = F.col(score_col).cast("bigint")
    lb = F.col(label_col).cast("bigint")
    guarded = df.where(
        F.when(lb.isin(0, 1), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"youden_threshold: {label_col} must be 0/1, got "),
                    lb.cast("string"),
                )
            )
        )
    ).select(sc.alias("_s"), lb.alias("_y"))
    per = guarded.groupBy("_s").agg(
        F.sum("_y").alias("_p"),
        (F.count(F.lit(1)) - F.sum("_y")).alias("_n"),
    )
    mm = per.agg(F.min("_s"), F.max("_s")).first()
    lo = int(mm[0]) if mm[0] is not None else 0
    hi = int(mm[1]) if mm[1] is not None else 0
    span = hi - lo + 1
    if span > (1 << 62):
        raise ValueError(
            "youden_threshold: score range exceeds 2^62; rescale the "
            "quantization upstream (bucket arithmetic would overflow)"
        )
    n_buckets = 1024
    width = -(-span // n_buckets)  # ceil; bucket 0 = the HIGHEST scores
    per = per.withColumn("_b", F.expr(f"(({hi}L - _s) div {width}L)"))
    totals = {
        int(b): (int(p or 0), int(n or 0))
        for b, p, n in per.groupBy("_b")
        .agg(F.sum("_p"), F.sum("_n"))
        .collect()
    }
    base_tp: dict[int, int] = {}
    base_fp: dict[int, int] = {}
    acc_p = acc_n = 0
    for b in sorted(totals):
        base_tp[b] = acc_p
        base_fp[b] = acc_n
        acc_p += totals[b][0]
        acc_n += totals[b][1]
    if not base_tp:
        base_tp = base_fp = {0: 0}
    _map = lambda d: F.element_at(  # noqa: E731
        F.create_map(*[F.lit(v) for kv in d.items() for v in kv]),
        F.col("_b"),
    )
    w = (
        Window.partitionBy("_b")
        .orderBy(F.col("_s").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per.select(
        "_s",
        (_map(base_tp) + F.sum("_p").over(w)).alias("_tp"),
        (_map(base_fp) + F.sum("_n").over(w)).alias("_fp"),
    )
    tot = guarded.agg(
        F.sum("_y").alias("_P"),
        (F.count(F.lit(1)) - F.sum("_y")).alias("_N"),
    )
    j = cum.crossJoin(F.broadcast(tot)).where(
        (F.col("_P") > 0) & (F.col("_N") > 0)
    )
    jn = F.col("_tp") * F.col("_N") - F.col("_fp") * F.col("_P")
    best = j.agg(
        F.min(
            F.struct(
                (-jn).alias("_njn"),
                F.col("_s").alias("_t"),
                F.col("_tp").alias("_tp"),
                F.col("_fp").alias("_fp"),
                F.col("_P").alias("_P"),
                F.col("_N").alias("_N"),
            )
        ).alias("_m")
    )
    m = F.col("_m")
    return best.where(m.isNotNull()).select(
        m["_t"].alias("threshold"),
        m["_tp"].alias("tp"),
        m["_fp"].alias("fp"),
        (m["_P"] - m["_tp"]).alias("fn"),
        (m["_N"] - m["_fp"]).alias("tn"),
        (-m["_njn"]).alias("j_num"),
        (
            (-m["_njn"]).cast("double")
            / (m["_P"] * m["_N"]).cast("double")
        ).alias("j"),
    )


def bh_fdr(
    df: DataFrame,
    p_col: str = "p_ppm",
    alpha_num: int = 5,
    alpha_den: int = 100,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Benjamini-Hochberg FDR control (r5) — the multiple-testing
    gatekeeper every per-feature drift/AB scan needs above its
    chi2/KS/MWU p-values: of m tests, find the largest i with
    ``p_(i) <= (i/m) * alpha`` and reject everything at or below that
    cutoff, bounding the expected false-discovery rate at alpha.

    EXACT-INTEGER spec: p-values are ppm ints (0..10^6, WHERE-guarded);
    alpha is the rational alpha_num/alpha_den; the step-up condition is
    the cross-multiplication ``p * m * alpha_den <= i * alpha_num *
    10^6`` — no float ever enters, so the cutoff is engine-replayable
    bit for bit. With ties, the largest rank of a tie group decides
    (equivalent to the textbook rule: i can always be chosen at the
    end of a tie run).

    Plan: one distinct-p count aggregate, then cumulative n_le(p) as a
    PARTITIONED prefix — per group when ``group_cols`` is given, else
    the youden two-pass fixed-range bucket discipline (p lives in
    [0, 10^6], so 1024 fixed buckets need no min/max pass) — never a
    single-partition global window. One max-struct argmax finds the
    cutoff.

    Returns one row (per group): ``(group..., m, n_discoveries,
    p_cutoff_ppm)`` — n_discoveries = 0 and NULL cutoff when nothing
    clears.
    """
    if alpha_num < 0 or alpha_den <= 0:
        raise ValueError("alpha must be a nonnegative rational with alpha_den > 0")
    gcols = list(group_cols or [])
    p = F.col(p_col).cast("bigint")
    guarded = df.where(
        F.when((p >= 0) & (p <= 1_000_000), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"bh_fdr: {p_col} must be ppm in [0, 1e6], got "),
                    p.cast("string"),
                )
            )
        )
    ).select(*gcols, p.alias("_p"))
    per = guarded.groupBy(*gcols, "_p").agg(F.count(F.lit(1)).alias("_c"))
    m_tot = guarded.groupBy(*gcols).agg(F.count(F.lit(1)).alias("_m"))
    if gcols:
        w = (
            Window.partitionBy(*gcols)
            .orderBy("_p")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = per.select(*gcols, "_p", F.sum("_c").over(w).alias("_nle"))
        joined = cum.join(m_tot, gcols)
    else:
        per = per.withColumn("_b", F.expr("_p div 1024"))  # 1024-wide fixed buckets
        totals = {
            int(b): int(c or 0)
            for b, c in per.groupBy("_b").agg(F.sum("_c")).collect()
        }
        base: dict[int, int] = {}
        acc = 0
        for b in sorted(totals):
            base[b] = acc
            acc += totals[b]
        if not base:
            base = {0: 0}
        base_expr = F.element_at(
            F.create_map(*[F.lit(v) for kv in base.items() for v in kv]),
            F.col("_b"),
        )
        w = (
            Window.partitionBy("_b")
            .orderBy("_p")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = per.select(
            "_p", (base_expr + F.sum("_c").over(w)).alias("_nle")
        )
        joined = cum.crossJoin(F.broadcast(m_tot))
    ok = (
        F.col("_p") * F.col("_m") * F.lit(int(alpha_den))
        <= F.col("_nle") * F.lit(int(alpha_num)) * F.lit(1_000_000)
    )
    best = joined.groupBy(*gcols).agg(
        F.max(F.col("_m")).alias("m"),
        F.max(
            F.when(ok, F.struct(F.col("_p").alias("_p"), F.col("_nle").alias("_n")))
        ).alias("_best"),
    )
    return best.select(
        *gcols,
        "m",
        F.coalesce(F.col("_best._n"), F.lit(0)).alias("n_discoveries"),
        F.col("_best._p").alias("p_cutoff_ppm"),
    )


def fisher_exact(
    agg: DataFrame,
    max_n: int = 2000,
) -> DataFrame:
    """Fisher EXACT test over pre-aggregated 2x2 tables (r5) — the
    small-count sibling of prop_test/chi2 (those are asymptotic; a
    3-vs-0 conversion table needs the exact hypergeometric). Input
    rows carry ``(a, b, c, d)`` — successes/failures for the two arms
    (the prop_test_counts posture: aggregate counts however the
    experiment is sharded, then run the exact chain per row).

    EXACT spec: conditioning on the margins, P(table) is
    hypergeometric; the two-sided p sums P over every table whose
    UNNORMALIZED weight C(r1, k)*C(r2, c1-k) is <= the observed one
    (integer comparison — no pmf floats), all in unbounded-int
    ``fractions.Fraction``; the ONLY float is the final
    numerator/denominator division, correctly rounded once — so Spark
    and any scalar replay agree bit for bit. ``n = a+b+c+d`` is
    bounded by ``max_n`` (binomials grow combinatorially; past that
    the asymptotic tests are the right tool) and raises loudly.

    Returns input columns + ``p_two:double`` (NULL for an all-zero
    table) + ``odds_ratio:double`` (NULL when b*c == 0). Plan: one
    Arrow-batched mapInPandas over the (already tiny) aggregated
    table rows — map-only.
    """
    import pandas as pd

    in_cols = agg.columns
    for c in ("a", "b", "c", "d"):
        if c not in in_cols:
            raise ValueError(f"fisher_exact input needs column {c!r}")
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in agg.schema.fields
    ) + ", p_two double, odds_ratio double"

    def kernel(it):
        from fractions import Fraction
        from math import comb

        for pdf in it:
            ps, ors = [], []
            for a, b, c, d in zip(pdf["a"], pdf["b"], pdf["c"], pdf["d"]):
                a, b, c, d = int(a), int(b), int(c), int(d)
                if min(a, b, c, d) < 0:
                    raise ValueError("fisher_exact: negative cell count")
                n = a + b + c + d
                if n > max_n:
                    raise ValueError(
                        f"fisher_exact: n={n} exceeds max_n={max_n}; use the "
                        "asymptotic prop_test/chi2 at this scale"
                    )
                r1, r2, c1 = a + b, c + d, a + c
                if n == 0:
                    ps.append(None)  # empty table: no test, NULL out
                    ors.append(None)
                    continue
                obs = comb(r1, a) * comb(r2, c1 - a)
                num = 0
                for k in range(max(0, c1 - r2), min(r1, c1) + 1):
                    w = comb(r1, k) * comb(r2, c1 - k)
                    if w <= obs:
                        num += w
                ps.append(float(Fraction(num, comb(n, c1))))
                ors.append((a * d) / (b * c) if b * c != 0 else None)
            # nullable Float64: empty-table p and zero-cell OR are
            # NULL (not NaN) through Arrow
            yield pdf.assign(
                p_two=pd.array(ps, dtype="Float64"),
                odds_ratio=pd.array(ors, dtype="Float64"),
            )

    return agg.mapInPandas(kernel, out_schema)


def perm_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    n_perms: int = 199,
    seed: int = 0,
) -> DataFrame:
    """Deterministic PERMUTATION test for a two-group mean difference
    (r5) — the assumption-free sibling of welch_ttest (no normality,
    no variance model): re-divide the rows into the same group sizes
    n_perms times, and p = (1 + #{permutation |diff| >= observed}) /
    (n_perms + 1), the standard add-one Monte-Carlo estimator.

    EXACT spec (no floats until the final division): values are int64
    (quantize upstream — the module contract); group A' of permutation
    i = the n_a rows with the smallest ``(md5_40(seed:i:id), id)``
    rank (exact size-preserving resampling without replacement,
    deterministic — no RNG state); the comparison
    |diff_perm| >= |diff_obs| is the exact integer cross-multiplication
    ``|s'_a*n_b - s'_b*n_a| >= |s_a*n_b - s_b*n_a|`` (same denominator
    n_a*n_b on both sides — never divide).

    Plan: one tiny observed aggregate, one n_perms-way Generate, one
    rank window PARTITIONED BY PERMUTATION (never single-partition),
    one per-perm aggregate, one final count. Input must have exactly
    two groups (WHERE-guarded loudly).

    Returns 1 row: (n_a, n_b, diff_num, n_perms, n_ge, p).
    """
    v = F.col(value_col).cast("bigint")
    t = df.select(
        F.col(group_col).alias("_g"), v.alias("_v"), F.col(id_col).alias("_id")
    )
    groups = [r["_g"] for r in t.select("_g").distinct().orderBy("_g").collect()]
    if len(groups) != 2:
        raise ValueError(f"perm_test needs exactly 2 groups, got {groups}")
    ga, gb = groups
    obs = t.groupBy().agg(
        F.sum(F.when(F.col("_g") == ga, F.col("_v"))).alias("s_a"),
        F.count(F.when(F.col("_g") == ga, F.lit(1))).alias("n_a"),
        F.sum(F.when(F.col("_g") == gb, F.col("_v"))).alias("s_b"),
        F.count(F.when(F.col("_g") == gb, F.lit(1))).alias("n_b"),
    ).first()
    n_a, n_b = int(obs["n_a"]), int(obs["n_b"])
    s_a, s_b = int(obs["s_a"] or 0), int(obs["s_b"] or 0)
    if n_a == 0 or n_b == 0:
        raise ValueError("perm_test: both groups must be non-empty")
    obs_num = abs(s_a * n_b - s_b * n_a)
    s_tot = s_a + s_b
    perms = t.select(
        "_v",
        "_id",
        F.explode(
            F.array(*[F.lit(i) for i in range(int(n_perms))])
        ).alias("_i"),
    )
    rank_key = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{int(seed)}:"),
                    F.col("_i").cast("string"),
                    F.lit(":"),
                    F.col("_id").cast("string"),
                )
            ),
            1,
            10,
        ),
        16,
        10,
    ).cast("bigint")
    w = Window.partitionBy("_i").orderBy(rank_key.asc(), F.col("_id").asc())
    ranked = perms.select(
        "_i", "_v", (F.row_number().over(w) <= F.lit(n_a)).alias("_in_a")
    )
    per = ranked.groupBy("_i").agg(
        F.sum(F.when(F.col("_in_a"), F.col("_v"))).alias("_sa")
    )
    # |s'_a*n_b - s'_b*n_a| with s'_b = s_tot - s'_a
    pa = F.coalesce(F.col("_sa"), F.lit(0))
    perm_num = F.abs(pa * F.lit(n_b) - (F.lit(s_tot) - pa) * F.lit(n_a))
    n_ge = per.where(perm_num >= F.lit(obs_num)).count()
    spark = df.sparkSession
    return spark.createDataFrame(
        [(
            n_a, n_b, obs_num, int(n_perms), int(n_ge),
            float(1 + n_ge) / float(n_perms + 1),
        )],
        "n_a long, n_b long, diff_num long, n_perms long, n_ge long, p double",
    )
