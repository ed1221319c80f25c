"""Retrieval / classification / calibration evaluation (batch 37).

The training-data counterpart of the rank-fusion and classifier ops
(`ann.rrf_fuse`, `text.nb_classify`, `stats.logreg_*`): once a pipeline
produces rankings or predictions, these score them — at corpus scale,
with the repo's exactness discipline so every metric is gate-hashable.

- ``rank_metrics``: per-query nDCG@k / MRR / precision@k / recall@k.
  The log2 discount is NOT evaluated in either engine: the spec is a
  Python-computed integer literal table ``DISC[i] = halfup(2^20 /
  log2(i+1))`` shared verbatim by the Spark plan and the SQL oracle
  (the benford/hexgrid literal-constant posture), so DCG/IDCG are
  exact int64 sums and nDCG is ONE correctly-rounded division.
- ``confusion_metrics``: per-class tp/fp/fn as exact counts;
  precision/recall/F1 each a single division of exact int64
  (F1 = 2*tp / (n_true + n_pred) — the harmonic mean with cleared
  denominators).
- ``ece_calibration``: expected calibration error over integer-ppm
  scores: bins by integer DIV, per-bin |Σscore_ppm − n_pos·10^6| is
  exact int64, ECE is an integer-ppm floor division.

Plans / 100-TB posture: rank_metrics is ONE shuffle on the query key
(two window sorts over the same partitioning, then a partial-agg
rollup); confusion_metrics shuffles only |classes| rows after map-side
partial aggregation; ece_calibration shuffles n_bins rows. No Python
anywhere — pure whole-stage codegen.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "ndcg_discounts",
    "rank_metrics",
    "confusion_metrics",
    "ece_calibration",
    "average_precision",
    "regression_metrics",
    "lift_table",
]

DISC_SCALE = 1 << 20  # discount fixed-point unit


def ndcg_discounts(k: int) -> list[int]:
    """``[halfup(2^20 / log2(rank+1)) for rank in 1..k]`` — the shared
    integer discount spec (rank 1 → exactly 2^20)."""
    return [
        int(math.floor(DISC_SCALE / math.log2(r + 1) + 0.5))
        for r in range(1, k + 1)
    ]


def rank_metrics(
    df: DataFrame,
    query_col: str,
    item_col: str,
    rel_col: str,
    score_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-query ranking quality: ``(query, n, n_rel, n_rel_at_k,
    dcg_u, idcg_u, ndcg, first_rel_rank, rr, p_at_k, recall_at_k)``.

    The system ranking is ``row_number() over (score DESC, item ASC)``
    (total order — ties broken by item, so every engine reproduces the
    same permutation); the ideal ranking orders by ``rel DESC, item
    ASC``. ``dcg_u = Σ_{rank<=k} rel·DISC[rank]`` in 2^20 units (exact
    int64; IDCG likewise over the ideal permutation — tie order inside
    equal rel values cannot change it). ``ndcg = dcg_u/idcg_u``, NULL
    when the query has no relevant items; rr = 1/first_rel_rank;
    p_at_k divides by the fixed k (the standard convention — short
    result lists are penalized).
    """
    disc = ndcg_discounts(k)
    disc_arr = F.array(*[F.lit(d) for d in disc])
    rel = F.col(rel_col).cast("bigint")
    w_sys = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(item_col).asc()
    )
    w_ideal = Window.partitionBy(query_col).orderBy(
        rel.desc(), F.col(item_col).asc()
    )
    ranked = df.select(
        F.col(query_col).alias("query"),
        rel.alias("_rel"),
        F.row_number().over(w_sys).alias("_rank"),
        F.row_number().over(w_ideal).alias("_irank"),
    )
    gain = F.when(
        F.col("_rank") <= k,
        F.col("_rel") * F.element_at(disc_arr, F.col("_rank").cast("int")),
    ).otherwise(F.lit(0))
    igain = F.when(
        F.col("_irank") <= k,
        F.col("_rel") * F.element_at(disc_arr, F.col("_irank").cast("int")),
    ).otherwise(F.lit(0))
    per = ranked.groupBy("query").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("_rel") > 0).cast("bigint")).alias("n_rel"),
        F.sum(
            ((F.col("_rel") > 0) & (F.col("_rank") <= k)).cast("bigint")
        ).alias("n_rel_at_k"),
        F.sum(gain).cast("bigint").alias("dcg_u"),
        F.sum(igain).cast("bigint").alias("idcg_u"),
        F.min(F.when(F.col("_rel") > 0, F.col("_rank"))).alias(
            "first_rel_rank"
        ),
    )
    return per.select(
        "query",
        "n",
        "n_rel",
        "n_rel_at_k",
        "dcg_u",
        "idcg_u",
        F.when(
            F.col("idcg_u") > 0,
            F.col("dcg_u").cast("double") / F.col("idcg_u").cast("double"),
        ).alias("ndcg"),
        "first_rel_rank",
        (F.lit(1.0) / F.col("first_rel_rank").cast("double")).alias("rr"),
        (F.col("n_rel_at_k").cast("double") / F.lit(float(k))).alias(
            "p_at_k"
        ),
        F.when(
            F.col("n_rel") > 0,
            F.col("n_rel_at_k").cast("double")
            / F.col("n_rel").cast("double"),
        ).alias("recall_at_k"),
    )


def confusion_metrics(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Per-class confusion counts + P/R/F1:
    ``(cls, n_true, n_pred, tp, fp, fn, precision, recall, f1)``.

    Classes = union of observed labels and predictions (a class never
    predicted still reports recall; a hallucinated class reports
    precision 0). Each metric is one division of exact int64 counts;
    NULL where its denominator is 0 (not NaN — gate-stable).
    """
    lab = F.col(label_col).cast("string")
    prd = F.col(pred_col).cast("string")
    t = df.groupBy(lab.alias("cls")).agg(F.count(F.lit(1)).alias("n_true"))
    p = df.groupBy(prd.alias("cls")).agg(F.count(F.lit(1)).alias("n_pred"))
    tp = (
        df.where(lab == prd)
        .groupBy(lab.alias("cls"))
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    out = (
        t.join(p, "cls", "full_outer")
        .join(tp, "cls", "left")
        .select(
            "cls",
            F.coalesce("n_true", F.lit(0)).alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    return out.select(
        "cls",
        "n_true",
        "n_pred",
        "tp",
        (F.col("n_pred") - F.col("tp")).alias("fp"),
        (F.col("n_true") - F.col("tp")).alias("fn"),
        F.when(
            F.col("n_pred") > 0,
            F.col("tp").cast("double") / F.col("n_pred").cast("double"),
        ).alias("precision"),
        F.when(
            F.col("n_true") > 0,
            F.col("tp").cast("double") / F.col("n_true").cast("double"),
        ).alias("recall"),
        F.when(
            F.col("n_true") + F.col("n_pred") > 0,
            (F.lit(2) * F.col("tp")).cast("double")
            / (F.col("n_true") + F.col("n_pred")).cast("double"),
        ).alias("f1"),
    )


def ece_calibration(
    df: DataFrame,
    score_ppm_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Expected calibration error over INTEGER-ppm confidence scores:
    one row per occupied bin ``(bin, n, n_pos, sum_score_ppm, gap_u,
    ece_ppm)`` where ``gap_u = |Σscore_ppm − n_pos·10^6|`` (exact
    int64 — the unnormalized confidence-vs-accuracy gap) and
    ``ece_ppm = (Σ_bins gap_u) DIV Σn`` (the same integer-ppm ECE on
    every row — a broadcastable 1-row cross join, not a global
    window).

    ``score_ppm`` must lie in [0, 10^6] and ``label`` in {0,1}; both
    are enforced by raise_error guards in the WHERE path (the
    snap_to_segments lesson: guards in pruned projections never fire).
    Bin = ``score_ppm·n_bins DIV 10^6`` clamped to n_bins−1 (a score
    of exactly 10^6 joins the top bin).
    """
    s = F.col(score_ppm_col).cast("bigint")
    y = F.col(label_col).cast("bigint")
    df = df.where(
        F.when(
            (s >= 0) & (s <= 1_000_000) & y.isin(0, 1), F.lit(True)
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("ece_calibration: score_ppm/label out of range: "),
                    s.cast("string"),
                    F.lit("/"),
                    y.cast("string"),
                )
            )
        )
    )
    bin_ = F.least(
        F.expr(f"({score_ppm_col} * {n_bins}) DIV 1000000"),
        F.lit(n_bins - 1),
    ).cast("bigint")
    per = df.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("n_pos"),
        F.sum(s).alias("sum_score_ppm"),
    )
    per = per.withColumn(
        "gap_u",
        F.abs(F.col("sum_score_ppm") - F.col("n_pos") * F.lit(1_000_000)),
    )
    tot = per.agg(
        F.sum("gap_u").alias("_g"), F.sum("n").alias("_n")
    ).select(F.expr("_g DIV _n").alias("ece_ppm"))
    return per.crossJoin(F.broadcast(tot))


def average_precision(
    df: DataFrame,
    query_col: str,
    item_col: str,
    rel_col: str,
    score_col: str,
    k: int | None = None,
) -> DataFrame:
    """Per-query Average Precision under a QUANTIZED-contribution
    spec (the rrf_fuse discipline): with the same deterministic
    ranking as :func:`rank_metrics` (score DESC, item ASC),

        ap = ( Σ_{ranks r with rel>0} (cumrel_r · 2^40) DIV r )
             / (n_rel · 2^40)

    Each contribution is an EXACT int64 (floor of P@r in 2^40 units —
    a double running sum of raw P@r values is summation-ORDER-
    dependent and DuckDB's windowed sum uses a segment tree, so its
    last ulp differs from Spark's sequential fold; integer sums have
    no order). The quantization understates true AP by < ranks/2^40.
    ``k`` truncates the ranking (AP@k, still normalized by the FULL
    n_rel — the TREC convention). Overflow: n_per_query under ~8×10⁶
    rows (cumrel·2^40 < 2^63).

    Returns (query, n, n_rel, ap_u, ap); ap NULL when the query has
    no relevant items. Plan: one shuffle on the query key, one
    ranking window + one cumulative window over it, one aggregate.
    """
    rel = (F.col(rel_col).cast("bigint") > 0).cast("bigint")
    w_rank = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(item_col).asc()
    )
    ranked = df.select(
        F.col(query_col).alias("query"),
        rel.alias("_rel"),
        F.row_number().over(w_rank).alias("_rank"),
    )
    w_cum = (
        Window.partitionBy("query")
        .orderBy("_rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = ranked.select(
        "query",
        "_rel",
        "_rank",
        F.sum("_rel").over(w_cum).alias("_cumrel"),
    )
    in_k = F.lit(True) if k is None else (F.col("_rank") <= k)
    contrib = F.when(
        (F.col("_rel") > 0) & in_k,
        F.expr("(_cumrel * 1099511627776) DIV _rank"),
    ).otherwise(F.lit(0))
    per = cum.groupBy("query").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_rel").alias("n_rel"),
        F.sum(contrib).cast("bigint").alias("ap_u"),
    )
    return per.select(
        "query",
        "n",
        "n_rel",
        "ap_u",
        F.when(
            F.col("n_rel") > 0,
            F.col("ap_u").cast("double")
            / (F.col("n_rel").cast("double") * F.lit(1099511627776.0)),
        ).alias("ap"),
    )


def regression_metrics(
    df: DataFrame, y_col: str, yhat_col: str
) -> DataFrame:
    """Regression quality over INTEGER targets/predictions: one row
    ``(n, sae, sse, mae, rmse, r2)``.

        mae  = Σ|e| / n                    (exact int64 numerator)
        rmse = sqrt(Σe² / n)
        r2   = 1 − n·Σe² / (n·Σy² − (Σy)²)  (cleared denominators)

    Every statistic is ONE fixed chain on exact int64 sums (the
    welch_ttest discipline). Overflow: n·Σe² under 2^63 — floor or
    rescale beyond. r2 is NULL for a constant target (zero variance).
    Plan: a single map-side-combinable aggregate.
    """
    y = F.col(y_col).cast("bigint")
    yh = F.col(yhat_col).cast("bigint")
    e = y - yh
    m = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.abs(e)).alias("sae"),
        F.sum(e * e).alias("sse"),
        F.sum(y).alias("_sy"),
        F.sum(y * y).alias("_syy"),
    )
    n = F.col("n")
    ss_tot = (n * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast("bigint")
    return m.select(
        "n",
        "sae",
        "sse",
        (F.col("sae").cast("double") / n.cast("double")).alias("mae"),
        F.sqrt(F.col("sse").cast("double") / n.cast("double")).alias("rmse"),
        F.when(
            ss_tot > 0,
            F.lit(1.0)
            - (n * F.col("sse")).cast("double") / ss_tot.cast("double"),
        ).alias("r2"),
    )


def lift_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    item_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Decile gains/lift analysis of a ranking score vs a 0/1 label —
    the campaign-targeting standard (how much of the response does the
    top decile capture?). Rows rank by (score DESC, item ASC) — the
    rank_metrics total order — and split into ``n_buckets`` ntile
    buckets; per bucket:

        (bucket, n, n_pos, cum_pos, gain = cum_pos/total_pos,
         lift = (n_pos·N) / (n·total_pos))

    gain and lift are single divisions of exact int64 counts; the
    cumulative fold is an integer running sum over the bucket order.
    ntile's split (equal buckets, earlier buckets take the remainder)
    is deterministic given the total order — both engines implement
    the same SQL-standard rule. Plan: one global ranking window (use
    per-stratum grouping upstream at extreme scale) + an
    n_buckets-row rollup.
    """
    y = (F.col(label_col).cast("bigint") > 0).cast("bigint")
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.col(score_col).desc(), F.col(item_col).asc()
    )
    b = df.select(
        y.alias("_y"), F.ntile(n_buckets).over(w).alias("bucket")
    )
    per = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"), F.sum("_y").alias("n_pos")
    )
    wcum = (
        Window.partitionBy(F.lit(0))
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(F.lit(0))
    cum = per.select(
        "bucket",
        "n",
        "n_pos",
        F.sum("n_pos").over(wcum).alias("cum_pos"),
        F.sum("n_pos").over(wall).alias("_tp"),
        F.sum("n").over(wall).alias("_tn"),
    )
    return cum.select(
        "bucket",
        "n",
        "n_pos",
        "cum_pos",
        F.when(
            F.col("_tp") > 0,
            F.col("cum_pos").cast("double") / F.col("_tp").cast("double"),
        ).alias("gain"),
        F.when(
            F.col("_tp") > 0,
            (F.col("n_pos") * F.col("_tn")).cast("double")
            / (F.col("n") * F.col("_tp")).cast("double"),
        ).alias("lift"),
    )
