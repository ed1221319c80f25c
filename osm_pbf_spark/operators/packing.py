"""Training-batch packing + deterministic sampling operators.

Extends SURVEY.md §2.4b (training-data pipeline family) with the three
ops every pretraining data pipeline runs between "dedup" and "write
training shards":

- ``concat_chunk_pack``  — GPT-style concatenation packing: documents
  are laid out end-to-end in a deterministic global order and split
  into fixed token-budget chunks; a document may span chunks. The
  global token offset is a DISTRIBUTED prefix sum (per-range partial
  sums -> tiny driver-side exclusive prefix -> partition-local window),
  never a single-partition global window — the plan stays parallel at
  10^12 docs.
- ``bin_pack_ffd``       — first-fit-decreasing bin packing (no doc
  splitting, one doc per bin slot, bins never exceed the budget unless
  a single oversize doc forces its own bin). Packing is partition-local
  per a deterministic md5-derived group — the industry-standard
  approximation (packing quality is within ~1 bin of optimal per group,
  and group-local packing is what keeps it one shuffle at scale).
- ``stratified_sample``  — deterministic per-stratum Bernoulli sampling
  via an md5 threshold compare. Pure native expressions, NO shuffle,
  NO RNG state: the same row always makes the same decision in any
  engine (the DuckDB oracle runs the byte-identical predicate).

All determinism comes from md5 over explicit strings — never from
Spark's ``rand()``/``sample()`` (seed-stable only per partition
layout) — so results are reproducible across partitionings, engines
and cluster sizes, which is what makes them CI-gateable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count

__all__ = [
    "concat_chunk_pack",
    "bin_pack_ffd",
    "stratified_sample",
    "group_sample",
    "md5_uniform_hex",
    "dsir_weights",
    "interleave_sources",
]


def md5_uniform_hex(key) -> "F.Column":
    """First 8 hex chars of md5(key) — a uniform draw in [0, 2^32) that
    both Spark and DuckDB produce byte-identically (lowercase hex).
    Compared LEXICOGRAPHICALLY against an 8-hex-digit threshold, which
    is order-isomorphic to the numeric compare."""
    return F.substring(F.md5(key), 1, 8)


def _hex_threshold(fraction: float) -> str:
    """fraction in [0,1] -> 8-digit lowercase hex of floor(f * 2^32)."""
    t = min(max(int(fraction * (1 << 32)), 0), 1 << 32)
    return format(t, "08x") if t < (1 << 32) else "ffffffff" + "~"  # "~" > 'f': keep-all


def stratified_sample(
    df: DataFrame,
    fractions,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified Bernoulli sample.

    ``fractions`` is a float (same rate everywhere) or a dict
    ``{stratum_value: rate}`` (strata absent from the dict are dropped).
    Keep rule: ``md5(stratum || ':' || id)[:8] < hex(floor(rate*2^32))``.
    Hashing the stratum INTO the key decorrelates the draws across
    strata, so re-weighting one stratum never disturbs another's
    sample. Zero shuffles; the filter pushes into the scan."""
    key = md5_uniform_hex(
        F.concat(F.col(strata_col).cast("string"), F.lit(":"), F.col(id_col).cast("string"))
    )
    if isinstance(fractions, dict):
        thr = None
        for value, rate in sorted(fractions.items()):
            branch = F.when(F.col(strata_col) == F.lit(value), F.lit(_hex_threshold(rate)))
            thr = branch if thr is None else thr.when(
                F.col(strata_col) == F.lit(value), F.lit(_hex_threshold(rate))
            )
        thr = thr.otherwise(F.lit(""))  # "" sorts before any hex -> drop
    else:
        thr = F.lit(_hex_threshold(float(fractions)))
    return df.filter(key < thr)


def group_sample(
    df: DataFrame,
    k: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    prefilter_fraction: float | None = None,
) -> DataFrame:
    """Deterministic exactly-k-per-group sample (uniform without
    replacement): rank rows within each group by ``md5(group:id)`` and
    keep the first ``k``. The hash order is a uniform random permutation
    per group, engine-reproducible (same rule as stratified_sample).

    Plan: one shuffle (the per-group ranking window). For huge groups
    where shuffling every row just to rank it is wasteful, pass
    ``prefilter_fraction`` = c*k/min_group_size (c ≈ 4 for comfortable
    slack): rows are PRE-FILTERED to hash < that fraction before the
    window, cutting shuffle volume by ~that factor. The pre-filter is
    EXACT — it changes nothing — as long as ≥ k rows per group survive
    it (the kept rows are the hash-smallest, which is what the ranking
    selects anyway); callers own that bound. None (default) applies no
    pre-filter.
    """
    key = md5_uniform_hex(
        F.concat(F.col(group_col).cast("string"), F.lit(":"), F.col(id_col).cast("string"))
    )
    base = df.withColumn("_gs_key", key)
    if prefilter_fraction is not None:
        base = base.filter(F.col("_gs_key") < F.lit(_hex_threshold(float(prefilter_fraction))))
    w = Window.partitionBy(group_col).orderBy("_gs_key", id_col)
    return (
        base.withColumn("_gs_rank", F.row_number().over(w))
        .filter(F.col("_gs_rank") <= k)
        .drop("_gs_key", "_gs_rank")
    )


# ---------------- concatenation packing ----------------


def _with_global_offsets(
    docs: DataFrame, id_col: str, tokens_col: str, n_ranges: int
) -> DataFrame:
    """Attach ``_start`` = exclusive prefix sum of ``tokens_col`` in
    global ``id_col`` order, as a distributed two-pass prefix sum:

    1. a deterministic range id from (min_id, max_id) — an EXPRESSION,
       not RangePartitioner sampling, so the split is reproducible;
    2. per-range token sums -> driver (``n_ranges`` rows, tiny) ->
       exclusive prefix -> literal CASE map;
    3. window cumsum WITHIN each range (parallel across ranges) + base.

    The only global sync point is the n_ranges-row aggregate; every
    other stage is partition-parallel. At 10^12 docs you raise
    ``n_ranges`` — the driver state stays n_ranges integers.
    """
    lo, hi = docs.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:
        return docs.withColumn("_start", F.lit(0).cast("long"))
    span = max((int(hi) - int(lo)) // n_ranges + 1, 1)
    with_rid = docs.withColumn(
        "_rid", F.floor((F.col(id_col) - F.lit(int(lo))) / F.lit(span)).cast("int")
    )
    sums = {
        int(r): int(s)
        for r, s in with_rid.groupBy("_rid").agg(F.sum(tokens_col)).collect()
    }
    base, acc = {}, 0
    for rid in sorted(sums):
        base[rid] = acc
        acc += sums[rid]
    base_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in base.items() for x in kv]), F.col("_rid")
    )
    w = (
        Window.partitionBy("_rid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return with_rid.withColumn(
        "_start",
        (base_expr + F.coalesce(F.sum(tokens_col).over(w), F.lit(0))).cast("long"),
    ).drop("_rid")


def concat_chunk_pack(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    n_ranges: int = 64,
) -> DataFrame:
    """Concatenation packing: lay documents end-to-end ordered by
    ``id_col`` and cut the token stream into chunks of exactly
    ``budget`` tokens (the final chunk may be short). Returns one row
    per (chunk, doc-slice):

      chunk_id      — 0-based chunk index in the global token stream
      <id_col>      — the contributing document
      slice_begin   — first token of the slice WITHIN the document
      slice_len     — tokens contributed to this chunk
      pos_in_chunk  — token position of the slice WITHIN the chunk

    Exact integer arithmetic end-to-end -> engine-independent; the
    DuckDB oracle recomputes it with one window + generate_series.
    Token spec = ``text.token_count`` (whitespace split) unless a
    precomputed ``tokens_col`` is given.
    """
    if tokens_col is None:
        docs = docs.withColumn("_toks", token_count(F.col(text_col)).cast("long"))
        tokens_col = "_toks"
    t = _with_global_offsets(docs, id_col, tokens_col, n_ranges)
    b = F.lit(int(budget)).cast("long")
    # integer DIV, not floor(double/b): exact past 2^53 total tokens
    first_c = F.expr(f"_start DIV {int(budget)}")
    last_c = F.expr(f"(_start + {tokens_col} - 1) DIV {int(budget)}")
    out = (
        t.withColumn(
            "chunk_id",
            F.explode(
                F.when(F.col(tokens_col) > 0, F.sequence(first_c, last_c)).otherwise(
                    F.array().cast("array<long>")
                )
            ),
        )
        .withColumn("_cstart", F.col("chunk_id") * b)
        .select(
            "chunk_id",
            id_col,
            (F.greatest(F.col("_start"), F.col("_cstart")) - F.col("_start")).alias(
                "slice_begin"
            ),
            (
                F.least(F.col("_start") + F.col(tokens_col), F.col("_cstart") + b)
                - F.greatest(F.col("_start"), F.col("_cstart"))
            ).alias("slice_len"),
            (F.greatest(F.col("_start"), F.col("_cstart")) - F.col("_cstart")).alias(
                "pos_in_chunk"
            ),
        )
    )
    return out


# ---------------- first-fit-decreasing bin packing ----------------


def bin_pack_ffd(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    n_groups: int = 32,
) -> DataFrame:
    """First-fit-decreasing packing WITHOUT document splitting.

    Documents are hashed into ``n_groups`` deterministic groups
    (md5(id) mod n_groups — replayable in any engine), each group is
    FFD-packed independently in one Arrow batch (sort by tokens desc,
    id asc; place each doc in the first bin it fits). A doc larger
    than the budget gets a bin of its own (overflowing, by design —
    the caller splits oversize docs with concat_chunk_pack first if
    that's not wanted).

    Output: (bin_id, <id_col>, n_tokens, bin_pos) where
    ``bin_id = group * 2^32 + local_bin`` and ``bin_pos`` is the
    placement order within the bin. One shuffle (the groupBy); packing
    is O(docs_in_group * bins) per group, parallel across groups.
    """
    if tokens_col is None:
        docs = docs.withColumn("_toks", token_count(F.col(text_col)).cast("long"))
        tokens_col = "_toks"
    grp = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("long"),
        F.lit(int(n_groups)),
    ).alias("_grp")
    slim = docs.select(grp, F.col(id_col).alias("_id"), F.col(tokens_col).alias("_tk"))
    bud = int(budget)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        g = int(pdf["_grp"].iloc[0])
        order = np.lexsort((pdf["_id"].to_numpy(), -pdf["_tk"].to_numpy()))
        ids = pdf["_id"].to_numpy()[order]
        toks = pdf["_tk"].to_numpy()[order]
        fill: list[int] = []
        out_bin = np.empty(len(ids), dtype=np.int64)
        out_pos = np.empty(len(ids), dtype=np.int64)
        counts: list[int] = []
        for i, tk in enumerate(toks):
            placed = -1
            for b_idx, used in enumerate(fill):
                if used + tk <= bud:
                    placed = b_idx
                    break
            if placed < 0:
                placed = len(fill)
                fill.append(0)
                counts.append(0)
            out_bin[i] = (g << 32) | placed
            out_pos[i] = counts[placed]
            fill[placed] += int(tk)
            counts[placed] += 1
        return pd.DataFrame(
            {"bin_id": out_bin, "_id": ids, "n_tokens": toks, "bin_pos": out_pos}
        )

    out_schema = "bin_id long, _id long, n_tokens long, bin_pos long"
    return (
        slim.groupBy("_grp")
        .applyInPandas(_pack, schema=out_schema)
        .withColumnRenamed("_id", id_col)
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k per group
    (Efraimidis–Spirakis A-ES): each row draws u uniform in (0, 1] from
    the project-standard 40-bit md5 hash of (group:id) and gets the key
    ln(u) / w — the top-k keys per group are exactly a weight-
    proportional sample without replacement. Hash-seeded, so both
    engines replay the identical sample.

    Exactness note: ln() is the one ulp-risky op; a selection flip
    would need two keys within ~1e-16 at the k-th rank boundary, where
    typical adjacent-key gaps are ~1/|group| — negligible, and the
    (key, id) ORDER makes actual ties deterministic.

    Plan: one per-group ranking window (one shuffle); the weight guard
    lives in a WHERE so Catalyst cannot prune it.
    """
    u_int = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(group_col).cast("string"),
                    F.lit(":"),
                    F.col(id_col).cast("string"),
                )
            ),
            1,
            10,
        ),
        16,
        10,
    ).cast("bigint")
    # (h + 1) / 2^40 in (0, 1]; ln(u)/w in (-inf, 0], larger = luckier
    u = (u_int + F.lit(1)).cast("double") / F.lit(float(1 << 40))
    key = F.log(u) / F.col(weight_col).cast("double")
    guarded = df.where(
        F.when(
            F.col(weight_col).cast("double") <= 0.0,
            F.raise_error(
                F.concat(
                    F.lit("weighted_sample: non-positive weight for id "),
                    F.col(id_col).cast("string"),
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("_ws_key"), id_col)
    return (
        guarded.withColumn("_ws_key", key)
        .withColumn("_ws_rank", F.row_number().over(w))
        .filter(F.col("_ws_rank") <= k)
        .drop("_ws_key", "_ws_rank")
    )


def mixture_sample(
    docs: DataFrame,
    targets_ppm: dict[str, int],
    total: int,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-mixture construction: build a corpus of (at most)
    ``total`` docs whose composition follows the target mixture —
    group g contributes ``min(n_g, total * ppm_g // 10^6)`` docs,
    selected by the deterministic md5 rank (uniform within group,
    engine-replayable). Groups absent from ``targets_ppm`` contribute
    nothing.

    Weights are INTEGER PARTS-PER-MILLION so the per-group quota is
    exact integer arithmetic (``DIV``) — no float weight can make two
    engines disagree on a quota by one row. When a group is smaller
    than its quota the shortfall is NOT redistributed (the caller sees
    it by comparing counts — redistribution would make every group's
    selection depend on every other group's size, breaking resume
    stability).

    Plan: one tiny per-group count aggregate broadcast back, then the
    group_sample ranking window — one data-sized shuffle total.
    """
    if total < 0:
        raise ValueError(f"total must be >= 0, got {total}")
    for g, ppm in targets_ppm.items():
        if ppm < 0:
            raise ValueError(f"negative ppm for group {g!r}")
    spark = docs.sparkSession
    tgt = spark.createDataFrame(
        [(g, int(ppm)) for g, ppm in sorted(targets_ppm.items())],
        f"{group_col} string, _ppm long",
    )
    quota = (
        docs.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .join(F.broadcast(tgt), group_col)
        .select(
            group_col,
            # floor(total*ppm / 1e6): the numerator is an exact int in
            # float64 (< 2^53) and a non-divisible quotient sits >= 1e-6
            # from any integer while the division error is < 1 ulp — so
            # this floor equals the oracle's integer `//` for any sane
            # total*ppm; quotas beyond 2^53 should use bigger ppm units
            F.least(
                F.col("_n"),
                F.floor(
                    F.lit(int(total)) * F.col("_ppm") / F.lit(1_000_000.0)
                ).cast("bigint"),
            ).alias("_k"),
        )
    )
    key = md5_uniform_hex(
        F.concat(
            F.col(group_col).cast("string"), F.lit(":"), F.col(id_col).cast("string")
        )
    )
    w = Window.partitionBy(group_col).orderBy("_mx_key", id_col)
    return (
        docs.join(F.broadcast(quota), group_col)
        .withColumn("_mx_key", key)
        .withColumn("_mx_rank", F.row_number().over(w))
        .filter(F.col("_mx_rank") <= F.col("_k"))
        .drop("_mx_key", "_mx_rank", "_k")
    )


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    group_col: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    n_ranges: int = 256,
) -> DataFrame:
    """Token-budget corpus construction: take documents in the
    deterministic md5 order until the budget fills — the "build me a
    1B-token corpus" primitive (mixture_sample fixes COMPOSITION by
    doc counts; this fixes SIZE by tokens). A document is kept iff the
    tokens of the docs BEFORE it (in hash order) are < budget, so the
    boundary-crossing document is included and the sample is the
    unique hash-order prefix holding >= budget tokens (or everything,
    if the corpus is smaller). Adding new docs to the corpus only
    perturbs the sample where their hashes land — the selection is
    stable under appends, like every md5-ranked sampler here.

    With ``group_col``, each group fills its own budget (window per
    group — scalable when groups are many). Without it the prefix sum
    is the DISTRIBUTED two-pass (hash-prefix range buckets -> tiny
    per-bucket totals -> driver exclusive prefix -> within-bucket
    window), never a single-partition global window — the
    concat_chunk_pack discipline with md5 order instead of id order
    (the hash is uniform, so the 2-hex-char bucket ranges are balanced
    by construction).

    Returns the kept docs: (id_col[, group_col], doc_tokens:bigint,
    cum_before:bigint).
    """
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    from .text import token_count

    if tokens_col is None:
        docs = docs.withColumn("_tb_toks", token_count(F.col(text_col)).cast("long"))
        tokens_col = "_tb_toks"
    key = md5_uniform_hex(
        F.concat(
            (F.col(group_col).cast("string") if group_col else F.lit("")),
            F.lit(":"),
            F.col(id_col).cast("string"),
        )
    )
    t = docs.withColumn("_tb_key", key)
    if group_col is not None:
        w = (
            Window.partitionBy(group_col)
            .orderBy("_tb_key", id_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        t = t.withColumn(
            "cum_before", F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
        )
        out_cols = [id_col, group_col]
    else:
        rid_width = max(1, min(4, (n_ranges.bit_length() + 3) // 4))
        n_rid = 16 ** rid_width
        t = t.withColumn(
            "_tb_rid", F.conv(F.substring("_tb_key", 1, rid_width), 16, 10).cast("int")
        )
        sums = {
            int(r): int(s or 0)
            for r, s in t.groupBy("_tb_rid").agg(F.sum(tokens_col)).collect()
        }
        base, acc = {}, 0
        for rid in range(n_rid):
            if rid in sums:
                base[rid] = acc
                acc += sums[rid]
        if not base:
            base = {0: 0}
        base_expr = F.element_at(
            F.create_map(*[F.lit(v) for kv in base.items() for v in kv]),
            F.col("_tb_rid"),
        )
        w = (
            Window.partitionBy("_tb_rid")
            .orderBy("_tb_key", id_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        t = t.withColumn(
            "cum_before",
            (base_expr + F.coalesce(F.sum(tokens_col).over(w), F.lit(0))).cast("long"),
        )
        out_cols = [id_col]
    return t.where(F.col("cum_before") < F.lit(int(budget_tokens))).select(
        *out_cols,
        F.col(tokens_col).cast("long").alias("doc_tokens"),
        "cum_before",
    )


def rendezvous_assign(
    df: DataFrame,
    key_col: str,
    shards: list[str],
    out_col: str = "shard",
) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing — the consistent
    shard assignment for incremental pipelines: every key goes to the
    shard with the highest md5-derived weight, so ADDING a shard moves
    ONLY the keys that now rank the new shard first (≈ 1/(n+1) of
    them) and removing one moves only ITS keys. Plain `hash % n`
    reshuffles almost everything on every resize — at 100 TB that is
    the difference between re-bucketing one shard's worth of data and
    rewriting the table (the property is pinned by test).

    Weight spec (engine-replayable): w(key, shard) = the project
    40-bit md5 prefix of '<shard>|<key>'; argmax with ties (md5
    collisions — unreachable in practice) broken by shard ascending.

    Plan: ONE native array `aggregate` fold over the shard list per
    row — pure projection, zero shuffle, zero Python; |shards| md5
    calls per row (use a two-level hierarchy beyond ~10^3 shards).
    """
    if not (1 <= len(shards) <= 1024):
        raise ValueError(f"need 1..1024 shards, got {len(shards)}")
    if len(set(shards)) != len(shards):
        raise ValueError("shard names must be unique")
    key = F.col(key_col).cast("string")

    def weight(s: F.Column) -> F.Column:
        return F.conv(
            F.substring(F.md5(F.concat(s, F.lit("|"), key)), 1, 10), 16, 10
        ).cast("bigint")

    arr = F.array(*[F.lit(s) for s in shards])
    init = F.struct(
        F.lit(-1).cast("bigint").alias("w"),
        F.lit(None).cast("string").alias("s"),
    )
    best = F.aggregate(
        arr,
        init,
        lambda acc, s: F.when(
            (weight(s) > acc["w"])
            | ((weight(s) == acc["w"]) & (s < acc["s"])),
            F.struct(weight(s).alias("w"), s.alias("s")),
        ).otherwise(acc),
    )
    return df.withColumn(out_col, best["s"])


def split_assign(
    df: DataFrame,
    key_col: str,
    weights: dict[str, int],
    seed: int = 0,
) -> DataFrame:
    """Deterministic train/val/test split assignment — the ML-pipeline
    cousin of ``stratified_sample``: each key's 40-bit md5 hash (seeded
    — different seeds give independent splits) falls into one of the
    half-open weight intervals tiling [0, 2^40), so the assignment is
    reproducible across engines, partitionings and reruns, STABLE
    under corpus growth (a key's split never changes when other rows
    appear), and exactly proportional in expectation.

    ``weights`` maps split name -> INTEGER weight (e.g. {"train": 8,
    "val": 1, "test": 1}); integer thresholds keep the interval edges
    exact — the boundary t_i = floor(2^40 * cum_i / total) is the same
    bigint everywhere.

    Duplicate keys (e.g. multiple rows of one document) land in the
    SAME split by construction — the leakage-safe grouping a row-level
    rand() split gets wrong.

    Plan: pure native projection (md5 + a CASE chain over |splits|
    thresholds), zero shuffle, zero Python.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    names = list(weights)
    ws = [weights[n] for n in names]
    if any((not isinstance(w, int)) or w <= 0 for w in ws):
        raise ValueError(f"weights must be positive ints, got {weights}")
    total = sum(ws)
    space = 1 << 40
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string"))),
            1,
            10,
        ),
        16,
        10,
    ).cast("bigint")
    cum = 0
    expr = None
    for name, w in zip(names, ws):
        cum += w
        hi = (space * cum) // total
        cond = h < F.lit(hi)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    return df.withColumn("split", expr)


# ---------------- DSIR importance weights ----------------


def _dsir_bucket_py(feat: str, n_buckets: int) -> int:
    """Pure-Python replay of the native DSIR feature-bucket hash:
    first 8 hex chars of md5(feat) as an integer, mod n_buckets —
    byte-identical to Spark's conv(substring(md5(f),1,8),16,10) and to
    the DuckDB nibble-shift replay (the md5_uniform_hex discipline)."""
    import hashlib

    return int(hashlib.md5(feat.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def _dsir_feats(text_col) -> "F.Column":
    """Hashed-n-gram feature strings: unigrams tagged ``1|tok`` and
    adjacent bigrams tagged ``2|a b`` over whitespace tokens (empty
    tokens dropped). Tags keep a unigram from colliding with a bigram
    whose space-joined text happens to match."""
    toks = F.filter(F.split(text_col, " "), lambda t: t != "")
    uni = F.transform(toks, lambda t: F.concat(F.lit("1|"), t))
    # size<2 guard: sequence(1, size-1) DESCENDS for size<2 (the
    # bigram_pmi lesson) and element_at(, 0) throws under ANSI
    big = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(
                F.lit("2|"),
                F.element_at(toks, i),
                F.lit(" "),
                F.element_at(toks, i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(uni, big)


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every RAW
    document by how much more likely its hashed-n-gram features are
    under the TARGET corpus than under the raw corpus itself — the
    standard "select web data that looks like the quality corpus"
    pretraining filter. Downstream, Gumbel-top-k / weighted_sample on
    ``dsir_weight`` performs the actual resampling.

    Feature space: unigrams + adjacent bigrams hashed into
    ``n_buckets`` buckets (md5-prefix mod — engine-replayable, see
    ``_dsir_bucket_py``). Both corpus distributions are add-one
    smoothed over the bucket space; each feature occurrence scores

        lr = ln((t_cnt+1)/(T+B)) - ln((p_cnt+1)/(P+B))

    where t/p count the bucket in target/raw, T/P are total feature
    occurrences and B = n_buckets.

    Exactness posture (bigram_lm_score discipline): each lr is
    quantized to MICRO-NATS with the explicit HALF-UP-away-from-zero
    rule ``sign(lr) * floor(|lr|*1e6 + 0.5)`` (never round(): Spark
    HALF_UP vs DuckDB HALF_EVEN), bigint-SUMmed per doc (order-free,
    exact), then ``dsir_weight = sum_q / 1e6 / n_feats`` as one fixed
    two-division IEEE chain. The one ulp-risky op is ln(); micro-nat
    rounding absorbs ~1-ulp engine drift outside a measure-zero band.

    Returns ``(doc_id, n_feats:bigint, dsir_weight:double)``; docs
    with no features get ``(0, NULL)``.

    Plan shape (100-TB posture): two corpus-level hash aggregates
    bounded by ``n_buckets`` rows (map-side combinable — every task
    ships <= B rows regardless of corpus size), the raw feature stream
    joined against the two <=B-row count tables (AQE broadcasts them),
    one per-doc aggregate. No Python stages, no skew (buckets are
    md5-uniform), no driver actions.
    """
    B = int(n_buckets)
    bucket = (
        F.conv(F.substring(F.md5(F.col("_feat")), 1, 8), 16, 10).cast("bigint")
        % F.lit(B)
    ).alias("bucket")

    tfe = target.select(F.explode(_dsir_feats(F.col(text_col))).alias("_feat")).select(bucket)
    rfe = raw.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_dsir_feats(F.col(text_col))).alias("_feat"),
    ).select("doc_id", bucket)

    tcnt = tfe.groupBy("bucket").agg(F.count(F.lit(1)).alias("t_cnt"))
    pcnt = rfe.groupBy("bucket").agg(F.count(F.lit(1)).alias("p_cnt"))
    tot_t = tfe.agg(F.count(F.lit(1)).alias("T"))
    tot_p = rfe.agg(F.count(F.lit(1)).alias("P"))

    lr = F.log(
        (F.coalesce(F.col("t_cnt"), F.lit(0)) + 1).cast("double")
        / (F.col("T") + B).cast("double")
    ) - F.log((F.col("p_cnt") + 1).cast("double") / (F.col("P") + B).cast("double"))
    q = (
        F.when(lr >= 0, F.floor(lr * 1e6 + F.lit(0.5)))
        .otherwise(-F.floor(-lr * 1e6 + F.lit(0.5)))
        .cast("bigint")
    )
    scored = (
        rfe.join(pcnt, "bucket")
        .join(tcnt, "bucket", "left")
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_p))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_feats"), F.sum(q).alias("_sum_q"))
    )
    return (
        raw.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).cast("bigint").alias("n_feats"),
            (F.col("_sum_q").cast("double") / F.lit(1e6) / F.col("n_feats").cast("double")).alias(
                "dsir_weight"
            ),
        )
    )


MIX_PREC = 1 << 20  # stride precision: i * MIX_PREC must stay < 2^63


def mix_sources(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weights: dict,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted source interleaving — the training-data
    MIXING order (Pile/Dolma-style): stream rows so that every prefix
    of the output holds the sources in ~the given ratios, reproducibly
    across engines, partitionings and reruns (a shuffled union gives
    the ratio only in expectation and never the same order twice).

    Stride-scheduling spec, all exact integers:
      - within each source, rows get rank ``i`` (1-based) in seeded
        md5 hash order (``md5(seed:group:id)`` 8-hex prefix, id
        tie-break — the group_sample convention, so the within-source
        order is itself a reproducible shuffle);
      - row i of source g is scheduled at virtual time
        ``mix_t = (i * 2^20) DIV w_g`` (nonnegative operands: Spark
        DIV == floor) — larger weight = smaller stride = denser;
      - the mix order is (mix_t, group, i); ``mix_pos`` materializes
        it as a global 0-based row_number.

    Every prefix of length L carries ~L*w_g/W rows of source g (off by
    at most one stride + the 2^-20 quantization). Rows whose group is
    missing from ``weights`` RAISE (WHERE guard). ``i`` up to 2^42
    fits the stride product.

    Returns the input columns plus ``(i, mix_t, mix_pos)``.

    Plan: one per-group ranking window + one global ranking window
    over the slim key triple. The global window is the str_partition
    class — at 100 TB assign mix_pos with the two-pass prefix-sum
    rank discipline over mix_t range buckets instead, and ORDER BY
    (mix_t, group, i) stays the streaming-friendly form.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    for g, w in weights.items():
        if int(w) < 1:
            raise ValueError(f"weight for {g!r} must be >= 1, got {w}")
    from pyspark.sql import Window

    wexpr = None
    for g, w in weights.items():
        c = F.col(group_col) == F.lit(g)
        wexpr = F.when(c, F.lit(int(w))) if wexpr is None else wexpr.when(c, F.lit(int(w)))
    df = df.where(
        F.when(wexpr.isNotNull(), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("mix_sources: no weight for group "),
                    F.col(group_col).cast("string"),
                )
            )
        )
    )
    hk = F.substring(
        F.md5(
            F.concat_ws(
                ":",
                F.lit(str(seed)),
                F.col(group_col).cast("string"),
                F.col(id_col).cast("string"),
            )
        ),
        1,
        8,
    )
    wg = Window.partitionBy(group_col).orderBy(hk, F.col(id_col))
    ranked = df.select(
        *df.columns,
        F.row_number().over(wg).cast("bigint").alias("i"),
        wexpr.alias("_w"),
    ).withColumn(
        "mix_t", F.expr(f"(i * {MIX_PREC}L) DIV _w")
    )
    wglob = Window.partitionBy(F.lit(0)).orderBy(
        "mix_t", F.col(group_col), "i"
    )
    return ranked.select(
        *df.columns,
        "i",
        "mix_t",
        (F.row_number().over(wglob) - 1).cast("bigint").alias("mix_pos"),
    )


def interleave_sources(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic SOURCE-INTERLEAVED training order (r5) — the
    ordering half of mixture construction (mixture_sample fixes WHAT
    is in the mix; this fixes the ORDER so a sequential trainer sees
    sources evenly spread, not source-clustered): each document gets
    a global position by sorting on (within-source md5 rank, source),
    which round-robins through the sources while they last — the
    standard shard-interleave a data loader wants, with md5 ranks so
    the per-source order is the stable hash order every sampler here
    uses (append-stable, seedless, engine-replayable).

    Plan: one per-source rank window (partitioned by source — never
    global), then the position is DERIVED (rank, source) — callers
    ORDER BY (pos_in_round, source) at read time; no global window
    materializes a total order. Returns
    (id_col, source_col, pos_in_round:bigint).
    """
    key = md5_uniform_hex(F.col(id_col).cast("string"))
    w = Window.partitionBy(source_col).orderBy(key, F.col(id_col))
    return docs.select(
        id_col,
        source_col,
        (F.row_number().over(w) - 1).cast("bigint").alias("pos_in_round"),
    )
