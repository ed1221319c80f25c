"""Edit-distance similarity join (SURVEY.md §2.4b P-family extension).

``fuzzy_join(df, threshold=1)`` returns every pair of rows whose
strings are within Levenshtein distance ``threshold`` — the classic
entity-resolution / near-duplicate-title primitive.

Scale design (the FastSS / SymSpell deletion-neighborhood scheme,
public algorithm): for threshold 1, two strings a, b satisfy
ed(a, b) <= 1  ⟺  D(a) ∩ D(b) ≠ ∅ where D(x) = {x} ∪ {x with one
character deleted}.  (Substitution: deleting the differing character
from both yields the same string; insertion/deletion: the shorter
string itself is a deletion of the longer; equality: x ∈ both.)
The converse has false positives (e.g. "ab"/"ba" share "a"), so an
exact native ``levenshtein`` refine runs on candidates.

Plan shape:
  1. map-only Generate: each row emits len+1 signatures via a native
     ``transform(sequence(...))`` — NO Python stage, stays in
     whole-stage codegen;
  2. one equi-join shuffle on the signature; ``id_a < id_b`` halves it;
  3. distinct pair ids (a pair can share several deletions);
  4. join the two string payloads back (slim id->string side) and
     refine with native ``levenshtein``.

At 10^12 rows the signature table is sum(len+1) rows of (sig, id) —
linear, and the shuffle key is the signature itself, so hot signatures
(very common short strings) are exact-duplicate groups a caller should
pre-collapse with exact dedup first (same guidance as minhash_lsh_pairs,
operators/dedup.py).

Only threshold=1 uses the deletion scheme; threshold>=2 would need
k-deletion neighborhoods (size O(len^k)) — out of scope, rejected
loudly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_join", "phonetic_join", "jaro_winkler_join",
           "jaro_winkler_ppm_py"]


def fuzzy_join(
    df: DataFrame,
    id_col: str = "id",
    str_col: str = "s",
    threshold: int = 1,
) -> DataFrame:
    """All pairs (id_a < id_b) with levenshtein(s_a, s_b) <= threshold.

    Returns columns (id_a, id_b, dist). Exact (no false positives or
    negatives) for threshold in {0, 1}.
    """
    if threshold not in (0, 1):
        raise ValueError(
            f"fuzzy_join supports threshold 0 or 1 (deletion-neighborhood "
            f"blocking); got {threshold}"
        )
    base = df.select(F.col(id_col).alias("_fid"), F.col(str_col).alias("_fs"))
    if threshold == 0:
        # exact-equality join on the string itself — one shuffle
        a = base.select(F.col("_fid").alias("id_a"), F.col("_fs").alias("sa"))
        b = base.select(F.col("_fid").alias("id_b"), F.col("_fs").alias("sb"))
        return (
            a.join(b, (F.col("sa") == F.col("sb")) & (F.col("id_a") < F.col("id_b")))
            .select("id_a", "id_b", F.lit(0).alias("dist"))
        )

    # D(x) = {x} ∪ deletions1(x), emitted by a native Generate
    sigs = base.select(
        "_fid",
        F.explode(
            F.array_union(
                F.array(F.col("_fs")),
                F.expr(
                    "transform(sequence(1, length(_fs)), "
                    "i -> concat(substring(_fs, 1, i - 1), substring(_fs, i + 1, length(_fs))))"
                ),
            )
        ).alias("sig"),
    )
    pairs = (
        sigs.alias("a")
        .join(
            sigs.alias("b"),
            (F.col("a.sig") == F.col("b.sig")) & (F.col("a._fid") < F.col("b._fid")),
        )
        .select(F.col("a._fid").alias("id_a"), F.col("b._fid").alias("id_b"))
        .distinct()
    )
    sa = base.select(F.col("_fid").alias("id_a"), F.col("_fs").alias("sa"))
    sb = base.select(F.col("_fid").alias("id_b"), F.col("_fs").alias("sb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("dist", F.levenshtein("sa", "sb"))
        .where(F.col("dist") <= threshold)
        .select("id_a", "id_b", "dist")
    )


def phonetic_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_edit: int = 2,
) -> DataFrame:
    """Phonetic-blocking fuzzy match: candidate pairs share an American
    Soundex code (Spark's native ``soundex``), refined with native
    ``levenshtein(a, b) <= max_edit`` — the classic name-matching /
    entity-resolution recipe ("sounds alike AND spells close").

    Unlike :func:`fuzzy_join` (exact by the deletion lemma), phonetic
    blocking is approximate-RECALL by design: a pair whose codes differ
    (e.g. a first-letter typo) is never considered — that is the
    documented Soundex-blocking tradeoff. Precision is exact (the
    levenshtein refine is native and final).

    Plan: two map-only soundex projections, ONE equi-join shuffle on
    the 4-char code (at most 26*7^3 distinct blocks — hot blocks mean
    near-identical names, which is the match set itself), codegen
    refine. No Python anywhere.
    """
    lc = left.select(
        *left.columns, F.soundex(F.col(left_col)).alias("_sdx")
    )
    rc = right.select(
        *right.columns, F.soundex(F.col(right_col)).alias("_sdx")
    )
    return (
        lc.join(rc, "_sdx")
        .where(F.levenshtein(F.col(left_col), F.col(right_col)) <= max_edit)
        .drop("_sdx")
    )


def fs_weights(m_u: dict[str, tuple[float, float]]) -> dict[str, tuple[int, int]]:
    """Fellegi–Sunter field weights in micro-nats (driver-side floats
    -> INT literals, so engine arithmetic is pure int64): agreement
    weight ln(m/u), disagreement weight ln((1-m)/(1-u)), each
    quantized HALF-UP-away-from-zero (the dsir rule — never round():
    Spark HALF_UP vs DuckDB HALF_EVEN). Shared by the operator and the
    gate oracle so the two sides cannot drift."""
    import math

    out = {}
    for f, (m, u) in m_u.items():
        if not (0.0 < m < 1.0 and 0.0 < u < 1.0):
            raise ValueError(f"field {f!r}: m and u must be in (0, 1)")

        def q(x: float) -> int:
            return int(math.floor(abs(x) * 1e6 + 0.5)) * (1 if x >= 0 else -1)

        out[f] = (q(math.log(m / u)), q(math.log((1.0 - m) / (1.0 - u))))
    return out


def fs_link(
    left: DataFrame,
    right: DataFrame,
    block_on: list[str],
    m_u: dict[str, tuple[float, float]],
    left_id: str = "id_a",
    right_id: str = "id_b",
) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage over blocked
    candidate pairs — the classical entity-resolution scorer (census /
    customer-dedup lineage) that turns per-field agreement into an
    additive log-likelihood-ratio match score.

    Per comparison field f with match/unmatch agreement probabilities
    (m_f, u_f), a candidate pair contributes the AGREEMENT weight
    ln(m/u) when both sides are non-null and equal, the DISAGREEMENT
    weight ln((1-m)/(1-u)) when both non-null and unequal, and 0 when
    either side is null (missing is uninformative — the standard
    convention). Weights are quantized to micro-nat INT LITERALS at
    plan time (:func:`fs_weights`), so the engine-side score is an
    exact int64 sum — deterministic, gate-hashable; the caller
    thresholds ``score_micro`` downstream.

    Returns ``(id_a, id_b, n_agree, n_disagree, score_micro)`` — one
    row per blocked candidate pair.

    Plan: ONE equi-join on the blocking key (never all-pairs — pick
    blocks the way every linkage pipeline does: phonetic_join /
    fuzzy_join blocking keys compose here) + a map-side CASE sum per
    field, whole-stage codegen, no Python, no extra shuffle beyond the
    join's. Hot blocks are the caller's contract, exactly as in the
    LSH family.
    """
    if not block_on:
        raise ValueError("block_on must be non-empty")
    fields = list(m_u)
    if not fields:
        raise ValueError("m_u must name at least one comparison field")
    w = fs_weights(m_u)
    lt = left.select(
        F.col(left_id).alias("id_a"),
        *[F.col(c).alias(f"_bk{i}") for i, c in enumerate(block_on)],
        *[F.col(f).alias(f"_la{i}") for i, f in enumerate(fields)],
    )
    rt = right.select(
        F.col(right_id).alias("id_b"),
        *[F.col(c).alias(f"_bk{i}") for i, c in enumerate(block_on)],
        *[F.col(f).alias(f"_ra{i}") for i, f in enumerate(fields)],
    )
    j = lt.join(rt, [f"_bk{i}" for i in range(len(block_on))])
    agree_terms, dis_terms, score_terms = [], [], []
    for i, f in enumerate(fields):
        a, b = F.col(f"_la{i}"), F.col(f"_ra{i}")
        both = a.isNotNull() & b.isNotNull()
        wa, wd = w[f]
        agree_terms.append(F.when(both & (a == b), 1).otherwise(0))
        dis_terms.append(F.when(both & (a != b), 1).otherwise(0))
        score_terms.append(
            F.when(both & (a == b), F.lit(wa))
            .when(both, F.lit(wd))
            .otherwise(F.lit(0))
            .cast("bigint")
        )
    n_agree = sum(agree_terms[1:], agree_terms[0])
    n_dis = sum(dis_terms[1:], dis_terms[0])
    score = sum(score_terms[1:], score_terms[0])
    return j.select(
        "id_a",
        "id_b",
        n_agree.cast("int").alias("n_agree"),
        n_dis.cast("int").alias("n_disagree"),
        score.alias("score_micro"),
    )


def jaro_winkler_ppm_py(s1: str, s2: str) -> int:
    """EXACT-RATIONAL Jaro-Winkler similarity in ppm (floor) — the
    shared scalar spec for both the engine kernel and the oracle
    replay. Standard definition (Winkler 1990, boost threshold OFF):
    greedy left-to-right matching inside the window
    max(l1,l2)//2 - 1, t = half the out-of-order matches, jaro =
    (m/l1 + m/l2 + (m-t)/m)/3, jw = jaro + min(prefix,4)/10*(1-jaro).
    Every quantity is a small-int rational, so
    ppm = floor(10^6 * jw) computes in exact int64 (never a float):
    jaro = jn/jd with jn = m*m*l2 + m*m*l1 + (m-t)*l1*l2,
    jd = 3*l1*l2*m; jw = ((10-p)*jn + p*jd) / (10*jd).
    """
    l1, l2 = len(s1), len(s2)
    if l1 == 0 and l2 == 0:
        return 1_000_000
    if l1 == 0 or l2 == 0:
        return 0
    w = max(l1, l2) // 2 - 1
    if w < 0:
        w = 0
    used = [False] * l2
    m1, m2 = [], []
    for i, c in enumerate(s1):
        lo, hi = max(0, i - w), min(l2, i + w + 1)
        for j in range(lo, hi):
            if not used[j] and s2[j] == c:
                used[j] = True
                m1.append(i)
                m2.append(j)
                break
    m = len(m1)
    if m == 0:
        return 0
    s2m = [j for j in range(l2) if used[j]]
    half_trans = sum(1 for a, b in zip(m1, s2m) if s1[a] != s2[b])
    t = half_trans // 2
    jn = m * m * l2 + m * m * l1 + (m - t) * l1 * l2
    jd = 3 * l1 * l2 * m
    p = 0
    for a, b in zip(s1, s2):
        if a != b or p == 4:
            break
        p += 1
    return (1_000_000 * ((10 - p) * jn + p * jd)) // (10 * jd)


def jaro_winkler_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    min_ppm: int = 850_000,
    block: str = "soundex",
) -> DataFrame:
    """Jaro-Winkler similarity join (r4) — the name/title matcher the
    record-linkage literature actually uses (edit distance treats a
    transposed first name as 2 errors; JW scores order and shared
    prefixes): all (left, right) pairs with exact-rational JW ppm
    >= ``min_ppm``.

    EXACTNESS: the similarity is computed by the integer spec in
    :func:`jaro_winkler_ppm_py` — m, t, prefix are small ints and the
    final value is ONE integer floor-division, so there is no float
    anywhere and any engine/replay reproduces the bits.

    Blocking (documented approximate-recall, the phonetic_join
    posture): ``block='soundex'`` joins on the native Soundex code;
    ``block='prefix1'`` on the first character (higher recall, hotter
    blocks). Precision is exact — the kernel is final.

    Plan: map-only block-key projections, ONE equi-join shuffle,
    ONE Arrow-batched mapInPandas kernel scoring the candidate pairs
    (per-DISTINCT-pair Python loop inside the batch — the map_match
    bounded-scalar-kernel class; the block join keeps candidates
    near-linear). Returns left/right columns + ``jw_ppm``.
    """
    if block not in ("soundex", "prefix1"):
        raise ValueError(f"block must be soundex|prefix1, got {block!r}")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"left/right column names must be disjoint (the joined row "
            f"carries both sides verbatim); overlapping: {sorted(overlap)}"
        )

    def key(c):
        return (
            F.soundex(F.col(c)) if block == "soundex"
            else F.substring(F.col(c), 1, 1)
        )

    lc = left.select(*left.columns, key(left_col).alias("_blk"))
    rc = right.select(*right.columns, key(right_col).alias("_blk"))
    cand = lc.join(rc, "_blk").drop("_blk")

    import pandas as pd

    out_cols = [c for c in cand.columns]
    lcol, rcol = left_col, right_col
    thr = int(min_ppm)

    def refine(it):
        # memo only exists to dedupe repeats WITHIN a task; cap it so a
        # hot block with high-cardinality distinct pairs cannot grow
        # executor memory without bound across batches
        cache: dict = {}
        for pdf in it:
            ppms = []
            for a, b in zip(pdf[lcol], pdf[rcol]):
                k = (a, b)
                v = cache.get(k)
                if v is None:
                    v = jaro_winkler_ppm_py(a or "", b or "")
                    if len(cache) >= 1_000_000:
                        cache.clear()
                    cache[k] = v
                ppms.append(v)
            pdf = pdf.assign(jw_ppm=pd.Series(ppms, dtype="int64").values)
            yield pdf[pdf["jw_ppm"] >= thr]

    schema_parts = [
        f"{f.name} {f.dataType.simpleString()}" for f in cand.schema.fields
    ]
    schema_parts.append("jw_ppm bigint")
    return cand.mapInPandas(refine, schema=", ".join(schema_parts))
