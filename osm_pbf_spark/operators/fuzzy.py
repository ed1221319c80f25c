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

__all__ = ["fuzzy_join", "phonetic_join"]


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
