"""Text-analysis operators for training-data pipelines.

All built from native pyspark.sql.functions (JVM-side, codegen) so they
stay cheap at 10^12-doc scale; each has an ANSI-SQL-expressible
equivalent used as its DuckDB oracle. A rolling-hash fingerprint
(python/numpy) exists for tests; the production fingerprint is md5
(identical across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small, deterministic stopword marker sets per language — the lang-id
# heuristic counts occurrences of these space-delimited markers.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "fr": [" le ", " la ", " et "],
    "de": [" der ", " die ", " und "],
    "es": [" el ", " los ", " y "],
}


def occurrences(col: Column, needle: str) -> Column:
    """Vectorized substring-occurrence count: (len - len(remove)) / len(needle)."""
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / F.lit(
        len(needle)
    )


def token_count(col: Column) -> Column:
    """Whitespace token count (single-space convention of the corpus)."""
    return F.size(F.split(col, " "))


def quality_score(col: Column) -> Column:
    """Deterministic quality heuristic in [0, ~1]:

    0.4 * min(1, len/500) + 0.3 * stopword-ratio + 0.3 * (1 - punct-ratio)

    Pure arithmetic on exact integer counts -> identical in any engine.
    """
    length = F.length(col)
    stop = occurrences(col, " the ") + occurrences(col, " and ") + occurrences(col, " of ")
    toks = token_count(col)
    punct = (
        occurrences(col, ".") + occurrences(col, ",") + occurrences(col, "!")
        + occurrences(col, "?")
    )
    return (
        F.lit(0.4) * F.least(F.lit(1.0), length / F.lit(500.0))
        + F.lit(0.3) * F.least(F.lit(1.0), stop * F.lit(10.0) / toks)
        + F.lit(0.3) * (F.lit(1.0) - F.least(F.lit(1.0), punct * F.lit(5.0) / toks))
    )


def lang_id(col: Column) -> Column:
    """N-gram-marker language ID: argmax of per-language marker counts.

    Deterministic tie-break: language order en > fr > de > es ('und'
    beats nothing — first maximum wins via strict > comparisons).
    """
    scores = {
        lang: sum((occurrences(col, m) for m in markers), F.lit(0.0))
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    expr = F.lit(langs[-1])
    # build right-to-left: earlier languages win ties
    for lang in reversed(langs[:-1]):
        later = [scores[other] for other in langs[langs.index(lang) + 1 :]]
        cond = scores[lang] >= later[0]
        for o in later[1:]:
            cond = cond & (scores[lang] >= o)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint_md5(col: Column) -> Column:
    """Content fingerprint — md5 hex; bit-identical across engines."""
    return F.md5(col)


def tfidf(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-(document, term) TF-IDF over whitespace tokens:

        tfidf = tf * (ln((N + 1) / (df + 1)) + 1)

    (the smoothed-idf formula used by scikit-learn's TfidfTransformer,
    public). Returns ``(doc_id, term, tf:bigint, tfidf:double)``.

    Plan shape: explode tokens -> ONE (doc, term) hash aggregate (tf)
    -> ONE term hash aggregate (df, map-side partial) -> join tf-to-df
    on term (df side is |vocab| rows — tiny vs corpus, broadcast-able)
    -> cross-join the 1-row N. Two narrow shuffles total; everything
    whole-stage codegen, no Python.

    Cross-engine exactness: counts are exact ints; the division is done
    as double of exact ints in one fixed order; only ``ln`` can drift
    ~1 ulp between JVM and libm — callers gate-compare at
    ``round(tfidf, 6)`` per row (no cross-row float sums).
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = toks.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    n = docs.select(F.count(F.lit(1)).alias("n"))
    idf = F.log((F.col("n") + F.lit(1)).cast("double") / (F.col("df") + F.lit(1)).cast("double")) + F.lit(1.0)
    return (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(n))
        .select(F.col(id_col), "term", "tf", (F.col("tf") * idf).alias("tfidf"))
    )


def doc_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document analysis columns in one pass."""
    c = F.col(text_col)
    return docs.select(
        "*",
        token_count(c).alias("n_tokens"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint_md5(c).alias("fp"),
    )


def rolling_fingerprint(text: str, window: int = 16, mod: int = (1 << 61) - 1,
                        base: int = 257) -> int:
    """Pure-Python Rabin-Karp rolling-hash document fingerprint:
    min of rolling hashes (a winnowing-style representative). Test-side
    counterpart used by the dedup property tests."""
    data = text.encode("utf-8")
    if len(data) < window:
        h = 0
        for b in data:
            h = (h * base + b) % mod
        return h
    h = 0
    power = pow(base, window - 1, mod)
    best = None
    for i, b in enumerate(data):
        if i >= window:
            h = (h - data[i - window] * power) % mod
        h = (h * base + b) % mod
        if i >= window - 1:
            best = h if best is None or h < best else best
    return best
