"""ngram_decontaminate vs a scalar pure-Python n-gram oracle, plus the
mode algebra (hits / clean / dirty partition the corpus)."""

from __future__ import annotations

import pytest


def _grams(text: str, n: int) -> set[str]:
    toks = [t for t in text.split(" ") if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "sphinx of black quartz judge my vow"),
    (4, "the quick brown cat naps all day long"),
    (5, "short doc"),  # fewer than n tokens -> zero grams
    (6, ""),  # empty text
    (7, "over the lazy dog we went walking yesterday"),
    (8, "a a a a a"),  # repeated-gram doc: distinct grams counted once
]
BENCH = [
    (100, "the quick brown fox ran fast"),
    (101, "over the lazy dog"),
    (102, "a a a a"),
]
N = 3


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id int, text string")


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(BENCH, "doc_id int, text string")


def _expected_hits():
    bench_grams = set()
    for _i, t in BENCH:
        bench_grams |= _grams(t, N)
    out = {}
    for i, t in CORPUS:
        k = len(_grams(t, N) & bench_grams)
        if k:
            out[i] = k
    return out


def test_hits_match_oracle(spark, docs, bench):
    from osm_pbf_spark.operators.text import ngram_decontaminate

    got = {
        r.doc_id: r.dirty_grams
        for r in ngram_decontaminate(docs, bench, n=N).collect()
    }
    want = _expected_hits()
    assert got == want
    # sanity of the fixture itself: multi-hit, single-hit, repeated-gram
    assert want[1] >= 2  # "the quick brown" + "over the lazy" + ...
    assert want[8] == 1  # 'a a a' counted once despite repeats
    assert 5 not in want and 6 not in want  # sub-n docs never match


def test_clean_dirty_partition_corpus(spark, docs, bench):
    from osm_pbf_spark.operators.text import ngram_decontaminate

    clean = ngram_decontaminate(docs, bench, n=N, mode="clean")
    dirty = ngram_decontaminate(docs, bench, n=N, mode="dirty")
    clean_ids = {r.doc_id for r in clean.collect()}
    dirty_ids = {r.doc_id for r in dirty.collect()}
    assert clean_ids | dirty_ids == {i for i, _ in CORPUS}
    assert not (clean_ids & dirty_ids)
    assert dirty_ids == set(_expected_hits())
    # clean/dirty preserve the full input schema
    assert clean.columns == docs.columns


def test_bad_mode_rejected(spark, docs, bench):
    from osm_pbf_spark.operators.text import ngram_decontaminate

    with pytest.raises(ValueError, match="mode"):
        ngram_decontaminate(docs, bench, mode="purge")


def test_doc_ngrams_native_matches_python(spark):
    """The native Generate produces exactly the scalar n-grams,
    including the <n-token guard and multi-space splits."""
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.text import doc_ngrams

    texts = [
        "one two three four five",
        "one  two   three",  # empty tokens from double spaces are dropped
        "just two",
        "",
        "a b c",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select("text", doc_ngrams(F.col("text"), 3).alias("g")).collect()
    for r in rows:
        assert sorted(r.g) == sorted(_grams(r.text, 3)), r.text
