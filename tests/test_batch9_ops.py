"""Batch-9 operators: BPE tokenizer apply (text.bpe_encode), phonetic
ops (fuzzy.phonetic_join + the Soundex replay pin), and Getis-Ord Gi*
hot spots (spatialstats.getis_ord_gi)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------

MERGES = [
    ("t", "h"), ("th", "e"), ("l", "e"), ("t", "a"), ("ta", "b"),
    ("tab", "le"), ("a", "b"), ("e", "r"),
]


def _bpe_py(word: str, merges) -> list[str]:
    """Reference GPT-2 bpe() loop (min-rank pair, merge all, repeat)."""
    ranks = {p: i for i, p in enumerate(merges)}
    sym = list(word)
    while len(sym) > 1:
        pairs = [(ranks[p], p) for p in zip(sym, sym[1:]) if p in ranks]
        if not pairs:
            break
        _, (a, b) = min(pairs)
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_bpe_chained_merges(spark):
    from osm_pbf_spark.operators.text import bpe_encode

    df = spark.createDataFrame(
        [(1, "table the tab ber"), (2, ""), (3, "table table zzz")],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in bpe_encode(df, MERGES).collect()}
    # t a b l e -> ta b le -> tab le -> table (rule 6 needs rules 3-5);
    # ber -> b + er (rule 8)
    assert rows[1].tokens == ["table", "the", "tab", "b", "er"]
    assert rows[1].n_words == 4 and rows[1].n_tokens == 5
    assert rows[2].tokens == [] and rows[2].n_tokens == 0
    assert rows[3].tokens == ["table", "table", "z", "z", "z"]


def test_bpe_matches_reference_loop(spark):
    from osm_pbf_spark.operators.text import bpe_encode

    words = ["there", "tablet", "abba", "ttttt", "bertha", "x", "tabble"]
    df = spark.createDataFrame(
        [(i, " ".join(words)) for i in range(3)], "doc_id bigint, text string"
    ).repartition(3)
    want = [t for w in words for t in _bpe_py(w, MERGES)]
    for r in bpe_encode(df, MERGES).collect():
        assert r.tokens == want


def test_bpe_duplicate_merge_rejected(spark):
    from osm_pbf_spark.operators.text import bpe_encode

    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="duplicate"):
        bpe_encode(df, [("a", "b"), ("a", "b")])


# ---------------------------------------------------------------------------
# soundex / phonetic join
# ---------------------------------------------------------------------------


def test_soundex_replay_matches_spark(spark):
    """The hybrid-oracle pin: the pure-Python Soundex replay must be
    bit-equal to Spark's native soundex over the gate vocabulary AND
    a battery of H/W and repeated-code edge cases."""
    import __spark_entry__ as entry

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    vocab = [
        r.w
        for r in d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter("w <> ''")
        .distinct()
        .collect()
    ]
    vocab += entry.PHONETIC_PROBES
    vocab += ["ashcraft", "tymczak", "pfister", "honeyman", "robert",
              "rupert", "wheel", "hwhw", "aaaa", "bbbb", "llll"]
    df = spark.createDataFrame([(w,) for w in vocab], "w string")
    got = {r.w: r.c for r in df.select("w", F.soundex("w").alias("c")).collect()}
    for w in vocab:
        assert entry._soundex_py(w) == got[w], (w, entry._soundex_py(w), got[w])


def test_phonetic_join_blocks_and_refines(spark):
    from osm_pbf_spark.operators.fuzzy import phonetic_join

    vocab = spark.createDataFrame(
        [("table",), ("query",), ("batch",), ("stream",)], "w string"
    )
    probes = spark.createDataFrame(
        [("tabel",), ("qery",), ("bach",), ("xyz",)], "probe string"
    )
    got = {(r.probe, r.w) for r in phonetic_join(probes, vocab, "probe", "w").collect()}
    # tabel~table (same code T140, ed 2); qery~query (Q600, ed 1)
    assert ("tabel", "table") in got and ("qery", "query") in got
    # bach vs batch: codes differ (B200 vs B320) -> blocked (recall tradeoff)
    assert not any(p == "bach" for p, _ in got)
    assert not any(p == "xyz" for p, _ in got)


# ---------------------------------------------------------------------------
# Getis-Ord Gi*
# ---------------------------------------------------------------------------


def _gi_py(cells: dict[tuple[int, int], int]) -> dict[tuple[int, int], float]:
    n = len(cells)
    s = sum(cells.values())
    s2 = sum(v * v for v in cells.values())
    out = {}
    for (cx, cy), x in cells.items():
        nb = [
            cells[(cx + dx, cy + dy)]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (cx + dx, cy + dy) in cells
        ]
        wi, ti = len(nb), sum(nb)
        num = n * ti - s * wi
        out[(cx, cy)] = float(num) / (
            math.sqrt(float(n * s2 - s * s))
            * math.sqrt(float(n * wi - wi * wi) / float(n - 1))
        )
    return out


def test_getis_ord_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.spatialstats import getis_ord_gi

    cells = {}
    for i in range(8):
        for j in range(8):
            cells[(i, j)] = ((i * 13 + j * 7) % 5) + 1
    cells[(2, 2)] = cells[(2, 3)] = cells[(3, 2)] = 40  # a hot cluster
    df = spark.createDataFrame(
        [(cx, cy, x) for (cx, cy), x in cells.items()], "cx bigint, cy bigint, x bigint"
    )
    got = {(r.cx, r.cy): (r.wi, r.gi_z) for r in getis_ord_gi(df).collect()}
    want = _gi_py(cells)
    assert set(got) == set(want)
    for k, (wi, z) in got.items():
        assert z == want[k], (k, z, want[k])  # exact-bits contract
    # the hot cluster must be the top z-scores, well past 2 sigma
    top = sorted(got, key=lambda k: -got[k][1])[:3]
    assert set(top) == {(2, 2), (2, 3), (3, 2)}
    assert got[(2, 2)][1] > 2.0
    # corner cell has wi = 4 (3x3 window clipped to the grid)
    assert got[(0, 0)][0] == 4
