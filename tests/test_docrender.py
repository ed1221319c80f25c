"""Span-sequence equality: Spark render vs pure-Python oracle renderer.

This is THE per-row invariant of the engine (BASELINE.json:16):
(kind, text, media_ref, order) must match exactly for every document.
"""

from __future__ import annotations

import pytest

from osm_pbf_spark.operators.docrender import render_documents
from osm_pbf_spark.sources import pbf_source as src
from tests import oracle_pbf, oracle_render


@pytest.mark.parametrize("name", ["minimal", "mixed", "multiblob", "granularity",
                                  "denseinfo", "empty-strings"])
def test_span_sequence_equality(spark, fixtures_dir, name):
    path = f"{fixtures_dir}/{name}.osm.pbf"
    entities, _ = src.read_pbf(spark, path)
    got = {r["doc_id"]: r for r in render_documents(entities).collect()}

    want = oracle_render.render_file(oracle_pbf.decode_file(path))
    assert len(got) == len(want)
    for w in want:
        g = got[w["doc_id"]]
        g_spans = [
            {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"],
             "offset": s["offset"]}
            for s in g["spans"]
        ]
        assert g_spans == w["spans"], w["doc_id"]


def test_offsets_strictly_nondecreasing(spark, fixtures_dir):
    entities, _ = src.read_pbf(spark, f"{fixtures_dir}/mixed.osm.pbf")
    for r in render_documents(entities).collect():
        offs = [s["offset"] for s in r["spans"]]
        assert offs == sorted(offs)
        assert offs[0] == 0
