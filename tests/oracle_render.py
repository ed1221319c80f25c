"""Pure-Python ORACLE renderer: entity -> (doc_id, spans).

Independent scalar mirror of osm_pbf_spark.operators.docrender's render
spec. The Spark pipeline must reproduce this per-row span sequence
EXACTLY — (kind, text, media_ref, order) — per BASELINE.json:16.
"""

from __future__ import annotations


def render_entity(kind: str, entity: dict) -> dict:
    spans = []
    offset = 0

    def text_span(span_kind: str, text: str):
        nonlocal offset
        spans.append({"kind": span_kind, "text": text, "media_ref": "", "offset": offset})
        offset += len(text) + 1

    def media_span(span_kind: str, media_ref: str):
        spans.append({"kind": span_kind, "text": "", "media_ref": media_ref, "offset": offset})

    text_span("text", f"{kind} {entity['id']}")
    for k, v in entity.get("tags", {}).items():
        text_span("tag-key", k)
        text_span("tag-value", v)

    if kind == "node":
        media_span("geom", "geom:point:%.7f,%.7f" % (entity["lat"], entity["lon"]))
    elif kind == "way":
        refs = entity["refs"]
        media_span("geom", f"geom:way:{refs[0]}..{refs[-1]}:{len(refs)}")
    elif kind == "relation":
        for m in entity.get("members", []):
            media_span("media", f"member:{m['type']}/{m['ref']}:{m['role']}")

    return {"doc_id": f"{kind}/{entity['id']}", "spans": spans}


def render_file(decoded: dict) -> list[dict]:
    """oracle_pbf.decode_file output -> list of rendered docs."""
    out = []
    for n in decoded["nodes"]:
        out.append(render_entity("node", n))
    for w in decoded["ways"]:
        out.append(render_entity("way", w))
    for r in decoded["relations"]:
        out.append(render_entity("relation", r))
    return out
