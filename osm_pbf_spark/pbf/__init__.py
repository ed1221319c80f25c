"""OSM-PBF decode stack: wire format -> PrimitiveBlock -> entity arrays.

Spec-normative sources (public): the OSM PBF format specification
(fileformat.proto / osmformat.proto, wiki.openstreetmap.org/wiki/PBF_Format).
No google.protobuf dependency — the wire decoder is hand-rolled with a
numpy-vectorized packed-varint kernel for the hot arrays.
"""
