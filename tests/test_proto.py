"""Wire-format round-trips: encoder <-> vectorized decoder (SURVEY §5.2.3)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_pbf_spark.pbf import encoder as E
from osm_pbf_spark.pbf import proto as P

i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
u64 = st.integers(min_value=0, max_value=2**64 - 1)


@given(st.lists(u64, max_size=200))
@settings(max_examples=200, deadline=None)
def test_packed_varint_roundtrip(values):
    buf = b"".join(E.varint(v) for v in values)
    got = P.decode_packed_varints(buf)
    assert got.tolist() == values


@given(st.lists(i64, max_size=200))
@settings(max_examples=200, deadline=None)
def test_packed_sint_roundtrip(values):
    buf = b"".join(E.varint(E.zigzag(v)) for v in values)
    got = P.decode_packed_sint(buf)
    assert got.tolist() == values


@given(i64)
def test_zigzag_scalar_matches_np(v):
    u = E.zigzag(v)
    assert P.zigzag_decode(u) == v
    assert P.zigzag_decode_np(np.array([u], dtype=np.uint64))[0] == v


# deltas of two int64s can exceed int64; OSM ids/coords are far smaller
# (ids < 2^40, nanodeg coords < 2^38), so constrain to the spec domain.
i62 = st.integers(min_value=-(2**61), max_value=2**61 - 1)


@given(st.lists(i62, min_size=1, max_size=100))
@settings(max_examples=100, deadline=None)
def test_delta_cumsum_roundtrip(values):
    deltas = E.deltas(values)
    got = np.cumsum(np.array(deltas, dtype=np.int64), dtype=np.int64)
    assert got.tolist() == values


def test_field_walker_mixed_message():
    msg = (
        E.field_varint(1, 300)
        + E.field_bytes(2, b"hello")
        + E.field_varint(1, 7)
        + E.field_string(16, "prog")
    )
    f = P.fields(msg)
    assert f[1] == [300, 7]
    assert bytes(f[2][0]) == b"hello"
    assert bytes(f[16][0]) == b"prog"


def test_repeated_scalar_handles_unpacked():
    # proto2 allows repeated scalars to arrive unpacked
    vals = [E.zigzag(v) for v in [5, -3, 10]]
    got = P.repeated_scalar(vals, packed_sint=True)
    assert got.tolist() == [5, -3, 10]


def test_truncated_varint_raises():
    import pytest

    with pytest.raises(ValueError):
        P.decode_packed_varints(b"\x80\x80")
