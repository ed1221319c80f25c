"""Batch-30 operators: containment_join (asymmetric set containment),
k_anonymity (privacy audit), chaikin_smooth (corner cutting)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------ containment_join


def _contain_py(docs: dict[int, str], num: int, den: int):
    sets = {d: {t for t in txt.split(" ") if t} for d, txt in docs.items()}
    out = {}
    for a in sets:
        for b in sets:
            if a == b:
                continue
            inter = len(sets[a] & sets[b])
            if den * inter >= num * len(sets[a]) and inter > 0:
                out[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    return out


def test_containment_matches_brute(spark):
    from osm_pbf_spark.operators.dedup import containment_join

    docs = {
        1: "a b c d e f g h",
        2: "a b c d",  # fully inside 1
        3: "a b x y",  # half inside 1 and 2
        4: "p q r s t",  # disjoint
        5: "a b c d e f g h p q",  # contains 1 at 8/10
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): (r.n_inter, r.na, r.nb)
        for r in containment_join(df, threshold=(8, 10)).collect()
    }
    assert got == _contain_py(docs, 8, 10)
    assert (2, 1) in got and (1, 2) not in got  # asymmetry
    assert (1, 5) in got  # the long doc is contained in its superset


def test_containment_duplicate_tokens_and_validation(spark):
    """Token MULTIPLICITY is ignored (set semantics), matching the
    distinct-token spec."""
    from osm_pbf_spark.operators.dedup import containment_join

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b c d e f")], "doc_id long, text string"
    )
    got = {(r.id_a, r.id_b): (r.n_inter, r.na, r.nb)
           for r in containment_join(df, threshold=(9, 10)).collect()}
    assert got == {(1, 2): (2, 2, 6)}
    with pytest.raises(ValueError):
        containment_join(df, threshold=(0, 10))


# ----------------------------------------------------------- k_anonymity


def test_k_anonymity_flags_small_classes(spark):
    from osm_pbf_spark.operators.dq import k_anonymity

    rows = [("94110", "F")] * 5 + [("94110", "M")] * 2 + [("10001", "F")] * 1
    df = spark.createDataFrame(rows, "zip string, sex string")
    got = sorted(
        (r.zip, r.sex, r.n) for r in k_anonymity(df, ["zip", "sex"], k=3).collect()
    )
    assert got == [("10001", "F", 1), ("94110", "M", 2)]
    # k-anonymous at k=3 after dropping the violators
    ok = spark.createDataFrame(rows[:5], "zip string, sex string")
    assert k_anonymity(ok, ["zip", "sex"], k=3).count() == 0


def test_k_anonymity_null_is_a_value_and_validation(spark):
    from osm_pbf_spark.operators.dq import k_anonymity

    df = spark.createDataFrame(
        [(None, "F"), (None, "F"), ("x", "M")], "zip string, sex string"
    )
    got = sorted(
        ((r.zip, r.sex, r.n) for r in k_anonymity(df, ["zip", "sex"], k=3).collect()),
        key=str,
    )
    assert (None, "F", 2) in got and ("x", "M", 1) in got
    with pytest.raises(ValueError):
        k_anonymity(df, [], 3)
    with pytest.raises(ValueError):
        k_anonymity(df, ["zip"], 1)


# -------------------------------------------------------- chaikin_smooth


def _chaikin_py(pts, iters):
    for _ in range(iters):
        if len(pts) == 1:
            pts = [(pts[0][0] * 4, pts[0][1] * 4)]
            continue
        out = [(pts[0][0] * 4, pts[0][1] * 4)]
        for (x1, y1), (x2, y2) in zip(pts, pts[1:]):
            out.append((3 * x1 + x2, 3 * y1 + y2))
            out.append((x1 + 3 * x2, y1 + 3 * y2))
        out.append((pts[-1][0] * 4, pts[-1][1] * 4))
        pts = out
    return pts


@pytest.mark.parametrize("iters", [1, 2, 3])
def test_chaikin_matches_scalar_replay(spark, iters):
    from osm_pbf_spark.operators.simplify import chaikin_smooth

    lines = {
        0: [(0, 0), (10, 0), (10, 10), (0, 10)],
        1: [((i * 7) % 40, (i * 13) % 40) for i in range(12)],
        2: [(5, 5)],  # degenerate single vertex
        3: [(0, 0), (100, 50)],  # one segment
    }
    rows = [
        (lid, p, x, y) for lid, pts in lines.items() for p, (x, y) in enumerate(pts)
    ]
    df = spark.createDataFrame(rows, "line_id long, pos long, ix long, iy long")
    got: dict[int, list] = {}
    for r in chaikin_smooth(df, iters=iters).collect():
        assert r.scale_pow4 == iters
        got.setdefault(r.line_id, []).append((r.pos, r.ix, r.iy))
    for lid, pts in lines.items():
        exp = [
            (i, x, y) for i, (x, y) in enumerate(_chaikin_py(list(pts), iters))
        ]
        assert sorted(got[lid]) == exp, lid


def test_chaikin_endpoints_fixed_and_validation(spark):
    """Endpoints stay at the original coordinates (in 4^iters units)
    and each pass doubles the vertex count."""
    from osm_pbf_spark.operators.simplify import chaikin_smooth

    pts = [(0, 0), (8, 0), (8, 8)]
    df = spark.createDataFrame(
        [(1, i, x, y) for i, (x, y) in enumerate(pts)],
        "line_id long, pos long, ix long, iy long",
    )
    out = sorted(chaikin_smooth(df, iters=2).collect(), key=lambda r: r.pos)
    assert len(out) == 12  # 3 -> 6 -> 12
    assert (out[0].ix, out[0].iy) == (0, 0)
    assert (out[-1].ix, out[-1].iy) == (8 * 16, 8 * 16)
    with pytest.raises(ValueError):
        chaikin_smooth(df, iters=0)
