"""Batch-39: span_corruption, decision_stump, psi_drift."""

from __future__ import annotations

import hashlib
import math


def _mask(seed, doc, w, noise_ppm):
    h = hashlib.md5(f"{seed}:{doc}:{w}".encode()).hexdigest()[:10]
    return int(h, 16) % 1_000_000 < noise_ppm


def _scalar_span_corrupt(doc, toks, seed, span_len, noise_ppm):
    inputs, targets = [], []
    k = -1
    n_masked = 0
    for pos, tok in enumerate(toks):
        w = pos // span_len
        m = _mask(seed, doc, w, noise_ppm)
        isf = pos % span_len == 0
        if m and isf:
            k += 1
            inputs.append(f"<extra_id_{k}>")
            targets.append(f"<extra_id_{k}>")
        if m:
            targets.append(tok)
            n_masked += 1
        else:
            inputs.append(tok)
    return inputs, targets, k + 1, n_masked


def test_span_corruption_scalar_replay(spark):
    from osm_pbf_spark.operators.text import span_corruption

    rows = [(d, [f"t{d}_{i}" for i in range((d * 7) % 13 + 1)])
            for d in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    out = {
        r.doc_id: r
        for r in span_corruption(
            df, "doc_id", "toks", seed=5, span_len=3, noise_ppm=400_000
        ).collect()
    }
    assert set(out) == {d for d, _ in rows}
    any_masked = False
    for d, toks in rows:
        inp, tgt, n_spans, n_masked = _scalar_span_corrupt(
            d, toks, 5, 3, 400_000
        )
        r = out[d]
        assert r.n_tokens == len(toks)
        assert (r.n_spans, r.n_masked) == (n_spans, n_masked)
        assert list(r.inputs) == inp and list(r.targets) == tgt
        assert r.input_text == " ".join(inp)
        assert r.target_text == " ".join(tgt)
        any_masked = any_masked or n_masked > 0
        # reconstruction invariant: stripping sentinels and splicing
        # targets back at sentinel positions recovers the original
        recon, ti = [], 0
        tlist = tgt
        for v in inp:
            if v.startswith("<extra_id_"):
                ti = tlist.index(v) + 1
                while ti < len(tlist) and not tlist[ti].startswith(
                    "<extra_id_"
                ):
                    recon.append(tlist[ti])
                    ti += 1
            else:
                recon.append(v)
        assert recon == toks, d
    assert any_masked  # the fixture must actually exercise masking


def test_span_corruption_seed_changes_mask(spark):
    from osm_pbf_spark.operators.text import span_corruption

    df = spark.createDataFrame(
        [(1, [f"w{i}" for i in range(30)])],
        "doc_id long, toks array<string>",
    )
    a = span_corruption(df, "doc_id", "toks", seed=1).collect()[0]
    b = span_corruption(df, "doc_id", "toks", seed=2).collect()[0]
    assert a.input_text != b.input_text  # overwhelmingly likely by spec
    # determinism: same seed -> identical output
    a2 = span_corruption(df, "doc_id", "toks", seed=1).collect()[0]
    assert a.input_text == a2.input_text and a.targets == a2.targets


# ------------------------------------------------------- decision_stump


def _scalar_stump(pairs):
    xs = sorted({x for x, _ in pairs})
    tn, tp = len(pairs), sum(y for _, y in pairs)
    best = None
    for v in xs[:-1]:
        nl = sum(1 for x, _ in pairs if x <= v)
        pl = sum(y for x, y in pairs if x <= v)
        ql, nr = nl - pl, tn - nl
        pr = tp - pl
        qr = nr - pr
        score = float(pl * pl + ql * ql) / nl + float(pr * pr + qr * qr) / nr
        key = (score, -v)
        if best is None or key > best[0]:
            best = (key, v, nl, nr, pl, pr)
    return best


def test_stump_scalar_replay(spark):
    from osm_pbf_spark.operators.stats import decision_stump

    pairs = [((i * 13) % 50, 1 if (i * 13) % 50 > 30 and i % 5 != 0 else
              (1 if i % 7 == 0 else 0)) for i in range(200)]
    df = spark.createDataFrame(pairs, "x long, y long")
    r = decision_stump(df, "x", "y").collect()[0]
    (score_key, v, nl, nr, pl, pr) = _scalar_stump(pairs)
    assert r.threshold == v and r.score == score_key[0]
    assert (r.n_left, r.n_right, r.pos_left, r.pos_right) == (nl, nr, pl, pr)
    assert r.pred_left == (1 if 2 * pl >= nl else 0)
    assert r.pred_right == (1 if 2 * pr >= nr else 0)


def test_stump_perfect_split(spark):
    from osm_pbf_spark.operators.stats import decision_stump

    rows = [(i, 0) for i in range(50)] + [(100 + i, 1) for i in range(50)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = decision_stump(df, "x", "y").collect()[0]
    assert r.threshold == 49  # the smallest threshold achieving purity
    assert r.wgini == 0.0
    assert (r.pred_left, r.pred_right) == (0, 1)


# ------------------------------------------------------------ psi_drift


def test_psi_scalar_replay(spark):
    from osm_pbf_spark.operators.stats import psi_drift

    rows = [(i % 100, "a") for i in range(300)] + [
        ((i * 3) % 140, "b") for i in range(250)
    ]
    df = spark.createDataFrame(rows, "v long, side string")
    r = psi_drift(df, "v", "side", lo=0, hi=100, n_bins=10).collect()[0]
    ca = [0] * 10
    cb = [0] * 10
    for v, s in rows:
        b = min(max((v * 10) // 100, 0), 9)
        (ca if s == "a" else cb)[b] += 1
    na, nb = sum(ca), sum(cb)
    psi_micro = 0
    for i in range(10):
        a1, b1 = ca[i] + 1, cb[i] + 1
        n1, n2 = na + 10, nb + 10
        d = float(a1 * n2 - b1 * n1) / float(n1 * n2)
        ln = math.log(float(a1 * n2) / float(b1 * n1))
        psi_micro += int(math.floor(d * ln * 1e6 + 0.5))
    assert (r.n_a, r.n_b, r.n_bins) == (na, nb, 10)
    assert r.psi_micro == psi_micro
    assert r.psi == float(psi_micro) / 1e6
    assert r.psi > 0.01  # the b side is genuinely drifted


def test_psi_identical_distributions(spark):
    from osm_pbf_spark.operators.stats import psi_drift

    rows = [(i % 50, s) for i in range(200) for s in ("a", "b")]
    df = spark.createDataFrame(rows, "v long, side string")
    r = psi_drift(df, "v", "side", lo=0, hi=50, n_bins=5).collect()[0]
    assert r.psi_micro == 0  # identical sides -> exactly zero
