"""Independent-reference tests for the similarity/ANN family:
pure-Python implementations of exact cosine top-k, Lloyd's k-means
(the IVF training loop), and product-quantization encode/reconstruct/
score — built only from the published definitions and the repo's
documented integer conventions (floor(x·1e6) quantization, cosine in
micro-units, argbest tie-breaks by lowest id). No Spark, no shared
code with functions/similarity.py. Guards the shared-formulation
blind spot: the DuckDB oracle proves Spark and DuckDB agree, these
prove the agreed semantics are the INTENDED ones.

Embedding values are dyadic rationals (k/256) so the float32 column
round-trips exactly and the double arithmetic is reproducible."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F  # noqa: F401 (parity with suite style)

from soil_data_development_tools___arcmap_spark.functions.similarity import (
    brute_force_topk,
    pq_topk,
    train_ivf_centroids,
)

DIM = 16


def _vecs(seed: int, n: int = 40):
    rng = random.Random(seed)
    return {
        i: [rng.randrange(-512, 512) / 256 for _ in range(DIM)]
        for i in range(n)
    }


def _q(v):
    return [math.floor(x * 1_000_000) for x in v]


def _cos_e6(a, b):
    n2a = sum(x * x for x in a)
    n2b = sum(x * x for x in b)
    if n2a == 0 or n2b == 0:
        return -2_000_000
    dot = sum(x * y for x, y in zip(a, b))
    return math.floor((dot / (math.sqrt(n2a) * math.sqrt(n2b))) * 1_000_000)


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )


def _ref_topk(vecs, qids_below=8, topk=5):
    out = set()
    for qid in range(qids_below):
        qv = _q(vecs[qid])
        scored = sorted(
            ((-_cos_e6(qv, _q(vecs[c])), c) for c in vecs if c >= qids_below),
        )
        for rn, (neg, cid) in enumerate(scored[:topk], 1):
            out.add((qid, cid, -neg, rn))
    return out


@pytest.mark.parametrize("seed", [5, 21])
def test_brute_force_topk_matches_reference(spark, seed):
    vecs = _vecs(seed)
    got = {
        (r["qid"], r["cid"], r["cos_e6"], r["rn"])
        for r in brute_force_topk(_df(spark, vecs)).collect()
    }
    assert got == _ref_topk(vecs)


def _ref_kmeans(vecs, k=4, iters=3):
    """Lloyd's with the documented conventions: first-k-by-id init,
    cosine argmax assignment (ties -> lowest centroid id), update =
    floor(per-dim mean), empty cluster keeps its centroid."""
    ids = sorted(vecs)
    cents = [(i, _q(vecs[ids[i]])) for i in range(k)]
    for _ in range(iters):
        groups = {}
        for d in ids:
            v = _q(vecs[d])
            best = max(
                ((_cos_e6(v, kv), -kid) for kid, kv in cents),
            )
            kid = -best[1]
            groups.setdefault(kid, []).append(v)
        new = []
        for kid, kv in cents:
            members = groups.get(kid)
            if not members:
                new.append((kid, kv))
                continue
            n = len(members)
            new.append(
                (
                    kid,
                    [
                        math.floor(sum(m[p] for m in members) / n)
                        for p in range(DIM)
                    ],
                )
            )
        cents = new
    return cents


@pytest.mark.parametrize("seed", [5, 21])
def test_train_ivf_centroids_matches_reference(spark, seed):
    vecs = _vecs(seed)
    got = train_ivf_centroids(_df(spark, vecs), n_centroids=4, iters=3)
    want = _ref_kmeans(vecs, k=4, iters=3)
    assert [(kid, list(kv)) for kid, kv in got] == want


def _ref_pq(vecs, qids_below=8, topk=5, m=4, n_codes=8):
    sub = DIM // m
    cand = {c: _q(v) for c, v in vecs.items() if c >= qids_below}
    # deterministic codebook: subspace slices of the first n_codes
    # candidates by id, kid = id - qids_below
    cb = {
        j: [
            (c - qids_below, _q(vecs[c])[j * sub : (j + 1) * sub])
            for c in sorted(cand)[:n_codes]
        ]
        for j in range(m)
    }
    recon = {}
    for c, v in cand.items():
        rv = []
        for j in range(m):
            sv = v[j * sub : (j + 1) * sub]
            best = min(
                (sum((x - y) ** 2 for x, y in zip(sv, kv)), kid, kv)
                for kid, kv in cb[j]
            )
            rv += best[2]
        recon[c] = rv
    out = set()
    for qid in range(qids_below):
        qv = _q(vecs[qid])
        scored = sorted((-_cos_e6(qv, rv), c) for c, rv in recon.items())
        for rn, (neg, cid) in enumerate(scored[:topk], 1):
            out.add((qid, cid, -neg, rn))
    return out


@pytest.mark.parametrize("seed", [5, 21])
def test_pq_topk_matches_reference(spark, seed):
    vecs = _vecs(seed)
    got = {
        (r["qid"], r["cid"], r["cos_e6"], r["rn"])
        for r in pq_topk(_df(spark, vecs), dim=DIM, m=4, n_codes=8).collect()
    }
    assert got == _ref_pq(vecs)


def _ref_sq8_topk(vecs, qids_below=8, topk=5):
    """Independent SQ8 reference: per-dim [min,max] over candidates in
    e6 ints, code = (x-mn)*255 // rng, decoded = mn + code*rng // 255,
    asymmetric cosine vs the full-precision query."""
    cands = {i: _q(v) for i, v in vecs.items() if i >= qids_below}
    dims = range(len(next(iter(cands.values()))))
    mn = [min(v[d] for v in cands.values()) for d in dims]
    rng = [max(v[d] for v in cands.values()) - mn[d] for d in dims]

    def decode(v):
        out = []
        for d in dims:
            if rng[d] == 0:
                out.append(mn[d])
            else:
                code = (v[d] - mn[d]) * 255 // rng[d]
                out.append(mn[d] + code * rng[d] // 255)
        return out

    dec = {i: decode(v) for i, v in cands.items()}
    out = set()
    for qid in range(qids_below):
        qv = _q(vecs[qid])
        scored = sorted((-_cos_e6(qv, dv), c) for c, dv in dec.items())
        for rn, (neg, cid) in enumerate(scored[:topk], 1):
            out.add((qid, cid, -neg, rn))
    return out


@pytest.mark.parametrize("seed", [7, 33])
def test_sq8_topk_matches_reference(spark, seed):
    from soil_data_development_tools___arcmap_spark.functions.similarity import (
        sq8_topk,
    )

    vecs = _vecs(seed)
    got = {
        (r["qid"], r["cid"], r["cos_e6"], r["rn"])
        for r in sq8_topk(_df(spark, vecs)).collect()
    }
    assert got == _ref_sq8_topk(vecs)
    # 8-bit codes on these ranges keep ranking nearly exact: the
    # reference decode must never move a cosine by more than the
    # quantization step allows — spot-check top-1 agreement with the
    # exact reference for most queries
    exact = {(q, c) for q, c, _, rn in _ref_topk(vecs) if rn == 1}
    approx = {(q, c) for q, c, _, rn in _ref_sq8_topk(vecs) if rn == 1}
    assert len(exact & approx) >= 6
