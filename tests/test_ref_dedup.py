"""Independent-reference tests for the text-dedup family: pure-Python
implementations of the PUBLISHED definitions (Broder shingling/MinHash,
banded LSH, Charikar SimHash) built only from hashlib + the documented
hash conventions (md5 hex substrings, 16 funcs / 4 bands, doc-frequency
caps) — no Spark, no shared code with functions/dedup.py. Guards the
shared-formulation blind spot the DuckDB cross-engine hash can't see:
if both engines encoded the same wrong semantics, these would fail.

Randomized corpora with planted near-duplicates, short (<k tokens) and
empty docs included to exercise the no-shingle branches."""

from __future__ import annotations

import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F

from soil_data_development_tools___arcmap_spark.functions.dedup import (
    minhash_lsh_pairs,
    minhash_signatures,
    simhash16,
)

K = 3
NUM_HASHES = 16
BANDS = 4


def _shingles(text: str) -> list[str]:
    toks = text.split(" ")
    if len(toks) < K:
        return []
    seen, out = set(), []
    for i in range(len(toks) - K + 1):
        s = " ".join(toks[i : i + K])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def _minhash(ss: list[str]) -> list[str] | None:
    if not ss:
        return None
    sig = []
    for i in range(NUM_HASHES):
        g, part = i // 4, i % 4
        sig.append(
            min(
                hashlib.md5(f"{g}#{s}".encode()).hexdigest()[
                    8 * part : 8 * part + 8
                ]
                for s in ss
            )
        )
    return sig


def _corpus(seed: int, n: int = 60):
    """Random docs + planted near-dups + degenerate short/empty docs."""
    rng = random.Random(seed)
    vocab = [f"w{j}" for j in range(40)]
    docs = {}
    for d in range(n):
        docs[d] = " ".join(rng.choice(vocab) for _ in range(rng.randrange(8, 30)))
    # planted near-dups: copy with one token substituted
    for d in range(n, n + 6):
        base = docs[rng.randrange(n)].split(" ")
        base[rng.randrange(len(base))] = rng.choice(vocab)
        docs[d] = " ".join(base)
    docs[n + 6] = "w0 w1"  # < k tokens -> no shingles
    docs[n + 7] = ""
    return docs


@pytest.mark.parametrize("seed", [7, 19])
def test_minhash_signatures_match_reference(spark, seed):
    docs = _corpus(seed)
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["did"]: [r[f"mh{i}"] for i in range(NUM_HASHES)]
        for r in minhash_signatures(df, k=K, num_hashes=NUM_HASHES).collect()
    }
    want = {
        d: _minhash(_shingles(t))
        for d, t in docs.items()
        if _shingles(t)  # no-shingle docs are absent from signatures
    }
    assert got == want


def _ref_lsh_pairs(docs, threshold_e4=3000, max_freq=100):
    ss = {d: _shingles(t) for d, t in docs.items()}
    sigs = {d: _minhash(s) for d, s in ss.items() if s}
    buckets = {}
    for d, sig in sigs.items():
        for b in range(BANDS):
            buckets.setdefault((b, tuple(sig[4 * b : 4 * b + 4])), []).append(d)
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                cand.add((ids[x], ids[y]))
    # doc-frequency cap: shingles in > max_freq docs excluded from
    # the intersection (sizes use the full sets)
    freq = {}
    for d, s in ss.items():
        for sh in s:
            freq[sh] = freq.get(sh, 0) + 1
    out = set()
    for i, j in cand:
        fi = {s for s in ss[i] if freq[s] <= max_freq}
        fj = {s for s in ss[j] if freq[s] <= max_freq}
        inter = len(fi & fj)
        union = len(ss[i]) + len(ss[j]) - inter
        jac_e4 = math.floor(inter / union * 10000)
        if jac_e4 >= threshold_e4:
            out.add((i, j, jac_e4))
    return out


@pytest.mark.parametrize("seed", [7, 19])
def test_minhash_lsh_pairs_match_reference(spark, seed):
    docs = _corpus(seed)
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        (r["i"], r["j"], r["jac_e4"])
        for r in minhash_lsh_pairs(df, k=K, threshold_e4=3000).collect()
    }
    want = _ref_lsh_pairs(docs)
    assert got == want
    assert len(want) >= 4  # the planted near-dups actually surface


def test_simhash_matches_reference(spark):
    docs = _corpus(33)
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items() if t], "doc_id long, text string"
    )
    got = {r["did"]: r["simhash"] for r in simhash16(df).collect()}
    want = {}
    for d, t in docs.items():
        if not t:
            continue
        sig = 0
        toks = sorted(set(t.split(" ")))
        for i in range(16):
            s = sum(
                1 if hashlib.md5(w.encode()).hexdigest()[i] in "89abcdef" else -1
                for w in toks
            )
            if s > 0:
                sig |= 1 << i
        want[d] = sig
    assert got == want
