"""Sketch layer (functions/sketches.py): KMV bottom-k distinct
sketches and priority sampling, each checked against an INDEPENDENT
pure-Python reference implementation (hashlib md5 + integer math —
no Spark, no shared formulation beyond the published definitions),
plus the structural properties the estimators rely on
(mergeability, monotone bottom-k prefix, threshold semantics)."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from soil_data_development_tools___arcmap_spark.functions.sketches import (
    M,
    kmv_estimate,
    kmv_sketch,
    priority_sample,
)

K = 8


def _h(seed: str, v: str) -> int:
    """Independent reference hash: md5 15-hex-digit prefix mod M."""
    return int(hashlib.md5((seed + v).encode()).hexdigest()[:15], 16) % M


def _ref_bottom_k(values, seed: str, k: int) -> list[int]:
    return sorted({_h(seed, v) for v in values})[:k]


def test_kmv_sketch_matches_pure_python_reference(spark):
    rng = random.Random(81)
    rows = []
    groups = {}
    for g in ("a", "b", "c"):
        vals = [f"w{rng.randrange(10_000)}" for _ in range(rng.randrange(3, 400))]
        groups[g] = vals
        rows += [(g, v) for v in vals]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {
        (r["g"], r["rank"]): r["h"]
        for r in kmv_sketch(df, F.col("v"), ["g"], K, "s1:").collect()
    }
    want = {
        (g, i + 1): h
        for g, vals in groups.items()
        for i, h in enumerate(_ref_bottom_k(vals, "s1:", K))
    }
    assert got == want


def test_kmv_sketch_is_mergeable(spark):
    """Union-then-sketch == sketch-then-merge-then-truncate — the
    property that lets every executor ship k rows per group."""
    rng = random.Random(9)
    part1 = [f"x{rng.randrange(5000)}" for _ in range(300)]
    part2 = [f"x{rng.randrange(5000)}" for _ in range(300)]
    whole = _ref_bottom_k(part1 + part2, "s2:", K)
    merged = sorted(
        set(_ref_bottom_k(part1, "s2:", K)) | set(_ref_bottom_k(part2, "s2:", K))
    )[:K]
    assert whole == merged


def test_kmv_estimate_exact_when_unsaturated(spark):
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(5)], "g string, v string"
    )
    sk = kmv_sketch(df, F.col("v"), ["g"], K, "s3:")
    row = kmv_estimate(sk, ["g"], K).collect()[0]
    assert row["n_sketch"] == 5 and row["est_distinct"] == 5


def test_kmv_estimate_accuracy_when_saturated(spark):
    n = 5000
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(n)], "g string, v string"
    )
    sk = kmv_sketch(df, F.col("v"), ["g"], 64, "s4:")
    row = kmv_estimate(sk, ["g"], 64).collect()[0]
    # (k-1)*M // h_k with k=64: standard error ~ 1/sqrt(k-2) ≈ 13%
    assert row["n_sketch"] == 64
    assert abs(row["est_distinct"] - n) / n < 0.40
    # and the estimate equals the independent reference exactly
    hk = _ref_bottom_k([f"v{i}" for i in range(n)], "s4:", 64)[-1]
    assert row["est_distinct"] == (63 * M) // hk


def _ref_priority_sample(ids_weights, seed: str, n: int):
    """Independent reference: keys u*10^6 // w, n smallest, τ = key n+1."""
    keyed = sorted(
        ((_h(seed, str(i)) * 1_000_000) // max(w, 1), i, max(w, 1))
        for i, w in ids_weights
    )
    samp = keyed[:n]
    tau_key = keyed[n][0] if len(keyed) > n else None
    return samp, tau_key


@pytest.mark.parametrize("seed", [3, 44])
def test_priority_sample_matches_pure_python_reference(spark, seed):
    rng = random.Random(seed)
    rows = [(i, rng.randrange(1, 10_000)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    n = 50
    got = priority_sample(df, F.col("w"), n, "ps:", id_col="doc_id").collect()
    ref, tau_key = _ref_priority_sample(rows, "ps:", n)
    assert sorted(r["doc_id"] for r in got) == sorted(i for _, i, _ in ref)
    assert {r["tau_key"] for r in got} == {tau_key}
    # Horvitz–Thompson: sum of max(w, floor(10^18/τ)) over the sample
    ht = sum(max(w, (M * 1_000_000) // tau_key) for _, _, w in ref)
    got_ht = sum(
        max(r["w_"], (M * 1_000_000) // r["tau_key"]) for r in got
    )
    assert got_ht == ht
    # HT total should land near the true total (weighted sampling's
    # whole point); n=50-of-500 keeps the bound meaningful
    true_total = sum(w for _, w in rows)
    assert abs(ht - true_total) / true_total < 0.2


def test_priority_sample_small_input_null_tau(spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], "doc_id long, w long")
    got = priority_sample(df, F.col("w"), 5, "ps2:", id_col="doc_id").collect()
    assert len(got) == 2
    assert all(r["tau_key"] is None for r in got)


def test_priority_sample_heavy_weight_always_included(spark):
    rows = [(i, 1) for i in range(200)] + [(999, 10_000_000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = priority_sample(df, F.col("w"), 10, "ps3:", id_col="doc_id").collect()
    assert 999 in {r["doc_id"] for r in got}


# ---------------------------------------------------------------- CMS


def _ref_cms(tokens, depth, width, seed):
    """Independent reference count-min grid: dict (r, c) -> count."""
    grid = {}
    for t in tokens:
        for r in range(depth):
            c = _h(f"{seed}{r}:", t) % width
            grid[(r, c)] = grid.get((r, c), 0) + 1
    return grid


def test_cms_sketch_matches_pure_python_reference(spark):
    from soil_data_development_tools___arcmap_spark.functions.sketches import cms_sketch

    rng = random.Random(17)
    toks = [f"t{rng.randrange(300)}" for _ in range(2000)]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {
        (r["r"], r["c"]): r["cnt"]
        for r in cms_sketch(df, F.col("tok"), 3, 64, "cms").collect()
    }
    assert got == _ref_cms(toks, 3, 64, "cms")


def test_cms_lookup_never_undercounts(spark):
    from soil_data_development_tools___arcmap_spark.functions.sketches import (
        cms_lookup,
        cms_sketch,
    )

    rng = random.Random(23)
    toks = [f"t{rng.randrange(100)}" for _ in range(3000)]
    exact = {}
    for t in toks:
        exact[t] = exact.get(t, 0) + 1
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    # width 32 forces collisions — the guarantee must hold anyway
    sk = cms_sketch(df, F.col("tok"), 3, 32, "cms")
    cand = spark.createDataFrame([(t,) for t in exact], "tok string")
    got = {
        r["tok"]: r["cms_est"]
        for r in cms_lookup(sk, cand, F.col("tok"), ["tok"], 3, 32, "cms").collect()
    }
    assert set(got) == set(exact)
    assert all(got[t] >= exact[t] for t in exact)
    # depth-3 min beats any single row's estimate: at least one token
    # should be estimated exactly even at width 32
    assert any(got[t] == exact[t] for t in exact)


def test_cms_sketch_is_mergeable(spark):
    """Grid of the concatenation == cellwise sum of the part grids —
    the property that lets every executor ship ≤ depth×width cells."""
    from soil_data_development_tools___arcmap_spark.functions.sketches import cms_sketch

    rng = random.Random(31)
    part1 = [f"t{rng.randrange(200)}" for _ in range(800)]
    part2 = [f"t{rng.randrange(200)}" for _ in range(800)]

    def grid(tokens):
        df = spark.createDataFrame([(t,) for t in tokens], "tok string")
        return {
            (r["r"], r["c"]): r["cnt"]
            for r in cms_sketch(df, F.col("tok"), 3, 64, "m").collect()
        }

    g1, g2, gw = grid(part1), grid(part2), grid(part1 + part2)
    merged = dict(g1)
    for k, v in g2.items():
        merged[k] = merged.get(k, 0) + v
    assert gw == merged


# ------------------------------------------------- log-bucket quantiles


def _ref_bucket(v: int) -> int:
    if v == 0:
        return 0
    bl = v.bit_length()
    return (bl - 1) * 8 + ((v >> max(bl - 4, 0)) & 7)


def _ref_rep(b: int) -> int:
    if b < 24:
        return b % 8
    bl = b // 8 + 1
    lo = (8 + b % 8) << (bl - 4)
    return lo + ((1 << (bl - 4)) // 2 if bl >= 5 else 0)


def test_logbucket_matches_pure_python_reference(spark):
    from soil_data_development_tools___arcmap_spark.functions.sketches import (
        logbucket_rep_sql,
        logbucket_sql,
    )

    rng = random.Random(41)
    vals = [0, 1, 2, 7, 8, 15, 16, 255, 256, 2**40, 2**62] + [
        rng.randrange(1, 2**50) for _ in range(200)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = df.select(
        "v",
        F.expr(logbucket_sql("v")).alias("b"),
    ).withColumn("rep", F.expr(logbucket_rep_sql("b")))
    for r in got.collect():
        assert r["b"] == _ref_bucket(r["v"])
        assert r["rep"] == _ref_rep(r["b"])
        # error bound: exact below 8, relative ≤ 1/16 above
        if r["v"] <= 7:
            assert r["rep"] == r["v"]
        else:
            assert abs(r["rep"] - r["v"]) * 16 <= r["v"]


def test_logbucket_is_monotone(spark):
    from soil_data_development_tools___arcmap_spark.functions.sketches import (
        logbucket_sql,
    )

    vals = sorted({v for v in range(0, 5000)} | {2**k + d for k in range(13, 40) for d in (-1, 0, 1)})
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [r["b"] for r in df.orderBy("v").select(F.expr(logbucket_sql("v")).alias("b")).collect()]
    assert got == sorted(got)


def test_quantile_sketch_within_relative_error_bound(spark):
    """The registry query's estimate columns must sit within the
    sketch's guaranteed 1/16 relative error of the exact order
    statistics it carries alongside."""
    from soil_data_development_tools___arcmap_spark import queries as Q

    from conftest import SF_SMOKE

    rows = Q.events_quantile_sketch(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        for p in ("p50", "p95", "p99"):
            est, exact = r[f"{p}_est"], r[f"{p}_exact"]
            if exact <= 7:
                assert est == exact
            else:
                assert abs(est - exact) * 16 <= exact


def test_cms_drift_registry_query(spark, tmp_path):
    """docs_cms_drift on a crafted two-snapshot corpus: estimates must
    equal the independent python CMS lookups per half, and the exact
    deltas must match hand counts (even ids = old, odd = new)."""
    import os

    from soil_data_development_tools___arcmap_spark import queries as Q

    rows = [
        (0, "s1", "a a b"),
        (2, "s1", "a b b c"),
        (1, "s1", "a c c c"),
        (3, "s1", "c d"),
    ]
    d = str(tmp_path / "drift")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    old_toks = "a a b a b b c".split()
    new_toks = "a c c c c d".split()
    g_old = _ref_cms(old_toks, 3, 512, "cms")
    g_new = _ref_cms(new_toks, 3, 512, "cms")

    def lookup(grid, t):
        return min(grid.get((r, _h(f"cms{r}:", t) % 512), 0) for r in range(3))

    got = {r["tok"]: r for r in Q.docs_cms_drift(spark, d).collect()}
    assert set(got) == {"a", "b", "c", "d"}
    for t in got:
        assert got[t]["est_old"] == lookup(g_old, t)
        assert got[t]["est_new"] == lookup(g_new, t)
        assert got[t]["exact_old"] == old_toks.count(t)
        assert got[t]["exact_new"] == new_toks.count(t)
        assert got[t]["delta_exact"] == new_toks.count(t) - old_toks.count(t)
        assert got[t]["delta_est"] == got[t]["est_new"] - got[t]["est_old"]


def test_dsir_sample_prefers_target_like_docs(spark, tmp_path):
    """docs_dsir_sample on a planted corpus: pool docs written in the
    target domain's vocabulary must carry far higher importance
    weights than off-domain docs and dominate the selection."""
    import os
    import random

    from soil_data_development_tools___arcmap_spark import queries as Q

    rng = random.Random(97)
    # tight vocabularies + long docs concentrate per-bucket counts so
    # the like/far weight ratio is orders of magnitude, not single
    # digits — the regime the selection claim is about
    a_vocab = [f"alpha{i}" for i in range(10)]
    z_vocab = [f"zulu{i}" for i in range(10)]

    def doc(vocab):
        return " ".join(rng.choice(vocab) for _ in range(100))

    rows = []
    did = 0
    for _ in range(30):          # target domain: vocabulary A
        rows.append((did, "src0", doc(a_vocab))); did += 1
    for _ in range(40):          # pool, target-like
        rows.append((did, "srclike", doc(a_vocab))); did += 1
    for _ in range(160):         # pool, off-domain
        rows.append((did, "srcfar", doc(z_vocab))); did += 1
    d = str(tmp_path / "dsir")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    got = Q.docs_dsir_sample(spark, d).collect()
    assert len(got) == 50
    by_src = {}
    for r in got:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    # 40 of 200 pool docs are target-like; importance selection must
    # pull essentially all of them into the 50 picks
    assert by_src.get("srclike", 0) >= 35
    like_w = [r["w_e6"] for r in got if r["source"] == "srclike"]
    far_w = [r["w_e6"] for r in got if r["source"] == "srcfar"]
    assert like_w and min(like_w) > 10 * max(far_w or [0])
    assert all(r["pool_mean_w_e6"] == got[0]["pool_mean_w_e6"] for r in got)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=2**50), min_size=1, max_size=200),
        st.integers(min_value=1, max_value=999),
    )
    def test_logbucket_quantile_bound_property(vals, p_permille):
        """For ANY non-negative multiset and ANY permille quantile, the
        log-bucket estimate sits within 1/16 relative error of the
        exact ceil-threshold order statistic (exact below 8) — the
        guarantee both registry queries and the streaming twin state,
        proven against the pure-Python reference independent of either
        engine."""
        n = len(vals)
        svals = sorted(vals)
        thresh = -(-p_permille * n // 1000)  # ceil
        exact = svals[thresh - 1]
        hist = {}
        for v in vals:
            b = _ref_bucket(v)
            hist[b] = hist.get(b, 0) + 1
        cum = 0
        est = None
        for b in sorted(hist):
            cum += hist[b]
            if cum * 1000 >= p_permille * n:
                est = _ref_rep(b)
                break
        assert est is not None
        if exact <= 7:
            assert est == exact
        else:
            assert abs(est - exact) * 16 <= exact
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_priority_sample_salted_merge_identity():
    """The mergeability identity the STREAMING priority sampler
    (streaming/docs.priority_sample_stateful) relies on, checked in
    pure Python over randomized inputs: for any partition of the rows
    into salt groups and any split of each group into arrival batches,
    keeping only the running bottom-(n+1) by (skey, id) per group and
    merging the survivors yields exactly the global bottom-(n+1).
    Spark-free — guards the algorithm, not the plumbing (the 4-file
    replay test covers the plumbing)."""
    n = 7
    for seed in range(20):
        rng = random.Random(seed)
        rows = [
            ((_h("ps:", str(i)) * 1_000_000) // max(w, 1), i, w)
            for i, w in ((i, rng.randrange(0, 5_000)) for i in range(200))
        ]
        salts = rng.choice([1, 2, 8])
        groups: dict[int, list] = {}
        for r in rows:
            groups.setdefault(r[1] % salts, []).append(r)
        survivors = []
        for g in groups.values():
            rng.shuffle(g)
            kept: list = []
            # arbitrary batch split: merge one batch at a time and
            # truncate — exactly the stream-state update
            i = 0
            while i < len(g):
                step = rng.randrange(1, 6)
                kept = sorted(kept + g[i : i + step])[: n + 1]
                i += step
            survivors.extend(kept)
        assert sorted(survivors)[: n + 1] == sorted(rows)[: n + 1]


def test_emb_drift_planted_dimension_shift(spark, tmp_path):
    """emb_drift on a crafted two-snapshot embedding table: a shift
    planted in one dimension of the odd (new) half must rank that
    dimension first, with integer-exact sums/counts and delta_xn =
    sum_new*n_old - sum_old*n_new (never a division — the cross-
    multiplied form both engines agree on for negative values)."""
    import os

    from soil_data_development_tools___arcmap_spark import queries as Q

    dims = 64
    rows = []
    for vid in range(40):
        vec = [0.001 * ((vid + j) % 5) for j in range(dims)]
        if vid % 2 == 1:
            vec[17] += 0.5  # planted shift in dim 17, new half only
            vec[3] -= 0.002  # small opposing shift, must rank below
        rows.append((vid, vec, vid % 3))
    d = str(tmp_path / "embdrift")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))

    got = {r["dim"]: r for r in Q.emb_drift(spark, d).collect()}
    assert set(got) == set(range(dims))
    assert all(r["n_old"] == 20 and r["n_new"] == 20 for r in got.values())
    # independent integer reference for the planted dim
    def q(x):
        import math
        return math.floor(float(__import__("numpy").float32(x)) * 1_000_000)

    for dim in (17, 3):
        s_old = sum(q(0.001 * ((vid + dim) % 5)) for vid in range(0, 40, 2))
        s_new = sum(
            q(
                0.001 * ((vid + dim) % 5)
                + (0.5 if dim == 17 else -0.002)
            )
            for vid in range(1, 40, 2)
        )
        assert got[dim]["sum_old_e6"] == s_old
        assert got[dim]["sum_new_e6"] == s_new
        assert got[dim]["delta_xn"] == s_new * 20 - s_old * 20
    assert got[17]["drift_rank"] == 1
    ranks = sorted(got.values(), key=lambda r: r["drift_rank"])
    assert ranks[1]["dim"] == 3  # the small opposing shift is rank 2
