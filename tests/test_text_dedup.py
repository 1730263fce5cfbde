"""Tests for the LLM-pipeline text/dedup/similarity operators on
hand-built fixtures with known answers."""

from __future__ import annotations

from conftest import rows_to_dict

from soil_data_development_tools___arcmap_spark.functions.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash16,
)
from soil_data_development_tools___arcmap_spark.functions.similarity import (
    brute_force_topk,
    rp_lsh_topk,
)
from soil_data_development_tools___arcmap_spark.functions.text import (
    langid_scores,
    quality_features,
    token_count,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over the lazy cat today"),  # near-dup of 1
    (3, "completely different words appear here without any overlap present"),
    (4, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 1
    (5, "short text"),  # < 3 tokens -> empty shingle set
]


def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_token_count(spark):
    out = rows_to_dict(token_count(docs(spark)), "doc_id", "n_tokens")
    assert out[1] == 10 and out[5] == 2


def test_quality_features(spark):
    row = quality_features(docs(spark)).where("doc_id = 1").collect()[0]
    assert row["n_tokens"] == 10
    assert row["ttr_e4"] == 9000  # 9 distinct of 10
    assert row["stop_e4"] == 2000  # 'the' twice


def test_langid_deterministic(spark):
    out = rows_to_dict(langid_scores(docs(spark)), "doc_id", "lang_pred")
    assert out[1] == "en"  # 'the','a' markers
    assert out[3] in {"de", "en", "es", "fr", "zh"}  # deterministic argmax


def test_exact_dedup(spark):
    out = exact_dedup(docs(spark))
    groups = {r["keep_id"]: r["n"] for r in out.collect()}
    assert groups[1] == 2  # docs 1 and 4 identical
    assert out.count() == 4  # 5 docs, one merged pair


def test_ngram_jaccard_finds_near_dup(spark):
    pairs = ngram_jaccard_pairs(docs(spark), threshold_e4=3000, max_freq=None)
    got = {(r["i"], r["j"]): r["jac_e4"] for r in pairs.collect()}
    assert (1, 4) in got and got[(1, 4)] == 10000  # exact dup -> jaccard 1
    assert (1, 2) in got and 3000 <= got[(1, 2)] < 10000
    assert not any(3 in p for p in got)  # doc 3 shares nothing


def test_minhash_lsh_recalls_dups(spark):
    pairs = minhash_lsh_pairs(docs(spark), threshold_e4=3000, max_freq=None)
    got = {(r["i"], r["j"]) for r in pairs.collect()}
    assert (1, 4) in got  # identical docs always share every band


def test_simhash_close_for_near_dups(spark):
    sig = rows_to_dict(simhash16(docs(spark)), "did", "simhash")
    assert sig[1] == sig[4]  # identical docs -> identical signature
    ham12 = bin(sig[1] ^ sig[2]).count("1")
    ham13 = bin(sig[1] ^ sig[3]).count("1")
    assert ham12 <= ham13  # near-dup at least as close as unrelated


def test_brute_force_topk_and_lsh(spark):
    import math
    import random

    random.seed(7)
    base = [random.uniform(-1, 1) for _ in range(64)]
    rows = []
    for vid in range(12):
        if vid == 9:  # near-copy of query vector 1
            v = [x + 0.01 for x in base]
        elif vid == 1:
            v = base
        else:
            v = [random.uniform(-1, 1) for _ in range(64)]
        rows.append((vid, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = brute_force_topk(emb, query_ids_below=2, topk=3)
    top1 = {r["qid"]: r["cid"] for r in out.where("rn = 1").collect()}
    assert top1[1] == 9  # the planted near-copy wins
    # LSH path: planted near-copy lands in the same bucket as its query
    lsh = rp_lsh_topk(emb, query_ids_below=2, topk=3)
    got = {(r["qid"], r["cid"]) for r in lsh.collect()}
    assert (1, 9) in got


def test_minhash_xxhash64_mode(spark, docs=None):
    from soil_data_development_tools___arcmap_spark.functions.dedup import (
        minhash_signatures,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "x y z w v u")],
        "doc_id long, text string",
    )
    sig = minhash_signatures(df, hasher="xxhash64")
    assert [f for f in sig.columns if f.startswith("mh")] == [
        f"mh{i}" for i in range(16)
    ]
    rows = {r["did"]: tuple(r[f"mh{i}"] for i in range(16)) for r in sig.collect()}
    # identical docs -> identical signatures; different doc differs
    assert rows[1] == rows[2] and rows[1] != rows[3]
    # values are 32-bit longs, not hex strings
    assert all(isinstance(v, int) and 0 <= v <= 0xFFFFFFFF for v in rows[1])
    # deterministic across runs
    again = {
        r["did"]: tuple(r[f"mh{i}"] for i in range(16))
        for r in minhash_signatures(df, hasher="xxhash64").collect()
    }
    assert rows == again


def test_minhash_lsh_hasher_equivalence(spark):
    """The production xxhash64 hasher and the oracle md5 hasher must
    recover the IDENTICAL verified pair set on a planted-duplicate
    corpus — the guard that keeps the faster mode from silently
    drifting (signatures differ between modes, but verification is
    exact Jaccard, so any recalled candidate agrees on jac_e4)."""
    rows = []
    for g in range(8):  # 8 groups x (original + near-dup + exact dup)
        words = [f"w{g}_{t}" for t in range(12)]
        rows.append((g * 10 + 1, " ".join(words)))
        rows.append((g * 10 + 2, " ".join(words[:-1] + [f"alt{g}"])))
        rows.append((g * 10 + 3, " ".join(words)))
    for u in range(200, 220):  # unrelated background docs
        rows.append((u, " ".join(f"u{u}_{t}" for t in range(12))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(threshold_e4=5000, max_freq=None)
    md5_pairs = {
        (r["i"], r["j"], r["jac_e4"])
        for r in minhash_lsh_pairs(df, hasher="md5", **kw).collect()
    }
    xx_pairs = {
        (r["i"], r["j"], r["jac_e4"])
        for r in minhash_lsh_pairs(df, hasher="xxhash64", **kw).collect()
    }
    assert md5_pairs == xx_pairs
    # every planted trio shows up: exact dup always (identical bands
    # in both modes); the near-dup at jac ~0.8 with 8 trios is pinned
    # by this fixture (deterministic hashes -> stable forever)
    for g in range(8):
        assert (g * 10 + 1, g * 10 + 3, 10000) in md5_pairs
    n_near = sum(1 for (i, j, _) in md5_pairs if j - i == 1)
    assert n_near >= 6  # near-dups recalled in BOTH modes


def test_banded_buckets_split_bounds_oversized(spark):
    """The 100 TB skew guard: a flood of identical docs must be split
    into <= bucket_cap sub-buckets (bounded pair expansion), with the
    pre-split size surfaced, and recall inside normal buckets kept."""
    import pyspark.sql.functions as F

    from soil_data_development_tools___arcmap_spark.functions.dedup import (
        banded_buckets,
        minhash_band_stats,
    )

    flood = [
        (i, "same boilerplate flood text body repeated") for i in range(100, 140)
    ]
    df = spark.createDataFrame(flood + DOCS[:4], "doc_id long, text string")

    stats = minhash_band_stats(df, bucket_cap=8).collect()
    assert stats, "flood bucket must appear in the audit view"
    for r in stats:
        assert r["max_raw_bucket"] == 40  # pre-split size surfaced
        assert r["n_split_sub_buckets"] >= 5  # 40/8 -> >=5 sub-buckets

    # direct check on bucket sizes after splitting
    stacked = spark.createDataFrame(
        [(i, 0, "hot") for i in range(40)] + [(100, 0, "cold"), (101, 0, "cold")],
        "did long, band_id int, key string",
    )
    b = banded_buckets(stacked, bucket_cap=8).collect()
    hot = [r for r in b if r["key"] == "hot"]
    assert len(hot) == 5 and all(len(r["ids"]) <= 8 for r in hot)
    assert sum(len(r["ids"]) for r in hot) == 40  # nothing lost
    cold = [r for r in b if r["key"] == "cold"]
    assert len(cold) == 1 and cold[0]["ids"] == [100, 101]

    # exact dups still found through the capped path (flood shingles
    # excluded via max_freq like the exact algorithm)
    pairs = minhash_lsh_pairs(df, bucket_cap=8, max_freq=None)
    got = {(r["i"], r["j"]) for r in pairs.where(F.col("jac_e4") == 10000).collect()}
    assert (1, 4) in got


def test_cosine_dup_pairs_multiband(spark):
    """Identical vectors agree in every band -> always recalled; the
    capped multi-band path returns exact cosine for them."""
    from soil_data_development_tools___arcmap_spark.functions.similarity import (
        cosine_dup_pairs,
    )

    base = [0.5] * 32 + [-0.25] * 32
    other = [1.0, -1.0] * 32
    rows = [(1, base), (2, base), (3, other)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {(r["i"], r["j"]): r["cos_e6"] for r in
           cosine_dup_pairs(emb, threshold_e6=900000).collect()}
    # floor((dot/(sqrt*sqrt))*1e6) can land one ulp under 1e6
    assert (1, 2) in out and out[(1, 2)] >= 999999
    assert (1, 3) not in out and (2, 3) not in out


def test_ivf_trained_centroids(spark):
    """Lloyd's k-means training: centroids converge onto the two
    obvious clusters and ivf_topk(train=True) still returns exact
    top-k for in-cluster queries."""
    from soil_data_development_tools___arcmap_spark.functions.similarity import (
        ivf_topk,
        train_ivf_centroids,
    )

    a = [1.0] * 32 + [0.0] * 32
    b = [0.0] * 32 + [1.0] * 32
    rows = []
    for i in range(8):  # queries: 4 near a, 4 near b
        rows.append((i, a if i % 2 == 0 else b))
    for i in range(8, 28):  # candidates: two tight clusters
        base = a if i % 2 == 0 else b
        rows.append((i, [x + 0.001 * (i % 5) for x in base]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents = train_ivf_centroids(
        emb.where("vec_id >= 8"), n_centroids=2, iters=3
    )
    assert len(cents) == 2
    # the two trained centroids separate the clusters: one has mass in
    # the first half, the other in the second half
    halves = sorted(
        (sum(kv[:32]) > sum(kv[32:])) for _, kv in cents
    )
    assert halves == [False, True]

    out = ivf_topk(emb, query_ids_below=8, topk=3, n_centroids=2,
                   nprobe=1, train=True)
    rows_out = out.collect()
    assert {r["qid"] for r in rows_out} == set(range(8))
    for r in rows_out:
        # with nprobe=1 and trained centroids every hit shares the
        # query's cluster parity
        assert r["cid"] % 2 == r["qid"] % 2


def test_ivf_farthest_first_seeding(spark):
    """Farthest-first seeding must SPREAD: on three well-separated
    clusters with the first-N ids all inside cluster 0, first-N
    seeding never leaves cluster 0, while the farthest-first traversal
    reaches every cluster within the first 3 picks (seed 0 = min id in
    cluster 0, each next seed the worst-covered point). Also pins
    determinism: two runs return the identical centroid list."""
    from soil_data_development_tools___arcmap_spark.functions.similarity import (
        train_ivf_centroids,
    )

    dims = 12
    centers = {0: [0] * dims, 1: [0] * dims, 2: [0] * dims}
    for c in centers:
        centers[c][4 * c] = 1.0
        centers[c][4 * c + 1] = 0.5
    rows = []
    for i in range(8, 14):  # first 6 candidate ids: ALL cluster 0
        rows.append((i, [x + 0.001 * (i % 3) for x in centers[0]]))
    for i in range(14, 32):  # the rest spread clusters 1 and 2
        c = 1 + i % 2
        rows.append((i, [x + 0.001 * (i % 3) for x in centers[c]]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def cluster_of(kv):
        return max(range(3), key=lambda c: kv[4 * c])

    first = train_ivf_centroids(emb, n_centroids=3, iters=0, init="first")
    ff = train_ivf_centroids(emb, n_centroids=3, iters=0, init="farthest")
    assert {cluster_of(kv) for _, kv in first} == {0}
    assert {cluster_of(kv) for _, kv in ff} == {0, 1, 2}
    ff2 = train_ivf_centroids(emb, n_centroids=3, iters=0, init="farthest")
    assert ff == ff2


def test_connected_components_chain_and_singleton(spark):
    """Min-label propagation reaches the fixpoint on a CHAIN (needs
    multiple rounds, not just one hop) and leaves singletons as their
    own representative."""
    from soil_data_development_tools___arcmap_spark.functions.dedup import (
        connected_components,
        dup_groups,
    )

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "did long")
    # chain 1-2-3-4-5 (diameter 4 -> needs several rounds) + pair 6-7
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (6, 7)], "i long, j long"
    )
    out = {r["did"]: r["group_rep"] for r in
           connected_components(nodes, pairs).collect()}
    assert all(out[i] == 1 for i in range(1, 6))  # whole chain -> 1
    assert out[6] == 6 and out[7] == 6  # pair component

    groups = dup_groups(docs(spark), max_freq=None)
    got = {r["doc_id"]: (r["group_rep"], r["is_rep"]) for r in groups.collect()}
    # docs 1, 2, 4 are one near-dup component with rep 1
    assert got[1] == (1, 1) and got[2] == (1, 0) and got[4] == (1, 0)
    assert got[3] == (3, 1) and got[5] == (5, 1)  # singletons keep selves


def test_chunk_documents_windows(spark):
    """32/24 chunking: overlap of 8 tokens between consecutive
    chunks, short tails kept, single-chunk docs intact."""
    from soil_data_development_tools___arcmap_spark.functions.text import (
        chunk_documents,
    )

    text_a = " ".join(f"t{i}" for i in range(50))  # 50 tokens -> 3 chunks
    rows = [(1, text_a), (2, "just a few tokens")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df).collect()
    a = sorted(
        [(r["chunk_idx"], r["n_tok"]) for r in out if r["doc_id"] == 1]
    )
    # starts 0, 24, 48 -> sizes 32, 26, 2
    assert a == [(0, 32), (1, 26), (2, 2)]
    b = [(r["chunk_idx"], r["n_tok"]) for r in out if r["doc_id"] == 2]
    assert b == [(0, 4)]
    # fingerprints are distinct across chunks of the same doc
    fps = {r["chunk_fp"] for r in out if r["doc_id"] == 1}
    assert len(fps) == 3


def test_gopher_rules_discriminate(spark):
    from soil_data_development_tools___arcmap_spark.functions.text import (
        gopher_rules,
    )

    data = [
        # 25 tokens, mwl in window, has 'the'+'a', distinct enough -> keep
        (1, "the quick brown foxy " * 5 + "runs a mile home today"),
        (2, "tiny doc"),  # fails word count
        (3, "the a " + "word " * 30),  # low ttr + short words
    ]
    df = spark.createDataFrame(
        [(i, t.strip()) for i, t in data], "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
    assert out[1]["keep"] == 1
    assert out[2]["r_wordcount"] == 0 and out[2]["keep"] == 0
    assert out[3]["r_ttr"] == 0 and out[3]["keep"] == 0


def test_repetition_stats_top_gram(spark):
    from soil_data_development_tools___arcmap_spark.functions.text import (
        repetition_stats,
    )

    df = spark.createDataFrame(
        [(1, "ab cd ab cd ab"), (2, "one two three four")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    # doc 1 2-grams: "ab cd" x2, "cd ab" x2 -> top 2 of 4
    assert out[1]["n_grams"] == 4 and out[1]["top_gram_n"] == 2
    assert out[1]["top_frac_e4"] == 5000
    assert out[2]["top_gram_n"] == 1 and out[2]["n_distinct_grams"] == 3


def test_resolve_keep_best_prefers_score_then_id(spark):
    from soil_data_development_tools___arcmap_spark.functions.dedup import (
        resolve_keep_best,
    )

    groups = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7)], "did long, group_rep long"
    )
    scores = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (7, 5)], "did long, score long"
    )
    out = {
        r["group_rep"]: r.asDict()
        for r in resolve_keep_best(
            groups, scores, id_col="did", score_col="score"
        ).collect()
    }
    # highest score wins; tie on 99 -> lowest id (2)
    assert out[1]["keep_id"] == 2 and out[1]["best_score"] == 99
    assert out[1]["n_members"] == 3
    assert out[7]["keep_id"] == 7 and out[7]["n_members"] == 1


def test_dup_spans_flags_shared_kgram(spark):
    from soil_data_development_tools___arcmap_spark.functions.dedup import (
        dup_spans,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d e x y z w v"),   # shares "a b c d e" with doc 2
            (2, "a b c d e p q r s t"),
            (3, "m n o p q r s t u m"),   # shares "p q r s t" with doc 2
            (4, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k0"),  # fully unique
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in dup_spans(df, k=5).collect()}
    assert all(out[i]["n_spans"] == 6 for i in out)
    assert out[1]["n_dup_spans"] == 1 and out[1]["dup_frac_e4"] == 1666
    assert out[2]["n_dup_spans"] == 2
    assert out[4]["n_dup_spans"] == 0


def test_ivfpq_exact_reconstruction_ranks_first(spark):
    """IVF-PQ end-to-end on planted vectors. A coarse-centroid member
    has residual 0, which the codebook contains (its own entry), so it
    reconstructs EXACTLY — a query equal to that vector must rank it
    top-1 with cos_e6 = 1000000. An arbitrary near-copy is NOT
    guaranteed rank-1 under a stand-in residual codebook (quantization
    loss is real — that's what emb_ivfpq_recall measures), but it must
    at least survive coarse routing into the scored probe set."""
    import random

    from soil_data_development_tools___arcmap_spark.functions.similarity import (
        ivfpq_topk,
    )

    random.seed(11)
    rows = []
    vecs = {}
    for vid in range(40):
        v = [random.uniform(-1, 1) for _ in range(64)]
        vecs[vid] = v
        rows.append((vid, [float(x) for x in v]))
    rows[1] = (1, [float(x) for x in vecs[8]])  # query 1 == candidate 8
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ivfpq_topk(emb, query_ids_below=2, topk=3).collect()
    got = {(r["qid"], r["cid"]): (r["rn"], r["cos_e6"]) for r in out}
    # candidate 8 is a coarse centroid -> residual 0 -> exact recon
    assert got[(1, 8)] == (1, 1000000)
    # structure: <= topk rows per query, ranks contiguous from 1
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r["rn"])
    for rns in by_q.values():
        assert sorted(rns) == list(range(1, len(rns) + 1)) and len(rns) <= 3


def test_lm_quality_ranks_in_domain_above_gibberish(spark, monkeypatch, tmp_path):
    """docs_lm_quality: a doc made of reference-frequent transitions
    must outscore a doc of never-seen transitions (the filter's whole
    point), and the score is the exact integer mean of per-transition
    Laplace ppm values."""
    import os

    from soil_data_development_tools___arcmap_spark import queries as Q

    rows = [
        # reference slice (doc_id % 10 == 0): trains "a b", "b c" heavy
        (10, "a b c a b c a b c"),
        (20, "a b c a b c"),
        # in-domain doc: transitions the reference saw
        (1, "a b c a b"),
        # gibberish: transitions never seen
        (2, "x y z w v"),
    ]
    d = str(tmp_path / "lm")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in Q.docs_lm_quality(spark, d).collect()}
    assert out[1]["score_e6"] > out[2]["score_e6"]
    # hand-check doc 2: every transition unseen, every x unseen ->
    # p_e6 = 1e6 div vocab; vocab = |{b, c, a}| = 3
    assert out[2]["score_e6"] == 1000000 // 3
    assert out[2]["n_trans"] == 4


def test_bpe_train_known_merges(spark, tmp_path):
    """docs_bpe_train on a corpus with a planted dominant pair: round 1
    must merge ('a','b') (5 occurrences), and round 2 must merge the
    FUSED token with 'c' — proving fusion feeds later rounds — with
    exact counts."""
    import os

    from soil_data_development_tools___arcmap_spark import queries as Q

    rows = [
        (1, "a b c a b c a b"),
        (2, "a b c a b d"),
        (3, "x y x y"),
    ]
    d = str(tmp_path / "bpe")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    out = {r["rank"]: (r["x"], r["y"], r["c"])
           for r in Q.docs_bpe_train(spark, d, n_merges=3).collect()}
    SEP = "\x1f"
    assert out[1] == ("a", "b", 5)
    # all five 'a b' fuse in round 1, so round 2 counts the fused
    # token against 'c': doc1 " (ab) c (ab) c (ab) " has 2, doc2 has 1
    assert out[2] == (f"a{SEP}b", "c", 3)
    # round 3: remaining best pair is 'x y' (3: the doc-3 pair twice
    # plus... exactly the planted count) or a fused continuation —
    # pin whatever is deterministic: x/y count is 3 in doc 3? it is 2
    # occurrences + tie-break; just assert determinism across runs
    again = {r["rank"]: (r["x"], r["y"], r["c"])
             for r in Q.docs_bpe_train(spark, d, n_merges=3).collect()}
    assert again == out


def test_bpe_canonical_chain_fusion(spark, tmp_path):
    """Canonical greedy fusion on an identical-token run — the case
    the old double-string-replace got wrong: ``a a a a a`` must fuse
    left-to-right into [aa, aa, a] (positions 1+2 and 3+4), so round 2
    sees the pair (aa, a). The replace-based fusion skipped the token
    whose leading space the first match consumed, producing
    [aa, a, aa] and a round-2 winner of (a, aa) instead."""
    import os

    from soil_data_development_tools___arcmap_spark import queries as Q

    d = str(tmp_path / "bpe_chain")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(1, "a a a a a")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    SEP = "\x1f"
    out = {r["rank"]: (r["x"], r["y"], r["c"])
           for r in Q.docs_bpe_train(spark, d, n_merges=2).collect()}
    assert out[1] == ("a", "a", 4)
    # canonical corpus after round 1 is [aa, aa, a]: adjacent pairs
    # (aa,aa) and (aa,a), tied at 1, lexicographic tiebreak on y
    assert out[2] == (f"a{SEP}a", "a", 1)


def test_bpe_artifact_memoized(spark, tmp_path):
    """docs_bpe_apply must reuse the trained artifact from
    docs_bpe_train (same corpus, same n_merges) instead of re-running
    the 8-round loop — the memo is keyed on the corpus content
    fingerprint, so a REWRITTEN corpus retrains."""
    import os

    from soil_data_development_tools___arcmap_spark import queries as Q
    from soil_data_development_tools___arcmap_spark.queries import (
        _BPE_MEMO,
        _bpe_run,
    )

    d = str(tmp_path / "bpe_memo")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, "documents.parquet")
    spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(p)
    m1, f1 = _bpe_run(spark, d, 8)
    m2, f2 = _bpe_run(spark, d, 8)
    assert m1 is m2 and f1 is f2  # memo hit: identical objects
    assert Q.docs_bpe_apply(spark, d).count() == 2
    # content change -> new fingerprint -> retrain
    spark.createDataFrame(
        [(1, "x y x y")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(p)
    m3, _ = _bpe_run(spark, d, 8)
    assert m3 is not m1 and m3[0][1] == "x"
    # the superseded SAME-corpus artifact was evicted (and freed);
    # entries for other corpora are retained up to the memo capacity
    same_src = [k for k in _BPE_MEMO if k[1] == os.path.abspath(p)]
    assert len(same_src) == 1


def test_bpe_tokenize_holdout_uses_trained_rules_only(spark, tmp_path):
    """docs_bpe_tokenize trains on the EVEN half and serves the odd
    half: the held-out doc is fused only by rules the trainer learned
    (its own (c,c) adjacency, never seen in training, stays unfused)."""
    import os

    from soil_data_development_tools___arcmap_spark import queries as Q

    d = str(tmp_path / "bpe_holdout")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c c")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in Q.docs_bpe_tokenize(spark, d).collect()}
    assert list(out) == [1]  # only held-out docs
    # (a, b) was learned from doc 0 and fuses; (c, c) was never seen
    assert out[1]["n_pieces"] == 3
    assert out[1]["n_fused"] == 1
    assert out[1]["n_raw_tokens"] == 4


def test_rowwise_minhash_matches_exploded(spark):
    """The per-row (streaming-compatible) signature formulation must
    produce BIT-IDENTICAL values to the exploded batch
    minhash_signatures — the property that lets a streaming batch
    probe a batch-built LSH index."""
    import pyspark.sql.functions as F

    from soil_data_development_tools___arcmap_spark.functions.dedup import (
        minhash_signatures,
        rowwise_minhash,
        rowwise_shingles,
    )

    df = docs(spark)
    exploded = {
        r["did"]: tuple(r[f"mh{i}"] for i in range(16))
        for r in minhash_signatures(df).collect()
    }
    rw = df.select(
        F.col("doc_id").alias("did"), rowwise_shingles("text").alias("ss")
    )
    rw = rw.select("did", *rowwise_minhash(F.col("ss")))
    rowwise = {
        r["did"]: tuple(r[f"mh{i}"] for i in range(16))
        for r in rw.collect()
        if r["mh0"] is not None  # doc 5 (< 3 tokens) has no signature
    }
    assert rowwise == exploded


# ---------------------------------------------------------------------------
# BPE canonical-semantics property test: the cross-engine hash proves
# Spark and DuckDB agree, but both run the SAME double-spaced-canvas
# replace — a shared deviation would pass it (the r6 verdict's point).
# This pins the trainer against an INDEPENDENT textbook implementation:
# a plain token-list scanner with left-to-right non-overlapping fusion.
# ---------------------------------------------------------------------------

def _ref_bpe(doc_tokens, n_merges):
    """Textbook greedy BPE over word-token docs: per round, count every
    adjacent pair (overlapping counts — 'a a a' has two (a,a)), pick
    max by (count desc, x asc, y asc), fuse occurrences left-to-right
    non-overlapping, repeat. Returns (merge table, fused docs)."""
    from collections import Counter

    SEP = "\x1f"
    cur = [list(t) for t in doc_tokens]
    merges = []
    for rank in range(1, n_merges + 1):
        cnt = Counter()
        for toks in cur:
            for i in range(len(toks) - 1):
                cnt[(toks[i], toks[i + 1])] += 1
        if not cnt:
            break
        (x, y), c = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, x, y, c))
        nxt = []
        for toks in cur:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == x and toks[i + 1] == y:
                    out.append(x + SEP + y)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            nxt.append(out)
        cur = nxt
    return merges, cur


def _spark_bpe(spark, tmp_path, tag, doc_tokens, n_merges):
    """Run the production trainer on the given docs; parse the fused
    double-spaced canvas back to token lists."""
    import os

    from soil_data_development_tools___arcmap_spark.queries import _bpe_run

    d = str(tmp_path / f"bpe_prop_{tag}")
    os.makedirs(d, exist_ok=True)
    rows = [(i + 1, " ".join(t)) for i, t in enumerate(doc_tokens)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    merges, fused = _bpe_run(spark, d, n_merges)
    # NB: split(" ") not split() — \x1f (the fuse SEP) is Unicode
    # whitespace to str.split(), which would shred fused tokens
    by_id = {
        r["doc_id"]: [t for t in r["s"].split(" ") if t]
        for r in fused.collect()
    }
    return merges, [by_id[i + 1] for i in range(len(doc_tokens))]


BPE_PINNED = [
    # the r6 deviation shapes: identical-token runs, odd and even
    [["a", "a", "a", "a", "a"]],
    [["a", "a", "a", "a"]],
    # long alternating chain (double-replace mis-paired every other)
    [["a", "b", "a", "b", "a", "b", "a"]],
    # fused-token adjacency across rounds + a tie on count
    [["a", "b", "b", "a"], ["b", "a", "a", "b"]],
    # degenerate: no adjacent pair anywhere -> trainer must break
    [["a"], [], ["b"]],
]


def test_bpe_matches_textbook_reference_pinned(spark, tmp_path):
    for i, docs_toks in enumerate(BPE_PINNED):
        ref = _ref_bpe(docs_toks, 3)
        got = _spark_bpe(spark, tmp_path, f"pin{i}", docs_toks, 3)
        assert got == ref, f"pinned case {i}: {docs_toks}"


def test_bpe_matches_textbook_reference_random(spark, tmp_path):
    """Randomized corpora over a 2-token alphabet (maximizes runs and
    alternations, the shapes where greedy fusion order matters)."""
    import random

    rng = random.Random(20260814)
    for case in range(10):
        docs_toks = [
            [rng.choice("ab") for _ in range(rng.randint(0, 10))]
            for _ in range(rng.randint(1, 4))
        ]
        ref = _ref_bpe(docs_toks, 3)
        got = _spark_bpe(spark, tmp_path, f"rnd{case}", docs_toks, 3)
        assert got == ref, f"random case {case}: {docs_toks}"


def test_lm_quality_matches_independent_reference(spark, tmp_path):
    """docs_lm_quality vs a from-the-docstring pure-Python scorer (the
    DuckDB oracle shares Spark's SQL formulation; this reference
    shares only the SPEC): Laplace-smoothed bigram transition
    probability in ppm, trained on the doc_id % 10 == 0 slice, every
    doc scored by integer-division mean. Seeded random corpora over a
    tiny vocab so reference-slice membership, unseen transitions, and
    unseen x-marginals all occur."""
    import os
    import random
    from collections import Counter

    from soil_data_development_tools___arcmap_spark import queries as Q

    def ref_scores(docs):
        toks = {
            i: [t for t in s.split(" ") if t] for i, s in docs.items()
        }
        bgs = {i: list(zip(t, t[1:])) for i, t in toks.items()}
        c_xy = Counter()
        for i, bg in bgs.items():
            if i % 10 == 0:
                c_xy.update(bg)
        c_x = Counter()
        for (x, _y), c in c_xy.items():
            c_x[x] += c
        vocab = len({y for (_x, y) in c_xy})
        out = {}
        for i, bg in bgs.items():
            if not bg:
                continue  # no transitions -> no row
            ps = [
                ((c_xy.get(p, 0) + 1) * 1000000) // (c_x.get(p[0], 0) + vocab)
                for p in bg
            ]
            out[i] = (len(bg), sum(ps) // len(bg))
        return out

    rng = random.Random(20260814)
    for case in range(3):
        words = ["the", "cat", "sat", "on", "zz"]
        docs = {
            i: " ".join(
                rng.choice(words) for _ in range(rng.randint(0, 12))
            )
            for i in range(rng.randint(11, 25))  # ids 0,10,20 hit the
            # reference slice; some slice docs may still be empty
        }
        d = str(tmp_path / f"lmq{case}")
        os.makedirs(d, exist_ok=True)
        spark.createDataFrame(
            list(docs.items()), "doc_id long, text string"
        ).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        got = {
            r["doc_id"]: (r["n_trans"], r["score_e6"])
            for r in Q.docs_lm_quality(spark, d).collect()
        }
        assert got == ref_scores(docs), f"case {case}"


def test_dup_triangles_planted_triangle_and_chain(spark):
    """A planted 3-clique (identical texts) must census as one
    triangle with clustering coefficient 1000 at every corner; a
    planted A~B~C chain (B overlaps both ends, the ends share
    nothing) must stay triangle-free — the false-merge shape the
    operator exists to expose."""
    from soil_data_development_tools___arcmap_spark.functions.dedup import (
        dup_triangles,
    )

    tri_text = "alpha beta gamma delta epsilon zeta eta theta"
    p = " ".join(f"p{i}" for i in range(4))
    q = " ".join(f"q{i}" for i in range(10))
    r = " ".join(f"r{i}" for i in range(10))
    s = " ".join(f"s{i}" for i in range(4))
    rows = [
        (1, tri_text), (2, tri_text), (3, tri_text),
        (10, f"{p} {q}"),   # A = P+Q
        (11, f"{q} {r}"),   # B = Q+R  (overlaps both ends)
        (12, f"{r} {s}"),   # C = R+S
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        row["doc_id"]: (row["deg"], row["n_tri"], row["cc_permille"])
        for row in dup_triangles(df, threshold_e4=3000, max_freq=100).collect()
    }
    assert got[1] == (2, 1, 1000)
    assert got[2] == (2, 1, 1000)
    assert got[3] == (2, 1, 1000)
    assert got[10] == (1, 0, 0)
    assert got[11] == (2, 0, 0)
    assert got[12] == (1, 0, 0)
    # exactly one triangle in the whole graph
    assert sum(t for _, t, _ in got.values()) == 3


def test_dup_wedge_gaps_planted_bridge(spark):
    """Two hub docs B1,B2 are near-dups of both A and C, but A and C
    share only the common block — below threshold. The wedge audit
    must surface exactly the (A, C) bridge with cn=2 and the true
    sub-threshold Jaccard; the verified pairs themselves must not
    appear."""
    from soil_data_development_tools___arcmap_spark.functions.dedup import (
        dup_wedge_gaps,
        ngram_jaccard_pairs,
    )

    x = " ".join(f"x{i}" for i in range(20))   # shared block
    ya = " ".join(f"a{i}" for i in range(30))  # A-only
    yc = " ".join(f"c{i}" for i in range(30))  # C-only
    rows = [
        (1, f"{x} {ya}"),          # A
        (2, f"{x} hubone"),        # B1
        (3, f"{x} hubtwo extra"),  # B2
        (4, f"{x} {yc}"),          # C
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.i, r.j)
        for r in ngram_jaccard_pairs(df, threshold_e4=3000, max_freq=100)
        .select("i", "j")
        .collect()
    }
    # the planted edges exist and (A, C) is not one of them
    assert {(1, 2), (1, 3), (2, 4), (3, 4)} <= pairs
    assert (1, 4) not in pairs
    got = dup_wedge_gaps(df, threshold_e4=3000, max_freq=100).collect()
    bridges = {(r.i, r.j): r for r in got}
    assert (1, 4) in bridges
    r = bridges[(1, 4)]
    assert r.cn == 2
    # independent reference: exact shingle Jaccard of A vs C
    def sh(t):
        toks = t.split(" ")
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    a, c = sh(rows[0][1]), sh(rows[3][1])
    inter = len(a & c)
    expect = 10000 * inter // (len(a) + len(c) - inter)
    assert r.jacc_e4 == expect
    assert r.jacc_e4 < 3000
    # no verified pair leaks into the gap list
    assert not (pairs & set(bridges))


def test_dup_wedge_gaps_random_graphs_match_reference(spark):
    """Graph logic verified against a pure-Python reference on
    randomized injected pair lists (the recall-repair composition
    mode): for every random graph, the operator's (i, j, cn) rows
    must equal the reference's non-edge wedge pairs with >= 2 common
    neighbors. Texts are pairwise disjoint so verification Jaccard is
    0 for every candidate — the graph machinery is isolated from the
    shingle pipeline."""
    import itertools
    import random

    from soil_data_development_tools___arcmap_spark.functions.dedup import (
        dup_wedge_gaps,
    )

    for seed in range(4):
        rng = random.Random(seed)
        n = 14
        all_pairs = list(itertools.combinations(range(n), 2))
        edges = sorted(rng.sample(all_pairs, rng.randrange(6, 18)))
        # pure-python reference
        adj = {v: set() for v in range(n)}
        for i, j in edges:
            adj[i].add(j)
            adj[j].add(i)
        expect = {}
        for b, c in all_pairs:
            if (b, c) in edges:
                continue
            cn = len(adj[b] & adj[c])
            if cn >= 2:
                expect[(b, c)] = cn
        rows = [
            (v, " ".join(f"u{v}t{k}" for k in range(5))) for v in range(n)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pair_df = spark.createDataFrame(edges, "i long, j long")
        got = {
            (r.i, r.j): (r.cn, r.jacc_e4)
            for r in dup_wedge_gaps(docs, pairs=pair_df).collect()
        }
        assert {k: v[0] for k, v in got.items()} == expect, f"seed {seed}"
        assert all(j == 0 for _, j in got.values())


def test_dup_wedge_gaps_center_degree_cap(spark):
    """max_center_deg excludes super-hub centers from wedge
    enumeration: with the cap below every center's degree no wedge
    survives; with a generous cap the planted bridge reappears."""
    from soil_data_development_tools___arcmap_spark.functions.dedup import (
        dup_wedge_gaps,
    )

    # star: center 1 near-dups of 2,3,4 (deg 3); leaves share nothing
    x = " ".join(f"x{i}" for i in range(20))
    rows = [
        (1, f"{x} hub"),
        (2, f"{x} " + " ".join(f"a{i}" for i in range(30))),
        (3, f"{x} " + " ".join(f"b{i}" for i in range(30))),
        (4, f"{x} " + " ".join(f"c{i}" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = dup_wedge_gaps(df, min_common=1).collect()
    assert {(r.i, r.j) for r in full} == {(2, 3), (2, 4), (3, 4)}
    capped = dup_wedge_gaps(df, min_common=1, max_center_deg=2).collect()
    assert capped == []
