"""Round-5 breadth batch B: deterministic shuffle/sharding,
snapshot-incremental dedup, and linear quality-classifier inference.

Each operator also has a DuckDB oracle entry (the gate pins full
per-row membership); these tests pin the *semantics* on crafted rows
where the synthetic corpus is vacuous (no exact text dups at sf0.01).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from soil_data_development_tools___arcmap_spark import queries as Q

from conftest import SF_SMOKE


def _write_docs(spark, tmp_path, rows):
    p = os.path.join(str(tmp_path), "documents.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(p)
    return str(tmp_path)


def test_shuffle_shards_offsets_consistent(spark):
    out = Q.docs_shuffle_shards(spark, SF_SMOKE).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) <= set(range(8))
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.pos)
        # positions are dense 0..n-1 and offsets are the running token sum
        cum = 0
        for i, r in enumerate(rows):
            assert r.pos == i
            assert r.tok_offset == cum
            cum += r.n_tok


def test_shuffle_shards_stable_under_growth(spark):
    """Adding documents must not perturb existing (shard, relative
    order) assignments — the property that makes the seeded-hash order
    resumable across corpus versions."""
    full = Q.docs_shuffle_shards(spark, SF_SMOKE)
    # simulate the smaller, earlier corpus: docs with even doc_id
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    sub_ids = {r.doc_id for r in docs.where("doc_id % 2 = 0").select("doc_id").collect()}
    full_rows = [r for r in full.collect() if r.doc_id in sub_ids]
    order_full = {}
    for r in full_rows:
        order_full.setdefault(r.shard, []).append((r.pos, r.doc_id))
    # relative order within each shard for the subset, from the full run
    rel_full = {s: [d for _, d in sorted(v)] for s, v in order_full.items()}
    # same docs hashed alone must give the same shard + relative order
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("shuffle1:"), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    alone = (
        docs.where("doc_id % 2 = 0")
        .select("doc_id", (h % 8).alias("shard"), h.alias("h"))
        .collect()
    )
    rel_alone: dict[int, list] = {}
    for r in sorted(alone, key=lambda r: (r.shard, r.h, r.doc_id)):
        rel_alone.setdefault(r.shard, []).append(r.doc_id)
    assert rel_alone == rel_full


def test_incremental_dedup_planted(spark, tmp_path):
    rows = [
        # old snapshot (doc_id % 3 != 0)
        (1, "alpha beta", "en", "a", 10),
        (2, "gamma delta", "en", "a", 11),
        # new batch (doc_id % 3 == 0)
        (3, "alpha beta", "en", "a", 10),   # dup of old doc 1
        (6, "epsilon zeta", "en", "a", 12), # fresh -> kept
        (9, "epsilon zeta", "en", "a", 12), # dup within new batch
        (12, "eta theta", "en", "a", 9),    # fresh -> kept
    ]
    out = Q.docs_incremental_dedup(spark, _write_docs(spark, tmp_path, rows))
    got = {r.doc_id: r.status for r in out.collect()}
    assert got == {
        3: "dup_of_old",
        6: "kept",
        9: "dup_in_new",
        12: "kept",
    }


def test_incremental_dedup_old_precedence(spark, tmp_path):
    """A new doc that duplicates BOTH the old corpus and an earlier
    new doc reports dup_of_old (the index hit wins)."""
    rows = [
        (1, "same text", "en", "a", 9),
        (3, "same text", "en", "a", 9),
        (6, "same text", "en", "a", 9),
    ]
    out = Q.docs_incremental_dedup(spark, _write_docs(spark, tmp_path, rows))
    got = {r.doc_id: r.status for r in out.collect()}
    assert got == {3: "dup_of_old", 6: "dup_of_old"}


def test_quality_classifier_recompute(spark):
    import hashlib

    out = Q.docs_quality_classifier(spark, SF_SMOKE)
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(5).collect()
    }
    got = {r.doc_id: r for r in out.collect()}
    for doc_id, text in docs.items():
        toks = text.split(" ")
        score = sum(
            int(hashlib.md5(f"w1:{t}".encode()).hexdigest()[:15], 16) % 2001 - 1000
            for t in toks
        )
        r = got[doc_id]
        assert r.n_tok == len(toks)
        assert r.score == score
        assert r.keep == int(score * 64 > len(toks) * -640)


def test_quality_classifier_no_shuffle(spark):
    """Map-only contract: no Exchange in the classifier's plan."""
    plan = Q.docs_quality_classifier(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _write_events(spark, tmp_path, rows):
    p = os.path.join(str(tmp_path), "events.parquet")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(p)
    return str(tmp_path)


def test_transition_matrix_crafted(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1: a -> b -> a  (pairs: a->b, b->a)
        (1, t0, 1, "a", 0.0, ""),
        (2, t0 + s, 1, "b", 0.0, ""),
        (3, t0 + 2 * s, 1, "a", 0.0, ""),
        # user 2: a -> b       (pair: a->b)
        (4, t0, 2, "a", 0.0, ""),
        (5, t0 + s, 2, "b", 0.0, ""),
        # user 3: single event, no pair
        (6, t0, 3, "c", 0.0, ""),
    ]
    out = Q.events_transition_matrix(spark, _write_events(spark, tmp_path, rows))
    got = {(r.prev_type, r.event_type): (r.n, r.ppm) for r in out.collect()}
    assert got == {
        ("a", "b"): (2, 666666),
        ("b", "a"): (1, 333333),
    }


def test_transition_matrix_ts_tiebreak(spark, tmp_path):
    """Identical timestamps fall back to event_id order — the pair
    set must be deterministic, not partition-order-dependent."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (10, t0, 1, "x", 0.0, ""),
        (11, t0, 1, "y", 0.0, ""),
        (12, t0, 1, "z", 0.0, ""),
    ]
    out = Q.events_transition_matrix(spark, _write_events(spark, tmp_path, rows))
    got = {(r.prev_type, r.event_type) for r in out.collect()}
    assert got == {("x", "y"), ("y", "z")}


def test_skew_audit_flags_hot_key(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # user 99 has 90 events; users 1..10 have 1 each => mean ~ 9.09,
    # 90 * 11 keys = 990 > 8 * 100 rows = 800 -> flagged
    rows = [(i, t0, 99, "a", 0.0, "") for i in range(90)]
    rows += [(100 + u, t0, u, "a", 0.0, "") for u in range(1, 11)]
    out = Q.events_skew_audit(spark, _write_events(spark, tmp_path, rows)).collect()
    assert out[0].user_id == 99 and out[0].n == 90 and out[0].skew_flag == 1
    assert all(r.skew_flag == 0 for r in out[1:])
    assert len(out) == 10  # top-10 of the 11 keys


def test_skew_audit_plan_is_topk(spark):
    from conftest import SF_T2

    plan = (
        Q.events_skew_audit(spark, SF_T2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_bucketed_join_no_fact_exchange(spark):
    """The bucketed layout must remove BOTH fact-side shuffles AND
    fact-side sorts: the only Exchange left is the final groupBy's."""
    df = Q.bucketed_rating_join(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange") == 1, plan
    # values identical to the plain parquet join
    import pyspark.sql.functions as SF

    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    exp = {
        r.o_orderpriority: (r.n_lines, r.total_c)
        for r in o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            SF.count(SF.lit(1)).alias("n_lines"),
            SF.sum(SF.round(SF.col("l_extendedprice") * 100).cast("long")).alias("total_c"),
        )
        .collect()
    }
    got = {r.o_orderpriority: (r.n_lines, r.total_c) for r in df.collect()}
    assert got == exp


def test_sample_per_source_exact_bottom_k(spark):
    """The threshold prefilter must return EXACTLY the true bottom-k
    per source — compare against the unfiltered window."""
    import hashlib

    out = Q.docs_sample_per_source(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "source"
    ).collect()
    by_src: dict[str, list] = {}
    for r in docs:
        h = int(hashlib.md5(f"sample1:{r.doc_id}".encode()).hexdigest()[:15], 16) % 1000000
        by_src.setdefault(r.source, []).append((h, r.doc_id))
    exp = set()
    for src, rows in by_src.items():
        for rk, (_, d) in enumerate(sorted(rows)[:20], 1):
            exp.add((d, src, rk))
    assert {(r.doc_id, r.source, r.rk) for r in out} == exp


def test_sample_per_source_widens_on_undershoot(spark, tmp_path):
    """A source whose provisional threshold keeps < k rows must fall
    back to full keep (exactness guarantee) — force it with a tiny
    threshold scenario: many docs whose hashes all land high."""
    import hashlib

    # pick 100 doc_ids with hash >= 4*20*1e6/100 = 800000 bucket-space
    # fraction; provisional thresh for n=100 (>4k=80) keeps h < 800000,
    # so choosing ids hashing >= 800000 gives 0 survivors -> widen.
    ids, i = [], 0
    while len(ids) < 100:
        h = int(hashlib.md5(f"sample1:{i}".encode()).hexdigest()[:15], 16) % 1000000
        if h >= 800000:
            ids.append(i)
        i += 1
    rows = [(d, f"text {d}", "en", "hot", 8) for d in ids]
    out = Q.docs_sample_per_source(spark, _write_docs(spark, tmp_path, rows)).collect()
    assert len(out) == 20
    exp = sorted(
        (int(hashlib.md5(f"sample1:{d}".encode()).hexdigest()[:15], 16) % 1000000, d)
        for d in ids
    )[:20]
    assert {r.doc_id for r in out} == {d for _, d in exp}


def test_aqe_splits_skewed_join(spark):
    """Design-for-scale evidence: with AQE skew handling on, a hot
    join key is split across tasks at runtime (skew=true in the final
    plan) instead of becoming one straggler. This is the runtime
    safety net behind every fact-fact SMJ in the repo; the explicit
    salting/bucket-cap guards in dedup cover the cases AQE can't see
    (aggregations, exploded candidate pairs)."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(400000).selectExpr(
            "CASE WHEN id % 4 = 0 THEN 0 ELSE id END AS k", "id AS v"
        )
        right = spark.range(1000).selectExpr("id AS k", "id AS w")
        j = left.join(right, "k")
        # 100000 rows collapse onto hot key 0; 750 spread rows match
        # right keys 1..999 (those not divisible by 4). collect() so
        # THIS DataFrame's adaptive plan is finalized (count() would
        # plan a separate query).
        assert len(j.collect()) == 100750
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_matryoshka_recall_bounds(spark):
    out = Q.emb_matryoshka_recall(spark, SF_SMOKE).collect()
    assert len(out) == 8  # one row per query vector
    for r in out:
        assert r.k == 5 and 0 <= r.hits <= 5
    # on ISOTROPIC synthetic embeddings a quarter of the dims carries
    # a quarter of the signal, so truncation must lose neighbors —
    # the measurement discriminates (real Matryoshka-trained vectors
    # would sit near 40/40; these sit low)
    assert 0 < sum(r.hits for r in out) < 5 * len(out)
