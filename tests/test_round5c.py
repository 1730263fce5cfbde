"""Round-5 breadth batch C: SCD2 history, retention cohorts, Z-order
layout, inverted index, integer-exact PageRank, text normalization.

Each operator also has a DuckDB oracle entry (the gate pins full
per-row membership at sf0.01); these tests pin the *semantics* on
crafted rows where the synthetic tables are vacuous (e.g. the corpus
vocabulary is 31 near-stop-words, so the posting-list branch needs
crafted docs to be exercised meaningfully).
"""

from __future__ import annotations

import datetime as dt
import os

from soil_data_development_tools___arcmap_spark import queries as Q
from soil_data_development_tools___arcmap_spark.functions.layout import morton_sql

from conftest import SF_SMOKE


def _write_events(spark, tmp_path, rows):
    p = os.path.join(str(tmp_path), "events.parquet")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(p)
    return str(tmp_path)


def _write_docs(spark, tmp_path, rows):
    p = os.path.join(str(tmp_path), "documents.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(p)
    return str(tmp_path)


T0 = dt.datetime(2024, 1, 1)
S = dt.timedelta(seconds=1)
DAY = dt.timedelta(days=1)


# --- SCD Type-2 history -----------------------------------------------------


def test_scd2_collapses_repeats_and_chains_intervals(spark, tmp_path):
    rows = [
        # user 1: a, a, b, a  -> 3 versions (repeat collapsed)
        (1, T0, 1, "a", 0.0, ""),
        (2, T0 + S, 1, "a", 0.0, ""),
        (3, T0 + 2 * S, 1, "b", 0.0, ""),
        (4, T0 + 3 * S, 1, "a", 0.0, ""),
        # user 2: single state
        (5, T0, 2, "x", 0.0, ""),
    ]
    d = _write_events(spark, tmp_path, rows)
    out = {
        (r.user_id, r.version): r
        for r in Q.events_scd2_history(spark, d).collect()
    }
    assert len(out) == 4
    u1 = [out[(1, v)] for v in (1, 2, 3)]
    assert [r.state for r in u1] == ["a", "b", "a"]
    # intervals chain: valid_to of version k == valid_from of k+1
    assert u1[0].valid_to_us == u1[1].valid_from_us
    assert u1[1].valid_to_us == u1[2].valid_from_us
    # repeat at t+1s did NOT open a new version
    assert u1[0].valid_from_us == int(T0.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    assert u1[1].valid_from_us - u1[0].valid_from_us == 2_000_000
    # only the open interval is current
    assert [r.is_current for r in u1] == [0, 0, 1]
    assert u1[2].valid_to_us is None
    assert out[(2, 1)].is_current == 1


def test_scd2_ts_tie_resolved_by_event_id(spark, tmp_path):
    rows = [
        (10, T0, 1, "b", 0.0, ""),
        (9, T0, 1, "a", 0.0, ""),  # same ts, lower event_id -> first
    ]
    d = _write_events(spark, tmp_path, rows)
    out = sorted(Q.events_scd2_history(spark, d).collect(), key=lambda r: r.version)
    assert [r.state for r in out] == ["a", "b"]
    assert out[1].is_current == 1


# --- retention cohorts ------------------------------------------------------


def test_retention_cohorts_crafted(spark, tmp_path):
    rows = [
        # cohort day0: users 1,2 ; user 1 returns day1, both return day2
        (1, T0, 1, "a", 0.0, ""),
        (2, T0, 2, "a", 0.0, ""),
        (3, T0 + DAY, 1, "a", 0.0, ""),
        (4, T0 + 2 * DAY, 1, "a", 0.0, ""),
        (5, T0 + 2 * DAY, 2, "a", 0.0, ""),
        # cohort day1: user 3 only
        (6, T0 + DAY, 3, "a", 0.0, ""),
    ]
    d = _write_events(spark, tmp_path, rows)
    out = {
        (r.cohort_day, r.day_offset): r
        for r in Q.events_retention_cohorts(spark, d).collect()
    }
    d0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp()) // 86400
    assert out[(d0, 0)].retained == 2 and out[(d0, 0)].cohort_n == 2
    assert out[(d0, 1)].retained == 1
    assert out[(d0, 1)].ppm == 500000
    assert out[(d0, 2)].retained == 2 and out[(d0, 2)].ppm == 1000000
    assert out[(d0 + 1, 0)].retained == 1 and out[(d0 + 1, 0)].cohort_n == 1
    # day-0 cell of every cohort is by construction the cohort size
    for (_, off), r in out.items():
        if off == 0:
            assert r.retained == r.cohort_n


# --- Z-order layout ---------------------------------------------------------


def test_morton_interleave_known_values(spark):
    # u=0b101 (bits at even slots), d=0b011 (odd slots):
    # z = 1*1 + 1*2 + 0*4 + 1*8 + 1*16 + 0*32 = 27
    row = spark.sql(
        f"SELECT {morton_sql('5', '3', 3, ' div ')} AS z"
    ).collect()[0]
    assert row.z == 27

    def py_morton(u, d, bits):
        z = 0
        for i in range(bits):
            z |= ((u >> i) & 1) << (2 * i)
            z |= ((d >> i) & 1) << (2 * i + 1)
        return z

    for u, d in [(0, 0), (63, 63), (17, 42), (1, 62)]:
        got = spark.sql(
            f"SELECT {morton_sql(str(u), str(d), 6, ' div ')} AS z"
        ).collect()[0].z
        assert got == py_morton(u, d, 6)


def test_zorder_buckets_tighter_than_linear_in_day_dim(spark):
    out = Q.layout_zorder(spark, SF_SMOKE).collect()
    span = lambda r: r.max_d - r.min_d  # noqa: E731
    zspans = [span(r) for r in out if r.layout == "zorder"]
    lspans = [span(r) for r in out if r.layout == "linear"]
    # the Z layout bounds BOTH dims per bucket; the user-sorted layout
    # leaves the day dimension unclustered (full-range spans)
    assert max(zspans) < max(lspans)
    assert sum(zspans) / len(zspans) < sum(lspans) / len(lspans)
    # every event is in exactly one bucket per layout
    zn = sum(r.n for r in out if r.layout == "zorder")
    ln = sum(r.n for r in out if r.layout == "linear")
    assert zn == ln > 0


# --- inverted index ---------------------------------------------------------


def test_inverted_index_postings_and_stopword_cap(spark, tmp_path):
    rows = [
        (1, "apple banana apple", "en", "s", 0),
        (2, "banana cherry", "en", "s", 0),
        (3, "apple", "en", "s", 0),
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {r.term: r for r in Q.docs_inverted_index(spark, d).collect()}
    assert out["apple"].df == 2 and out["apple"].cf == 3
    assert out["apple"].postings == "1:0,2;3:0"
    assert out["banana"].postings == "1:1;2:0"
    assert out["cherry"].df == 1 and out["cherry"].postings == "2:1"


def test_inverted_index_max_df_nulls_postings_not_stats(spark, tmp_path):
    # 40 docs all containing 'the' (> MAX_DF=32) plus one rare term
    rows = [(i, "the", "en", "s", 0) for i in range(40)]
    rows.append((99, "the rare", "en", "s", 0))
    d = _write_docs(spark, tmp_path, rows)
    out = {r.term: r for r in Q.docs_inverted_index(spark, d).collect()}
    assert out["the"].df == 41 and out["the"].cf == 41
    assert out["the"].postings is None  # stop-word guard
    assert out["rare"].df == 1 and out["rare"].postings == "99:1"


# --- PageRank ---------------------------------------------------------------


def test_pagerank_sink_outranks_source(spark, tmp_path):
    # every user walks a -> b -> b is absorbing-ish: b gets all of a's
    # mass plus most of its own back; ranks must order b > a.
    rows = []
    eid = 0
    for u in range(1, 6):
        for k, t in enumerate(["a", "b", "b", "b"]):
            rows.append((eid, T0 + k * S, u, t, 0.0, ""))
            eid += 1
    d = _write_events(spark, tmp_path, rows)
    out = {r.node: r.r for r in Q.events_pagerank(spark, d).collect()}
    assert set(out) == {"a", "b"}
    assert out["b"] > out["a"]
    # teleport floor: every node keeps at least (1-d)/N mass
    assert all(r >= 150000 // len(out) for r in out.values())
    # total mass conserved up to floor-division loss (strictly <= 1e6,
    # within |nodes| + |edges| integer-floor drops of it)
    assert 1_000_000 - 20 <= sum(out.values()) <= 1_000_000


def test_pagerank_deterministic_across_runs(spark):
    a = sorted(Q.events_pagerank(spark, SF_SMOKE).collect())
    b = sorted(Q.events_pagerank(spark, SF_SMOKE).collect())
    assert a == b


# --- normalization ----------------------------------------------------------


def test_normalize_text_crafted(spark, tmp_path):
    rows = [
        (1, "  Hello \t  WORLD  ", "en", "s", 0),
        (2, "already clean", "en", "s", 0),
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {r.doc_id: r for r in Q.docs_normalize_text(spark, d).collect()}
    assert out[1].n_chars_norm == len("hello world")
    assert out[1].changed == 1
    assert out[2].changed == 0
    import hashlib

    assert out[1].norm_md5 == hashlib.md5(b"hello world").hexdigest()
    assert out[2].norm_md5 == hashlib.md5(b"already clean").hexdigest()


# --- streaming transition matrix ---------------------------------------------


def test_stream_transition_matches_batch(spark):
    batch = {
        (r.prev_type, r.event_type): (r.n, r.ppm)
        for r in Q.events_transition_matrix(spark, SF_SMOKE).collect()
    }
    stream = {
        (r.prev_type, r.event_type): (r.n, r.ppm)
        for r in Q.events_stream_transition(spark, SF_SMOKE).collect()
    }
    assert stream == batch and len(batch) > 0


# --- batch D: PIT join, collocations, deciles --------------------------------


def test_point_in_time_join_no_leakage(spark, tmp_path):
    rows = [
        (1, T0, 1, "view", 0.0, ""),
        (2, T0 + S, 1, "purchase", 0.0, ""),   # state at t+1 = view
        (3, T0 + 2 * S, 1, "click", 0.0, ""),
        (4, T0 + 3 * S, 1, "purchase", 0.0, ""),  # state = click
        # same-instant dim update wins over the fact
        (5, T0 + 4 * S, 1, "error", 0.0, ""),
        (6, T0 + 4 * S, 1, "purchase", 0.0, ""),
        # purchase before any dim state -> NULL
        (7, T0, 2, "purchase", 0.0, ""),
        (8, T0 + S, 2, "view", 0.0, ""),
    ]
    d = _write_events(spark, tmp_path, rows)
    out = {r.event_id: r.state_asof
           for r in Q.events_point_in_time_join(spark, d).collect()}
    assert out == {2: "view", 4: "click", 6: "error", 7: None}


def test_collocations_pmi_ranking(spark, tmp_path):
    # "new york" always adjacent (high PMI); "the cat"/"the dog"/"cat the"...
    # with promiscuous "the" (low PMI). 5+ occurrences to pass the cutoff.
    text_hi = " ".join(["new york"] * 5)
    text_lo = " ".join(["the cat the dog the fox the owl the hen"] * 2)
    d = _write_docs(spark, tmp_path, [
        (1, text_hi, "en", "s", 0), (2, text_lo, "en", "s", 0),
    ])
    out = Q.docs_collocations(spark, d).collect()
    scores = {(r.x, r.y): r.pmi_e6 for r in out}
    assert ("new", "york") in scores
    top = out[0]
    assert (top.x, top.y) == ("new", "york")
    # recompute the contingency table in python: every score is the
    # exact integer marginal-PMI formula
    from collections import Counter

    pairs = Counter()
    for t in [text_hi, text_lo]:
        tk = t.split()
        pairs.update(zip(tk, tk[1:]))
    n_bg = sum(pairs.values())
    xm, ym = Counter(), Counter()
    for (x, y), c in pairs.items():
        xm[x] += c
        ym[y] += c
    for r in out:
        assert r.c_xy == pairs[(r.x, r.y)]
        assert r.c_x == xm[r.x] and r.c_y == ym[r.y]
        assert r.pmi_e6 == (r.c_xy * n_bg * 1_000_000) // (r.c_x * r.c_y)


def test_length_deciles_value_based_ties(spark, tmp_path):
    # 10 docs of 3 lengths: ties share a decile; deciles are monotone
    rows = [(i, " ".join(["w"] * (3 if i < 4 else 7 if i < 8 else 9)),
             "en", "s", 0) for i in range(10)]
    d = _write_docs(spark, tmp_path, rows)
    out = {r.doc_id: (r.n_tok, r.decile)
           for r in Q.docs_length_deciles(spark, d).collect()}
    # 4 docs of len 3 -> below=0 -> decile 0; 4 of len 7 -> below=4 ->
    # decile 4; 2 of len 9 -> below=8 -> decile 8
    for i in range(10):
        exp = 0 if i < 4 else 4 if i < 8 else 8
        assert out[i][1] == exp


# --- batch E: multi-touch, session paths, containment ------------------------


def test_multitouch_range_frame(spark, tmp_path):
    H = dt.timedelta(minutes=30)
    rows = [
        (1, T0, 1, "click", 0.0, ""),
        (2, T0 + H, 1, "click", 0.0, ""),
        (3, T0 + 2 * H, 1, "purchase", 0.0, ""),  # both clicks in 1h
        (4, T0 + 5 * H, 1, "purchase", 0.0, ""),  # none in window
        (5, T0, 2, "view", 0.0, ""),
        (6, T0 + S, 2, "purchase", 0.0, ""),      # view is not a touch
    ]
    d = _write_events(spark, tmp_path, rows)
    out = {r.event_id: (r.n_touches, r.credit_ppm)
           for r in Q.events_multitouch_attribution(spark, d).collect()}
    assert out[3] == (2, 500000)
    assert out[4] == (0, None)
    assert out[6] == (0, None)


def test_multitouch_excludes_same_instant_click(spark, tmp_path):
    rows = [
        (1, T0, 1, "click", 0.0, ""),
        (2, T0, 1, "purchase", 0.0, ""),  # strictly-before frame: 0 touches
        (3, T0 + S, 1, "purchase", 0.0, ""),
    ]
    d = _write_events(spark, tmp_path, rows)
    out = {r.event_id: r.n_touches
           for r in Q.events_multitouch_attribution(spark, d).collect()}
    assert out[2] == 0 and out[3] == 1


def test_session_paths_crafted(spark, tmp_path):
    G = dt.timedelta(hours=1)
    rows = [
        # user 1: two sessions a>b and a>b
        (1, T0, 1, "a", 0.0, ""), (2, T0 + S, 1, "b", 0.0, ""),
        (3, T0 + G, 1, "a", 0.0, ""), (4, T0 + G + S, 1, "b", 0.0, ""),
        # user 2: one session a>b, one c
        (5, T0, 2, "a", 0.0, ""), (6, T0 + S, 2, "b", 0.0, ""),
        (7, T0 + G, 2, "c", 0.0, ""),
    ]
    d = _write_events(spark, tmp_path, rows)
    out = {r.path: r.n_sessions for r in Q.events_session_paths(spark, d).collect()}
    assert out == {"a>b": 3, "c": 1}


def test_containment_quote_detected(spark, tmp_path):
    quote = "alpha beta gamma delta epsilon zeta"
    host = "intro words here " + quote + " trailing material follows now"
    other = "completely different content with nothing shared at all ok"
    d = _write_docs(spark, tmp_path, [
        (1, quote, "en", "s", 0), (2, host, "en", "s", 0),
        (3, other, "en", "s", 0),
    ])
    out = {(r.src, r.dst): r for r in Q.docs_containment(spark, d).collect()}
    # doc 1's 4 shingles all appear in doc 2 -> containment 100%
    assert out[(1, 2)].containment_ppm == 1_000_000
    assert out[(1, 2)].n_common == 4 and out[(1, 2)].n_sh == 4
    # reverse direction dilutes below 50% -> absent
    assert (2, 1) not in out
    assert all(k[0] != 3 and k[1] != 3 for k in out)


def test_stream_scd2_matches_batch(spark):
    batch = sorted(
        map(tuple, Q.events_scd2_history(spark, SF_SMOKE).collect())
    )
    stream = sorted(map(tuple, Q.events_stream_scd2(spark, SF_SMOKE).collect()))
    assert stream == batch and len(batch) > 0


def test_conversion_latency_buckets(spark, tmp_path):
    M = dt.timedelta(minutes=1)
    rows = [
        (1, T0, 1, "click", 0.0, ""),
        (2, T0 + S, 1, "purchase", 0.0, ""),      # 1 s  -> bin(1)   len 1
        (3, T0 + 17 * M, 1, "purchase", 0.0, ""),  # 1019s -> bin len 10
        (4, T0, 2, "purchase", 0.0, ""),           # no click -> NULL
    ]
    d = _write_events(spark, tmp_path, rows)
    out = {r.bucket_log2s: r.n_purchases
           for r in Q.events_conversion_latency(spark, d).collect()}
    assert out[1] == 1
    assert out[10] == 1
    assert out[None] == 1


def test_partitioned_sink_prunes_at_scan(spark):
    df = Q.partitioned_sink_prune(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the day window must appear as a partition filter, not a data filter
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "day_num" in pf
    import re

    m = re.search(r"PartitionCount: (\d+)", plan)
    if m:  # pruned listing: at most the 7 requested day directories
        assert int(m.group(1)) <= 7


def test_incremental_rollup_equals_full_recompute(spark):
    from pyspark.sql import functions as F

    inc = {(r.day_num, r.event_type): (r.n, r.value_c)
           for r in Q.events_incremental_rollup(spark, SF_SMOKE).collect()}
    ev = Q.read_events(spark, SF_SMOKE)
    full = {(r.day_num, r.event_type): (r.n, r.value_c)
            for r in ev.select(
                F.expr("(ts div 1000) div 86400000000").alias("day_num"),
                "event_type",
                F.round(F.col("value") * 100).cast("long").alias("v_c"),
            ).groupBy("day_num", "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("v_c").alias("value_c")).collect()}
    assert inc == full and len(full) > 0


# --- multi-batch replay of the new stateful streams --------------------------


def _day_split_source(spark, tmp_path):
    """One parquet file per day, oldest-first, read back with
    maxFilesPerTrigger=1 — each day arrives as its own micro-batch."""
    from pyspark.sql import functions as F

    from soil_data_development_tools___arcmap_spark.queries import read_events
    from soil_data_development_tools___arcmap_spark.streaming.events import (
        EVENTS_SCHEMA,
        _ts_ns,
    )

    ev = read_events(spark, SF_SMOKE).withColumn(
        "day_num", F.expr("(ts div 1000) div 86400000000")
    )
    days = sorted(r[0] for r in ev.select("day_num").distinct().collect())
    src = str(tmp_path / "ev_daysplit")
    os.makedirs(src, exist_ok=True)
    for d in days:
        ev.where(F.col("day_num") == d).drop("day_num").withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        ).coalesce(1).write.mode("append").parquet(src)
    return _ts_ns(
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_stream_transition_multibatch_matches_batch(spark, tmp_path):
    from soil_data_development_tools___arcmap_spark.streaming.events import (
        run_transition_stream,
    )

    batch = {
        (r.prev_type, r.event_type): (r.n, r.ppm)
        for r in Q.events_transition_matrix(spark, SF_SMOKE).collect()
    }
    stream = {
        (r.prev_type, r.event_type): (r.n, r.ppm)
        for r in run_transition_stream(
            spark, SF_SMOKE, source=_day_split_source(spark, tmp_path)
        ).collect()
    }
    # day boundaries cut nothing: state links the last event of day d
    # to the first event of day d+1, so counts equal the batch lag form
    assert stream == batch and len(batch) > 0


def test_stream_scd2_multibatch_matches_batch(spark, tmp_path):
    from soil_data_development_tools___arcmap_spark.streaming.events import (
        run_scd2_stream,
    )

    batch = sorted(
        map(tuple, Q.events_scd2_history(spark, SF_SMOKE).collect())
    )
    stream = sorted(
        map(
            tuple,
            run_scd2_stream(
                spark, SF_SMOKE, source=_day_split_source(spark, tmp_path)
            ).collect(),
        )
    )
    # intervals spanning a day boundary close in a later batch; the
    # closed revision supersedes the open one emitted earlier
    assert stream == batch and len(batch) > 0


def test_props_variant_typed_extraction(spark, tmp_path):
    rows = [
        (1, T0, 1, "a", 0.0, '{"k": 5}'),
        (2, T0, 1, "a", 0.0, '{"k": -3}'),
        (3, T0, 1, "a", 0.0, '{"other": 1}'),   # no k -> NULL, counted in n
        (4, T0, 1, "b", 0.0, 'not json'),        # unparseable -> NULL k
    ]
    d = _write_events(spark, tmp_path, rows)
    out = {r.event_type: r for r in Q.events_props_variant(spark, d).collect()}
    a = out["a"]
    assert (a.n, a.n_with_k, a.sum_k, a.min_k, a.max_k) == (3, 2, 2, -3, 5)
    assert out["b"].n_with_k == 0 and out["b"].sum_k is None


def test_morton_property_matches_reference():
    """Property: the portable SQL text equals the bit-interleave
    reference for arbitrary inputs/widths (DuckDB-evaluated — the
    builder emits the same arithmetic for both engines, so this pins
    the oracle side; the Spark side is pinned by the known-value
    test above)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from soil_data_development_tools___arcmap_spark.functions.layout import (
        morton_sql,
    )

    con = duckdb.connect()

    def py_morton(u, d, bits):
        z = 0
        for i in range(bits):
            z |= ((u >> i) & 1) << (2 * i)
            z |= ((d >> i) & 1) << (2 * i + 1)
        return z

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(min_value=0, max_value=2**16 - 1),
        st.integers(min_value=0, max_value=2**16 - 1),
        st.integers(min_value=1, max_value=16),
    )
    def check(u, d, bits):
        got = con.sql(
            f"SELECT {morton_sql(str(u), str(d), bits, ' // ')}"
        ).fetchone()[0]
        assert got == py_morton(u % (1 << bits), d % (1 << bits), bits)

    check()


def test_cdc_diff_classifies_all_three(spark, tmp_path):
    D0, D15, D25 = T0, T0 + 15 * DAY, T0 + 25 * DAY
    rows = [
        # user 1: in both windows, state moves a -> b  => update
        (1, D0, 1, "a", 0.0, ""), (2, D25, 1, "b", 0.0, ""),
        # user 2: only early (day 0 < offset 10... keep < 10) => delete
        (3, D0 + 2 * DAY, 2, "a", 0.0, ""),
        # user 3: only late (offset 25 >= 20) => insert
        (4, D25, 3, "a", 0.0, ""),
        # user 4: same state both windows => dropped
        (5, D0, 4, "x", 0.0, ""), (6, D25, 4, "x", 0.0, ""),
        # user 5: overlap-window event only (offset 15) => both, unchanged
        (7, D15, 5, "y", 0.0, ""),
    ]
    d = _write_events(spark, tmp_path, rows)
    out = {r.user_id: (r.change, r.old_state, r.new_state)
           for r in Q.events_cdc_diff(spark, d).collect()}
    assert out[1] == ("update", "a", "b")
    assert out[2] == ("delete", "a", None)
    assert out[3] == ("insert", None, "a")
    assert 4 not in out and 5 not in out


def test_rollup_gid_and_totals(spark, tmp_path):
    rows = [
        (1, T0, 1, "a", 1.0, ""),
        (2, T0, 1, "b", 2.0, ""),
        (3, T0 + DAY, 1, "a", 3.0, ""),
    ]
    d = _write_events(spark, tmp_path, rows)
    out = Q.events_rollup_cube(spark, d).collect()
    by_gid = {}
    for r in out:
        by_gid.setdefault(r.gid, []).append(r)
    assert len(by_gid[0]) == 3          # (day, type) cells
    assert len(by_gid[1]) == 2          # per-day subtotals
    assert len(by_gid[3]) == 1          # grand total
    g = by_gid[3][0]
    assert g.n == 3 and g.value_c == 600
    d0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp()) // 86400
    day0 = [r for r in by_gid[1] if r.day_num == d0][0]
    assert day0.n == 2 and day0.value_c == 300


def test_weighted_sample_prefers_heavy_docs(spark, tmp_path):
    # 200 docs: half 1-token (w=1), half 50-token (w=50); the
    # bottom-100 priorities must skew heavily toward w=50
    rows = [(i, "w" if i % 2 else " ".join(["w"] * 50), "en", "s", 0)
            for i in range(200)]
    d = _write_docs(spark, tmp_path, rows)
    out = Q.docs_weighted_sample(spark, d).collect()
    assert len(out) == 100
    heavy = sum(1 for r in out if r.w == 50)
    assert heavy > 80  # E[heavy] ≈ 98 under priority sampling
    # deterministic across runs
    again = Q.docs_weighted_sample(spark, d).collect()
    assert sorted(r.doc_id for r in out) == sorted(r.doc_id for r in again)


def test_ab_assignment_pure_and_exact(spark, tmp_path):
    import hashlib

    rows = []
    eid = 0
    for u in range(40):
        rows.append((eid, T0, u, "view", 0.0, "")); eid += 1
        if u % 4 == 0:
            rows.append((eid, T0 + S, u, "purchase", 0.0, "")); eid += 1
    d = _write_events(spark, tmp_path, rows)
    out = {r.arm: r for r in Q.events_ab_assignment(spark, d).collect()}

    def arm(u):
        h = int(hashlib.md5(f"exp1:{u}".encode()).hexdigest()[:15], 16)
        return "treatment" if h % 1000 < 500 else "control"

    exp = {"treatment": [0, 0], "control": [0, 0]}
    for u in range(40):
        exp[arm(u)][0] += 1
        exp[arm(u)][1] += 1 if u % 4 == 0 else 0
    for a in ("treatment", "control"):
        assert out[a].n_users == exp[a][0]
        assert out[a].n_converted == exp[a][1]
        assert out[a].conv_ppm == exp[a][1] * 1_000_000 // exp[a][0]


def test_simhash_pairs_crafted(spark, tmp_path):
    import hashlib

    def py_simhash16(text):
        sums = [0] * 16
        for w in set(text.split()):
            h = hashlib.md5(w.encode()).hexdigest()
            for i in range(16):
                sums[i] += 1 if h[i] in "89abcdef" else -1
        return sum((1 << i) for i in range(16) if sums[i] > 0)

    t1 = "alpha beta gamma delta epsilon"
    t2 = "alpha beta gamma delta zeta"      # one token swapped
    t3 = "q r s t u v w x y z aa bb cc dd"  # disjoint vocab
    d = _write_docs(spark, tmp_path, [
        (1, t1, "en", "s", 0), (2, t1, "en", "s", 0),
        (3, t2, "en", "s", 0), (4, t3, "en", "s", 0),
    ])
    out = {(r.i, r.j): r.hamming
           for r in Q.docs_simhash_pairs(spark, d).collect()}
    s1, s2, s3 = py_simhash16(t1), py_simhash16(t2), py_simhash16(t3)
    assert out[(1, 2)] == 0  # identical docs: identical signatures
    exp12 = bin(s1 ^ s2).count("1")
    if exp12 <= 3:
        assert out[(1, 3)] == exp12 and out[(2, 3)] == exp12
    # the disjoint doc pairs appear iff their true hamming <= 3 AND a
    # band collides — assert consistency with the reference either way
    for (i, j), ham in out.items():
        sigs = {1: s1, 2: s1, 3: s2, 4: s3}
        assert ham == bin(sigs[i] ^ sigs[j]).count("1")
        assert ham <= 3


def test_value_profile_exact_percentiles(spark, tmp_path):
    vals = [1.00, 2.00, 3.00, 4.00, 5.00, 6.00, 7.00, 8.00, 9.00, 10.00]
    rows = [(i, T0, 1, "a", v, "") for i, v in enumerate(vals)]
    rows.append((99, T0, 2, "b", 7.50, ""))
    d = _write_events(spark, tmp_path, rows)
    out = {r.event_type: r for r in Q.events_value_profile(spark, d).collect()}
    a = out["a"]
    # even n: med2 = v[n/2] + v[n/2+1] = 500 + 600 cents
    assert (a.n, a.vmin, a.vmax, a.med2) == (10, 100, 1000, 1100)
    # p95 rank = (19*9)//20 + 1 = 9 -> 900 cents
    assert a.p95 == 900
    b = out["b"]
    assert (b.n, b.med2, b.p95) == (1, 1500, 750)
