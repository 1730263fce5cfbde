"""Event-stream batch queries (windows, funnels, attribution,
rollups)."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import (
    RatingSpec,
    agg_dcd,
    agg_dcp,
    agg_hz_dcp_wta,
    agg_limiting,
    agg_maxmin,
    agg_pp_sum,
    agg_wta,
    month_collapse,
)
from .operators.horizon_agg import _member_sums, clipped_thickness

from ._qcore import _t, cents, read_events



# ------------------------------------------------------ events (batch
# analytics + streaming twin; ts convention: Spark `ts div 1000` ==
# DuckDB epoch_us(ts) — DuckDB truncates ns parquet to µs)


def events_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window per event_type (batch form)."""
    from .streaming.events import tumbling_daily

    return tumbling_daily(read_events(spark, sf_dir))


def events_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same aggregation through Structured Streaming (availableNow +
    memory sink) — hash-checked against the BATCH oracle SQL."""
    from .streaming.events import run_stream_to_table

    return run_stream_to_table(spark, sf_dir)


def events_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming sessionization
    (applyInPandasWithState); certified by the SAME oracle as the
    batch events_sessionize."""
    from .streaming.events import run_sessionize_stream

    return run_sessionize_stream(spark, sf_dir)


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: new session when the gap to the previous event
    of the same user exceeds 30 min. Exact µs integer arithmetic."""
    ev = read_events(spark, sf_dir).withColumn("ts_us", F.expr("ts div 1000"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    df = ev.withColumn("new_sess", (gap > 1800 * 1000000).cast("int"))
    return df.groupBy("user_id").agg(
        (F.coalesce(F.sum("new_sess"), F.lit(0)) + 1).alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


def events_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 7-day/1-day window through Structured Streaming
    (F.window slide) — hash-checked against the batch
    events_sliding_window oracle (generate_series fan-out form)."""
    from .streaming.events import run_sliding_stream

    return run_sliding_stream(spark, sf_dir)


def events_enriched_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment join: category dim
    broadcast onto events, tumbling 1-day counts + exact cent sums."""
    from .streaming.events import _category_dim, enriched_daily

    return enriched_daily(read_events(spark, sf_dir), _category_dim(spark))


def events_stream_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC join through Structured Streaming (the dimension
    is broadcast into every micro-batch) — hash-checked against the
    batch oracle."""
    from .streaming.events import run_enriched_stream

    return run_enriched_stream(spark, sf_dir)


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution pairs (1-hour lookback) — batch
    form of the stream-stream join."""
    from .streaming.events import attribution_pairs

    ev = read_events(spark, sf_dir)
    return attribution_pairs(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
    )


def events_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM watermarked inner join with an event-time range
    condition — certified by the SAME oracle as the batch
    events_attribution (inner-join output is micro-batch invariant)."""
    from .streaming.events import run_attribution_stream

    return run_attribution_stream(spark, sf_dir)


def events_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming exact-dedup (dropDuplicatesWithinWatermark):
    the events file arrives TWICE through the file source; the deduped
    stream equals the single-copy batch table (batch oracle certifies
    the stream). Watermark-evicted key state = bounded-memory ingest
    dedup at firehose scale."""
    from .streaming.events import run_dedup_stream

    return run_dedup_stream(spark, sf_dir)


def events_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer click→purchase attribution (unmatched clicks keep a
    null purchase) — batch twin of the outer stream-stream join."""
    from .streaming.events import attribution_pairs_outer

    ev = read_events(spark, sf_dir)
    return attribution_pairs_outer(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
    )


def events_stream_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER watermarked stream-stream join with state-eviction
    semantics made batch-equal by far-future flush sentinels (outer
    results only drain when the watermark passes them) — certified by
    the SAME oracle as the batch events_attribution_outer."""
    from .streaming.events import run_attribution_outer_stream

    return run_attribution_outer_stream(spark, sf_dir)


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 7-day window advancing 1 day, per event_type: each event
    lands in 7 windows (exploded window dimension — the batch twin of
    F.window(ts, '7 days', '1 day'), kept in exact integer day space
    for the oracle)."""
    ev = read_events(spark, sf_dir).withColumn(
        "day_num", F.expr("(ts div 1000) div 86400000000")
    )
    win = ev.withColumn("off", F.explode(F.sequence(F.lit(0), F.lit(6)))).select(
        (F.col("day_num") + F.col("off")).alias("win_end_day"),
        "event_type",
        cents("value").alias("value_c"),
    )
    return win.groupBy("win_end_day", "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value_c").alias("value_c")
    )


def events_topk_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per event_type (window top-k)."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        cents("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("event_type", "event_id", cents("value").alias("value_c"), "rn")
    )


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON prop extraction + aggregation (props is a JSON string)."""
    ev = read_events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n")
    )


def events_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day × event-type PIVOT (wide daily activity matrix): explicit
    value list so the output schema is static — Spark skips the
    distinct-values collect pass and the plan is a single groupBy with
    conditional counts, exactly what a 100 TB fact table wants."""
    ev = read_events(spark, sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    day = F.expr("(ts div 1000) div 86400000000").alias("day_num")
    out = (
        ev.select(day, "event_type")
        .groupBy("day_num")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "day_num",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
    )


def events_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted per-user engagement score with INTEGER
    half-life decay — the ranking signal a sampling/curation pipeline
    uses to favor recently-active users (or, swapped onto documents,
    recently-crawled pages): each event contributes
    value_cents << (20 − min(age_days, 20)), i.e. a one-day half-life
    truncated at 20 days, all in exact int64 arithmetic (no float
    exp(), so the cross-engine hash certifies it bit for bit; 20-bit
    shifts on ≤1e5-cent values keep the per-user sum orders of
    magnitude under int64 even at 100 TB event counts).

    Plan shape: one scan, the reference day is a 1-row broadcast
    (global MAX), one hash aggregation keyed by user — partial
    aggregation does the decay map-side. Columns: user_id, n_events,
    last_day, decayed_score."""
    ev = read_events(spark, sf_dir).select(
        "user_id",
        F.expr("(ts div 1000) div 86400000000").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    ref = ev.agg(F.max("day").alias("rd"))
    return (
        ev.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("day").alias("last_day"),
            F.sum(
                F.col("vc")
                * F.expr(
                    "cast(shiftleft(1, 20 - least(cast(rd - day AS int), 20))"
                    " AS bigint)"
                )
            ).alias("decayed_score"),
        )
        .select("user_id", "n_events", "last_day", "decayed_score")
    )


def events_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (event_type, day) subtotal lattice — per-(type, day)
    rows, per-type subtotals, grand total in ONE pass (Spark expands
    the grouping sets map-side; no re-scan per level). gid
    disambiguates subtotal NULLs from data NULLs; cent sums exact."""
    ev = read_events(spark, sf_dir)
    day = F.expr("(ts div 1000) div 86400000000").alias("day_num")
    return (
        ev.select("event_type", day, F.round(F.col("value") * 100).cast("long").alias("vc"))
        .rollup("event_type", "day_num")
        .agg(
            (F.grouping("event_type") * 2 + F.grouping("day_num"))
            .cast("int")
            .alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum("vc").alias("value_c"),
        )
        .select("event_type", "day_num", "gid", "n", "value_c")
    )


def events_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session counts via the BUILT-IN streaming
    ``F.session_window`` (engine-managed merging state; contrast with
    the applyInPandasWithState custom operator). Boundary: a gap of
    exactly 30 min starts a new session (windows don't overlap), so
    this query has its own ``>=``-gap oracle rather than reusing the
    strict-``>`` batch sessionize oracle."""
    from .streaming.events import run_session_window_stream

    return run_session_window_stream(spark, sf_dir)


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase with a 24 h
    conversion window per step: per user, the earliest view, the
    earliest click within (t1, t1+24h], the earliest purchase within
    (t2, t2+24h] — then one global stage-count row (150 -> 150 -> 60
    -> 25 at sf0.01; without the window every user trivially converts
    over a month of events). Three chained conditional-min windows
    over the SAME user partitioning (one exchange; each min references
    the previous stage's time), then a per-user collapse and a
    single-row count aggregate. No self-joins — the classic funnel
    N-way join shape collapses into one pass over the (already
    user-partitioned) events."""
    win_us = 86400000000  # 24 h conversion window per step
    ev = read_events(spark, sf_dir)
    e = ev.select(
        "user_id", "event_type", F.expr("ts div 1000").alias("ts_us")
    )
    w = Window.partitionBy("user_id")
    t1 = F.min(
        F.when(F.col("event_type") == "view", F.col("ts_us"))
    ).over(w)
    d1 = e.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts_us") > F.col("t1"))
            & (F.col("ts_us") <= F.col("t1") + win_us),
            F.col("ts_us"),
        )
    ).over(w)
    d2 = d1.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts_us") > F.col("t2"))
            & (F.col("ts_us") <= F.col("t2") + win_us),
            F.col("ts_us"),
        )
    ).over(w)
    d3 = d2.withColumn("t3", t3)
    per_user = d3.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_click"),
        F.count("t3").alias("n_purchase"),
    )


def events_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketch with ENGINE-EXACT registers: a
    64-register HyperLogLog-shaped sketch over user_id built from a
    double Lehmer LCG hash ((id*48271) mod 2^31-1, twice) — both
    engines compute identical buckets and rho values, so the oracle
    hash certifies the sketch itself, not just an estimate. rho =
    trailing-zero count of the remaining bits + 1 via bit_count((q &
    -q) - 1) — pure integer ops, no log2 float. The register table is
    what a 1000-executor cluster would actually ship to the driver
    (64 rows), merged with max() — the partial aggregate IS the sketch
    merge. (Spark's native approx_count_distinct gives the same shape
    but its HLL++ registers aren't reproducible in DuckDB.)"""
    ev = read_events(spark, sf_dir)
    h = ev.select(
        F.expr(
            "((user_id * 48271) % 2147483647) * 48271 % 2147483647"
        ).alias("h2")
    ).distinct()
    r = h.select(
        F.expr("h2 % 64").alias("bucket"), F.expr("h2 div 64").alias("q")
    )
    return r.groupBy("bucket").agg(
        F.expr(
            "max(CASE WHEN q = 0 THEN 26 "
            "ELSE bit_count((q & -q) - 1) + 1 END)"
        ).alias("max_rho"),
        F.count(F.lit(1)).alias("n_hashes"),
    )


def events_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``events_funnel``: per-user stage timestamps
    as applyInPandasWithState state, batch-identical results (the
    batch funnel oracle certifies the stream)."""
    from .streaming.events import run_funnel_stream

    return run_funnel_stream(spark, sf_dir)


def events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each purchase matched to the LAST click of the same
    user at-or-before it (ties on ts broken by event_id order), nulled
    when the gap exceeds 1 hour. The scalable shape: one window over
    the user-partitioned event stream — ``last(..., ignorenulls)``
    over preceding rows — instead of a range self-join, so the plan is
    a single shuffle on user_id regardless of how many clicks precede
    each purchase (the range-join form explodes with click density;
    this form is O(events))."""
    ev = read_events(spark, sf_dir).where(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "user_id",
        "event_type",
        "event_id",
        F.expr("ts div 1000").alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_click = F.col("event_type") == "click"
    lc_id = F.last(F.when(is_click, F.col("event_id")), ignorenulls=True).over(w)
    lc_ts = F.last(F.when(is_click, F.col("ts_us")), ignorenulls=True).over(w)
    return (
        # both window columns in ONE select so they collapse into a
        # single Window operator (one pass over the sorted partition)
        ev.select("*", lc_id.alias("lc_id"), lc_ts.alias("lc_ts"))
        .where(~is_click & (F.col("event_type") == "purchase"))
        .select(
            F.col("event_id").alias("purchase_id"),
            F.when(
                F.col("ts_us") - F.col("lc_ts") <= 3600 * 1000000,
                F.col("lc_id"),
            ).alias("click_id"),
            F.when(
                F.col("ts_us") - F.col("lc_ts") <= 3600 * 1000000,
                F.col("ts_us") - F.col("lc_ts"),
            ).alias("gap_us"),
        )
    )


def events_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly flags per event type — the ops-monitoring
    query a pipeline runs over its ingest counts. A day is anomalous
    when |x − mean| > 2σ, evaluated WITHOUT floats: with n days,
    S = Σx, S2 = Σx², the test is (n·x − S)² > 4·(n·S2 − S²) — pure
    BIGINT cross-multiplication, so the oracle reproduces every flag
    exactly. Two exchanges: the daily rollup, then the per-type stats
    broadcast back onto the 150-row day table."""
    daily = (
        read_events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.expr("(ts div 1000) div 86400000000").alias("day_num"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    d = F.col("n") * F.col("x") - F.col("s")
    var_n2 = F.col("n") * F.col("s2") - F.col("s") * F.col("s")
    return daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day_num",
        "x",
        (d * d > 4 * var_n2).cast("int").alias("is_anomaly"),
    )


def events_cogroup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user engagement profile via COGROUPED applyInPandas — the
    one grouped-Pandas surface the rest of the repo doesn't exercise
    (groupby().cogroup().applyInPandas): clicks and purchases arrive
    as two aligned per-user Arrow batches and the attribution count
    (purchases with any click in the preceding hour) is computed with
    a numpy searchsorted per group. This op exists as the documented
    escape hatch for per-key logic Spark expressions can't state; for
    THIS metric the JVM form exists too (events_asof_attribution), so
    the same oracle certifies the Python path — the point of the
    query. One shuffle per side on user_id; Arrow batches bounded by
    per-user row counts."""
    import pandas as pd

    ev = read_events(spark, sf_dir).where(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "user_id", F.expr("ts div 1000").alias("ts_us"), "event_type"
    )
    clicks = ev.where(F.col("event_type") == "click").drop("event_type")
    purch = ev.where(F.col("event_type") == "purchase").drop("event_type")

    def profile(key, cdf: pd.DataFrame, pdf: pd.DataFrame):
        import numpy as np

        cts = np.sort(cdf["ts_us"].to_numpy())
        pts = pdf["ts_us"].to_numpy()
        if len(cts) and len(pts):
            # any click in [p-1h, p]  <=>  searchsorted windows differ
            lo = np.searchsorted(cts, pts - 3600_000_000, side="left")
            hi = np.searchsorted(cts, pts, side="right")
            n_attr = int((hi > lo).sum())
        else:
            n_attr = 0
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_clicks": [len(cts)],
                "n_purchases": [len(pts)],
                "n_attributed": [n_attr],
            }
        )

    return (
        clicks.groupby("user_id")
        .cogroup(purch.groupby("user_id"))
        .applyInPandas(
            profile,
            "user_id long, n_clicks long, n_purchases long, n_attributed long",
        )
    )


def events_stream_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming daily rollup + offline 2σ scoring — certified by the
    SAME oracle as the batch events_volume_anomaly."""
    from .streaming.events import run_volume_anomaly_stream

    return run_volume_anomaly_stream(spark, sf_dir)


def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU per day — the engagement dashboard's
    first chart. The scale-correct order of operations: collapse to
    DISTINCT (user, day) FIRST (events per user-day can be huge; this
    is the map-side-combining shuffle), then fan each user-day into
    the ≤7 windows it serves and count distinct users per window.
    Day space stays exact-integer; WAU windows at the stream head
    (fewer than 7 prior days) simply cover the days that exist, like
    every dashboard draws them."""
    ud = (
        read_events(spark, sf_dir)
        .select(
            "user_id",
            F.expr("(ts div 1000) div 86400000000").alias("day_num"),
        )
        .distinct()
    )
    dau = ud.groupBy("day_num").agg(F.countDistinct("user_id").alias("dau"))
    wau = (
        ud.withColumn("off", F.explode(F.sequence(F.lit(0), F.lit(6))))
        .select((F.col("day_num") + F.col("off")).alias("win_day"), "user_id")
        .groupBy("win_day")
        .agg(F.countDistinct("user_id").alias("wau"))
        .withColumnRenamed("win_day", "day_num")
    )
    # windows whose end lies past the last real day are not reported
    return dau.join(wau, "day_num").select("day_num", "dau", "wau")


def events_stream_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DAU (stateful user-day dedup chained into the daily
    count) — certified by the batch COUNT(DISTINCT) oracle."""
    from .streaming.events import run_dau_stream

    return run_dau_stream(spark, sf_dir)


def events_stream_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming trailing-7d WAU (dedup state + window fanout +
    complete-mode count) — certified by the batch fanout oracle."""
    from .streaming.events import run_wau_stream

    return run_wau_stream(spark, sf_dir)


def events_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-sizing audit: per event, lateness = how far behind
    the running maximum event time (in ARRIVAL order — event_id is the
    ingest sequence) this event arrived; reported as a per-day-bucket
    histogram. This is the profile a streaming deployment reads to
    pick its watermark delay (a 1-day watermark drops exactly the
    rows in buckets ≥ 1).

    A running max over a global order is inherently sequential, so it
    is computed as a PARALLEL PREFIX SCAN — the shape that survives
    100×: arrival ids bucket into 1M-id chunks; the within-chunk
    running max is a PARTITIONED window (parallel), the cross-chunk
    carry is a prefix max over the chunk maxima (one row per chunk —
    the only global window, thousands of rows at any scale), joined
    back by chunk id. No single-partition sort of the fact table
    anywhere."""
    ev = read_events(spark, sf_dir).select(
        "event_id", F.expr("ts div 1000").alias("ts_us")
    ).withColumn("bkt", F.expr("event_id div 1000000"))
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = ev.withColumn("in_max", F.max("ts_us").over(w_in))
    bmax = ev.groupBy("bkt").agg(F.max("ts_us").alias("bmax"))
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    carry = bmax.select(
        "bkt", F.max("bmax").over(w_b).alias("carry_max")
    )
    run_max = F.greatest(
        F.coalesce(F.col("in_max"), F.lit(-1)),
        F.coalesce(F.col("carry_max"), F.lit(-1)),
    )
    late_us = F.greatest(run_max - F.col("ts_us"), F.lit(0))
    return (
        within.join(carry, "bkt")
        .withColumn("late_days", (late_us / F.lit(86400000000)).cast("long"))
        .groupBy("late_days")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def events_burst_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Abuse/bot screening — the rate-based filter a training pipeline
    runs before ingesting user-generated content: per user, the peak
    events-in-one-hour rate and a burst flag (peak ≥ 3). Two integer
    aggregates (user×hour rollup, then per-user max), both combining
    map-side; no windows, no floats."""
    ev = read_events(spark, sf_dir).select(
        "user_id", F.expr("(ts div 1000) div 3600000000").alias("hour")
    )
    hourly = ev.groupBy("user_id", "hour").agg(F.count(F.lit(1)).alias("n"))
    return hourly.groupBy("user_id").agg(
        F.max("n").alias("peak_per_hour"),
        (F.max("n") >= 3).cast("int").alias("burst_flag"),
        F.sum("n").alias("n_events"),
    )


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-sequence transition matrix (the first-order
    Markov summary behind session-flow dashboards and next-event
    models): for every consecutive (prev_type → type) pair in each
    user's event-time order, the global count and its parts-per-million
    share of all transitions. Deterministic order inside ts ties via
    event_id.

    100 TB posture: ONE user_id exchange carries the lag window (state
    = one row lookback per task, not per user); the pair counting is a
    map-side-combined groupBy on a key space of |types|² rows; the
    share denominator is a 1-row broadcast. No skew surface — the
    window partitions by user (bounded) and the final agg key space is
    tiny."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("prev_type"), F.col("event_type")
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = pairs.agg(F.sum("n").alias("total"))
    return pairs.crossJoin(F.broadcast(total)).select(
        "prev_type",
        "event_type",
        "n",
        F.expr("n * 1000000 div total").alias("ppm"),
    )


def events_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic — the pre-flight a 100 TB engine runs
    BEFORE shuffling on a key: per-key row counts for user_id, the
    top-10 heavy hitters (count desc, key asc tiebreak so the set is
    deterministic), each with its ppm share and an integer skew flag
    (count > 8× the mean key load, cross-multiplied so no float ever
    enters the decision). The operator exists because a single hot key
    at 8× mean is the difference between an even shuffle and one
    straggler task holding the stage.

    100 TB posture: one map-side-combined groupBy; the global (rows,
    keys) denominator is a 1-row broadcast; the top-10 plans as
    TakeOrderedAndProject (per-partition heaps + driver merge of 10
    rows), never a global sort."""
    counts = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = counts.agg(
        F.sum("n").alias("total_rows"), F.count(F.lit(1)).alias("total_keys")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            "user_id",
            "n",
            F.expr("n * 1000000 div total_rows").alias("ppm"),
            (F.col("n") * F.col("total_keys") > 8 * F.col("total_rows"))
            .cast("int")
            .alias("skew_flag"),
        )
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(10)
    )


def events_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value quantiles from a MERGEABLE log-bucket
    sketch (DDSketch-style, pure integer ops), certified against the
    exact order-statistics answer computed alongside.

    Values are cent-scaled (round(value*100), the repo's engine-exact
    integerization) and bucketed by ``logbucket_sql``: base-2 octaves
    × 8 linear sub-buckets, ≤ 512 buckets across the whole int64
    range, so the per-type summary state is CONSTANT in event count
    — the thing a 1000-executor p99 dashboard ships to its reducer,
    where bucket counts just add (mergeable), unlike an exact
    percentile which needs the full value multiset.  Quantile
    estimate = midpoint representative of the first bucket whose
    cumulative count reaches ceil(p·n/1000); guaranteed relative
    error ≤ 1/16 vs the true order statistic (exact below 8 cents).
    The exact quantiles come from the distinct-cent count histogram
    (the ``events_value_profile`` posture: window over distinct
    cents, never raw rows).  Columns: event_type, n_events,
    n_buckets, p50_est, p50_exact, p95_est, p95_exact, p99_est,
    p99_exact, err95_permille.
    """
    from .functions.sketches import logbucket_rep_sql, logbucket_sql

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        # clamp: logbucket requires v >= 0 (negative longs would land
        # in the top octave via two's-complement bin())
        F.greatest(
            F.round(F.col("value") * 100).cast("long"), F.lit(0).cast("long")
        ).alias("v_c"),
    )
    buckets = (
        ev.select("event_type", F.expr(logbucket_sql("v_c")).alias("b"))
        .groupBy("event_type", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = buckets.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("event_type"))
    )
    est = cum.groupBy("event_type").agg(
        F.max("n").alias("n_events"),
        F.count(F.lit(1)).alias("n_buckets"),
        *[
            F.min(
                F.when(
                    F.expr(f"cum * 1000 >= {p} * n"), F.expr(logbucket_rep_sql("b"))
                )
            ).alias(f"p{p}_est")
            for p in (500, 950, 990)
        ],
    )
    # exact quantiles over the distinct-cent histogram (no raw-row sort)
    hist = ev.groupBy("event_type", "v_c").agg(F.count(F.lit(1)).alias("cnt"))
    w_h = (
        Window.partitionBy("event_type")
        .orderBy("v_c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hcum = hist.withColumn("cum", F.sum("cnt").over(w_h)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("event_type"))
    )
    exact = hcum.groupBy("event_type").agg(
        *[
            F.min(F.when(F.expr(f"cum * 1000 >= {p} * n"), F.col("v_c"))).alias(
                f"p{p}_exact"
            )
            for p in (500, 950, 990)
        ],
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "n_events",
        "n_buckets",
        F.col("p500_est").alias("p50_est"),
        F.col("p500_exact").alias("p50_exact"),
        F.col("p950_est").alias("p95_est"),
        F.col("p950_exact").alias("p95_exact"),
        F.col("p990_est").alias("p99_est"),
        F.col("p990_exact").alias("p99_exact"),
        F.expr(
            "abs(p950_est - p950_exact) * 1000 div greatest(p950_exact, 1)"
        ).alias("err95_permille"),
    )


# ---------------------------------------------------------------------------
# Round 5 breadth batch C: warehouse history (SCD2), retention cohorts,
# Z-order data layout, inverted index, integer-exact PageRank, text
# normalization.
# ---------------------------------------------------------------------------


def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type-2 history build from a change
    log — the CDC pattern every warehouse ingest needs: collapse each
    user's event stream to its state-CHANGE rows (event_type as the
    tracked attribute) and emit validity intervals
    ``[valid_from_us, valid_to_us)`` with a per-user version number
    and an ``is_current`` flag on the open interval. Ties inside one
    timestamp resolve by event_id, so the history is deterministic.

    100 TB posture: ONE user_id exchange serves both window passes
    (lag to detect changes, lead/row_number to close intervals —
    same partitioning, Catalyst reuses the shuffle); state per task is
    a one-row lookback, never a per-user buffer. Interval times stay
    exact-integer microseconds (< 2^53, so the hash survives the
    nullable-column float64 round-trip bit-for-bit)."""
    ev = read_events(spark, sf_dir).select(
        "user_id",
        F.expr("ts div 1000").alias("us"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    chg = ev.withColumn("prev_state", F.lag("event_type").over(w)).where(
        F.col("prev_state").isNull()
        | (F.col("prev_state") != F.col("event_type"))
    )
    return (
        chg.select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("us").alias("valid_from_us"),
            F.lead("us").over(w).alias("valid_to_us"),
            F.row_number().over(w).alias("version"),
        )
        .withColumn(
            "is_current", F.col("valid_to_us").isNull().cast("int")
        )
    )


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle — the growth dashboard behind every
    'day-N retention' chart: cohort = the user's first active day,
    and for each (cohort_day, day_offset) cell the count of distinct
    users from that cohort active that day, the cohort size, and the
    retention share in exact ppm (integer division, no float).

    100 TB posture: collapse to DISTINCT (user, day) FIRST (the only
    big shuffle, map-side combined); the cohort day rides a window
    min over the same user partitioning; the final key space is
    days × offsets (tiny) and the cohort-size denominator joins back
    broadcast."""
    ud = (
        read_events(spark, sf_dir)
        .select(
            "user_id",
            F.expr("(ts div 1000) div 86400000000").alias("day_num"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id")
    c = ud.withColumn("cohort_day", F.min("day_num").over(w))
    ret = c.groupBy(
        "cohort_day",
        (F.col("day_num") - F.col("cohort_day")).alias("day_offset"),
    ).agg(F.countDistinct("user_id").alias("retained"))
    # cohort size = the offset-0 cell, pulled via a window over the
    # (tiny) cohort partition — single lineage, no second scan of the
    # event log to rebuild the denominator side
    wc = Window.partitionBy("cohort_day")
    return ret.withColumn(
        "cohort_n",
        F.max(F.when(F.col("day_offset") == 0, F.col("retained"))).over(wc),
    ).select(
        "cohort_day",
        "day_offset",
        "retained",
        "cohort_n",
        F.expr("retained * 1000000 div cohort_n").alias("ppm"),
    )


def events_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank over the event-type transition graph
    (10 power iterations, damping 0.85): ranks live in exact ppm
    integers and every per-edge contribution is a floor division
    ``(r·c) div out``, so the fixed-point is bit-identical across
    engines — the determinism trick that makes an ITERATIVE algorithm
    oracle-checkable at all. Edges come from the same lag-window
    transition pairs as ``events_transition_matrix``.

    100 TB posture: the rank table is O(|node types|) and broadcast
    into each iteration's edge join — the 100 TB edge list shuffles
    ONCE (the pair count), never per iteration; the driver touches
    only the node count (an O(1) scalar). For graphs whose node set
    itself is huge the same loop holds with the rank side hash-
    partitioned instead of broadcast (the CC operator's
    pointer-jumping shows that shape, functions/dedup.py)."""
    ITERS, DAMP_PPM = 10, 850000
    ev = read_events(spark, sf_dir).select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("src"),
        F.col("event_type").alias("dst"),
    ).where(F.col("src").isNotNull())
    edges = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c"))
    edges = edges.localCheckpoint()  # iterate over a settled edge list
    # settle nodes/outd too: they are joined EVERY iteration, and an
    # unsettled lineage would re-scan the event log per iteration
    # (plan-audited: 11 scans before, 0 after)
    nodes = (
        ev.select(F.col("event_type").alias("node"))
        .distinct()
        .localCheckpoint()
    )
    outd = edges.groupBy("src").agg(F.sum("c").alias("outc")).localCheckpoint()
    n_nodes = nodes.count()
    rank = nodes.withColumn(
        "r", F.lit(1000000 // n_nodes).cast("long")
    )
    # teleport share is (1-d)/N so total mass stays ~1e6 ppm (dangling
    # nodes would leak mass; the event-type graph has none)
    base_ppm = (1000000 - DAMP_PPM) // n_nodes
    for _ in range(ITERS):
        acc = (
            edges.join(
                F.broadcast(rank.withColumnRenamed("node", "src")), "src"
            )
            .join(F.broadcast(outd), "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("(r * c) div outc")).alias("acc"))
        )
        rank = nodes.join(
            F.broadcast(acc.withColumnRenamed("dst", "node")), "node", "left"
        ).select(
            "node",
            (
                F.lit(base_ppm)
                + F.expr(f"({DAMP_PPM} * coalesce(acc, 0)) div 1000000")
            ).cast("long").alias("r"),
        )
    return rank


def events_stream_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming transition matrix: a custom applyInPandasWithState
    operator (state = last event type per user) chained into a
    complete-mode pair count — certified by the SAME oracle as the
    batch ``events_transition_matrix``."""
    from .streaming.events import run_transition_stream

    return run_transition_stream(spark, sf_dir)


# ---------------------------------------------------------------------------
# Round 5 breadth batch D: point-in-time feature join, PMI collocations,
# histogram-based global quantile binning.
# ---------------------------------------------------------------------------


def events_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature lookup — the feature-store join
    every training pipeline needs to avoid label leakage: each fact
    (purchase) is enriched with the dimension state (the user's latest
    non-purchase event type) AS OF the purchase instant, never a later
    one. Same-instant dimension updates win over the fact (kind flag
    orders dim rows first inside one timestamp; event_id breaks the
    remaining ties), so the result is deterministic.

    Implemented as the marker-column as-of pattern: dim/fact roles are
    CONDITIONAL COLUMNS on one scan (no self-union, which would scan
    the log twice), and one user-partitioned window carries the last
    non-null state forward (``last(ignorenulls)`` over a running
    frame, evaluated incrementally) — an O(events) single-shuffle
    plan, where the naive interval range-join explodes with fact×state
    density.

    100 TB posture: ONE scan, ONE user_id exchange, rowsBetween
    running state of one value per task; no range join, no broadcast
    of the (huge) dimension history."""
    ev = read_events(spark, sf_dir).select(
        "user_id",
        F.expr("ts div 1000").alias("us"),
        "event_id",
        F.when(F.col("event_type") != "purchase", F.col("event_type"))
        .alias("state"),
        (F.col("event_type") == "purchase").cast("int").alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn(
            "state_asof", F.last("state", ignorenulls=True).over(w)
        )
        .where(F.col("kind") == 1)
        .select("event_id", "user_id", "us", "state_asof")
    )


def events_stream_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-event-type p50/p95/p99 with BOUNDED state: the
    stream state per type is its log-bucket histogram (≤ 512 counter
    pairs over the whole int64 range), merged per micro-batch by
    applyInPandasWithState; bucketing stays JVM-side on the stream.
    The streaming twin of ``events_quantile_sketch``'s estimate
    columns — same integer bucket/representative/ceil-threshold
    formulation, so the batch-shaped DuckDB oracle certifies the
    stream's final rows. See
    streaming/events.py::quantile_sketch_stateful."""
    from .streaming.events import run_quantile_sketch_stream

    return run_quantile_sketch_stream(spark, sf_dir)


# ---------------------------------------------------------------------------
# Round 5 breadth batch E: multi-touch attribution (range frames),
# session path mining, asymmetric containment dedup.
# ---------------------------------------------------------------------------


def events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution — the marketing-analytics twin
    of the last-touch as-of join: every click in the hour BEFORE a
    purchase shares the conversion credit equally (credit_ppm =
    10⁶ div n_touches, exact integer). The touch count per purchase
    comes from a VALUE-RANGE window frame (``rangeBetween`` on exact
    µs over the user partition) — no self-join, no interval explode;
    the frame slides incrementally, so a purchase preceded by a
    million clicks costs a frame update, not a million joined rows.

    100 TB posture: ONE user_id exchange; the range frame holds a
    sliding count, never the rows; purchases with zero touches report
    n_touches=0 / credit NULL (unattributable — kept, so the funnel
    audit sees them)."""
    HORIZON_US = 3600 * 1_000_000
    ev = read_events(spark, sf_dir).select(
        "user_id",
        F.expr("ts div 1000").alias("us"),
        "event_id",
        "event_type",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-HORIZON_US, -1)
    )
    return (
        ev.withColumn(
            "n_touches",
            F.sum(
                (F.col("event_type") == "click").cast("long")
            ).over(w),
        )
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "us",
            F.coalesce("n_touches", F.lit(0)).alias("n_touches"),
            F.expr(
                "CASE WHEN coalesce(n_touches, 0) > 0 "
                "THEN 1000000 div n_touches END"
            ).alias("credit_ppm"),
        )
    )


def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session paths — the flow-mining summary behind every
    'how do users move through the product' dashboard: sessions are
    cut at 30-min gaps (same arithmetic as ``events_sessionize``),
    each session becomes its ordered event-type path string, and the
    most frequent paths are reported with counts. Ties inside one
    timestamp order by event_id; tied path counts order by path text,
    so the top-20 is deterministic.

    100 TB posture: ONE user_id exchange serves the gap window AND the
    session-id running sum (same partitioning); the path build is a
    per-(user, session) sorted collect — bounded by session length,
    the natural unit — and the final count keys on path strings with
    map-side combine. Top-20 is TakeOrderedAndProject."""
    ev = read_events(spark, sf_dir).select(
        "user_id",
        F.expr("ts div 1000").alias("us"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    sess = ev.withColumn(
        "sess_id",
        F.sum((gap > 1800 * 1_000_000).cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).withColumn("sess_id", F.coalesce("sess_id", F.lit(0)))
    paths = sess.groupBy("user_id", "sess_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("us", "event_id", "event_type"))
                ),
                lambda s: s.event_type,
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )


def events_stream_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SCD Type-2 history (applyInPandasWithState per-user
    interval state; closed-beats-open revision resolution) — certified
    by the SAME oracle as the batch ``events_scd2_history``."""
    from .streaming.events import run_scd2_stream

    return run_scd2_stream(spark, sf_dir)


def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase conversion-latency distribution — the funnel
    dashboard's 'how long does conversion take': each purchase takes
    the delta to the user's LATEST prior click (the as-of carry, same
    marker-column window as the point-in-time join) and lands in a
    log₂ second bucket (bucket = length(bin(seconds)) — pure integer
    string length, engine-exact; sub-second deltas land in bucket 1).
    Purchases with no prior click report bucket NULL (unconverted
    traffic stays visible).

    100 TB posture: ONE user exchange; the latency histogram key space
    is ~40 buckets, map-side combined."""
    ev = read_events(spark, sf_dir).select(
        "user_id",
        F.expr("ts div 1000").alias("us"),
        "event_id",
        "event_type",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lat = (
        ev.withColumn(
            "click_us",
            F.last(
                F.when(F.col("event_type") == "click", F.col("us")),
                ignorenulls=True,
            ).over(w),
        )
        .where(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("click_us").isNotNull(),
                F.length(
                    F.bin(
                        F.expr("(us - click_us) div 1000000")
                    )
                ),
            ).alias("bucket_log2s")
        )
    )
    return lat.groupBy("bucket_log2s").agg(
        F.count(F.lit(1)).alias("n_purchases")
    )


def events_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance — the pattern that keeps a
    100 TB dashboard fresh WITHOUT rescanning history: the day×type
    rollup is maintained as old-snapshot ⊎ delta-batch (days ≥ 15 play
    the newly-arrived batch), merged by re-aggregating the tiny union
    of partial aggregates — count and cent-sum are commutative
    monoids, so snapshot + delta is EXACTLY the full recompute (the
    oracle recomputes from scratch; the hash match is the proof).

    100 TB posture: the delta agg scans only the new partition (cf.
    ``partitioned_sink_prune``); the merge re-aggregates
    days×types partial rows — dashboard-sized, not corpus-sized."""
    SPLIT = 15
    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.expr("(ts div 1000) div 86400000000").alias("day_num"),
        F.round(F.col("value") * 100).cast("long").alias("v_c"),
    )
    cut = F.col("day_num") % 30 < SPLIT

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("day_num", "event_type").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v_c").alias("value_c")
        )

    old_snapshot = rollup(ev.where(cut))
    delta = rollup(ev.where(~cut))
    return (
        old_snapshot.unionByName(delta)
        .groupBy("day_num", "event_type")
        .agg(
            F.sum("n").alias("n"), F.sum("value_c").alias("value_c")
        )
    )


def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured property analytics through Spark 4's VARIANT
    type: the JSON ``props`` column is parsed ONCE into a variant
    (``try_parse_json``: malformed records become NULL instead of
    failing the job — binary-encoded, no per-access re-parse — the modern replacement
    for repeated ``get_json_object`` string scans) and typed paths are
    extracted with ``try_variant_get``; per event type the k-range
    histogram stats come out as exact integers. The one surface a
    schema-on-read event lake leans on daily.

    100 TB posture: parse + extract are map-side codegen; the
    aggregate keys on |types| rows. Variant encoding means N path
    extractions cost one parse, not N JSON scans."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.try_parse_json("props").alias("v")
    )
    k = F.try_variant_get(F.col("v"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def events_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed GENERATION — the snapshot diff a warehouse
    publishes so downstreams don't rescan: each user's latest state
    (last event type, ts-tiebreak by event_id) is computed for an OLD
    window (days 0-19) and a NEW window (days 10-29), and the full
    outer join classifies every key as insert (new only), delete
    (old only), or update (state moved); unchanged keys are dropped —
    a CDC feed carries changes, not the world.

    100 TB posture: each snapshot is ONE argbest struct aggregate
    (map-side combined, no window sort); the diff joins two
    user-cardinality aggregates, not event logs."""
    ev0 = read_events(spark, sf_dir).select(
        "user_id",
        F.expr("ts div 1000").alias("us"),
        "event_id",
        "event_type",
        F.expr("(ts div 1000) div 86400000000").alias("day_num"),
    )
    # day offset from the stream head (1-row broadcast, no collect) —
    # an absolute-day modulo would WRAP and put the stream's last day
    # inside both windows
    d0 = ev0.agg(F.min("day_num").alias("d0"))
    ev = ev0.crossJoin(F.broadcast(d0)).withColumn(
        "d", F.col("day_num") - F.col("d0")
    )

    def snapshot(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.max(F.struct("us", "event_id", "event_type")).alias("b")
        ).select("user_id", F.col("b.event_type").alias("state"))

    old = snapshot(ev.where(F.col("d") < 20)).withColumnRenamed(
        "state", "old_state"
    )
    new = snapshot(ev.where(F.col("d") >= 10)).withColumnRenamed(
        "state", "new_state"
    )
    j = old.join(new, "user_id", "full_outer")
    return j.select(
        "user_id",
        "old_state",
        "new_state",
        F.when(F.col("old_state").isNull(), F.lit("insert"))
        .when(F.col("new_state").isNull(), F.lit("delete"))
        .when(F.col("old_state") != F.col("new_state"), F.lit("update"))
        .alias("change"),
    ).where(F.col("change").isNotNull())


def events_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity OLAP aggregate via ROLLUP — (day, type)
    cells, per-day subtotals, and the grand total from ONE pass with
    grouping-set expansion (the surface every BI layer compiles to;
    Spark expands the sets BEFORE the shuffle, so partial aggregation
    still combines map-side). ``gid`` is the grouping bitmask
    (0=cell, 1=day subtotal, 3=grand total), composed identically in
    the DuckDB oracle from GROUPING() bits.

    100 TB posture: one scan, one exchange; output cardinality is
    cells + days + 1."""
    ev = read_events(spark, sf_dir).select(
        F.expr("(ts div 1000) div 86400000000").alias("day_num"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v_c"),
    )
    return ev.rollup("day_num", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_c").alias("value_c"),
        F.grouping_id().alias("gid"),
    )


def events_ab_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic experiment assignment + readout — the A/B
    infrastructure primitive: users hash into 2 arms (seeded md5 mod
    1000 < 500), and the readout reports per-arm exposed users,
    converting users (≥1 purchase), and the conversion rate in exact
    ppm. Assignment is a pure function of (seed, user_id): re-runs,
    backfills, and cross-engine checks all agree — the property that
    makes an experiment auditable.

    100 TB posture: assignment is map-side; the readout is a distinct
    (user, converted) collapse then a 2-row aggregate."""
    ev = _t(spark, sf_dir, "events")
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long") % 1000
    users = (
        ev.select(
            "user_id",
            (F.col("event_type") == "purchase").cast("int").alias("conv"),
        )
        .groupBy("user_id")
        .agg(F.max("conv").alias("converted"))
        .withColumn(
            "arm", F.when(bucket < 500, F.lit("treatment")).otherwise(
                F.lit("control")
            )
        )
    )
    return users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
        F.expr("sum(converted) * 1000000 div count(1)").alias(
            "conv_ppm"
        ),
    )


def events_value_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value percentiles — the ops-dashboard latency/
    amount profile (p50/p95 of the metric per type), computed with the
    reusable exact histogram order-statistics operator: the corpus
    collapses to a (type, cents) count histogram first, so the only
    windows run over DISTINCT cent values per type, never raw events
    (the docs_source_stats scale fix, packaged as the default way to
    answer any percentile question at 100 TB). Exact integers
    throughout — med2 is the doubled median, integral for both
    parities.

    100 TB posture: one map-side-combined histogram shuffle; per-type
    single-task surface = distinct cent values, independent of event
    count."""
    from .functions.profile import exact_order_stats

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v_c")
    )
    return exact_order_stats(ev, ["event_type"], "v_c")


def events_geofence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static GEOFENCE join: which events
    (odd-grid points derived from event_id) fall inside which fence
    polygons (the customer even-grid rectangle layer) — the PBSM
    grid-cell join of functions/spatial.py with the broadcast
    dimension layer of streaming/events.py:geofence_layer. Oracle
    derives truth from the rectangle bounds."""
    from .streaming.events import geofence_layer, geofence_pairs

    return geofence_pairs(
        _t(spark, sf_dir, "events"), geofence_layer(spark, sf_dir)
    )


def events_stream_geofence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static SPATIAL join through Structured Streaming: the
    pre-exploded, ring-parsed fence layer broadcasts into every
    micro-batch; per event = one cell hash probe + exact ray cast;
    STATELESS (append mode, no watermark) so the stream is certified
    by the SAME oracle as the batch events_geofence."""
    from .streaming.events import run_geofence_stream

    return run_geofence_stream(spark, sf_dir)
