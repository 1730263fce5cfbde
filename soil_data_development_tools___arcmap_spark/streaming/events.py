"""Structured Streaming ingestion of the events table.

The reference is strictly batch (SURVEY §2.9); this is net-new,
north-star surface. The same transformation runs in batch and
streaming — ``tumbling_daily(df)`` is used by the batch query
``events_tumbling_daily`` AND by ``run_stream_to_table`` under a
file-source readStream, so the correctness oracle for the batch form
certifies the streaming form (exactly-once file source + deterministic
agg ⇒ identical results at availableNow completion).

Timestamps: ``ts`` is integer nanoseconds (see queries.read_events);
day = µs // 86_400_000_000 keeps everything in exact integer space.
At scale, the file source becomes Kafka and the watermark bounds
state: ``with_watermark=True`` derives an event-time column and a
1-day watermark so late data older than a day is dropped instead of
growing state forever.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # ns since epoch (nanosAsLong)
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

US_PER_DAY = 86_400_000_000


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The file source only accepts directories; sf_dir mixes all tables
    # in one dir, so expose just the events file through a symlink dir
    # (zero-copy; in production the source is a real directory/Kafka).
    src = os.path.abspath(f"{sf_dir}/events.parquet")
    # Per-process private dir (mkdtemp, mode 0700) rather than a
    # predictable path under the shared tmp dir — no pre-creation
    # hijack, no stale symlink if sf_dir moves between sessions.
    cache = getattr(read_events_stream, "_dirs", None)
    if cache is None:
        cache = read_events_stream._dirs = {}
    stream_dir = cache.get(src)
    if stream_dir is None or not os.path.isdir(stream_dir):
        stream_dir = tempfile.mkdtemp(prefix="sddt_events_stream_")
        os.symlink(src, os.path.join(stream_dir, "events.parquet"))
        cache[src] = stream_dir
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(stream_dir)


def tumbling_daily(events: DataFrame, with_watermark: bool = False) -> DataFrame:
    """Tumbling 1-day window per event_type: count + exact cent sum.
    Works identically over a batch or streaming DataFrame."""
    df = events.withColumn("day_num", F.expr("(ts div 1000) div 86400000000"))
    if with_watermark:
        df = df.withColumn(
            "event_time", F.timestamp_micros(F.expr("ts div 1000"))
        ).withWatermark("event_time", "1 day")
    return df.groupBy("day_num", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_c"),
    )


def sessionize_stateful(spark: SparkSession, sf_dir: str, gap_min: int = 30) -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization via
    ``applyInPandasWithState`` (the arbitrary-state API — the batch
    window/lag形 can't run incrementally). State per user =
    (n_sessions, n_events, last_ts); a new session opens when the gap
    to the previous event exceeds ``gap_min``.

    Semantics match the batch ``events_sessionize`` query exactly
    (same oracle certifies both): events are processed in
    (ts, event_id) order within the batch. In production, a watermark
    + event-time ordering guard would handle cross-batch late data;
    with the availableNow file source all rows arrive in one batch.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_min * 60 * 1_000_000
    ev = read_events_stream(spark, sf_dir).select(
        "user_id", F.expr("ts div 1000").alias("ts_us"), "event_id"
    )

    def fn(key, pdfs, state):
        n_sess, n_ev, last = state.get if state.exists else (0, 0, None)
        rows = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
        for ts in rows["ts_us"]:
            if last is None or ts - last > gap_us:
                n_sess += 1
            n_ev += 1
            last = int(ts)
        state.update((n_sess, n_ev, last))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sess], "n_events": [n_ev]}
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_sessions long, n_events long",
        stateStructType="n_sessions long, n_events long, last_ts long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful sessionization to completion and return the
    final per-user table (update-mode memory sink; the single
    availableNow batch yields one row per user)."""
    name = "events_sess_" + uuid.uuid4().hex[:8]
    q = (
        sessionize_stateful(spark, sf_dir)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_stream_to_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the streaming tumbling aggregation to completion
    (availableNow + memory sink) and return the result table."""
    name = "events_stream_" + uuid.uuid4().hex[:8]
    q = (
        tumbling_daily(read_events_stream(spark, sf_dir))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
