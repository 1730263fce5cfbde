"""Structured Streaming: the streaming tumbling aggregation must equal
the batch form of the same transformation (exactly-once file source)."""

from __future__ import annotations

from conftest import SF_SMOKE

from soil_data_development_tools___arcmap_spark.queries import (
    events_tumbling_daily,
    read_events,
)
from soil_data_development_tools___arcmap_spark.streaming.events import (
    run_stream_to_table,
    tumbling_daily,
)


def test_stream_equals_batch(spark):
    batch = {
        (r["day_num"], r["event_type"]): (r["n"], r["value_c"])
        for r in events_tumbling_daily(spark, SF_SMOKE).collect()
    }
    stream = {
        (r["day_num"], r["event_type"]): (r["n"], r["value_c"])
        for r in run_stream_to_table(spark, SF_SMOKE).collect()
    }
    assert batch == stream and len(batch) > 0


def test_watermarked_plan_builds(spark):
    # watermarked variant analyzes and keeps the event_time watermark
    df = tumbling_daily(read_events(spark, SF_SMOKE), with_watermark=True)
    assert "day_num" in df.columns
    assert df.count() > 0


def test_stateful_sessionize_equals_batch(spark):
    from soil_data_development_tools___arcmap_spark.queries import events_sessionize
    from soil_data_development_tools___arcmap_spark.streaming.events import (
        run_sessionize_stream,
    )

    batch = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in events_sessionize(spark, SF_SMOKE).collect()
    }
    stream = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in run_sessionize_stream(spark, SF_SMOKE).collect()
    }
    assert batch == stream and len(batch) > 0
