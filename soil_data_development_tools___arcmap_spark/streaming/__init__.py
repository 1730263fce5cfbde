from .events import (  # noqa: F401
    EVENTS_SCHEMA,
    read_events_stream,
    tumbling_daily,
    run_stream_to_table,
)
