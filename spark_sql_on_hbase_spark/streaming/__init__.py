"""Structured Streaming surface.

The reference has no streaming at all (SURVEY §2.2 "absent from
reference": no watermark/stateful ops) — this package is part of the
beyond-reference surface modern Spark adds: windowed aggregations with
watermarks, session windows, arbitrary stateful processing, and
exactly-once-style sinks via foreachBatch.
"""

from spark_sql_on_hbase_spark.streaming.events import (
    dedup_within_watermark,
    read_event_stream,
    run_to_memory,
    session_window_agg,
    stateful_user_counts,
    stream_interval_join,
    tumbling_window_agg,
)
from spark_sql_on_hbase_spark.streaming.changes_source import (
    changes_exactly_once_sink,
    ensure_changes_sink,
    init_offset,
    load_offset,
    stream_changes,
)
from spark_sql_on_hbase_spark.streaming.sessions import sessionize_stateful
from spark_sql_on_hbase_spark.streaming.sink import write_stream_to_table

__all__ = [
    "changes_exactly_once_sink",
    "dedup_within_watermark",
    "ensure_changes_sink",
    "init_offset",
    "load_offset",
    "stream_changes",
    "read_event_stream",
    "run_to_memory",
    "session_window_agg",
    "sessionize_stateful",
    "stateful_user_counts",
    "stream_interval_join",
    "tumbling_window_agg",
    "write_stream_to_table",
]
