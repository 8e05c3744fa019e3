"""Streaming query surface for the correctness gate.

`streaming_tumbling_counts` runs a REAL readStream (file source,
availableNow trigger) to completion and returns the materialized memory-
sink table — the DuckDB oracle checks it against the equivalent batch
SQL, proving stream/batch parity through the driver's gate.
`session_window_agg` exercises the session_window operator (batch mode —
identical code path to the streaming variant, minus the watermark).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_sql_on_hbase_spark.queries_relational import Q
from spark_sql_on_hbase_spark.tables import load_tables

_MEMSINK_SEQ = [0]


def _streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_on_hbase_spark.streaming import read_event_stream, run_to_memory, tumbling_window_agg

    _MEMSINK_SEQ[0] += 1
    stream = read_event_stream(spark, os.path.join(sf_dir, "events.parquet"))
    return run_to_memory(tumbling_window_agg(stream), f"q_stream_tumbling_{_MEMSINK_SEQ[0]}")


STREAMING: dict[str, Q] = {}

STREAMING["streaming_tumbling_counts"] = Q(
    spark=_streaming_tumbling,
    oracle="""
    SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS bucket_start,
           event_type, count(*) AS n, round(sum(value), 2) AS sum_v
    FROM events GROUP BY 1, 2
    """,
    doc="real Structured Streaming run (file source, availableNow, memory sink) vs batch oracle",
)


def _streaming_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_on_hbase_spark.streaming import read_event_stream, run_to_memory, stateful_user_counts

    _MEMSINK_SEQ[0] += 1
    stream = read_event_stream(spark, os.path.join(sf_dir, "events.parquet"))
    return run_to_memory(
        stateful_user_counts(stream), f"q_stream_stateful_{_MEMSINK_SEQ[0]}", output_mode="update"
    )


STREAMING["streaming_stateful_counts"] = Q(
    spark=_streaming_stateful,
    oracle="SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id",
    doc="applyInPandasWithState arbitrary stateful op (update mode, one availableNow "
    "batch → per-user totals equal the batch aggregate)",
)


def _streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_on_hbase_spark.streaming import (
        dedup_within_watermark,
        read_event_stream,
        run_to_memory,
    )

    _MEMSINK_SEQ[0] += 1
    stream = read_event_stream(spark, os.path.join(sf_dir, "events.parquet"))
    return run_to_memory(
        dedup_within_watermark(stream),
        f"q_stream_dedup_{_MEMSINK_SEQ[0]}",
        output_mode="append",
    )


STREAMING["streaming_dedup"] = Q(
    spark=_streaming_dedup,
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    doc="exact streaming dedup on a real stream (append mode, availableNow; "
    "state is one entry per distinct key — the honest cost of exactness); "
    "key set equals the batch DISTINCT.  The bounded-state variant "
    "(dropDuplicatesWithinWatermark) is dedup_within_watermark(bounded=True), "
    "pytest-covered",
)


def _streaming_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_on_hbase_spark.streaming import (
        read_event_stream,
        run_to_memory,
        stream_interval_join,
    )

    _MEMSINK_SEQ[0] += 1
    path = os.path.join(sf_dir, "events.parquet")
    clicks = (
        read_event_stream(spark, path)
        .filter(F.col("event_type") == "click")
        .select("user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("l_ts"))
    )
    purchases = (
        read_event_stream(spark, path)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("r_ts"))
    )
    joined = stream_interval_join(clicks, purchases, gap="1 hour").select(
        "user_id",
        "click_id",
        "purchase_id",
        F.floor((F.unix_micros("r_ts") - F.unix_micros("l_ts")) / F.lit(1000000))
        .cast("bigint")
        .alias("gap_sec"),
    )
    return run_to_memory(joined, f"q_stream_join_{_MEMSINK_SEQ[0]}", output_mode="append")


STREAMING["streaming_join"] = Q(
    spark=_streaming_join,
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS gap_sec
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '1 hour'
    """,
    doc="stream-stream inner join with event-time interval bound (both sides "
    "watermarked -> bounded join state); purchase within 1h after click",
)


def _session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_on_hbase_spark.streaming import session_window_agg

    t = load_tables(spark, sf_dir)
    return session_window_agg(t["events"], gap="30 minutes")


STREAMING["session_window_agg"] = Q(
    spark=_session_window,
    oracle="""
    WITH g AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), s AS (
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM g
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_v
    FROM s GROUP BY user_id, sess_id
    """,
    doc="session_window gap-merge aggregation (30 min gap; lag/cumsum batch-idiom oracle)",
)


def _streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming run of the custom stateful sessionizer: under
    availableNow the emitted set is deterministic — exactly the sessions
    whose close horizon (last event + gap) the final watermark
    (max ts - delay) has passed — so a full value oracle exists even for
    this non-declarative operator."""
    from spark_sql_on_hbase_spark.streaming import (
        read_event_stream,
        run_to_memory,
        sessionize_stateful,
    )

    _MEMSINK_SEQ[0] += 1
    stream = read_event_stream(spark, os.path.join(sf_dir, "events.parquet"))
    out = run_to_memory(
        sessionize_stateful(stream, gap="30 minutes", watermark="10 minutes"),
        f"q_stream_sessionize_{_MEMSINK_SEQ[0]}",
        output_mode="append",
    )
    return out.select(
        "user_id",
        F.unix_timestamp("session_start").alias("session_start"),
        F.unix_timestamp("session_end").alias("session_end"),
        "n_events",
        "sum_v",
    )


STREAMING["streaming_sessionize"] = Q(
    spark=_streaming_sessionize,
    oracle="""
    WITH g AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), s AS (
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM g
    ), sess AS (
      SELECT user_id, min(ts) AS t0, max(ts) AS t1,
             count(*) AS n_events, round(sum(value), 2) AS sum_v
      FROM s GROUP BY user_id, sess_id
    ), wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events)
    SELECT user_id,
           CAST(floor(epoch(t0)) AS BIGINT) AS session_start,
           CAST(floor(epoch(t1)) AS BIGINT) AS session_end,
           n_events, sum_v
    FROM sess, wm
    WHERE t1 + INTERVAL 30 MINUTE < w
    """,
    doc="custom stateful sessionization (applyInPandasWithState, event-time "
    "timeout close) run as a REAL stream; the availableNow emitted set is "
    "deterministic (close horizon behind the final watermark), so even "
    "this non-declarative operator gets a full DuckDB value oracle",
)
