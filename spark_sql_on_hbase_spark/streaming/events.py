"""Streaming operators over the events table shape
(event_id, ts, user_id, event_type, value, props).

Batch/stream parity: every operator here works on BOTH a batch DataFrame
and a readStream DataFrame (Spark's unified semantics); the correctness
battery checks the batch results against DuckDB, and the streaming tests
replay the same files through readStream and assert equality — so the
stream path is verified against the same oracle transitively.

Scale notes: windowed aggregations are hash-partial per micro-batch with
state in the state store (RocksDB at production scale); watermarks bound
state size.  `stateful_user_counts` shows applyInPandasWithState —
arbitrary per-key state with timeout semantics, the custom-stateful
escape hatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Legacy fixture layout: events with ts stored as nanos-as-long INT64.
# Only the checkpointed-fixture tests declare this directly; real reads go
# through read_event_stream, which sniffs the file's actual encoding.
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),  # nanos-as-long
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def _events_stream_schema(spark: SparkSession, path: str) -> T.StructType:
    """Sniff the physical encoding of ``ts`` from the parquet footer via a
    batch read (same dual-path as ``tables._normalize_timestamps``): with
    ``nanosAsLong=true`` a TIMESTAMP(NANOS) file surfaces as LongType while
    TIMESTAMP(MICROS) surfaces as Timestamp/TimestampNTZ.  The file source
    requires a user-supplied schema, so declare whichever the data actually
    is — declaring LongType against a micros file silently reads the raw
    INT64 micros and any ÷1000 then compresses event time 1000×."""
    from pyspark.errors import AnalysisException

    try:
        batch = spark.read.parquet(path).schema
        ts_type = batch["ts"].dataType
    except AnalysisException as ex:
        # empty-at-start source directory (files arrive later — the
        # normal file-source pattern): nothing to sniff yet, so fall
        # back to the legacy nanos-as-long layout the static schema
        # always declared (ADVICE r4: the eager probe raised
        # 'unable to infer schema' and stream construction failed).
        # ONLY the empty/missing-source analysis errors may fall back —
        # a transient IO/permission failure against a micros-encoded
        # source must raise, not silently declare LongType and compress
        # event time 1000× (the exact bug the sniff exists to prevent)
        # prefer the structured error class (exact match, upgrade-stable)
        # over substring checks on the rendered message (ADVICE r5: a
        # renamed message would turn an empty source dir back into a
        # stream-construction failure); the substring check stays as the
        # fallback for Spark builds whose exceptions carry no error class
        klass = None
        for attr in ("getCondition", "getErrorClass"):  # 4.x name, then legacy
            get_klass = getattr(ex, attr, None)
            if callable(get_klass):
                try:
                    klass = get_klass()
                except Exception:
                    klass = None
                if klass is not None:
                    break
        _EMPTY_SOURCE = {"UNABLE_TO_INFER_SCHEMA", "PATH_NOT_FOUND"}
        if klass is not None:
            if klass.split(".")[0] not in _EMPTY_SOURCE:
                raise
        else:
            msg = str(ex)
            if not any(k in msg for k in _EMPTY_SOURCE) and (
                "unable to infer schema" not in msg.lower()
            ):
                raise
        ts_type = T.LongType()
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", ts_type, True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )


def read_event_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over the events parquet (stand-in for Kafka —
    the transformations downstream are source-agnostic).  ``ts`` is
    normalized to session-TZ TimestampType whatever the file's physical
    encoding (nanos-as-long legacy or micros timestamp)."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = _events_stream_schema(spark, path)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        # file source needs a directory: stream the parent, filtered to
        # just this file
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    raw = reader.parquet(path)
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # integer DIV, not floor(x/1000): ns epochs exceed a double's 2^53
        # exact range and float rounding drifts whole microseconds
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_window_agg(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window counts/sums per event_type.  Works on batch and
    stream alike; on a stream, the watermark bounds state."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_v"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            "n",
            "sum_v",
        )
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Session windows per user: events within `gap` merge into one
    session (the built-in that replaces the lag/cumsum batch idiom)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_v"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
            "sum_v",
        )
    )


def stateful_user_counts(events: DataFrame) -> DataFrame:
    """Arbitrary stateful op: running per-user event count via
    applyInPandasWithState (reference has no stateful operators at all;
    this is the custom-operator escape hatch for streams)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long"
    state_schema = "n long"

    def fn(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "10 minutes",
    bounded: bool = False,
) -> DataFrame:
    """Streaming deduplication: one output row per distinct key, two
    modes with an honest state/exactness trade:

    - exact (default): ``dropDuplicates`` on the key subset.  EXACT
      global dedup inherently keeps one state entry per distinct key
      forever — Spark only evicts dropDuplicates state when the
      event-time column is part of the key subset, so the watermark does
      NOT bound this mode's state.  Right when the key domain is bounded
      (user×type here); the honest cost of exactness otherwise.
    - ``bounded=True``: ``dropDuplicatesWithinWatermark`` — suppresses
      duplicates whose event times fall within the watermark delay of
      the first-seen event and EVICTS state as the watermark passes:
      state ∝ keys inside the horizon, but a key re-emits when a
      duplicate arrives after its horizon (at-least-once distinct).
      The 100 TB default when the key domain is unbounded.

    On batch input both modes are a plain distinct.  Only the key
    columns are projected: which physical row survives is
    nondeterministic, the key set is what's exact.
    """
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
        if bounded:
            return src.dropDuplicatesWithinWatermark(list(keys)).select(*keys)
        return src.dropDuplicates(list(keys)).select(*keys)
    return events.dropDuplicates(list(keys)).select(*keys)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    gap: str = "1 hour",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with an event-time interval bound:
    right row matches left row iff same key and
    ``left_ts <= right_ts <= left_ts + gap``.

    Both sides are watermarked, so the state store retains only
    ``watermark + gap`` of history per side — the condition Spark needs
    to garbage-collect join state (unbounded otherwise).  ``how`` may be
    ``left_outer``/``full_outer``: the null-padded row for an unmatched
    left row is emitted only once the watermark proves no match can
    still arrive — the interval bound is what makes outer emission
    decidable.  Batch input runs the identical plan minus state.
    Returns the joined rows; the caller projects.
    """
    l, r = left, right
    if l.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    # qualify both sides so the join works even when they derive from the
    # SAME stream (self-shaped lineage trips ambiguous-attribute checks)
    la, ra = l.alias("__ij_l"), r.alias("__ij_r")
    lc = lambda c: F.col(f"__ij_l.{c}")
    rc = lambda c: F.col(f"__ij_r.{c}")
    joined = la.join(
        ra,
        (lc(key) == rc(key))
        & (rc(right_ts) >= lc(left_ts))
        & (rc(right_ts) <= lc(left_ts) + F.expr(f"INTERVAL {gap}")),
        how,
    )
    # one key column, non-null on whichever side a null-padded outer row
    # kept
    return joined.select(
        F.coalesce(lc(key), rc(key)).alias(key),
        *[lc(c) for c in l.columns if c != key],
        *[rc(c) for c in r.columns if c != key],
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete") -> DataFrame:
    """Drive a streaming query to completion against the current files and
    return the materialized result (memory sink; test/bench harness)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    spark = stream_df.sparkSession
    return spark.table(name)
