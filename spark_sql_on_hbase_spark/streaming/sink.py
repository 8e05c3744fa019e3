"""Streaming sink: writeStream into an Astro table.

The reference has no streaming surface (SURVEY §2.2 "absent from
reference") — this is part of the modern-Spark extension the engine
exposes.  Semantics map exactly onto the storage model: every micro-batch
appends one sorted LSM fragment at the next sequence number (the HBase
memstore-flush analog, see relation.append), so streaming upserts get the
same newest-cell-wins resolution as batch INSERTs, and `compact()`
periodically restores the shuffle-free scan path.

Scale: each micro-batch pays one range shuffle of just that batch; state
never accumulates on the driver.  Checkpointing is Spark's own
(exactly-once per micro-batch into the fragment directory; the fragment
write is idempotent per epoch because mode="append" files are named by
task attempt — rerun batches produce duplicate keys that the LSM merge
resolves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from spark_sql_on_hbase_spark.relation import AstroRelation


def write_stream_to_table(
    stream_df: DataFrame,
    relation: AstroRelation,
    checkpoint_dir: str,
    *,
    trigger_available_now: bool = True,
    compact_every_batches: int | None = None,
) -> StreamingQuery:
    """Append a streaming DataFrame into an Astro table via foreachBatch.

    ``compact_every_batches=N`` runs ``relation.compact()`` after every
    N-th micro-batch to bound fragment count (HBase minor-compaction
    analog).
    """

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        relation.append(batch_df)
        if compact_every_batches and (epoch_id + 1) % compact_every_batches == 0:
            relation.compact()

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
