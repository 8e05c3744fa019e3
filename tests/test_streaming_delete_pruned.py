"""r8: the r7 verdict's headline scenario end-to-end — a table under
continuous streaming ingest (unmerged upsert fragments pending
auto-compaction) takes a key-pruned DELETE as a PARTIAL rewrite, not the
full-table rewrite every such DELETE cost in r7; ingest continues
afterwards and the final state is exact.
"""

import os

import pytest

from spark_sql_on_hbase_spark.session import AstroSession
from spark_sql_on_hbase_spark.streaming.sink import write_stream_to_table


def _stage(spark, d, name, rows):
    df = spark.createDataFrame(rows, "k long, t string, v double")
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, name))


def _ingest(spark, staging, rel, ckpt):
    stream = (
        spark.readStream.schema("k long, t string, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(staging, "*"))
    )
    q = write_stream_to_table(stream, rel, ckpt)
    q.awaitTermination(300)


def test_pruned_delete_between_streaming_epochs(spark, tmp_path):
    astro = AstroSession(spark, str(tmp_path / "wh"))
    astro.sql(
        "CREATE TABLE st (k LONG, t STRING, v DOUBLE, PRIMARY KEY (k)) "
        "MAPPED BY (hst, COLS=[t=f.t, v=f.v]) OPTIONS (regions=4)"
    )
    rel = astro.relation("st")
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")

    # epoch 1: base corpus; epoch 2: upsert overlay on keys 50..60 —
    # overlapping generations pending compaction (the streaming state)
    _stage(spark, staging, "b1", [(k, f"t{k}", float(k)) for k in range(1, 101)])
    _ingest(spark, staging, rel, ckpt)
    _stage(
        spark, staging, "b2", [(k, f"u{k}", k + 0.5) for k in range(50, 61)]
    )
    _ingest(spark, staging, astro.relation("st"), ckpt)
    rel = astro.relation("st")
    assert rel.needs_merge()
    n_frag = len(rel.meta.regions)

    # the r7 scale-killer: a key-pruned DELETE on this state was a
    # full-table rewrite; r8's island closure keeps it partial
    astro.sql("DELETE FROM st WHERE k = 55")
    stats = astro.last_write_stats
    assert stats["files_total"] == n_frag
    assert 0 < stats["files_rewritten"] < n_frag

    assert astro.sql("SELECT count(*) AS c FROM st").collect()[0].c == 99
    # untouched upserted keys still resolve to their NEWEST version
    r = astro.sql("SELECT t, v FROM st WHERE k = 60").collect()[0]
    assert (r.t, r.v) == ("u60", 60.5)
    # the rewritten island resolved its survivors exactly too
    r = astro.sql("SELECT t, v FROM st WHERE k = 54").collect()[0]
    assert (r.t, r.v) == ("u54", 54.5)

    # ingest keeps flowing after the partial rewrite
    _stage(spark, staging, "b3", [(k, f"n{k}", float(k)) for k in range(200, 211)])
    _ingest(spark, staging, astro.relation("st"), ckpt)
    assert astro.sql("SELECT count(*) AS c FROM st").collect()[0].c == 110
    # compaction folds everything back to the shuffle-free path
    astro.sql("COMPACT TABLE st")
    rel = astro.relation("st")
    assert not rel.needs_merge()
    assert astro.sql("SELECT count(*) AS c FROM st").collect()[0].c == 110
