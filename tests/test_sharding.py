"""Size-bounded shard assignment + manifest export (operators/sharding.py).

The distributed two-phase prefix sum must reproduce the naive global
window exactly, for any bucket boundaries — the suite oracle pins it at
sf scale; these tests pin the edge shapes.
"""

import json

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_sql_on_hbase_spark.operators.sharding import assign_shards, write_shards


def _naive(df, order_col, bytes_col, target):
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(
        "want",
        ((F.sum(bytes_col).over(w) - F.col(bytes_col)) / target).cast("long"),
    )


@pytest.mark.parametrize("target", [10, 100, 1_000_000])
def test_assign_shards_matches_global_window(spark, target):
    rows = [(i, 7 + (i * 13) % 50) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "nbytes"])
    got = assign_shards(df, "doc_id", "nbytes", target)
    joined = got.join(_naive(df, "doc_id", "nbytes", target), "doc_id")
    assert joined.filter(F.col("shard_id") != F.col("want")).count() == 0


def test_assign_shards_size_bound(spark):
    rows = [(i, 10 + (i * 7) % 30) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "nbytes"])
    out = assign_shards(df, "doc_id", "nbytes", 200)
    stats = out.groupBy("shard_id").agg(F.sum("nbytes").alias("b")).collect()
    # every shard ≤ target + max_row_bytes; every shard but the last > target
    assert all(r["b"] <= 200 + 39 for r in stats)
    last = max(r["shard_id"] for r in stats)
    assert all(r["b"] > 200 - 39 for r in stats if r["shard_id"] != last)


def test_write_shards_manifest(spark, tmp_path):
    rows = [(i, 20) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "nbytes"])
    path = str(tmp_path / "shards")
    manifest = write_shards(df, path, "doc_id", "nbytes", 400)
    # 100 rows * 20B / 400B target = 5 exact shards of 20 rows
    assert manifest["num_shards"] == 5
    assert all(s["rows"] == 20 and s["bytes"] == 400 for s in manifest["shards"])
    # shards tile the key space in order, no overlap
    for a, b in zip(manifest["shards"], manifest["shards"][1:]):
        assert a["last_key"] < b["first_key"]
    on_disk = json.load(open(f"{path}/_MANIFEST.json"))
    assert on_disk == manifest
    back = spark.read.parquet(path)
    assert back.count() == 100


def test_global_shuffle_is_deterministic_permutation(spark):
    from spark_sql_on_hbase_spark.operators.sharding import global_shuffle

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    out1 = {r.doc_id: r.shuffle_rank for r in global_shuffle(df, "doc_id", seed=1).collect()}
    out2 = {r.doc_id: r.shuffle_rank for r in global_shuffle(df, "doc_id", seed=1).collect()}
    assert out1 == out2  # reproducible across runs
    assert sorted(out1.values()) == list(range(500))  # a true permutation
    assert out1 != {i: i for i in range(500)}  # actually shuffled
    other = {r.doc_id: r.shuffle_rank for r in global_shuffle(df, "doc_id", seed=2).collect()}
    assert other != out1  # seeds give independent epoch orders
    assert sorted(other.values()) == list(range(500))


def test_assign_shards_duplicate_order_keys_rows_frame(spark):
    """Duplicate order keys must not double-count peers' bytes (the
    default RANGE window frame would put every tied row in the last
    shard); the explicit ROWS frame yields even target-sized shards."""
    from spark_sql_on_hbase_spark.operators.sharding import assign_shards

    df = spark.createDataFrame([(5, 10)] * 100, "k long, nbytes long")
    out = assign_shards(df, "k", "nbytes", target_bytes=100)
    sizes = sorted(
        r.n for r in out.groupBy("shard_id").agg(F.count("*").alias("n")).collect()
    )
    assert sizes == [10] * 10
