"""Size-bounded shard assignment + manifest writer for training export.

The last step of a training-data pipeline is rarely "a parquet
directory" — trainers want a deterministic sequence of roughly
equal-size shards (WebDataset/TFRecord style) plus a manifest the data
loader can index.  The core primitive is a GLOBAL running byte total in
a fixed document order, which naively is a single-partition window —
the one shape that cannot scale.

``assign_shards`` computes it the scalable way (the textbook
distributed prefix sum):

1. ONE approx-quantile pass fixes range-bucket boundaries, frozen as
   plan LITERALS — so every downstream job buckets rows identically
   (``repartitionByRange`` would re-sample bounds per job, and the
   offsets pass and the assignment pass could silently disagree);
2. ONE tiny per-bucket aggregate (#buckets rows) is collected and
   turned into per-bucket starting offsets on the driver — O(1000)
   numbers for a 1000-executor job, not data;
3. each bucket independently adds its offset to its local running
   sum — an intra-bucket window, embarrassingly parallel.

``shard_id = (cum_bytes - row_bytes) / target`` — i.e. a row starts a
new shard when the bytes BEFORE it cross the target — which makes every
shard ≤ target + max_row_bytes and the assignment identical to the
single-partition window (the DuckDB oracle computes exactly that).

The reference engine has no export surface; this is beyond-reference
pipeline functionality (brief: training-data ops).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_sql_on_hbase_spark.functions.localdf import local_rows_df

from spark_sql_on_hbase_spark.functions.text import hash60


def assign_shards(
    df: DataFrame,
    order_col: str,
    bytes_col: str,
    target_bytes: int,
    out_col: str = "shard_id",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Add ``out_col``: the 0-based shard index of each row under a
    global cumulative-bytes cut at ``target_bytes``, ordered by
    ``order_col`` (numeric; ``tiebreak_col`` makes the order total when
    ``order_col`` alone is not unique — e.g. a hash key)."""
    assert target_bytes > 0
    spark = df.sparkSession
    n_buckets = spark.sparkContext.defaultParallelism
    # stage 1: freeze range boundaries as literals — deterministic
    # bucketing shared verbatim by the offsets pass and the final pass
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(df.stat.approxQuantile(order_col, probs, 0.001)))
    if bounds:
        bucket = F.size(
            F.filter(
                F.array(*[F.lit(b) for b in bounds]),
                lambda b: b < F.col(order_col).cast("double"),
            )
        )
    else:
        bucket = F.lit(0)
    with_pid = df.withColumn("__pid", bucket)
    # stage 2: tiny driver-side collect — one (bucket, total) row per
    # bucket, NOT data; offsets[b] = Σ totals of lower buckets
    parts = (
        with_pid.groupBy("__pid")
        .agg(F.sum(bytes_col).cast("long").alias("__total"))
        .collect()
    )
    parts.sort(key=lambda r: r["__pid"])
    offsets, acc = {}, 0
    for r in parts:
        offsets[r["__pid"]] = acc
        acc += r["__total"]
    off_df = F.broadcast(
        local_rows_df(
            spark,
            [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)],
            "__pid int, __offset long",
        )
    )
    # stage 3: intra-bucket running sum + frozen offset — the window
    # partitions by bucket, so the sort is per-bucket, never global
    order_cols = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    # explicit ROWS frame: the default RANGE frame includes ORDER-BY
    # peers, so duplicate order keys would double-count each other's
    # bytes in the running sum and silently shift shard boundaries
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(bytes_col)).over(w) + F.col("__offset")
    return (
        with_pid.join(off_df, "__pid", "left")
        .withColumn("__offset", F.coalesce("__offset", F.lit(0)))
        .withColumn("__before", (cum - F.col(bytes_col)).cast("long"))
        # `div`: exact integer floor division (a double `/` could round
        # x.999… up across a shard boundary)
        .withColumn(out_col, F.expr(f"__before div {int(target_bytes)}"))
        .drop("__pid", "__offset", "__before")
    )


def write_shards(
    df: DataFrame,
    path: str,
    order_col: str,
    bytes_col: str,
    target_bytes: int,
) -> dict:
    """Export ``df`` as size-bounded parquet shards + a JSON manifest.

    Shards land under ``path/shard_id=N/``; the manifest records per-
    shard row counts and byte totals (the data-loader's index) plus the
    cut parameters so a re-run can verify the layout.  Returns the
    manifest dict."""
    sharded = assign_shards(df, order_col, bytes_col, target_bytes)
    sharded.write.mode("overwrite").partitionBy("shard_id").parquet(path)
    back = df.sparkSession.read.parquet(path)
    stats = (
        back.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(bytes_col).cast("long").alias("bytes"),
            F.min(order_col).alias("first_key"),
            F.max(order_col).alias("last_key"),
        )
        .orderBy("shard_id")
        .collect()
    )
    manifest = {
        "target_bytes": int(target_bytes),
        "order_col": order_col,
        "bytes_col": bytes_col,
        "num_shards": len(stats),
        "shards": [
            {
                "shard_id": int(r["shard_id"]),
                "rows": int(r["rows"]),
                "bytes": int(r["bytes"]),
                "first_key": r["first_key"],
                "last_key": r["last_key"],
            }
            for r in stats
        ],
    }
    with open(os.path.join(path, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def global_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    out_col: str = "shuffle_rank",
) -> DataFrame:
    """Deterministic, reproducible global shuffle order for training.

    Every row gets a 0-based global rank under the order of
    ``hash60(seed ⊕ id)`` — a seeded permutation that is identical
    across re-runs and resumable mid-epoch (the trainer seeks to a
    rank), unlike ``orderBy(rand())``.  Changing ``seed`` yields an
    independent epoch order.

    Computed with the same two-phase distributed prefix sum as
    :func:`assign_shards` (bytes ≡ 1, target = 1 → the cumulative count
    BEFORE each row IS its rank): frozen quantile buckets over the hash
    key, per-bucket offsets, intra-bucket window — never a global
    single-partition sort.  Hash ties (60-bit; ~n²/2⁶¹) fall back to id
    order, keeping the permutation total and deterministic.
    """
    sk = hash60(
        F.concat_ws("\x1f", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    ranked = assign_shards(
        df.withColumn("__sk", sk).withColumn("__one", F.lit(1)),
        "__sk",
        "__one",
        1,
        out_col=out_col,
        tiebreak_col=id_col,
    )
    return ranked.drop("__sk", "__one")
