"""Driver-local small-DataFrame constructor.

``spark.createDataFrame(rows, schema)`` parallelizes the rows into
``defaultParallelism`` slices — on ``local[32]`` a 2-row broadcast rate
table becomes a 32-task stage where every task launches (or claims) a
Python worker for a fraction of a row.  Measured on the corpus-ops
bench: the stratified-sample branch spent 27 executor-task-seconds in
that one stage (~850 ms per task, zero input bytes).  At cluster scale
the same shape wastes a scheduler round trip and an executor-core
reservation per slice.

``local_rows_df`` pins such row lists to ONE slice: one task, one
Python worker, identical semantics.  Use it for every driver-side
literal table (rate maps, probe rows, param sidecars) — NOT for data
that is actually large, which should never originate on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["local_rows_df"]


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    rows = list(rows)
    if not rows:
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
