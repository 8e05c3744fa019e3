"""Unified query registry — the engine's judged surface.

Merges the relational battery (queries_relational), the LLM-pipeline
operators (queries_pipeline), and the Astro table-format demonstrations
(queries_astro).  ``__spark_entry__.py`` exposes exactly this registry to
the driver.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_sql_on_hbase_spark.queries_relational import RELATIONAL, Q
from spark_sql_on_hbase_spark.tables import load_tables


def _collect() -> dict[str, Q]:
    merged: dict[str, Q] = {}
    merged.update(RELATIONAL)
    try:
        from spark_sql_on_hbase_spark.queries_pipeline import PIPELINE

        for k, v in PIPELINE.items():
            assert k not in merged, f"duplicate query name {k}"
            merged[k] = v
    except ImportError:
        pass
    try:
        from spark_sql_on_hbase_spark.queries_astro import ASTRO

        for k, v in ASTRO.items():
            assert k not in merged, f"duplicate query name {k}"
            merged[k] = v
    except ImportError:
        pass
    try:
        from spark_sql_on_hbase_spark.queries_streaming import STREAMING

        for k, v in STREAMING.items():
            assert k not in merged, f"duplicate query name {k}"
            merged[k] = v
    except ImportError:
        pass
    return merged


def registry() -> dict[str, Q]:
    return _collect()


def _make_runner(q: Q) -> Callable[[SparkSession, str], DataFrame]:
    if callable(q.spark):
        return q.spark

    sql_text = q.spark

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_tables(spark, sf_dir)
        return spark.sql(sql_text)

    return run


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """name → (spark, sf_dir) → DataFrame, for __spark_entry__.queries()."""
    return {name: _make_runner(q) for name, q in registry().items()}


def oracle_queries() -> dict[str, str]:
    """name → DuckDB SQL, for __spark_entry__.oracle_sql()."""
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
