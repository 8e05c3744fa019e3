"""spark_sql_on_hbase_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of Huawei-Spark/Spark-SQL-on-HBase
("Astro"), re-expressed Spark-first.

The reference (see /root/reference, surveyed in SURVEY.md) extends Spark
SQL 1.4 with an HBase-backed table format: composite binary row keys,
region-ranged storage, multi-dimensional partition pruning ("critical
points"), predicate pushdown, and a shuffle-free aggregation strategy for
row-key-prefix group-bys.  This package models the same data model on
Spark-native storage: an order-preserving row-key codec, sorted
range-partitioned parquet "region" files with recorded key bounds, a
Python critical-point pruning planner over those bounds, and DataFrame /
Catalyst execution for the entire relational surface.

Layout
------
- ``codec``       order-preserving binary row-key codec (bytesUtils/HBaseKVHelper parity)
- ``catalog``     JSON metastore of Astro tables (HBaseCatalog parity)
- ``ddl``         DDL/DML grammar: CREATE TABLE ... MAPPED BY, LOAD DATA, INSERT VALUES ...
- ``relation``    the table format itself: write sorted region files, scan with pruning
- ``predicate``   predicate IR + parser + classifier (ScanPredClassifier parity)
- ``pruning``     multi-dimensional critical-point range pruning (HBaseCriticalPoint parity)
- ``session``     AstroSession: `.sql()` entry point routing DDL vs queries
- ``plans/``      custom physical strategies (shuffle-free key-prefix aggregation)
- ``operators/``  LLM-data-pipeline operators: dedup, similarity search, text analysis,
                  multimodal columns
- ``functions/``  helper column functions (vector math, text metrics)
- ``sources/``    readers/writers (CSV bulk load, parquet regions, JSON)
- ``streaming/``  Structured Streaming surface (windowed aggs, stateful ops)
"""

from spark_sql_on_hbase_spark.version import __version__

__all__ = ["__version__"]
