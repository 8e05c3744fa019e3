"""Pluggable sources/sinks.

``astro_source`` exposes Astro tables through the standard PySpark
DataSource API (``spark.read.format("astro")`` /
``df.write.format("astro")``) for interop with code that does not use
AstroSession.  The primary scan path remains ``AstroRelation.scan`` —
a direct Catalyst parquet plan (vectorized reader, codegen) that is
strictly faster than any Python data source; this source exists for API
parity with the reference's ``sqlContext.read.format(...)`` entry point
(HBaseRelation.scala:40-78, SURVEY §3.2).
"""

from spark_sql_on_hbase_spark.sources.astro_source import AstroDataSource, register

__all__ = ["AstroDataSource", "register"]
