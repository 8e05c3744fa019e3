"""Test/bench table loading: the driver-provided TPC-H-ish parquet tables.

`load_tables(spark, sf_dir)` registers every table as a temp view so both
the SQL and DataFrame paths see the same catalog names the DuckDB oracle
uses.  Reads are plain `spark.read.parquet` — columnar scan, predicate
pushdown and column pruning come from Catalyst for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# driver parquet quirks: events.ts is TIMESTAMP(NANOS) which Spark's reader
# rejects unless spark.sql.legacy.parquet.nanosAsLong=true (then it arrives
# as a LongType of nanoseconds); orders/lineitem timestamps arrive as
# TIMESTAMP_NTZ.  Normalize everything to session-TZ TimestampType (session
# TZ is pinned UTC) so timestamp literals and unix_timestamp() behave
# identically to the DuckDB oracle.
_TS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def _normalize_timestamps(name: str, df: DataFrame) -> DataFrame:
    for col in _TS_COLS.get(name, ()):
        dt = df.schema[col].dataType
        if isinstance(dt, T.LongType):  # nanos-as-long
            # integer DIV, not floor(x/1000): ns epochs (~1.7e18) exceed
            # a double's 2^53 exact-integer range, and the float rounding
            # drifts the result by whole microseconds vs DuckDB's exact
            # ns→µs truncation
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


# per-session plan cache: building the 10 DataFrames costs ~10 schema
# round-trips to the JVM (~0.8 s measured) and every battery query calls
# load_tables — uncached, that overhead dominated wall time over actual
# task time at small SF.  The parquet inputs are immutable driver data,
# so the logical plans are safely reusable; views are re-pointed when
# the same session switches sf_dir.  The cache hangs off the session
# OBJECT (not a module global): its lifetime is exactly the session's —
# a global registry would pin every session forever, since each cached
# DataFrame strongly references its session (even weak KEYS can't evict
# when the values point back at the keys).
_CACHE_ATTR = "_astro_driver_table_cache"


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register all driver tables as temp views; returns name → DataFrame.

    CONTRACT (ADVICE r5): the parquet under ``sf_dir`` is assumed
    immutable for the session's lifetime — the cache pins each dir's
    DataFrames (and their file-index snapshots), so regenerating inputs
    in-place mid-session leaves cached plans reading stale/missing files.
    Regenerate into a NEW directory (the driver's sf-dir-per-scale layout
    does exactly this), or call :func:`invalidate_tables` after an
    in-place rewrite.  External ``createOrReplaceTempView``/
    ``dropTempView`` calls on these names likewise desync ``active`` —
    route view changes through this module."""
    sf_dir = os.path.abspath(sf_dir)
    state = getattr(spark, _CACHE_ATTR, None)
    if state is None:
        state = {"dirs": {}, "active": None}
        setattr(spark, _CACHE_ATTR, state)
    out = state["dirs"].get(sf_dir)
    if out is None:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        out = {}
        for name in TABLES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            out[name] = _normalize_timestamps(name, spark.read.parquet(path))
        state["dirs"][sf_dir] = out
        state["active"] = None  # force (re-)registration below
    if state["active"] != sf_dir:
        for name, df in out.items():
            df.createOrReplaceTempView(name)
        state["active"] = sf_dir
    return out


def invalidate_tables(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Drop cached plans for ``sf_dir`` (or all dirs) after an in-place
    rewrite of the parquet inputs; the next load_tables re-reads footers
    and re-registers views."""
    state = getattr(spark, _CACHE_ATTR, None)
    if state is None:
        return
    if sf_dir is None:
        state["dirs"].clear()
    else:
        state["dirs"].pop(os.path.abspath(sf_dir), None)
    state["active"] = None
