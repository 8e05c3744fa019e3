"""One-phase (shuffle-free) aggregation for row-key-prefix group-bys.

Parity target: the reference's special Aggregate strategy
(HBaseStrategies.scala:42-60 + guard ``canBeAggregatedForAll`` /
``distinguishedForGroupKeys`` :87-173): when the GROUP BY columns are a
prefix of the row key AND region boundaries separate all groups, plan a
single partial aggregate per region with **no Exchange**.

Spark-first realization (SURVEY §7 step 5 option b): the guard checks the
catalog's file bounds (decoded key tuples instead of the reference's
byte-level split check with its 0x00-terminator subtlety — same decision,
no byte arithmetic); when it passes, each region file becomes one input
partition (``spark.sql.files.maxPartitionBytes`` raised so files never
split) and an Arrow-batched ``mapInPandas`` folds each partition's groups
locally — zero shuffle, O(groups-per-region) memory.  When the guard
fails, fall back to the normal 2-phase ``groupBy`` — like the reference's
kill switch (``spark.sql.hbase.aggregate.onephase`` analog via the
``one_phase`` parameter; HBaseSQLConf.scala:43-44).

Wrong-guard = silent wrong results (SURVEY known-hard #3), so
tests/test_onephase_agg.py fuzzes one-phase vs 2-phase equality.

Scale: the whole point.  A key-prefix group-by over 100 TB becomes an
embarrassingly parallel per-region fold — no shuffle of 100 TB, no AQE
skew handling needed, result size = #groups.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_sql_on_hbase_spark.relation import AstroRelation, spark_type

_SUPPORTED = {"count", "sum", "min", "max", "avg"}


@dataclass(frozen=True)
class AggSpec:
    out: str
    op: str  # count|sum|min|max|avg
    col: str | None = None  # None only for count


def prefix_groups_separated(rel: AstroRelation, k: int) -> bool:
    """Guard: no key-prefix group (first k key cols) spans two region files.

    Mirrors distinguishedForGroupKeys' boundary check
    (HBaseStrategies.scala:102-127) on decoded tuples: adjacent files must
    not share a prefix value.
    """
    if rel.needs_merge():
        # unresolved upserts: the merged scan re-shuffles by rowkey hash,
        # so per-file group locality no longer holds — 2-phase required
        return False
    regions = sorted(rel.meta.regions, key=lambda r: r.min_rowkey_hex)
    if not regions:
        return False
    for a, b in zip(regions, regions[1:]):
        if list(a.max_key[:k]) == list(b.min_key[:k]):
            return False
    return True


def _one_phase(rel: AstroRelation, group_cols: list[str], aggs: list[AggSpec]) -> DataFrame:
    spark = rel.spark
    # a region file must never split across input partitions; packing
    # multiple whole files into one partition is harmless (groups still
    # don't straddle partitions)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 40))

    in_cols = list(dict.fromkeys(group_cols + [a.col for a in aggs if a.col]))
    df = rel.scan().select(*in_cols)

    out_fields = [T.StructField(c, spark_type(rel.meta.column_type(c)), True) for c in group_cols]
    for a in aggs:
        if a.op == "count":
            out_fields.append(T.StructField(a.out, T.LongType(), False))
        elif a.op in ("sum", "avg"):
            out_fields.append(T.StructField(a.out, T.DoubleType(), True))
        else:  # min/max keep column type
            out_fields.append(T.StructField(a.out, spark_type(rel.meta.column_type(a.col)), True))
    out_schema = T.StructType(out_fields)
    agg_list = list(aggs)
    gcols = list(group_cols)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, list] = {}
        # state per group: [count, {i: partial per agg}]
        for pdf in batches:
            for key, sub in pdf.groupby(gcols, sort=False, dropna=False):
                if not isinstance(key, tuple):
                    key = (key,)
                st = acc.get(key)
                if st is None:
                    st = [0, [None] * len(agg_list)]
                    acc[key] = st
                st[0] += len(sub)
                for i, a in enumerate(agg_list):
                    if a.op == "count":
                        st[1][i] = (st[1][i] or 0) + len(sub)
                        continue
                    s = sub[a.col].dropna()
                    if s.empty:
                        continue
                    if a.op == "sum":
                        st[1][i] = (st[1][i] or 0.0) + float(s.sum())
                    elif a.op == "avg":
                        prev = st[1][i] or (0.0, 0)
                        st[1][i] = (prev[0] + float(s.sum()), prev[1] + len(s))
                    elif a.op == "min":
                        m = s.min()
                        st[1][i] = m if st[1][i] is None else min(st[1][i], m)
                    elif a.op == "max":
                        m = s.max()
                        st[1][i] = m if st[1][i] is None else max(st[1][i], m)
        rows = []
        for key, st in acc.items():
            row = list(key)
            for i, a in enumerate(agg_list):
                v = st[1][i]
                if a.op == "avg":
                    row.append(v[0] / v[1] if v and v[1] else None)
                else:
                    row.append(v)
            rows.append(row)
        yield pd.DataFrame(rows, columns=[f.name for f in out_fields])

    return df.mapInPandas(fold, out_schema)


def _two_phase(rel: AstroRelation, group_cols: list[str], aggs: list[AggSpec]) -> DataFrame:
    exprs = []
    for a in aggs:
        if a.op == "count":
            exprs.append(F.count("*").alias(a.out))
        elif a.op == "sum":
            exprs.append(F.sum(F.col(a.col).cast("double")).alias(a.out))
        elif a.op == "avg":
            exprs.append(F.avg(F.col(a.col).cast("double")).alias(a.out))
        elif a.op == "min":
            exprs.append(F.min(a.col).alias(a.out))
        elif a.op == "max":
            exprs.append(F.max(a.col).alias(a.out))
    return rel.scan().groupBy(*group_cols).agg(*exprs)


def agg_by_key_prefix(
    rel: AstroRelation,
    group_cols: list[str],
    aggs: list[AggSpec],
    one_phase: bool | None = None,
) -> tuple[DataFrame, bool]:
    """GROUP BY a row-key prefix.  Returns (df, used_one_phase).

    one_phase: None = automatic (guard decides); False = kill switch
    (always 2-phase); True = force (caller asserts the guard holds —
    still verified, ValueError if not, because a wrong guard silently
    corrupts results).
    """
    for a in aggs:
        if a.op not in _SUPPORTED:
            raise ValueError(f"unsupported agg op {a.op}")
    key_names = rel.meta.key_names
    k = len(group_cols)
    is_prefix = group_cols == key_names[:k]
    guard = is_prefix and prefix_groups_separated(rel, k)
    if one_phase is True and not guard:
        raise ValueError("one_phase forced but guard fails (groups span regions)")
    if one_phase is False or not guard:
        return _two_phase(rel, group_cols, aggs), False
    return _one_phase(rel, group_cols, aggs), True


def executed_plan(df: DataFrame) -> str:
    """Physical plan string — for Exchange-free plan-shape assertions
    (reference checkResult(df, containExchange, n),
    HBaseAdditionalQuerySuite.scala:288-296)."""
    return df._jdf.queryExecution().executedPlan().toString()
