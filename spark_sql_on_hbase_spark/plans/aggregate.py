"""One-phase (shuffle-free) aggregation for row-key-prefix group-bys.

Parity target: the reference's special Aggregate strategy
(HBaseStrategies.scala:42-60 + guard ``canBeAggregatedForAll`` /
``distinguishedForGroupKeys`` :87-173): when the GROUP BY columns are a
prefix of the row key AND region boundaries separate all groups, plan a
single aggregate per region with **no Exchange**.

Spark-first realization (SURVEY §7 step 5 option a): tables written with
``align_prefix`` are REAL Spark bucketed+sorted tables on a materialized
``_region`` id (relation.py — region ids mined so bucket order == key
order; the files are still range regions and CPR pruning is untouched).
The bucketed scan reports ``HashPartitioning(_region)``, so

    spark.table(t).groupBy(_region, *prefix).agg(...)

satisfies the aggregation's ClusteredDistribution and EnsureRequirements
plans it with ZERO Exchange — the entire fold stays in JVM whole-stage
codegen hash aggregation (no Python, no Arrow transfer).  Grouping by
``(_region, prefix)`` equals grouping by ``prefix`` exactly when no
prefix group spans two regions — the guard below, the same condition the
reference checks against HBase region boundaries.  ``_region`` is
dropped from the output.

When the guard fails (unaligned table, pending upserts, non-prefix
group), fall back to the normal 2-phase ``groupBy`` — like the
reference's kill switch (``spark.sql.hbase.aggregate.onephase`` analog
via the ``one_phase`` parameter; HBaseSQLConf.scala:43-44).  Note the
2-phase plan is already partial-agg local: the exchange moves one row
per (partition, group), not row data.

Wrong-guard = silent wrong results (SURVEY known-hard #3), so
tests/test_onephase_agg.py fuzzes one-phase vs 2-phase equality.

Scale: the whole point.  A key-prefix group-by over 100 TB becomes an
embarrassingly parallel per-region JVM fold — no shuffle, no AQE skew
handling needed, result size = #groups.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_sql_on_hbase_spark.relation import REGION_COL, AstroRelation

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


def _agg_exprs(aggs: list[AggSpec]):
    """Identical output schema on both paths: count→BIGINT, sum/avg→DOUBLE,
    min/max keep the column type."""
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
    return exprs


def _one_phase(rel: AstroRelation, group_cols: list[str], aggs: list[AggSpec]) -> DataFrame:
    tbl = rel.ensure_spark_table()
    df = rel.spark.table(tbl)
    # Map-side Projects preserve the bucketed scan's output partitioning:
    # ALTER-ADDed columns absent from the files read as NULL (absent-cell
    # semantics, HBaseRelation.scala:885-901); stringformat values cast
    # back to their declared types (schema-on-read).
    from spark_sql_on_hbase_spark.catalog import STRING_FORMAT
    from spark_sql_on_hbase_spark.relation import spark_type

    present = set(df.columns)
    cols = [F.col(REGION_COL)]
    for c, dt in rel.meta.all_columns:
        t = spark_type(dt)
        if c not in present:
            cols.append(F.lit(None).cast(t).alias(c))
        elif rel.meta.encoding == STRING_FORMAT:
            cols.append(F.col(c).cast(t).alias(c))
        else:
            cols.append(F.col(c))
    df = df.select(*cols)
    out = df.groupBy(REGION_COL, *group_cols).agg(*_agg_exprs(aggs))
    return out.select(*group_cols, *[a.out for a in aggs])


def _two_phase(rel: AstroRelation, group_cols: list[str], aggs: list[AggSpec]) -> DataFrame:
    return rel.scan().groupBy(*group_cols).agg(*_agg_exprs(aggs))


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
    guard = is_prefix and rel.meta.layout == "bucketed" and prefix_groups_separated(rel, k)
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
