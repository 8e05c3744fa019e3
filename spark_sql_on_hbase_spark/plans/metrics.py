"""Executed-plan metric probes for plan-shape / IO assertions.

The reference asserts scan-side effects with checkResult(df,
containExchange, n) and per-filter row counts (HBaseCFTestSuite.scala);
here the equivalent hard signal is the FileSourceScan's numOutputRows
metric, which counts rows surviving parquet row-group + page-index
skipping (i.e. the rows actually materialized from storage) — the
observable for the skip-scan layout (relation.py PAGE_ROW_LIMIT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _find_scans(node):
    out = []
    name = node.getClass().getSimpleName()
    if "FileSourceScan" in name:
        out.append(node)
    ch = node.children()
    for i in range(ch.length()):
        out.extend(_find_scans(ch.apply(i)))
    # wrapper nodes whose real subtree is not in children() (ADVICE r2:
    # descend unconditionally or scans get undercounted).  Gated by class
    # name: py4j would happily "find" child() on unary nodes too, and that
    # would double-count the children() traversal above.
    if name == "AdaptiveSparkPlanExec":
        out.extend(_find_scans(node.executedPlan()))
    elif name.endswith("QueryStageExec"):
        out.extend(_find_scans(node.plan()))
    elif name == "ReusedExchangeExec":
        out.extend(_find_scans(node.child()))
    return out


def collect_with_scan_rows(df: DataFrame) -> tuple[list, int]:
    """Run the query; return (rows, total FileSourceScan output rows).

    Scan output rows < table rows proves storage-level skipping (row
    groups / pages pruned by the pushed predicate), independent of the
    Filter above the scan.
    """
    rows = df.collect()
    scans = _find_scans(df._jdf.queryExecution().executedPlan())
    n = 0
    for s in scans:
        # only a genuinely missing metric is ignorable; anything else
        # (py4j failure, renamed metric) should surface, not silently
        # weaken the IO assertions built on this probe
        if s.metrics().contains("numOutputRows"):
            n += s.metrics().apply("numOutputRows").value()
    return rows, n
