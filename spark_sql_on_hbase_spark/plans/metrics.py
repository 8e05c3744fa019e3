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
    if "FileSourceScan" in node.getClass().getSimpleName():
        out.append(node)
    ch = node.children()
    for i in range(ch.length()):
        out.extend(_find_scans(ch.apply(i)))
    if not out:
        try:  # AdaptiveSparkPlanExec wraps the real tree
            out.extend(_find_scans(node.executedPlan()))
        except Exception:
            pass
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
        try:
            n += s.metrics().apply("numOutputRows").value()
        except Exception:
            pass
    return rows, n
