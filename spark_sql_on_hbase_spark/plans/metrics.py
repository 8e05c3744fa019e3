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


def _find_scans(node, _seen=None):
    # _seen guards reuse nodes: ReusedExchangeExec.child() / a reused
    # QueryStageExec point at instances also reachable elsewhere in the
    # tree — without identity dedup a shared scan under a self-join
    # would be counted (and its metric summed) twice
    if _seen is None:
        _seen = set()
    nid = node.id()
    if nid in _seen:
        return []
    _seen.add(nid)
    out = []
    name = node.getClass().getSimpleName()
    if "FileSourceScan" in name:
        out.append(node)
    ch = node.children()
    for i in range(ch.length()):
        out.extend(_find_scans(ch.apply(i), _seen))
    # wrapper nodes whose real subtree is not in children() (ADVICE r2:
    # descend unconditionally or scans get undercounted).  Gated by class
    # name: py4j would happily "find" child() on unary nodes too, and that
    # would double-count the children() traversal above.
    if name == "AdaptiveSparkPlanExec":
        out.extend(_find_scans(node.executedPlan(), _seen))
    elif name.endswith("QueryStageExec"):
        out.extend(_find_scans(node.plan(), _seen))
    elif name == "ReusedExchangeExec":
        out.extend(_find_scans(node.child(), _seen))
    return out


def scan_partition_files(df: DataFrame, path_substr: str) -> tuple[int, int]:
    """(partitions read, files read) for the FileSourceScan whose root
    path contains ``path_substr``, from the executed plan's partition
    listing (``selectedPartitions`` reflects partition pruning — the
    observable for a ``partitionBy`` layout like the IVF inverted lists,
    where probing nprobe of K lists must touch only those directories).
    Execute the DataFrame first (e.g. noop write); raises if no scan
    matches."""
    for s in _find_scans(df._jdf.queryExecution().executedPlan()):
        paths = s.relation().location().rootPaths().mkString(",")
        if path_substr in paths:
            sel = s.selectedPartitions()
            return sel.partitionCount(), sel.totalNumberOfFiles()
    raise ValueError(f"no FileSourceScan matching {path_substr!r} in executed plan")


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
