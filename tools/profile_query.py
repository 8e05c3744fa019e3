"""Per-query profiling harness for the r15 optimization round.

Usage:
  python tools/profile_query.py <name>[,<name>...] [--branches suite] \
      [--explain-dir plans/r15] [--runs 2] [--suffix _before]

For each named query (or each branch of --branches <suite>) this:
  * builds the SAME session as bench.py (local[$SPARK_GRAFT_CPUS], AQE,
    tuning confs),
  * times the noop-sink materialization (min of --runs),
  * records per-STAGE metrics (task time, shuffle r/w, input, spill)
    from the UI REST API so the cost is attributable to exchanges,
  * writes `.explain("formatted")` (post-AQE re-run of explain on the
    built frame) to --explain-dir/<name><suffix>.txt when set.

Prints one JSON line per query with the evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch_stages(spark, status="complete"):
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    url = f"{ui}/api/v1/applications/{spark.sparkContext.applicationId}/stages?status={status}"
    try:
        return json.load(urllib.request.urlopen(url, timeout=10))
    except Exception:
        return []


def _marker(spark):
    return max((s.get("stageId", -1) for s in _fetch_stages(spark)), default=-1)


def _stages_since(spark, since):
    mb = 1024.0 * 1024.0
    out = []
    for s in _fetch_stages(spark):
        if s.get("stageId", -1) <= since:
            continue
        out.append(
            {
                "id": s.get("stageId"),
                "name": (s.get("name") or "")[:60],
                "tasks": s.get("numCompleteTasks"),
                "task_sec": round(s.get("executorRunTime", 0) / 1000.0, 2),
                "input_mb": round(s.get("inputBytes", 0) / mb, 2),
                "sh_r_mb": round(s.get("shuffleReadBytes", 0) / mb, 2),
                "sh_w_mb": round(s.get("shuffleWriteBytes", 0) / mb, 2),
                "spill_mb": round(s.get("diskBytesSpilled", 0) / mb, 2),
            }
        )
    return sorted(out, key=lambda x: -x["task_sec"])


def build_session():
    from pyspark.sql import SparkSession

    from spark_sql_on_hbase_spark.tuning import local_shuffle_confs

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_query")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "30g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in local_shuffle_confs().items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def warm(spark, sf_dir):
    from pyspark.sql import functions as F

    spark.range(1_000_000).groupBy((F.col("id") % 16).alias("k")).count().write.mode(
        "overwrite"
    ).format("noop").save()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    def _warm(s):
        import numpy as _np
        import pandas as _pd

        return _pd.Series(_np.asarray(s, dtype=_np.float64))

    warm_udf = F.pandas_udf(_warm, "double")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(cpus * 4).repartition(cpus * 4).select(
        warm_udf(F.col("id").cast("double"))
    ).write.mode("overwrite").format("noop").save()


def profile_one(spark, name, make_df, sf_dir, runs, explain_dir, suffix, clear_cache=True):
    best = None
    best_stages = None
    for _ in range(runs):
        if clear_cache:
            spark.catalog.clearCache()
        before = _marker(spark)
        spark.sparkContext.setJobDescription(f"profile: {name}")
        t0 = time.time()
        df = make_df()
        df.write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        stages = _stages_since(spark, before)
        task = round(sum(s["task_sec"] for s in stages), 2)
        if best is None or task < best["task_sec"]:
            best = {"name": name, "wall_sec": round(wall, 2), "task_sec": task}
            best_stages = stages
    best["stages"] = len(best_stages)
    best["sh_r_mb"] = round(sum(s["sh_r_mb"] for s in best_stages), 2)
    best["spill_mb"] = round(sum(s["spill_mb"] for s in best_stages), 2)
    best["top_stages"] = best_stages[:8]
    if explain_dir:
        os.makedirs(explain_dir, exist_ok=True)
        df = make_df()
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(explain_dir, f"{name}{suffix}.txt"), "w") as f:
            f.write(txt)
    return best


def main():
    args = sys.argv[1:]
    names = []
    branches_suite = None
    explain_dir = None
    runs = 2
    suffix = ""
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--branches":
            branches_suite = args[i + 1]
            i += 2
        elif a == "--explain-dir":
            explain_dir = args[i + 1]
            i += 2
        elif a == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif a == "--suffix":
            suffix = args[i + 1]
            i += 2
        else:
            names.extend(x for x in a.split(",") if x)
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session()
    warm(spark, sf_dir)

    results = []
    if branches_suite:
        import bench

        builders = bench._branch_builders()
        build = builders[branches_suite]
        tags = names or None
        # build ONCE (exactly like bench._branch_attribution): the shared
        # spans-frame materialization is a build cost, not branch cost
        spark.catalog.clearCache()
        all_b = build(spark, sf_dir)
        for tag, df in all_b.items():
            if tags and tag not in tags:
                continue

            def mk(d=df):
                return d

            results.append(
                profile_one(
                    spark,
                    f"{branches_suite}.{tag}",
                    mk,
                    sf_dir,
                    runs,
                    explain_dir,
                    suffix,
                    clear_cache=False,
                )
            )
    else:
        from spark_sql_on_hbase_spark.queries import spark_queries

        qs = spark_queries()
        for name in names:
            fn = qs[name]

            def mk(f=fn):
                return f(spark, sf_dir)

            results.append(
                profile_one(spark, name, mk, sf_dir, runs, explain_dir, suffix)
            )
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
