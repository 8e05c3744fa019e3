"""sf1 soak harness (VERDICT r5 item 5): run the dedup / similarity /
decontam / repetition families at the ×10 scale step local[32] can
afford, and record per-query wall + stage/shuffle/SPILL/task-time
evidence to ``SOAK_SF1.json`` at the repo root.  ``bench.py`` embeds
that file as the ``sf1_soak`` section of the round's BENCH_DETAIL, so
the driver's own bench run carries the soak evidence.

Usage:  python tools/soak_sf1.py   (after tools/gen_sf1.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF1_DIR = os.path.join(ROOT, ".data", "sf1")

FAMILIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_suite",
    "dedup_clusters",
    "decontaminate",
    "text_repetition",
    "emb_neardup_pairs",
    "semantic_dedup",
    "knn_bruteforce_cosine",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "text_ops_suite",
    # r8: the full corpus-ops battery (sampling/sharding/packing/
    # quantize/classifier/chunking) — packing's applyInPandas and the
    # prefix-sum sharder are the spill-prone shapes worth watching at ×10
    "corpus_ops_suite",
    # relational families over the REAL sf1 fact tables (r6 verdict #8):
    # 10× lineitem/orders with per-replica key ranges — true ×10 shuffles
    "tpc_suite",
    "join_suite",
    "agg_stats",
    "win_suite",
]


def main() -> None:
    from pyspark.sql import SparkSession

    import bench  # stage-metrics probe + calibration, one definition

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from spark_sql_on_hbase_spark.tuning import local_shuffle_confs

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sf1-soak")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "30g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
    )
    # worker-BLAS pins + sort shuffle writer + AQE size-based coalescing
    # + tmpfs scratch — one definition in tuning.local_shuffle_confs
    for _k, _v in local_shuffle_confs().items():
        builder = builder.config(_k, _v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from spark_sql_on_hbase_spark.queries import spark_queries

    qs = spark_queries()
    out = {
        "sf": 1.0,
        "rows": {
            "documents": 50_000,
            "embeddings": 20_000,
            "orders": 1_500_000,
            "lineitem": "10x sf0.1 (~6M)",
        },
        "note": "documents/embeddings at 10x sf0.1 (tools/gen_sf1.py); "
        "lineitem/orders REAL sf1 (10x replication, disjoint per-replica "
        "order-key ranges); dimension tables symlinked sf0.1",
        "calibration_pre": bench._calibration(),
        "queries": {},
    }
    def _one(name: str) -> dict:
        # cold cache per run (same discipline as bench._sweep): a
        # family that persists an intermediate must not leak cached data
        # into later families' memory or its own re-run
        spark.catalog.clearCache()
        before = bench._stage_marker(spark)
        t0 = time.time()
        qs[name](spark, SF1_DIR).write.mode("overwrite").format("noop").save()
        m = bench._stage_totals(spark, since=before) or {}
        m["wall_sec"] = round(time.time() - t0, 2)
        return m

    for name in FAMILIES:
        # min of 2 per family (r10): single-run task time swings 2-3×
        # family-by-family under host contention (the r10 pilot measured
        # tpc_suite 845 vs 466 task-sec across two otherwise idle runs);
        # the min is the plan-shape number, the spread is recorded
        try:
            a, b = _one(name), _one(name)
        except Exception as ex:
            out["queries"][name] = {"error": str(ex)[:300]}
            continue
        m = a if a.get("task_time_sec", 1e18) <= b.get("task_time_sec", 1e18) else b
        m["task_samples"] = [a.get("task_time_sec"), b.get("task_time_sec")]
        out["queries"][name] = m
    # r9 (VERDICT r8 #7): WRITE-path soak — the island-closure pruned
    # DELETE under pending upserts at sf1 (the
    # test_streaming_delete_pruned scenario at ~6M-row scale): build an
    # astro table from sf1 lineitem, append a batch (live-ingest state),
    # then a key-pruned DELETE must rewrite only the intersecting
    # island, never the table
    spark.catalog.clearCache()
    before = bench._stage_marker(spark)
    t0 = time.time()
    try:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from spark_sql_on_hbase_spark.session import AstroSession

        wh = tempfile.mkdtemp(prefix="astro_soak_wh_")
        try:
            astro = AstroSession(spark, wh)
            astro.sql(
                "CREATE TABLE soak_li (ok BIGINT, ln INT, qty DOUBLE, px DOUBLE, "
                "PRIMARY KEY (ok, ln)) MAPPED BY (soak_li_ht, COLS=[qty=f.q, px=f.p]) "
                "OPTIONS(regions=32)"
            )
            li = spark.read.parquet(os.path.join(SF1_DIR, "lineitem.parquet")).select(
                F.col("l_orderkey").cast("bigint").alias("ok"),
                F.col("l_linenumber").cast("int").alias("ln"),
                F.col("l_quantity").cast("double").alias("qty"),
                F.col("l_extendedprice").cast("double").alias("px"),
            )
            rel = astro.relation("soak_li")
            rel.write(li)
            n0 = astro.sql("SELECT count(*) c FROM soak_li").collect()[0].c
            t_load = round(time.time() - t0, 2)
            # pending upserts: append a batch over a NARROW key range, the
            # live-ingest shape, flushed as a couple of fragments (the
            # micro-batch flush size a streaming writer would use) — the
            # delete's island closure must stay local to the overlapped
            # regions, not creep across the table
            rel.append(li.filter(F.col("ok").between(19_000, 23_000)), fragments=2)
            # pruned DELETE under the pending-upsert state; the qty
            # conjunct is RESIDUAL, forcing the island-closure resolved
            # rewrite (the key-only purge would not exercise closure)
            t1 = time.time()
            astro.sql(
                "DELETE FROM soak_li WHERE ok BETWEEN 20000 AND 21000 AND qty >= 0"
            )
            t_del = round(time.time() - t1, 2)
            stats = astro.last_write_stats or {}
            n1 = astro.sql("SELECT count(*) c FROM soak_li").collect()[0].c
            m = bench._stage_totals(spark, since=before) or {}
            m.update(
                {
                    "wall_sec": round(time.time() - t0, 2),
                    "rows_loaded": n0,
                    "rows_after_delete": n1,
                    "load_sec": t_load,
                    "delete_sec": t_del,
                    "del_files_rewritten": stats.get("files_rewritten"),
                    "del_files_total": stats.get("files_total"),
                    "del_history": stats.get("history"),
                }
            )
            out["queries"]["write_ops"] = m
        finally:
            shutil.rmtree(wh, ignore_errors=True)
    except Exception as ex:
        out["queries"]["write_ops"] = {"error": str(ex)[:300]}
    out["calibration_post"] = bench._calibration()
    spills = {
        n: m.get("spill_disk_mb", 0.0)
        for n, m in out["queries"].items()
        if m.get("spill_disk_mb")
    }
    out["spill_summary"] = spills or "zero disk spill across all soak queries"
    # atomic write: a soak killed mid-dump must not leave truncated JSON
    # for bench.py to trip over
    dst = os.path.join(ROOT, "SOAK_SF1.json")
    with open(dst + ".tmp", "w") as f:
        json.dump(out, f, indent=1)
    os.replace(dst + ".tmp", dst)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}, indent=1))
    for n, m in out["queries"].items():
        print(n, json.dumps(m, separators=(",", ":")))


if __name__ == "__main__":
    main()
