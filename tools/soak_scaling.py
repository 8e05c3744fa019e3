"""Super-linear-scale regression check (r10, VERDICT r9 #4).

The sf1 soak proves zero spill but cannot catch a GENTLE quadratic tail
— a family whose task time grows like N^1.3 looks healthy at one scale
point.  This one-off measures the top task-time families at TWO scale
points — the sf1 soak dataset (50k docs / 20k vectors) and a 3× variant
(150k docs / 60k vectors, same generator and distributional shape) —
and records the per-family scaling exponent

    exponent = log(task_3x / task_1x) / log(3)

to ``SOAK_SCALING.json`` at the repo root.  ``bench.py`` embeds the file
in the round's BENCH_DETAIL and surfaces a ``scale_flags`` count in the
compact line when any family's PRIMARY-signal ratio exceeds FLAG_RATIO
× the data ratio (i.e. exponent > 1 + log(FLAG_FACTOR)/log(3)).

Primary signal (r14, VERDICT r13 #1): task time for every family except
``semantic_dedup``, whose primary signal is the exact candidate-pair
VOLUME (Σ C(cell,2) from K rows of assignment metadata) — the
structural quantity the gate exists to catch; its task time stays
recorded as an advisory.  Rationale: task = pairs × per-pair kernel
cost, and the per-pair cost is constant, so task-time motion without
pair-volume motion is host noise by construction (r12/r13 measured
2-4× same-code spread under recorded load 10-15).

The acceptance bar (README §bench gates): task-time growth ≤ ~1.3× the
data ratio (ratio ≤ 3.9 at 3×); families above 1.5× (ratio > 4.5) are
FLAGGED.  Task time — not wall — because wall at local[32] saturates on
parallelism noise long before plan shape shows.

Fact tables are symlinked from sf1 (the measured families are the
document/embedding pipelines; the TPC families already soak at a true
×10 in soak_sf1.py).

Usage:  python tools/soak_scaling.py [family ...]   (after tools/gen_sf1.py)
        With families named, ONLY those are re-measured (serialized,
        quiet host) and merged into the existing SOAK_SCALING.json;
        flag_count is recomputed over the merged set.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF1_DIR = os.path.join(ROOT, ".data", "sf1")
SF3_DIR = os.path.join(ROOT, ".data", "sf3docs")
SCALE = 3
FLAG_FACTOR = 1.5  # task ratio > FLAG_FACTOR × data ratio → flag
# r15 (VERDICT r14 #5): min-of-3 silently reports the lucky tail when
# the three samples of one point spread wildly (r14 text_ops_suite:
# [1303, 493, 1242] — 2.6×).  A family whose within-point max/min
# sample ratio exceeds this is marked measurement_unstable: its
# exponent is recorded as ADVISORY and excluded from flag_count, and
# the file carries unstable_count so the round reads as "needs
# re-measurement", never "settled".
SPREAD_UNSTABLE = 1.8
# r15 (ADVICE r14 medium): semantic_dedup's pair-volume gate assumes
# per-pair kernel cost is constant — true only while the kernel is
# unchanged.  A plan regression that inflates per-pair cost (e.g.
# re-shipping vectors per pair) moves task time WITHOUT moving pair
# volume; this looser task-time backstop (2.5× the data ratio, i.e.
# ratio > 7.5 at 3× — above the 2-4× same-code host spread measured
# r12-r14, below a genuine quadratic's 9×) keeps that class flaggable
# instead of advisory-only.
TASK_LOOSE_FACTOR = 2.5


def _sample_spread(samples) -> float | None:
    """max/min ratio of one point's task-time samples (None when
    unavailable or degenerate)."""
    if not samples:
        return None
    lo, hi = min(samples), max(samples)
    return round(hi / lo, 2) if lo > 0 else None


def _apply_stability(entry: dict, flag_from_samples: bool = True) -> dict:
    """Annotate a family entry with per-point sample spreads and the
    measurement_unstable verdict (pure — tests feed synthetic samples).
    An unstable family's SAMPLE-derived flag moves to flag_advisory and
    its flagged_superlinear is cleared so flag_count only counts
    SETTLED flags; unstable_count carries the not-settled families.
    ``flag_from_samples=False`` (a structural flag, e.g. pair volume
    computed from assignment metadata) keeps the flag — host noise in
    the timing samples cannot launder a structural regression."""
    s1 = _sample_spread(entry.get("task_samples_1x"))
    s3 = _sample_spread(entry.get("task_samples_3x"))
    entry["sample_spread_1x"] = s1
    entry["sample_spread_3x"] = s3
    spreads = [s for s in (s1, s3) if s is not None]
    unstable = bool(spreads) and max(spreads) > SPREAD_UNSTABLE
    entry["measurement_unstable"] = unstable
    if unstable:
        entry["gating"] = (
            "within-point sample spread "
            f"{max(spreads)}x > {SPREAD_UNSTABLE}x — min-of-N would "
            "report the lucky tail; re-measure on a quiet host"
        )
        if flag_from_samples:
            entry["flag_advisory"] = entry.get("flagged_superlinear", False)
            entry["flagged_superlinear"] = False
            entry["gating"] = "excluded (" + entry["gating"] + ")"
    return entry

# the top task-time families of the r9 bench audit, all document/
# embedding-driven so the 3× documents+embeddings step scales their
# actual input (the TPC families scale in soak_sf1.py instead)
FAMILIES = [
    "text_ops_suite",
    "corpus_ops_suite",
    "text_repetition",
    "decontaminate",
    "dedup_minhash_lsh",
]

# semantic_dedup's scaling CONTRACT is a parameter rule, not a fixed
# plan: within-cluster pair volume is Θ((N/K)²·K), so K = n_clusters
# must grow ∝ N (the r9 knee study's 100 TB guidance in its docstring).
# Measuring the graded entry's FIXED K=16 at 3× data measures the
# mis-parameterization (exponent ≈ 2 — recorded below as evidence the
# gate detects it), so the FLAGGED measurement for this family follows
# the rule: K scaled 3× at the 3× point.  Both runs are recorded.
SEMDEDUP_K = 16

# emb_neardup's scaling CONTRACT is likewise a parameter rule (r12 —
# this soak found the fixed-(r,b) quadratic): banded-LSH background
# candidates are Θ(b·N²/2^r), so r grows ~log2(N) with b re-derived to
# hold the S-curve midpoint at the threshold (tune_lsh_params(n=...),
# the operator docstring's 100 TB guidance).  The flagged measurement
# follows the rule at both points; the fixed-param 3× run is recorded
# as evidence of what the rule prevents.
NEARDUP_N1 = 20_000  # gen_sf1.N_VECS


def _route_estimate(spark, sf_dir: str, n: int) -> float:
    """The operator's own cluster-collapse estimate for this corpus —
    recorded so the soak shows WHY the routed plan engaged."""
    from spark_sql_on_hbase_spark.operators.similarity import (
        estimate_lsh_candidates_per_doc,
        tune_lsh_params,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    bits, bands = tune_lsh_params(0.9, n=n)
    return estimate_lsh_candidates_per_doc(emb, bits, bands, n=n)


def _neardup_scaled(n):
    def q(spark, sf_dir):
        from spark_sql_on_hbase_spark.operators.similarity import (
            neardup_pairs_lsh,
            tune_lsh_params,
        )

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        bits, bands = tune_lsh_params(0.9, n=n)
        return neardup_pairs_lsh(emb, threshold=0.9, bits=bits, bands=bands)

    return q


def _semantic_pair_volume(spark) -> dict:
    """Exact within-cell candidate-pair volume Σ C(cell, 2) at both
    scale points under the K ∝ N rule — the verifiable plan-shape fact
    behind semantic_dedup's timing (K rows of metadata per point)."""
    from spark_sql_on_hbase_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
    )

    try:
        vols = {}
        for tag, d, k in (
            ("pairs_1x", SF1_DIR, SEMDEDUP_K),
            ("pairs_3x", SF3_DIR, SCALE * SEMDEDUP_K),
        ):
            emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
            cent = ivf_centroids(emb, k)
            sizes = ivf_assign(emb, cent).groupBy("cluster_id").count().collect()
            vols[tag] = int(sum(r["count"] * (r["count"] - 1) // 2 for r in sizes))
        r = vols["pairs_3x"] / max(1, vols["pairs_1x"])
        vols["ratio"] = round(r, 2)
        vols["exponent"] = round(math.log(r) / math.log(SCALE), 3)
        return vols
    except Exception as ex:  # evidence only — never kills the soak
        return {"error": str(ex)[:200]}


def _semantic_dedup_scaled(k):
    def q(spark, sf_dir):
        from spark_sql_on_hbase_spark.operators.similarity import semantic_dedup

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        return semantic_dedup(emb, n_clusters=k, threshold=0.35)

    return q


def ensure_sf3() -> None:
    if os.path.exists(os.path.join(SF3_DIR, "documents.parquet")):
        return
    import numpy as np
    import pyarrow.parquet as pq

    import tools.gen_sf1 as g

    os.makedirs(SF3_DIR, exist_ok=True)
    rng = np.random.default_rng(g.SEED + 3)
    pq.write_table(
        g.gen_documents(rng, n_docs=SCALE * g.N_DOCS),
        os.path.join(SF3_DIR, "documents.parquet"),
    )
    pq.write_table(
        g.gen_embeddings(rng, n_vecs=SCALE * g.N_VECS),
        os.path.join(SF3_DIR, "embeddings.parquet"),
    )
    for t in ["region", "nation", "customer", "supplier", "part", "events",
              "orders", "lineitem"]:
        dst = os.path.join(SF3_DIR, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF1_DIR, f"{t}.parquet"), dst)


class _Skip(Exception):
    """Control-flow marker: family not selected by the argv subset."""


def main() -> None:
    from pyspark.sql import SparkSession

    import bench  # stage-metrics probe + calibration, one definition

    ensure_sf3()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from spark_sql_on_hbase_spark.tuning import local_shuffle_confs

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scaling-soak")
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

    def _one(q, sf_dir: str) -> dict:
        spark.catalog.clearCache()
        before = bench._stage_marker(spark)
        t0 = time.time()
        q(spark, sf_dir).write.mode("overwrite").format("noop").save()
        m = bench._stage_totals(spark, since=before) or {}
        m["wall_sec"] = round(time.time() - t0, 2)
        return m

    def run_q(q, sf_dir: str, runs: int = 2) -> dict:
        # min of N per point (bench's discipline, default 2): one host
        # spike on one point would otherwise fabricate — or mask — an
        # exponent.  The param-rule families pass runs=3: their absolute
        # task times sit near the per-job overhead floor where 2 samples
        # proved insufficient (r12 — a 4x swing between same-code runs)
        #
        # r16 (VERDICT r15 #4/#5): ONE DISCARDED WARM-UP run per point —
        # five families stayed advisory-unstable in r15 purely from
        # in-session JIT/codegen warm-up (samples decreasing
        # monotonically, e.g. text_ops 509.9 → 216.5 → 118.5); the
        # stability gate correctly refused to bless a min-of-N under
        # that spread.  The warm-up executes the SAME plan so the
        # measured samples all run against compiled codegen classes,
        # which is also the steady state of a long-lived cluster.
        _one(q, sf_dir)
        ms = [_one(q, sf_dir) for _ in range(runs)]
        best = min(ms, key=lambda m: m.get("task_time_sec", m["wall_sec"]))
        best["task_samples"] = [
            m.get("task_time_sec", m["wall_sec"]) for m in ms
        ]
        return best

    def run(name: str, sf_dir: str) -> dict:
        # r13: 3 samples for the generic families too — this round's
        # first pass measured a 2.5× WITHIN-point spread on an unchanged
        # operator (text_repetition [38.9, 15.3] / [86.5, 206.0]) under
        # double-digit host load with no local process; min-of-2 is not
        # robust to that steal profile
        return run_q(qs[name], sf_dir, runs=3)

    # r14: an argv family subset re-measures ONLY those families and
    # merges into the existing SOAK_SCALING.json — the serialized
    # quiet-host re-run the r13 adjudication called for doesn't have to
    # pay for the five already-green families
    only = set(sys.argv[1:]) or None

    def want(name: str) -> bool:
        return only is None or name in only

    out = {
        "scale_ratio": SCALE,
        "flag_factor": FLAG_FACTOR,
        "rows_1x": {"documents": 50_000, "embeddings": 20_000},
        "rows_3x": {"documents": 150_000, "embeddings": 60_000},
        "note": "per-family scaling between the sf1 soak dataset and a "
        "3x same-shape variant; exponent ~1 = linear, 2 = quadratic; "
        "flag when the family's PRIMARY signal ratio > flag_factor x "
        "data ratio (primary = task time, except semantic_dedup where "
        "it is the exact candidate-pair volume — see gate_basis)",
        "calibration_pre": bench._calibration(),
        "families": {},
    }
    for name in FAMILIES:
        if not want(name):
            continue
        try:
            # interleave nothing between the two points of one family so
            # host drift hits both sides as equally as possible
            m1 = run(name, SF1_DIR)
            m3 = run(name, SF3_DIR)
        except Exception as ex:
            out["families"][name] = {"error": str(ex)[:300]}
            continue
        t1 = max(0.001, m1.get("task_time_sec", m1["wall_sec"]))
        t3 = max(0.001, m3.get("task_time_sec", m3["wall_sec"]))
        ratio = t3 / t1
        exponent = math.log(ratio) / math.log(SCALE) if ratio > 0 else None
        flagged = ratio > FLAG_FACTOR * SCALE
        out["families"][name] = _apply_stability({
            "task_1x_sec": round(t1, 2),
            "task_3x_sec": round(t3, 2),
            "wall_1x_sec": m1["wall_sec"],
            "wall_3x_sec": m3["wall_sec"],
            "task_ratio": round(ratio, 2),
            "exponent": round(exponent, 3),
            "flagged_superlinear": flagged,
            "spill_disk_mb_3x": m3.get("spill_disk_mb", 0.0),
            # both samples of each min-of-2 point: a flag whose two
            # sides show 2x within-point spread is host noise, not a
            # plan regression (r11 — adjudication evidence)
            "task_samples_1x": m1.get("task_samples"),
            "task_samples_3x": m3.get("task_samples"),
        })
    # emb_neardup under its documented parameter rule ((r, b) from
    # tune_lsh_params(n=N)) — flagged measurement + fixed-param evidence
    try:
        if not want("emb_neardup_pairs"):
            raise _Skip()
        from spark_sql_on_hbase_spark.operators.similarity import tune_lsh_params

        m1 = run_q(_neardup_scaled(NEARDUP_N1), SF1_DIR, runs=3)
        m3 = run_q(_neardup_scaled(SCALE * NEARDUP_N1), SF3_DIR, runs=3)
        m3_fixed = run_q(_neardup_scaled(NEARDUP_N1), SF3_DIR, runs=2)
        t1 = max(0.001, m1.get("task_time_sec", m1["wall_sec"]))
        t3 = max(0.001, m3.get("task_time_sec", m3["wall_sec"]))
        t3f = max(0.001, m3_fixed.get("task_time_sec", m3_fixed["wall_sec"]))
        ratio = t3 / t1
        flagged = ratio > FLAG_FACTOR * SCALE
        b1 = tune_lsh_params(0.9, n=NEARDUP_N1)
        b3 = tune_lsh_params(0.9, n=SCALE * NEARDUP_N1)
        out["families"]["emb_neardup_pairs"] = _apply_stability({
            "task_1x_sec": round(t1, 2),
            "task_3x_sec": round(t3, 2),
            "wall_1x_sec": m1["wall_sec"],
            "wall_3x_sec": m3["wall_sec"],
            "task_ratio": round(ratio, 2),
            "exponent": round(math.log(ratio) / math.log(SCALE), 3),
            "flagged_superlinear": flagged,
            "spill_disk_mb_3x": m3.get("spill_disk_mb", 0.0),
            "task_samples_1x": m1.get("task_samples"),
            "task_samples_3x": m3.get("task_samples"),
            "param_rule": f"(bits, bands) = {b1} -> {b3} "
            "(r grows ~log2 N, b re-derived to hold the S-curve midpoint "
            "at the threshold — tune_lsh_params(n=...), the operator's "
            "documented scaling contract)",
            "fixed_param_task_3x_sec": round(t3f, 2),
            "fixed_param_exponent": round(math.log(t3f / t1) / math.log(SCALE), 3),
            "fixed_param_note": "fixed (r, b) at 3x data is the documented "
            "mis-parameterization (background candidates Θ(b·N²/2^r)) — "
            "kept as evidence the two-point gate detects gentle quadratics",
            # r13 (VERDICT r12 #1): the operator now detects cluster
            # collapse itself (sampled bucket-occupancy estimate vs
            # ROUTE_CAND_BOUND) and auto-routes through learned k-means
            # cells (K ∝ N, top-2 assignment, band join within cell) —
            # the r12 flag_note's "documented path for clustered
            # corpora" became the AUTOMATIC path; both soak points
            # exceed the bound, so this measurement exercises the routed
            # plan at both scales with zero manual parameters
            "route_estimates_cand_per_doc": {
                "1x": round(
                    _route_estimate(spark, SF1_DIR, NEARDUP_N1), 2
                ),
                "3x": round(
                    _route_estimate(spark, SF3_DIR, SCALE * NEARDUP_N1), 2
                ),
            },
            "route_bound": __import__(
                "spark_sql_on_hbase_spark.operators.similarity",
                fromlist=["ROUTE_CAND_BOUND"],
            ).ROUTE_CAND_BOUND,
        })
    except _Skip:
        pass
    except Exception as ex:
        out["families"]["emb_neardup_pairs"] = {"error": str(ex)[:300]}
    # semantic_dedup under its documented parameter rule (K ∝ N) — this
    # is the flagged measurement; the fixed-K quadratic is recorded
    # alongside as evidence of what the rule prevents
    try:
        if not want("semantic_dedup"):
            raise _Skip()
        m1 = run_q(_semantic_dedup_scaled(SEMDEDUP_K), SF1_DIR, runs=3)
        m3 = run_q(_semantic_dedup_scaled(SCALE * SEMDEDUP_K), SF3_DIR, runs=3)
        m3_fixed = run_q(_semantic_dedup_scaled(SEMDEDUP_K), SF3_DIR, runs=2)
        t1 = max(0.001, m1.get("task_time_sec", m1["wall_sec"]))
        t3 = max(0.001, m3.get("task_time_sec", m3["wall_sec"]))
        t3f = max(0.001, m3_fixed.get("task_time_sec", m3_fixed["wall_sec"]))
        ratio = t3 / t1
        # r14 gating (VERDICT r13 #1): the PRIMARY signal for this
        # family is the candidate-pair VOLUME exponent — Σ C(cell,2)
        # computed exactly from K rows of assignment metadata — because
        # that is the structural quantity the gate exists to catch
        # (within-cluster pairs Θ((N/K)²·K) under fixed K).  Task time
        # = pair volume × per-pair cost; per-pair cost is a constant of
        # the kernel, so a task-time ratio that moves WITHOUT the pair
        # volume moving is host noise by construction (r12/r13 measured
        # 2-4× same-code spread under recorded load 10-15).  Task-time
        # stays recorded as an ADVISORY signal, and remains the flag
        # when the volume measurement itself errors out.
        pv = _semantic_pair_volume(spark)
        task_flag = ratio > FLAG_FACTOR * SCALE
        # r15 (ADVICE r14 medium): the pair-volume gate only covers
        # regressions that change the CANDIDATE SHAPE; a kernel/plan
        # regression that inflates per-pair cost moves task time with
        # pair volume flat — the loose task backstop keeps that class
        # flaggable instead of advisory-only
        loose_task_flag = ratio > TASK_LOOSE_FACTOR * SCALE
        pv_flagged = bool(pv and "ratio" in pv and pv["ratio"] > FLAG_FACTOR * SCALE)
        if pv and "ratio" in pv:
            flagged = pv_flagged or loose_task_flag
            gate_basis = (
                "pair_volume (structural) + loose task-time backstop "
                f"(ratio > {TASK_LOOSE_FACTOR * SCALE} — per-pair-cost "
                "regressions move task time without moving pair volume)"
            )
        else:
            flagged = task_flag
            gate_basis = "task_time (pair-volume measurement unavailable)"
        out["families"]["semantic_dedup"] = _apply_stability(flag_from_samples=not pv_flagged, entry={
            "task_1x_sec": round(t1, 2),
            "task_3x_sec": round(t3, 2),
            "wall_1x_sec": m1["wall_sec"],
            "wall_3x_sec": m3["wall_sec"],
            "task_ratio": round(ratio, 2),
            "exponent": round(math.log(ratio) / math.log(SCALE), 3),
            "flagged_superlinear": flagged,
            "gate_basis": gate_basis,
            "task_flag_advisory": task_flag,
            "spill_disk_mb_3x": m3.get("spill_disk_mb", 0.0),
            "task_samples_1x": m1.get("task_samples"),
            "task_samples_3x": m3.get("task_samples"),
            "param_rule": f"n_clusters = {SEMDEDUP_K} -> {SCALE * SEMDEDUP_K} "
            "(K proportional to N, the operator's documented scaling contract)",
            "fixed_param_task_3x_sec": round(t3f, 2),
            "fixed_param_exponent": round(math.log(t3f / t1) / math.log(SCALE), 3),
            "fixed_param_note": "fixed K at 3x data is the documented "
            "mis-parameterization (within-cluster pairs Θ((N/K)²·K)) — "
            "kept as evidence the two-point gate detects gentle quadratics",
            "pair_volume": pv,
            "loose_task_flag": loose_task_flag,
        })
        if task_flag and not flagged and pv:
            out["families"]["semantic_dedup"]["flag_note"] = (
                "task-time advisory exceeded the gate but the PRIMARY "
                "signal — candidate-pair volume, the shape the gate "
                f"exists to catch — measures {pv['pairs_1x']} -> "
                f"{pv['pairs_3x']} (ratio {pv['ratio']}, exp "
                f"{pv['exponent']}) under K∝N, i.e. ~linear by "
                "construction; per-pair cost is a kernel constant, so "
                "the residual task-time motion is host noise "
                "(see calibration_pre/post and task_samples)"
            )
    except _Skip:
        pass
    except Exception as ex:
        out["families"]["semantic_dedup"] = {"error": str(ex)[:300]}
    out["calibration_post"] = bench._calibration()
    dst = os.path.join(ROOT, "SOAK_SCALING.json")
    if only is not None and os.path.exists(dst):
        # merge: re-measured families replace their old entries, the
        # untouched ones persist; this run's calibration is recorded
        # per re-measured family so provenance stays visible
        try:
            with open(dst) as f:
                prev = json.load(f)
        except (OSError, ValueError):
            prev = {}
        for name, m in out["families"].items():
            if isinstance(m, dict) and "error" not in m:
                m["remeasured_calibration"] = {
                    "pre": out["calibration_pre"],
                    "post": out["calibration_post"],
                }
        merged = dict(prev.get("families", {}))
        merged.update(out["families"])
        out["families"] = merged
        for k in ("calibration_pre", "calibration_post"):
            if k in prev:
                out[k] = prev[k]
        # r15 (ADVICE r14 medium): a flag_count computed after an argv-
        # subset re-measurement is PARTIAL evidence — record exactly
        # which families were re-measured this run so an adjudication
        # that cleared a flag via a quiet-host re-run stays visible
        out["partial_remeasure"] = {
            "families": sorted(only),
            "note": "flag_count recomputed over the merged set after "
            "re-measuring ONLY these families; the rest carry their "
            "previous run's numbers",
        }
    # flag_count is always recomputed over the FULL (possibly merged)
    # family set — the compact-line scale_flags gate reads it.
    # unstable_count carries families whose measurement was too noisy
    # to settle (r15, VERDICT r14 #5) — bench surfaces it separately.
    out["flag_count"] = sum(
        1
        for m in out["families"].values()
        if isinstance(m, dict) and m.get("flagged_superlinear")
    )
    out["unstable_count"] = sum(
        1
        for m in out["families"].values()
        if isinstance(m, dict) and m.get("measurement_unstable")
    )
    with open(dst + ".tmp", "w") as f:
        json.dump(out, f, indent=1)
    os.replace(dst + ".tmp", dst)
    print(json.dumps({k: v for k, v in out.items() if k != "families"}, indent=1))
    for n, m in out["families"].items():
        print(n, json.dumps(m, separators=(",", ":")))


if __name__ == "__main__":
    main()
