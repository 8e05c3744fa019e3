"""Pin the bench compact-line contract (r16, VERDICT r15 #2).

An inherited r15 commit silently swapped the compact line's
``value``/``unit`` pair from wall/sec to spin-normalized task seconds;
only a late manual audit caught it (restored in f9f4d13).  These tests
make that class of drift fail at commit time: the line is built by the
pure ``bench._compact_line`` (no Spark), so the contract the driver
parses — one JSON object, ``value`` = total wall seconds, ``unit`` =
"sec", ``task_norm_sec`` riding along, under the ~2 KiB capture cap —
is asserted directly against the exact code path ``bench.main`` prints.
"""

import json

import bench

# the full plan-shape gate set of a healthy run (values from the r15
# committed artifact) — worst-case realistic line payload
_SHAPES = {
    "point_files": 1, "files_total": 8, "prefix_agg_exch": 0,
    "skipscan_rows": 11264, "del_files_rw": 2, "del_files_total": 8,
    "del_upsert_rw": 2, "sf_pushdown_rows": 3241, "sf_float_rows": 4265,
    "sf_f1_rows": 10517, "zorder_files": 5, "bloom_files": 1,
    "index_files": 1, "index_engaged": True, "ixr_files": 1,
    "ixr_engaged": True, "ixsj_engaged": True, "ixsj_files": 2,
    "ixfk_skip": True, "ixfk_files": 2, "ixfk_ms": 90.8,
    "cov_engaged": True, "cov_files": 1, "cov_mor": True,
    "cov_mor_files": 4, "cov_mor_total": 4, "asof_joins": 0,
    "ivjoin_nl": False, "skew_plain": 28.9, "skew_salted": 2.3,
    "quant_py": False, "boiler_bhj": True, "dupspan_equi": True,
    "ivf_parts_read": 4, "ivf_parts_total": 16, "nd_cand": 1.02,
    "nd_rec": 1.0, "lsh_rec": 0.8, "mp_rec": 1.0, "ivf_rec": 1.0,
    "pq_rec": 1.0, "mh_cand": 0.05,
}


def _inputs(**over):
    """Realistic _compact_line inputs: every HEADLINE query timed, every
    plan-shape gate present (the r15-artifact worst case)."""
    timings = {q: 1.234 for q in bench.HEADLINE}
    metrics = {q: {"task_time_sec": 2.345} for q in bench.HEADLINE}
    kw = dict(
        total=40.051,
        norm={
            "task_norm_sec": 35.62, "spin_cur": 0.396, "spin_ref": 0.25,
            "norm_factor": 0.631, "norm_clamped": False,
        },
        task_total=56.42,
        timings=timings,
        query_metrics=metrics,
        sf=0.1,
        compact_shapes=dict(_SHAPES),
        detail_file="BENCH_DETAIL_r16.json",
    )
    kw.update(over)
    return kw


def test_value_is_wall_and_unit_is_sec():
    line = bench._compact_line(**_inputs())
    assert "\n" not in line
    c = json.loads(line)  # exactly one JSON object
    # THE driver contract (every BENCH_r*.json records this pair; an
    # inherited commit swapped it to task_sec_norm once — never again)
    assert c["value"] == 40.05  # rounded wall seconds
    assert c["unit"] == "sec"
    # the primary regression signal rides the same line
    assert c["task_norm_sec"] == 35.62
    assert c["task_time_sec"] == 56.42
    assert c["spin_cur"] == 0.396 and c["spin_ref"] == 0.25
    assert c["q_unit"] == "task_sec(min-run)"
    assert c["sf"] == 0.1
    assert c["detail_file"] == "BENCH_DETAIL_r16.json"
    # per-query values are task seconds rounded to 0.1
    assert c["queries"]["corpus_ops_suite"] == 2.3
    assert set(c["queries"]) == set(bench.HEADLINE)
    assert c["plan_shapes"] == _SHAPES


def test_worst_case_line_fits_capture_cap():
    # every optional key at once — the longest line a healthy-but-noisy
    # run can produce must still fit the driver's ~2 KiB tail capture
    line = bench._compact_line(
        **_inputs(
            norm={
                "task_norm_sec": 135.62, "spin_cur": 0.833,
                "spin_ref": 0.25, "norm_factor": 0.33, "norm_clamped": True,
            },
            spin_clamped=True,
            retry_info={"queries_improved": 12},
            scale_flags=3,
            scale_unstable=5,
            branch_dmax={"text": 1.02, "corpus": 0.33, "mm": 0.63},
        )
    )
    assert len(line) <= bench.COMPACT_LINE_CAP
    c = json.loads(line)
    assert c["unit"] == "sec" and c["norm_clamped"] == 1
    assert c["spin_clamp"] == 1 and c["cal_retry"] == 12
    assert c["scale_flags"] == 3 and c["scale_unstable"] == 5


def test_failed_query_reports_minus_one():
    kw = _inputs()
    kw["timings"]["agg_stats"] = -1.0
    line = bench._compact_line(**kw)
    assert json.loads(line)["queries"]["agg_stats"] == -1


def test_missing_scaling_artifact_is_surfaced():
    c = json.loads(bench._compact_line(**_inputs(scale_flags=None)))
    assert c["scale_flags"] == "no-artifact"


def test_oversize_line_sheds_flags_before_gates():
    # a pathological branch_flags payload must be shed FIRST; the
    # plan-shape gates (which exist nowhere else) must survive, and the
    # wall/sec pair must survive any shedding
    flags = {f"text_ops_suite.branch{i:03d}": [111.11, 999.99] for i in range(60)}
    line = bench._compact_line(**_inputs(branch_reg=flags))
    assert len(line) <= bench.COMPACT_LINE_CAP
    c = json.loads(line)
    assert "branch_flags" not in c
    assert c["plan_shapes"] == _SHAPES
    assert c["value"] == 40.05 and c["unit"] == "sec"
    assert "task_norm_sec" in c
