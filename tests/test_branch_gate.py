"""r13 — branch-level regression gate self-test (VERDICT r12 #6).

bench._branch_regressions / _branch_delta_max are pure functions over
the previous round's detail file and the current query_metrics; a
synthetic 2×+ branch regression must be caught, and noise below the
absolute floor must not.  No Spark session involved.
"""

import bench


def _detail(branches_by_suite):
    return {
        "query_metrics": {
            s: {"task_time_sec": sum(b.values()), "branches": b}
            for s, b in branches_by_suite.items()
        }
    }


PREV = _detail(
    {
        "text_ops_suite": {"perplexity": 36.5, "dupspans": 2.9, "leak": 0.05},
        "corpus_ops_suite": {"clf": 14.4, "pack": 0.9},
        "multimodal_suite": {"video": 1.68, "jpeg": 2.5},
    }
)


def test_synthetic_regression_is_caught():
    cur = _detail(
        {
            "text_ops_suite": {"perplexity": 80.0, "dupspans": 2.8, "leak": 0.04},
            "corpus_ops_suite": {"clf": 14.0, "pack": 0.8},
            "multimodal_suite": {"video": 1.7, "jpeg": 2.4},
        }
    )["query_metrics"]
    reg = bench._branch_regressions(PREV, cur)
    assert reg == {"text_ops_suite.perplexity": [36.5, 80.0]}
    dmax = bench._branch_delta_max(PREV, cur)
    assert dmax["text"] == round(80.0 / 36.5, 2)
    assert dmax["corpus"] < 1.0 and dmax["mm"] <= 1.02


def test_noise_floor_suppresses_subsecond_swings():
    cur = _detail(
        {
            # leak 0.05 → 0.9 is an 18× ratio but under the 1 s floor
            "text_ops_suite": {"perplexity": 37.0, "dupspans": 3.0, "leak": 0.9},
            "corpus_ops_suite": {"clf": 15.0, "pack": 0.95},
            "multimodal_suite": {"video": 1.6, "jpeg": 2.6},
        }
    )["query_metrics"]
    assert bench._branch_regressions(PREV, cur) == {}


def test_exactly_2x_is_not_flagged_strictly_greater_is():
    cur = _detail({"corpus_ops_suite": {"clf": 28.8, "pack": 0.9}})["query_metrics"]
    assert bench._branch_regressions(PREV, cur) == {}
    cur = _detail({"corpus_ops_suite": {"clf": 28.81, "pack": 0.9}})["query_metrics"]
    assert bench._branch_regressions(PREV, cur) == {
        "corpus_ops_suite.clf": [14.4, 28.81]
    }


def test_new_branch_and_missing_prev_are_ignored():
    cur = _detail(
        {"text_ops_suite": {"brand_new": 50.0}, "never_seen_suite": {"x": 9.0}}
    )["query_metrics"]
    assert bench._branch_regressions(PREV, cur) == {}
    assert bench._branch_regressions(None, cur) == {}
    assert bench._branch_delta_max(None, cur) == {}


# ---- r14 spin normalization (VERDICT r13 #7) --------------------------------


def test_host_slowdown_does_not_flag_under_normalization():
    """A simulated 30% host slowdown inflates EVERY branch ×1.3 with an
    identical plan; with spin_ratio 1.3 the gate stays quiet and dmax
    reads ~1.0 — the drift that forced the old 2 s floor is factored
    out, so the floor can sit at 1 s."""
    cur = _detail(
        {
            "text_ops_suite": {
                "perplexity": 36.5 * 1.3,
                "dupspans": 2.9 * 1.3,
                "leak": 0.05 * 1.3,
            },
            "corpus_ops_suite": {"clf": 14.4 * 1.3, "pack": 0.9 * 1.3},
            "multimodal_suite": {"video": 1.68 * 1.3, "jpeg": 2.5 * 1.3},
        }
    )["query_metrics"]
    assert bench._branch_regressions(PREV, cur, spin_ratio=1.3) == {}
    dmax = bench._branch_delta_max(PREV, cur, spin_ratio=1.3)
    assert all(abs(v - 1.0) < 0.02 for v in dmax.values()), dmax
    # without normalization the same drift reads as a uniform 1.3× —
    # nothing flags (2× factor) but dmax mis-reports plan motion
    raw = bench._branch_delta_max(PREV, cur, spin_ratio=1.0)
    assert all(abs(v - 1.3) < 0.02 for v in raw.values()), raw


def test_real_regression_still_flags_on_slow_host():
    """A genuine 2.2× plan regression on a 30% slower host (raw 2.86×)
    must still trip after normalization back to 2.2×."""
    cur = _detail(
        {"corpus_ops_suite": {"clf": 14.4 * 2.2 * 1.3, "pack": 0.9}}
    )["query_metrics"]
    reg = bench._branch_regressions(PREV, cur, spin_ratio=1.3)
    assert list(reg) == ["corpus_ops_suite.clf"]
    # recorded pair stays RAW seconds (what detail files hold)
    assert reg["corpus_ops_suite.clf"] == [14.4, round(14.4 * 2.2 * 1.3, 2)]


def test_spin_norm_ratio_derivation_and_clamp():
    prev = {
        "calibration_pre": {"spin_1e7_sec": 0.24},
        "calibration_post": {"spin_1e7_sec": 0.25},
        "calibration_final": {"spin_1e7_sec": 0.26},
    }
    assert bench._spin_norm_ratio(prev, 0.325) == 0.325 / 0.25
    # missing calibration on either side → neutral
    assert bench._spin_norm_ratio({}, 0.3) == 1.0
    assert bench._spin_norm_ratio(prev, None) == 1.0
    assert bench._spin_norm_ratio(None, 0.3) == 1.0
    # clamp: a wild sample can't invert a flag — and the clamp band is
    # the OBSERVED round-over-round drift (~1.35×), not 2×, so the
    # combined normalization × regression-factor leniency stays ~2.7×
    # (r15, ADVICE r14 low)
    assert bench._spin_norm_ratio(prev, 2.5) == bench._SPIN_RATIO_CLAMP[1]
    assert bench._spin_norm_ratio(prev, 0.01) == bench._SPIN_RATIO_CLAMP[0]
    assert bench._SPIN_RATIO_CLAMP[1] <= 1.4


def test_headline_norm_flat_under_host_slowdown():
    """r15 (VERDICT r14 #4): a host running 2× slower per cycle doubles
    both spin and CPU-bound task seconds — the normalized headline must
    stay flat (no false regression), and a missing calibration must
    fall back to raw task seconds."""
    fast = [{"spin_1e7_sec": 0.25}] * 3
    slow = [{"spin_1e7_sec": 0.50}] * 3
    n_fast = bench._headline_norm(100.0, fast)
    n_slow = bench._headline_norm(200.0, slow)  # same work, 2× slower host
    assert n_fast["task_norm_sec"] == 100.0
    assert n_slow["task_norm_sec"] == 100.0
    assert not n_fast["norm_clamped"] and not n_slow["norm_clamped"]
    # a wild calibration sample cannot fabricate a 10× improvement
    wild = bench._headline_norm(100.0, [{"spin_1e7_sec": 5.0}] * 3)
    assert wild["norm_clamped"] and wild["norm_factor"] == bench._NORM_FACTOR_CLAMP[0]
    # no calibration → raw task seconds, factor 1
    none = bench._headline_norm(77.0, [])
    assert none["task_norm_sec"] == 77.0 and none["norm_factor"] == 1.0


def test_split_flags_parses_suite_tag_keys():
    got = bench._split_flags(
        {"corpus_ops_suite.quantize": [0.5, 20.5], "text_ops_suite.fingerprint": [1, 26],
         "corpus_ops_suite.pack": [0.2, 1.1], "malformed": [1, 2]}
    )
    assert got == {
        "corpus_ops_suite": ["quantize", "pack"],
        "text_ops_suite": ["fingerprint"],
    }
