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
            # leak 0.05 → 1.4 is a 28× ratio but under the 2 s floor
            "text_ops_suite": {"perplexity": 37.0, "dupspans": 3.0, "leak": 1.4},
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
