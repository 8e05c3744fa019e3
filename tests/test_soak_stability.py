"""r15 (VERDICT r14 #5 + ADVICE r14 medium) — soak-scaling measurement
stability and the semantic_dedup loose task-time backstop.

The scaling soak's min-of-3 per point silently reported the lucky tail
when samples spread wildly (r14 text_ops_suite: [1303, 493, 1242] —
2.6× within-point).  `_apply_stability` marks such families
measurement_unstable, demotes their SAMPLE-derived flag to advisory
(excluded from flag_count), and never demotes a STRUCTURAL flag (pair
volume computed from assignment metadata is immune to host noise).
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import importlib

soak = importlib.import_module("soak_scaling")


def _entry(s1, s3, flagged=False):
    return {
        "task_samples_1x": s1,
        "task_samples_3x": s3,
        "flagged_superlinear": flagged,
        "exponent": 0.859,
    }


def test_r14_text_ops_spread_marks_unstable():
    """The exact r14 case: [1303, 493, 1242] spreads 2.64× — the 0.859
    exponent must be advisory, not settled."""
    e = soak._apply_stability(_entry([1303, 493, 1242], [400, 420, 410]))
    assert e["sample_spread_1x"] == 2.64
    assert e["measurement_unstable"] is True
    assert e["flagged_superlinear"] is False
    assert "excluded" in e["gating"]


def test_stable_family_keeps_flag_and_no_gating_note():
    e = soak._apply_stability(_entry([100, 110, 105], [480, 500, 490], flagged=True))
    assert e["measurement_unstable"] is False
    assert e["flagged_superlinear"] is True
    assert "gating" not in e


def test_unstable_sample_flag_moves_to_advisory():
    """An unstable family that ALSO tripped the flag: the flag is not
    silently dropped — it moves to flag_advisory while flag_count skips
    it (the round carries unstable_count instead)."""
    e = soak._apply_stability(_entry([10, 25, 12], [200, 210, 205], flagged=True))
    assert e["measurement_unstable"] is True
    assert e["flagged_superlinear"] is False
    assert e["flag_advisory"] is True


def test_structural_flag_survives_unstable_samples():
    """ADVICE r14 medium: host noise in the timing samples must not
    launder a pair-volume (structural) flag."""
    e = soak._apply_stability(
        _entry([10, 25, 12], [200, 210, 205], flagged=True),
        flag_from_samples=False,
    )
    assert e["measurement_unstable"] is True
    assert e["flagged_superlinear"] is True  # structural — kept
    assert "flag_advisory" not in e
    assert "excluded" not in e["gating"]


def test_spread_edge_cases():
    assert soak._sample_spread(None) is None
    assert soak._sample_spread([]) is None
    assert soak._sample_spread([0.0, 5.0]) is None  # degenerate min
    assert soak._sample_spread([2.0, 3.0]) == 1.5
    # exactly at the bound is NOT unstable (> comparison)
    e = soak._apply_stability(_entry([100, 180], [100, 100]))
    assert e["sample_spread_1x"] == 1.8
    assert e["measurement_unstable"] is False


def test_loose_task_backstop_constant_sane():
    """The backstop must sit above the measured same-code host spread
    (ratio ≤ ~4.5 r12-r14) and below a genuine quadratic (9 at 3×)."""
    bound = soak.TASK_LOOSE_FACTOR * soak.SCALE
    assert 4.5 < bound < 9.0
