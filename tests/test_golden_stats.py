"""Golden end-to-end statistics at N=1k (BASELINE 'bit-reproducible'
row): a seeded CPU/float64 run must reproduce the checked-in summary
statistics EXACTLY — any refactor that changes summation order, RNG
consumption, or physics on the science-precision path fails here.

Regenerate after an INTENDED physics change:
    python scripts/gen_golden_stats.py
"""
import json
import os

import pytest

from golden_stats import run_golden, summarize

# two full N=1k 1000-step f64 runs: excluded from the default selection
# (pyproject addopts); run with `pytest -m slow`
pytestmark = pytest.mark.slow

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "n1k_stats.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.mark.parametrize("mode", ["default", "sn_parity"])
def test_golden_n1k_bit_reproducible(golden, mode):
    state, cfg = run_golden(sn_parity_mode=(mode == "sn_parity"))
    got = summarize(state, cfg)
    want = golden[mode]
    assert set(got) == set(want)
    for k in sorted(want):
        assert got[k] == want[k], (
            f"{mode}/{k}: got {got[k]!r}, golden {want[k]!r} — exact-match "
            "regression on the deterministic f64 path"
        )


def test_golden_modes_diverge_at_10myr(golden):
    """Round 3: with the published LC18 vel=300 mass anchors, EVERY
    13-25 Msun pre-SN mass (5.4-9.5 Msun, models/stellar/lc18_anchors)
    sits below the 13 Msun threshold, so the reference's step-start
    current-mass gate (sn_parity_mode) now suppresses the golden seed's
    one SN (m0 ~ 19.5) that the default initial-mass candidacy keeps.
    sn_parity_mode reproduces the reference's RULE, not its outcome —
    the outcome depends on the stellar code's mass track, and SeBa's
    non-rotating winds keep stars heavier than the LC18 rotating models
    (docs/stellar_model.md). The default gate is therefore the better
    outcome-parity mode; see also
    test_step.py::test_sn_parity_gate_loses_low_bin_sn and
    test_step_transcription.py (the transcription confirms step() applies
    the same rule the reference's code does)."""
    assert golden["default"]["n_kicked"] == 1
    assert golden["default"]["sum_sne_26al"] > 0.0
    assert golden["sn_parity"]["n_kicked"] == 0
    assert golden["sn_parity"]["sum_sne_26al"] == 0.0
    # the wind channels stay active in parity mode (local identical for
    # this seed: the gated star is outside every 0.1 pc local bubble)
    assert golden["sn_parity"]["sum_local_26al"] > 0.0
    assert (golden["sn_parity"]["sum_global_26al"]
            < golden["default"]["sum_global_26al"])
