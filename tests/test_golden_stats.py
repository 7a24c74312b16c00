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


def test_golden_modes_coincide_at_10myr(golden):
    """At t_f = 10 Myr the two SN gates agree for this seed: the one star
    that collapses (t_sn < 10 requires m0 >~ 19 Msun) has m_presn above the
    13 Msun threshold, so the reference's step-start current-mass gate and
    our initial-mass gate fire the same SN. The gates only diverge for the
    13-14.5 Msun bin (m_presn < 13), whose lifetimes exceed 10 Myr — see
    test_step.py::test_sn_parity_gate_loses_low_bin_sn for that case."""
    assert golden["default"]["n_kicked"] == 1
    assert golden["sn_parity"]["n_kicked"] == 1
    assert golden["default"]["sum_sne_26al"] > 0.0
    assert (golden["sn_parity"]["sum_sne_26al"]
            == golden["default"]["sum_sne_26al"])
