"""Regenerate tests/golden/n1k_stats.json (run after an INTENDED physics
change; see tests/golden_stats.py). Usage:

    python scripts/gen_golden_stats.py
"""
from __future__ import annotations

import json
import os
import sys

os.environ.pop("JAX_PLATFORMS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from golden_stats import run_golden, summarize  # noqa: E402


def main():
    out = {}
    modes = [("default", False, "lc18"), ("sn_parity", True, "lc18"),
             ("sn_parity_seba", True, "seba")]
    for key, parity, tracks in modes:
        state, cfg = run_golden(sn_parity_mode=parity, mass_tracks=tracks)
        out[key] = summarize(state, cfg)
        print(f"{key}: kicked={out[key]['n_kicked']} "
              f"sum_sne_26al={out[key]['sum_sne_26al']:.4e}")
    path = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                        "n1k_stats.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
