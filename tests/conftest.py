"""Test configuration: force CPU with 8 fake devices (multi-chip sharding
tests run on a virtual mesh, SURVEY.md §4g) and enable float64.

Note: the ambient environment auto-prepends the experimental `axon` TPU
platform to JAX_PLATFORMS at interpreter startup, so the env var alone
cannot deselect it — we set the jax config flag directly, which wins.
"""
import os

os.environ.pop("JAX_PLATFORMS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def _ensure_native_codec() -> None:
    """Build the C++ UBJSON codec once per session when a compiler is
    available (VERDICT r4: the native tests silently skipped unless
    someone had run scripts/build_native.py by hand, so a regression in
    the .cpp could rot unnoticed). Best-effort: on any failure the
    pure-Python codec remains the fallback and tests/test_io.py's
    skipif still applies — but a broken COMPILE on a box with a
    compiler should be loud, so that surfaces as a warning."""
    import glob
    import shutil
    import subprocess
    import sys
    import warnings

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    native = os.path.join(repo, "al26_tpu", "io", "native")
    cpp = os.path.join(native, "ubjson_native.cpp")
    sos = glob.glob(os.path.join(native, "_ubjson_native*.so"))
    if sos and all(os.path.getmtime(so) >= os.path.getmtime(cpp)
                   for so in sos):
        return
    if shutil.which("c++") is None and shutil.which("g++") is None:
        return
    try:
        r = subprocess.run(
            [sys.executable,
             os.path.join(repo, "scripts", "build_native.py")],
            capture_output=True, text=True, timeout=300,
        )
    except subprocess.TimeoutExpired:
        # genuinely best-effort: a hung/slow compiler must not abort the
        # whole pytest session at conftest import (review r5)
        warnings.warn("native codec build timed out (300 s); tests will "
                      "skip the native lane")
        return
    if r.returncode != 0:
        warnings.warn(
            "native codec build FAILED (tests will skip the native lane):\n"
            + "\n".join(r.stderr.strip().splitlines()[-5:])
        )


_ensure_native_codec()
