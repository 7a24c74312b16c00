"""Pallas force-kernel correctness tests (interpreter mode on CPU; the same
kernel compiles for real on TPU — see bench.py for throughput)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from al26_tpu.ops.nbody import acc_jerk_pot_dense
from al26_tpu.ops.pallas_nbody import TILE_I, TILE_J, pallas_acc_jerk_pot


def _system(n, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        jnp.asarray(rng.uniform(0.1, 2.0, n), jnp.float32),
    )


@pytest.mark.parametrize("n", [TILE_J, 2 * TILE_J, 100, 777])
def test_pallas_matches_dense(n):
    pos, vel, mass = _system(n)
    a1, j1, p1 = pallas_acc_jerk_pot(pos, vel, mass, 1e-3)
    a2, j2, p2 = acc_jerk_pot_dense(
        pos.astype(jnp.float64), vel.astype(jnp.float64),
        mass.astype(jnp.float64), 1e-3,
    )
    scale_a = float(jnp.max(jnp.abs(a2)))
    scale_j = float(jnp.max(jnp.abs(j2)))
    scale_p = float(jnp.max(jnp.abs(p2)))
    assert float(jnp.max(jnp.abs(a1 - a2))) / scale_a < 1e-5
    assert float(jnp.max(jnp.abs(j1 - j2))) / scale_j < 1e-5
    assert float(jnp.max(jnp.abs(p1 - p2))) / scale_p < 1e-5


def test_pallas_unsoftened_masks_self():
    pos, vel, mass = _system(64, seed=3)
    a1, j1, p1 = pallas_acc_jerk_pot(pos, vel, mass, 0.0)
    assert np.isfinite(np.asarray(a1)).all()
    assert np.isfinite(np.asarray(j1)).all()
    assert np.isfinite(np.asarray(p1)).all()


def test_pallas_force_fn_in_integrator():
    from al26_tpu.ops.integrators import hermite4_advance
    from al26_tpu.ops.pallas_nbody import make_pallas_force

    pos, vel, mass = _system(128, seed=4)
    pos64 = pos.astype(jnp.float64)
    vel64 = vel.astype(jnp.float64)
    mass64 = mass.astype(jnp.float64)
    p_ref, v_ref = hermite4_advance(pos64, vel64, mass64,
                                    jnp.asarray(0.001), eps2=1e-2)
    ff = make_pallas_force(mass, 1e-2)
    p_pal, v_pal = hermite4_advance(pos, vel, mass, jnp.asarray(0.001,
                                    jnp.float32), eps2=1e-2, force_fn=ff)
    np.testing.assert_allclose(np.asarray(p_pal), np.asarray(p_ref),
                               rtol=1e-4, atol=1e-6)
