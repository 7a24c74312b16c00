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
@pytest.mark.parametrize("use_mxu", [False, True])
def test_pallas_matches_dense(n, use_mxu):
    """use_mxu=False: pure-VPU difference sums, ~1e-5 of f64 truth.
    use_mxu=True (the default): MXU reduction decomposition with mean
    pre-centring — a few 1e-5 of cancellation noise (docs/precision.md),
    pinned at 3e-4. The offset below stresses the centring."""
    pos, vel, mass = _system(n)
    pos = pos + 4.0  # off-centre cluster: the worst case for use_mxu
    a1, j1, p1 = pallas_acc_jerk_pot(pos, vel, mass, 1e-3, use_mxu=use_mxu)
    a2, j2, p2 = acc_jerk_pot_dense(
        pos.astype(jnp.float64), vel.astype(jnp.float64),
        mass.astype(jnp.float64), 1e-3,
    )
    tol = 3e-4 if use_mxu else 1e-5
    scale_a = float(jnp.max(jnp.abs(a2)))
    scale_j = float(jnp.max(jnp.abs(j2)))
    scale_p = float(jnp.max(jnp.abs(p2)))
    assert float(jnp.max(jnp.abs(a1 - a2))) / scale_a < tol
    assert float(jnp.max(jnp.abs(j1 - j2))) / scale_j < tol
    assert float(jnp.max(jnp.abs(p1 - p2))) / scale_p < 1e-5


def test_pallas_matmul_potential_softened():
    """eps2 >= 1e-2 + default potential: the pot rides the Sw matmul
    (sum m_j/r == sum w r^2 recovery, pallas_nbody.py:pot_via_mxu) — must
    match the dense f64 truth within the kernel's error budget."""
    pos, vel, mass = _system(640, seed=9)
    pos = pos + 4.0  # off-centre: worst case for the decomposition
    eps2 = 0.125     # BHTree-parity scale softening
    a1, j1, p1 = pallas_acc_jerk_pot(pos, vel, mass, eps2)
    a2, j2, p2 = acc_jerk_pot_dense(
        pos.astype(jnp.float64), vel.astype(jnp.float64),
        mass.astype(jnp.float64), eps2,
    )
    assert float(jnp.max(jnp.abs(p1 - p2))) / float(jnp.max(jnp.abs(p2))) \
        < 1e-4
    assert float(jnp.max(jnp.abs(a1 - a2))) / float(jnp.max(jnp.abs(a2))) \
        < 3e-4
    assert float(jnp.max(jnp.abs(j1 - j2))) / float(jnp.max(jnp.abs(j2))) \
        < 3e-4


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


def test_pallas_rows_variant_matches_full():
    """The row-block kernel (multi-chip per-shard path) equals the full
    kernel's corresponding rows for any offset."""
    from al26_tpu.ops.pallas_nbody import pallas_acc_jerk_pot_rows

    pos, vel, mass = _system(512, seed=7)
    a_full, j_full, p_full = pallas_acc_jerk_pot(pos, vel, mass, 1e-3)
    for start, width in [(0, 128), (128, 256), (384, 128)]:
        a, j, p = pallas_acc_jerk_pot_rows(
            pos[start:start + width], vel[start:start + width],
            jnp.arange(start, start + width, dtype=jnp.int32),
            pos, vel, mass, eps2=1e-3)
        np.testing.assert_allclose(np.asarray(a),
                                   np.asarray(a_full[start:start + width]),
                                   rtol=2e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(p),
                                   np.asarray(p_full[start:start + width]),
                                   rtol=2e-5, atol=1e-8)


def test_sharded_force_pallas_path_matches():
    """shard_map + pallas row kernel (forced on, interpret mode) equals the
    jnp sharded result on the fake 8-device mesh."""
    import functools

    from jax.sharding import PartitionSpec as P

    from al26_tpu.parallel.sharded import _local_rows_force, make_mesh

    rng = np.random.default_rng(3)
    n = 256
    pos = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.1, 2.0, n), jnp.float32)
    mesh = make_mesh(8)

    def build(use_pallas):
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P("rows"), P("rows"), P("rows")),
            out_specs=(P("rows"), P("rows"), P("rows")),
            check_vma=False)
        def f(p, v, m):
            return _local_rows_force(p, v, m, 1e-3, 4.4985e-3, "rows",
                                     use_pallas=use_pallas)
        return f

    a1, j1, p1 = build(False)(pos, vel, mass)
    a2, j2, p2 = build(True)(pos, vel, mass)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                               rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=2e-4, atol=1e-7)


def test_pallas_scattered_rows():
    """Arbitrary (non-contiguous, unordered) row subsets mask their self
    pairs correctly — the block-timestep fast-group path."""
    from al26_tpu.ops.pallas_nbody import pallas_acc_jerk_pot_rows

    pos, vel, mass = _system(300, seed=9)
    a_full, j_full, p_full = pallas_acc_jerk_pot(pos, vel, mass, 1e-3)
    ids = jnp.asarray([7, 3, 299, 150, 42, 0, 255], jnp.int32)
    a, j, p = pallas_acc_jerk_pot_rows(
        pos[ids], vel[ids], ids, pos, vel, mass, eps2=1e-3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_full[ids]),
                               rtol=2e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(j), np.asarray(j_full[ids]),
                               rtol=2e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_full[ids]),
                               rtol=2e-5, atol=1e-8)


def test_pallas_group_window_matches_per_group_dense():
    """group_size > 0 (flattened ensembles): the block-diagonal column
    window + mask must reproduce the per-group dense forces exactly, for a
    group size that straddles TILE_J boundaries."""
    gs, b = 700, 3  # 2100 rows: groups cross the 512-wide column tiles
    pos, vel, mass = _system(gs * b, seed=11)
    a, j, p = pallas_acc_jerk_pot(pos, vel, mass, 1e-3, group_size=gs)
    for k in range(b):
        sl = slice(k * gs, (k + 1) * gs)
        a_ref, j_ref, p_ref = acc_jerk_pot_dense(
            pos[sl].astype(jnp.float64), vel[sl].astype(jnp.float64),
            mass[sl].astype(jnp.float64), 1e-3,
        )
        np.testing.assert_allclose(np.asarray(a[sl]), np.asarray(a_ref),
                                   rtol=2e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(j[sl]), np.asarray(j_ref),
                                   rtol=2e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(p[sl]), np.asarray(p_ref),
                                   rtol=2e-4, atol=1e-7)


def test_pallas_group_window_scattered_rows():
    """The column window derives from row ids, so a SCATTERED fast-group row
    subset (block-timestep subcycle) with group masking stays correct even
    when its rows span several groups."""
    from al26_tpu.ops.pallas_nbody import pallas_acc_jerk_pot_rows

    gs, b = 600, 3
    pos, vel, mass = _system(gs * b, seed=13)
    a_full, j_full, p_full = pallas_acc_jerk_pot(pos, vel, mass, 1e-3,
                                                 group_size=gs)
    ids = jnp.asarray([5, 1700, 599, 600, 1234, 0, 1799], jnp.int32)
    a, j, p = pallas_acc_jerk_pot_rows(
        pos[ids], vel[ids], ids, pos, vel, mass, eps2=1e-3, group_size=gs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_full[ids]),
                               rtol=2e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(j), np.asarray(j_full[ids]),
                               rtol=2e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_full[ids]),
                               rtol=2e-5, atol=1e-8)


def test_pallas_pot_eps2_fused_sweep():
    """pot_eps2 decouples the potential's softening from the forces': one
    sweep returns BHTree-softened acc/jerk AND the unsoftened potential
    (what sim.step feeds the virial radius)."""
    pos, vel, mass = _system(400, seed=15)
    eps2 = 0.125
    a_s, j_s, _ = pallas_acc_jerk_pot(pos, vel, mass, eps2)
    _, _, p_u = pallas_acc_jerk_pot(pos, vel, mass, 0.0)
    a, j, p = pallas_acc_jerk_pot(pos, vel, mass, eps2, pot_eps2=1e-30)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_s),
                               rtol=1e-6, atol=0)
    np.testing.assert_allclose(np.asarray(j), np.asarray(j_s),
                               rtol=1e-6, atol=0)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_u),
                               rtol=2e-5, atol=1e-8)


def test_auto_tile_j_selection():
    """Wide column tiles engage only for big single-cluster sweeps;
    ensembles (group windows) and small n keep the narrow tiles."""
    from al26_tpu.ops.pallas_nbody import TILE_J_WIDE, _auto_tile_j

    n = TILE_J_WIDE + 52
    assert _auto_tile_j(n, 0) == TILE_J_WIDE
    assert _auto_tile_j(n, 700) == TILE_J    # ensembles keep narrow tiles
    assert _auto_tile_j(512, 0) == TILE_J    # small n keeps narrow tiles


@pytest.mark.slow  # interpret-mode sweep at n=2100; narrow-tile equality
# vs dense runs in the default set (test_pallas_matches_dense)
def test_pallas_wide_tile_j_matches_dense():
    """n >= TILE_J_WIDE auto-selects the 2048-wide column tiles (the
    ~1.5x-throughput config measured on v5e); results must stay within the
    kernel's error budget, including with the non-tile-aligned padding a
    wide tile implies (2100 -> 4096 columns)."""
    from al26_tpu.ops.pallas_nbody import TILE_J_WIDE

    n = TILE_J_WIDE + 52
    pos, vel, mass = _system(n, seed=21)
    pos = pos + 4.0
    a1, j1, p1 = pallas_acc_jerk_pot(pos, vel, mass, 1e-3)
    a3, j3, p3 = pallas_acc_jerk_pot(pos, vel, mass, 1e-3, tile_j=TILE_J)
    a2, j2, p2 = acc_jerk_pot_dense(
        pos.astype(jnp.float64), vel.astype(jnp.float64),
        mass.astype(jnp.float64), 1e-3,
    )
    # the narrow-tile override must meet the same budget (a1 vs a3 differ
    # only by f32 summation order, so both sit within tol of the truth)
    for got, ref, tol in ((a1, a2, 3e-4), (j1, j2, 3e-4), (p1, p2, 1e-5),
                          (a3, a2, 3e-4), (j3, j2, 3e-4), (p3, p2, 1e-5)):
        assert (float(jnp.max(jnp.abs(got - ref)))
                / float(jnp.max(jnp.abs(ref)))) < tol


def test_pallas_tile_vmem_guard():
    """Oversized tile_i x tile_j products fail Mosaic with an opaque
    remote-compile 500 on the real device — the wrapper must reject them
    eagerly with a readable error."""
    from al26_tpu.ops.pallas_nbody import pallas_acc_jerk_pot_rows

    pos, vel, mass = _system(256, seed=1)
    with pytest.raises(ValueError, match="VMEM bound"):
        pallas_acc_jerk_pot_rows(
            pos, vel, jnp.arange(256, dtype=jnp.int32), pos, vel, mass,
            eps2=1e-3, tile_i=512, tile_j=2048)


@pytest.mark.parametrize("use_mxu", [False, True])
def test_pred_cols_kernel_matches_explicit_columns(use_mxu):
    """The predicted-columns kernel (columns Hermite-predicted IN-KERNEL at
    tau) + the K x K source-linearity override delta together equal the
    explicit path: predict_all + fast-row scatter + the plain rows kernel."""
    from al26_tpu.ops.integrators import _fast_override_delta
    from al26_tpu.ops.pallas_nbody import (
        make_pred_force_rows, pallas_acc_jerk_pot_rows,
    )
    from al26_tpu.units import G_INTERNAL

    n, k = 700, 64
    pos, vel, mass = _system(n, seed=3)
    pos = pos * 2.0 + 1.5
    rng = np.random.default_rng(4)
    a0 = jnp.asarray(rng.normal(size=(n, 3)) * 0.1, jnp.float32)
    j0 = jnp.asarray(rng.normal(size=(n, 3)) * 0.05, jnp.float32)
    fast_idx = jnp.asarray(
        rng.choice(n, size=k, replace=False), jnp.int32)
    tau = jnp.float32(0.0037)
    eps2 = 1e-3

    # subcycled fast-row states (differ from their predicted states)
    pfp = pos[fast_idx] + jnp.asarray(
        rng.normal(size=(k, 3)) * 1e-3, jnp.float32)
    vfp = vel[fast_idx] + jnp.asarray(
        rng.normal(size=(k, 3)) * 1e-3, jnp.float32)

    # explicit path: predict every column, overwrite fast columns
    t2 = tau * tau
    p_cols = pos + tau * vel + 0.5 * t2 * a0 + (t2 * tau / 6.0) * j0
    v_cols = vel + tau * a0 + 0.5 * t2 * j0
    pf_pred = p_cols[fast_idx]
    vf_pred = v_cols[fast_idx]
    p_cols = p_cols.at[fast_idx].set(pfp)
    v_cols = v_cols.at[fast_idx].set(vfp)
    a_ref, j_ref, _ = pallas_acc_jerk_pot_rows(
        pfp, vfp, fast_idx, p_cols, v_cols, mass, eps2=eps2,
        use_mxu=use_mxu, tile_i=64,
    )

    # fused path: in-kernel prediction + override delta
    rows_at = make_pred_force_rows(pos, vel, a0, j0, mass, eps2=eps2,
                                   use_mxu=use_mxu, tile_i=64)
    a_f, j_f = rows_at(pfp, vfp, fast_idx, tau)
    da, dj = _fast_override_delta(pfp, vfp, pfp, vfp, pf_pred, vf_pred,
                                  mass[fast_idx], eps2, G_INTERNAL)
    a_f = a_f + da
    j_f = j_f + dj

    tol = 5e-4 if use_mxu else 2e-5
    sa = float(jnp.max(jnp.abs(a_ref)))
    sj = float(jnp.max(jnp.abs(j_ref)))
    assert float(jnp.max(jnp.abs(a_f - a_ref))) / sa < tol
    assert float(jnp.max(jnp.abs(j_f - j_ref))) / sj < tol


def test_block_advance_pred_cols_matches_explicit():
    """hermite4_block_advance with the predicted-columns factory tracks the
    explicit-columns advance at kernel-error tolerances over a full dt."""
    from al26_tpu.ops.integrators import hermite4_block_advance
    from al26_tpu.ops.pallas_nbody import (
        make_pallas_force_rows, make_pred_force_rows,
    )

    n, k = 600, 64
    pos, vel, mass = _system(n, seed=9)
    pos = pos * 3.0
    vel = vel * 0.3
    dt = jnp.float32(0.01)
    eps2 = 1e-4

    def rows_fn(pr, vr, ids, p_all, v_all):
        from al26_tpu.ops.pallas_nbody import pallas_acc_jerk_pot_rows
        a, j, _ = pallas_acc_jerk_pot_rows(
            pr, vr, ids, p_all, v_all, mass, eps2=eps2, tile_i=64)
        return a, j

    p1, v1 = hermite4_block_advance(
        pos, vel, mass, dt, k, eps2=eps2, force_rows_fn=rows_fn)

    def factory(p, v, a0, j0):
        return make_pred_force_rows(p, v, a0, j0, mass, eps2=eps2,
                                    tile_i=64)

    p2, v2 = hermite4_block_advance(
        pos, vel, mass, dt, k, eps2=eps2, force_rows_fn=rows_fn,
        force_rows_at_factory=factory)

    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                               rtol=1e-4, atol=1e-5)
