"""Pallas TPU kernel: tiled O(N^2) force / jerk / potential.

This is the hot-path replacement for the reference's out-of-process C++
gravity workers (BHTree/Hermite/ph4, al26_nbody.py:1709-1722). The
interaction matrix is swept in (TILE_I x TILE_J) blocks entirely on-chip:

  * source coordinates live in VMEM in lane-major [3, N] layout (sublane dim
    3 pads to 8 — a [N, 3] layout would pad the 3-wide lane dim to 128 and
    waste 40x VMEM);
  * each grid program owns a TILE_I row block ([TILE_I, 3] blocks of the
    row-major copies, giving natural (TILE_I, 1) column slices) and loops
    over TILE_J column chunks with a fori_loop, accumulating
    acc/jerk/potential in f32 registers;
  * self-interaction and padding are masked exactly (global row index vs
    column index), so results match the dense jnp reference to float
    round-off — verified in tests/test_pallas.py.

At N=100k / f32 this keeps ~10 MB in VMEM and runs the 10^10-pair sweep in
a single pallas_call.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..units import G_INTERNAL

TILE_I = 256
TILE_J = 512
# wide column tiles (fewer fori_loop trips, larger MXU contractions) beat
# the 512 default by ~1.5x on the big single-cluster sweep (measured on
# v5e at N=131072, docs/precision.md); group-windowed ensemble sweeps keep
# the 512 tiles so the block-diagonal column window stays tight around
# each realization
TILE_J_WIDE = 2048


def _auto_tile_j(n: int, group_size: int) -> int:
    return TILE_J if (group_size > 0 or n < TILE_J_WIDE) else TILE_J_WIDE


# v5e VMEM bound on the kernel's [tile_i, tile_j] f32 temporaries: with
# jerk, products above 2^19 (512x2048, 256x4096, 128x8192) fail Mosaic
# compilation with an opaque remote-compile 500; the jerk-free variant
# holds fewer live temporaries and 256x4096 (2^20) compiles and runs
# (measured, docs/precision.md) — reject over-budget combinations eagerly
# with a readable error
_MAX_TILE_ELEMS = 512 * 1024


def _check_tiles(tile_i: int, tile_j: int, with_jerk: bool = True) -> None:
    limit = _MAX_TILE_ELEMS if with_jerk else 2 * _MAX_TILE_ELEMS
    if tile_i * tile_j > limit:
        raise ValueError(
            f"tile_i*tile_j = {tile_i}*{tile_j} exceeds the v5e VMEM bound "
            f"({limit} f32 elements per pair-block temporary at "
            f"with_jerk={with_jerk}); use tile_i <= {limit // tile_j} at "
            f"this tile_j"
        )


def use_pallas(n: int, dtype) -> bool:
    """Single source of truth for 'should the tiled kernel run here':
    a real TPU backend, f32 data, enough rows to amortise the launch, and
    x64 DISABLED — Mosaic has no i64 support, and under jax_enable_x64 the
    pallas grid machinery emits i64 index ops that fail to legalize
    (observed: 'failed to legalize operation func.return (i64, i64)')."""
    return (jax.default_backend() == "tpu" and n >= 4096
            and dtype == jnp.float32
            and not jax.config.jax_enable_x64)


def _nbody_kernel(
    n_ref,            # [1,1] SMEM: true source count
    row_ids_ref,      # [TILE_I, 1] VMEM int32: global column index of each
    #                   row (-1 for padding rows; masks the self pair even
    #                   for scattered row subsets)
    pos_row,          # [TILE_I, 3] VMEM (this block's rows)
    vel_row,          # [TILE_I, 3]
    pos_t,            # [3, Np] VMEM (all columns, lane-major)
    vel_t,            # [3, Np]
    mass2d,           # [1, Np]
    cols8,            # [8, Np] VMEM (x,y,z,vx,vy,vz,1,|x|^2) lane-major (a
    #                   row-major [Np, 8] would pad the 8-wide lane dim to
    #                   128 and blow VMEM 16x) — the MXU reduction operand
    #                   (zeros when use_mxu=False)
    acc_out,          # [TILE_I, 3]
    jerk_out,         # [TILE_I, 3]
    pot_out,          # [TILE_I, 1]
    *,
    eps2: float,
    g: float,
    n_padded: int,
    with_jerk: bool = True,
    group_size: int = 0,
    pot_eps2: float | None = None,
    use_mxu: bool = False,
    tile_i: int = TILE_I,
    tile_j: int = TILE_J,
):
    n_true = n_ref[0, 0]
    row_ids = row_ids_ref[:, 0:1]
    # default-softened potential rides the Sw matmul (see body_mxu); for
    # small eps2 the |x|^2-decomposition's close-pair cancellation exceeds
    # the kernel's error budget, so the explicit per-pair sum stays there
    pot_via_mxu = use_mxu and pot_eps2 is None and eps2 >= 1e-2

    xi = pos_row[:, 0:1]
    yi = pos_row[:, 1:2]
    zi = pos_row[:, 2:3]
    vxi = vel_row[:, 0:1]
    vyi = vel_row[:, 1:2]
    vzi = vel_row[:, 2:3]

    num_j = n_padded // tile_j
    if group_size > 0:
        # block-diagonal column window: a row tile only interacts with the
        # column tiles overlapping its own group(s), so a B-realization
        # flattened ensemble costs O(B*N^2) pair work instead of O((B*N)^2).
        # The window is derived from the tile's row ids (works for the
        # contiguous flat-ensemble layout AND scattered block-timestep row
        # subsets); the in-loop group mask stays, handling partial overlap.
        ids1d = row_ids_ref[:, 0]
        big = jnp.int32(2**30)
        id_min = jnp.min(jnp.where(ids1d >= 0, ids1d, big))
        id_max = jnp.max(ids1d)  # padding rows are -1, never the max
        g_lo = id_min // group_size
        g_hi = id_max // group_size
        jt_lo = jnp.minimum((g_lo * group_size) // tile_j, num_j)
        jt_hi = jnp.minimum(-(-((g_hi + 1) * group_size) // tile_j), num_j)
        # all-padding tile: id_min=big, id_max=-1 -> jt_lo >= jt_hi -> no work
        jt_lo = jnp.minimum(jt_lo, jt_hi)
    def _pair_weights(jt):
        """Shared per-tile-pair VPU work: (w, inv_r2, geometry)."""
        j0 = jt * tile_j  # int32: the loop bounds below pin the index dtype
        cols = pos_t[:, pl.ds(j0, tile_j)]          # [3, tile_j] -> rows
        xj = cols[0:1, :]
        yj = cols[1:2, :]
        zj = cols[2:3, :]
        vcols = vel_t[:, pl.ds(j0, tile_j)]
        vxj = vcols[0:1, :]
        vyj = vcols[1:2, :]
        vzj = vcols[2:3, :]
        mj = mass2d[0:1, pl.ds(j0, tile_j)]         # [1, tile_j]

        dx = xj - xi                                 # [TILE_I, TILE_J]
        dy = yj - yi
        dz = zj - zi
        r2 = dx * dx + dy * dy + dz * dz + eps2

        col_ids = j0 + jax.lax.broadcasted_iota(jnp.int32, (1, tile_j), 1)
        # mask self pairs AND padding columns. Padding masses are zero, so
        # the mj-weighted sums would vanish anyway — but without the
        # col_ids < n_true term a row whose position coincides with a
        # zero-padded origin column would produce inv_r = inf (eps2 floor
        # 1e-30) and w = 0 * inf = NaN; the explicit mask keeps the
        # invariant independent of the wrapper's zero-padding (advisor r2)
        valid = (col_ids != row_ids) & (col_ids < n_true)
        if group_size > 0:
            # block-diagonal ensembles: interactions only within the same
            # realization (rows/cols of one group of `group_size` stars)
            valid &= (col_ids // group_size) == (row_ids // group_size)

        inv_r = jax.lax.rsqrt(r2)
        inv_r = jnp.where(valid, inv_r, 0.0)
        inv_r2 = inv_r * inv_r
        w = mj * (inv_r * inv_r2)                    # m_j / r^3, masked
        return (j0, mj, valid, r2, inv_r, inv_r2, w,
                dx, dy, dz, vxj, vyj, vzj)

    def _pot_update(pot, mj, valid, r2, inv_r):
        if pot_eps2 is None:
            return pot - jnp.sum(mj * inv_r, axis=1, keepdims=True)
        # separately-softened potential (pot_eps2=1e-30 ~ unsoftened):
        # lets ONE sweep return BHTree-softened forces AND the raw
        # potential the virial radius needs (al26_nbody.py:770), instead
        # of a second full O(N^2) pass per step
        inv_rp = jax.lax.rsqrt(r2 - eps2 + pot_eps2)
        inv_rp = jnp.where(valid, inv_rp, 0.0)
        return pot - jnp.sum(mj * inv_rp, axis=1, keepdims=True)

    def body(jt, carry):
        ax, ay, az, jx, jy, jz, pot = carry
        (j0, mj, valid, r2, inv_r, inv_r2, w,
         dx, dy, dz, vxj, vyj, vzj) = _pair_weights(jt)

        ax = ax + jnp.sum(w * dx, axis=1, keepdims=True)
        ay = ay + jnp.sum(w * dy, axis=1, keepdims=True)
        az = az + jnp.sum(w * dz, axis=1, keepdims=True)

        if with_jerk:
            dvx = vxj - vxi
            dvy = vyj - vyi
            dvz = vzj - vzi
            # 3 (x.v) / r^2 with the mask folded into w already
            s = 3.0 * (dx * dvx + dy * dvy + dz * dvz) * inv_r2
            jx = jx + jnp.sum(w * (dvx - s * dx), axis=1, keepdims=True)
            jy = jy + jnp.sum(w * (dvy - s * dy), axis=1, keepdims=True)
            jz = jz + jnp.sum(w * (dvz - s * dz), axis=1, keepdims=True)

        pot = _pot_update(pot, mj, valid, r2, inv_r)
        return ax, ay, az, jx, jy, jz, pot

    def body_mxu(jt, carry):
        # MXU offload: the per-pair reduction sums become two
        # [TILE_I, TILE_J] @ [TILE_J, 8] matmuls against the precomputed
        # column matrix C8 = (x, y, z, vx, vy, vz, 1, |x_j|^2):
        #   S  = w  @ C8 -> (sum w x_j, ..., sum w v_j, sum w, sum w|x_j|^2)
        #   Ss = ws @ C8    (ws = w * (dx.dv)/r^2; the jerk's factor 3 is
        #                    applied once after the loop, not per pair)
        # and the difference sums are recovered AFTER the j-loop as
        # e.g. sum w dx = S[x] - x_i S[1] (gravity's linearity in x_j);
        # inputs are pre-centred on the centre of mass in the wrapper to
        # bound the big-minus-big cancellation this decomposition has.
        # The default-softened potential rides the SAME matmul: w r^2 =
        # m_j/r, so sum m_j/r = S[7] + (|x_i|^2 + eps2) S[1] - 2 x_i.S[0:3]
        # — zero per-pair potential work (pot_eps2 runs keep the explicit
        # second rsqrt).
        Sw, Sws, pot = carry
        (j0, mj, valid, r2, inv_r, inv_r2, w,
         dx, dy, dz, vxj, vyj, vzj) = _pair_weights(jt)
        c8t = cols8[:, pl.ds(j0, tile_j)]            # [8, tile_j]
        # contract the TILE_J axis of both (rhs pre-transposed layout)
        dn = (((1,), (1,)), ((), ()))
        Sw = Sw + jax.lax.dot_general(
            w, c8t, dn, preferred_element_type=jnp.float32)
        if with_jerk:
            dvx = vxj - vxi
            dvy = vyj - vyi
            dvz = vzj - vzi
            s = (dx * dvx + dy * dvy + dz * dvz) * inv_r2
            Sws = Sws + jax.lax.dot_general(
                w * s, c8t, dn, preferred_element_type=jnp.float32)
        if not pot_via_mxu:
            pot = _pot_update(pot, mj, valid, r2, inv_r)
        return Sw, Sws, pot

    zeros = jnp.zeros((tile_i, 1), jnp.float32)
    # int32 loop bounds: under jax_enable_x64 python-int bounds make the
    # induction variable int64, whose promotion into the int32 column-index
    # compare sends Mosaic lowering into infinite recursion
    if group_size > 0:
        bounds = (jt_lo.astype(jnp.int32), jt_hi.astype(jnp.int32))
    else:
        bounds = (jnp.int32(0), jnp.int32(num_j))
    if use_mxu:
        zeros8 = jnp.zeros((tile_i, 8), jnp.float32)
        Sw, Sws, pot = jax.lax.fori_loop(
            bounds[0], bounds[1], body_mxu, (zeros8, zeros8, zeros)
        )
        sw1 = Sw[:, 6:7]
        ax = Sw[:, 0:1] - xi * sw1
        ay = Sw[:, 1:2] - yi * sw1
        az = Sw[:, 2:3] - zi * sw1
        sws1 = Sws[:, 6:7]
        # the jerk's factor 3 (ws carries (dx.dv)/r^2, not 3(dx.dv)/r^2)
        # is applied here once per row instead of once per pair
        jx = (Sw[:, 3:4] - vxi * sw1) - 3.0 * (Sws[:, 0:1] - xi * sws1)
        jy = (Sw[:, 4:5] - vyi * sw1) - 3.0 * (Sws[:, 1:2] - yi * sws1)
        jz = (Sw[:, 5:6] - vzi * sw1) - 3.0 * (Sws[:, 2:3] - zi * sws1)
        if pot_via_mxu:
            # sum m_j/r = sum w r^2 with r^2 = |x_j|^2 - 2 x_i.x_j +
            # |x_i|^2 + eps2, all of whose w-weighted sums sit in Sw
            # (C8's 8th column is |x_j|^2; sum w x_j = a + x_i sum w):
            #   sum w r^2 = S7 - 2 x_i.a - |x_i|^2 sw1 + eps2 sw1
            xi2 = xi * xi + yi * yi + zi * zi
            pot = -(Sw[:, 7:8] + (eps2 - xi2) * sw1
                    - 2.0 * (xi * ax + yi * ay + zi * az))
    else:
        ax, ay, az, jx, jy, jz, pot = jax.lax.fori_loop(
            bounds[0], bounds[1], body, (zeros,) * 7
        )
    acc_out[:, 0:1] = g * ax
    acc_out[:, 1:2] = g * ay
    acc_out[:, 2:3] = g * az
    jerk_out[:, 0:1] = g * jx
    jerk_out[:, 1:2] = g * jy
    jerk_out[:, 2:3] = g * jz
    pot_out[:, :] = g * pot


def _pad_rows(a: jax.Array, n_padded: int) -> jax.Array:
    pad = n_padded - a.shape[0]
    if pad:
        a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
    return a


@functools.partial(jax.jit,
                   static_argnames=("eps2", "g", "interpret", "with_jerk",
                                    "group_size", "pot_eps2", "use_mxu",
                                    "tile_j"))
def pallas_acc_jerk_pot(
    pos: jax.Array,
    vel: jax.Array,
    mass: jax.Array,
    eps2: float = 0.0,
    g: float = G_INTERNAL,
    interpret: bool | None = None,
    with_jerk: bool = True,
    group_size: int = 0,
    pot_eps2: float | None = None,
    use_mxu: bool = True,
    tile_j: int | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(acc [N,3], jerk [N,3], pot [N]) via the tiled TPU kernel. f32.

    `with_jerk=False` skips the jerk accumulation (~40% of the pair work) —
    the leapfrog/BHTree-parity path needs only accelerations.
    `pot_eps2` softens the potential separately from the forces (1e-30 ~
    unsoftened) so one sweep serves both the integrator and the virial
    radius. `interpret=None` auto-selects interpreter mode off-TPU so the
    kernel is testable on the CPU backend."""
    return pallas_acc_jerk_pot_rows(
        pos, vel, jnp.arange(pos.shape[0], dtype=jnp.int32), pos, vel, mass,
        eps2=eps2, g=g, interpret=interpret, with_jerk=with_jerk,
        group_size=group_size, pot_eps2=pot_eps2, use_mxu=use_mxu,
        tile_j=tile_j,
    )


@functools.partial(jax.jit,
                   static_argnames=("eps2", "g", "interpret", "with_jerk",
                                    "group_size", "pot_eps2", "use_mxu",
                                    "tile_i", "tile_j"))
def pallas_acc_jerk_pot_rows(
    pos_rows: jax.Array,   # [B,3]  target rows (a subset of the columns)
    vel_rows: jax.Array,   # [B,3]
    row_ids: jax.Array,    # [B] int32: global column index of each row
    #                        (any order/subset; -1 = padding row)
    pos: jax.Array,        # [N,3]  ALL source columns
    vel: jax.Array,        # [N,3]
    mass: jax.Array,       # [N]
    eps2: float = 0.0,
    g: float = G_INTERNAL,
    interpret: bool | None = None,
    with_jerk: bool = True,
    group_size: int = 0,
    pot_eps2: float | None = None,
    use_mxu: bool = True,
    tile_i: int = TILE_I,
    tile_j: int | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Row-subset variant: forces on `pos_rows` from all of `pos`.

    `tile_i` sets the row-tile height (default 256): a small scattered row
    subset (the block-timestep ultra tier) pads to tile_i rows, so a
    64-row call with tile_i=64 costs 1/4 of the default padding.

    `tile_j` sets the column-tile width (None = auto): big single-cluster
    sweeps use TILE_J_WIDE=2048 — fewer fori_loop trips and larger MXU
    contractions, ~1.5x the 512-tile throughput at N=131072 on v5e —
    while group-windowed (ensemble) sweeps keep 512 so the block-diagonal
    column window stays tight. VMEM bounds tile_i * tile_j at ~2^19
    (256x4096 and 512x2048 fail to compile on v5e).

    use_mxu=True routes the per-pair reduction sums through the MXU as two
    small matmuls (see _nbody_kernel.body_mxu); inputs are pre-centred on
    the mean position/velocity to bound the decomposition's cancellation
    error (~1e-4 relative in f32, tests/test_pallas.py).

    group_size > 0 restricts interactions to stars in the same group
    (global_index // group_size): a flattened ensemble of B realizations of
    group_size stars runs as ONE block-diagonal sweep — far faster than a
    vmapped dense force, which materialises [B,N,N,3] temporaries.

    Used by (a) the multi-chip path (parallel.sharded) with a contiguous
    row block per chip, and (b) the block-timestep Hermite's fast-group
    subcycle (ops.integrators) with a SCATTERED row subset. Self pairs are
    masked by comparing each row's global id against the column index."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # group-masked (flattened-ensemble) sweeps are deposition-bound, not
    # force-bound, and their many-invalid-pair rows worsen the MXU
    # decomposition's relative cancellation — keep them on the exact VPU
    # difference sums
    use_mxu = use_mxu and group_size == 0
    if not interpret and jax.config.jax_enable_x64:
        raise RuntimeError(
            "the Pallas N-body kernel cannot compile with jax_enable_x64 "
            "(Mosaic has no i64 support); disable x64 or use the jnp "
            "force path (ops.nbody)"
        )
    if eps2 == 0.0:
        # eps2 == 0.0 exactly sends the Mosaic compiler into a >10 min hang
        # (observed on v5e); 1e-30 is numerically inert here (self-pairs are
        # masked and real pair distances are >> 1e-15) and compiles fine.
        eps2 = 1e-30
    if use_mxu:
        # translation/boost invariance of the forces: centring bounds the
        # |x| scale entering the sum(w x_j) - x_i sum(w) decomposition
        c_pos = jnp.mean(pos, axis=0)
        c_vel = jnp.mean(vel, axis=0)
        pos = pos - c_pos
        vel = vel - c_vel
        pos_rows = pos_rows - c_pos
        vel_rows = vel_rows - c_vel
    b = pos_rows.shape[0]
    n = pos.shape[0]
    if tile_j is None:
        # the pure-VPU body (use_mxu=False, incl. all group-windowed
        # sweeps) holds more live [tile_i, tile_j] temporaries and fails
        # to compile at 256x2048 (measured) — wide tiles are an
        # MXU-body-only optimisation
        tile_j = _auto_tile_j(n, group_size) if use_mxu else TILE_J
    _check_tiles(tile_i, tile_j, with_jerk)
    b_padded = -(-b // tile_i) * tile_i
    n_padded = -(-n // tile_j) * tile_j

    f32 = jnp.float32
    rowsp = _pad_rows(pos_rows.astype(f32), b_padded)
    vrowsp = _pad_rows(vel_rows.astype(f32), b_padded)
    idsp = jnp.pad(row_ids.astype(jnp.int32), (0, b_padded - b),
                   constant_values=-1)[:, None]
    posp = _pad_rows(pos.astype(f32), n_padded)
    velp = _pad_rows(vel.astype(f32), n_padded)
    massp = _pad_rows(mass.astype(f32), n_padded)

    pos_t = posp.T                      # [3, Np]
    vel_t = velp.T
    mass2d = massp[None, :]             # [1, Np]
    n_arr = jnp.full((1, 1), n, jnp.int32)
    if use_mxu:
        cols8 = jnp.concatenate(
            [pos_t, vel_t, jnp.ones((1, n_padded), f32),
             jnp.sum(posp * posp, axis=1)[None, :]],
            axis=0)  # [8, Np] lane-major: (x, y, z, vx, vy, vz, 1, |x|^2)
    else:
        cols8 = jnp.zeros((8, 8), f32)  # untouched placeholder

    grid = (b_padded // tile_i,)
    kernel = functools.partial(
        _nbody_kernel, eps2=float(eps2), g=float(g), n_padded=n_padded,
        with_jerk=with_jerk, group_size=group_size,
        pot_eps2=None if pot_eps2 is None else float(pot_eps2),
        use_mxu=use_mxu, tile_i=tile_i, tile_j=tile_j,
    )
    flops_per_pair = 50 if with_jerk else 30
    acc, jerk, pot = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_i, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_padded), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_padded), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_padded), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cols8.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_i, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_padded, 3), f32),
            jax.ShapeDtypeStruct((b_padded, 3), f32),
            jax.ShapeDtypeStruct((b_padded, 1), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * b_padded * n_padded,
            bytes_accessed=7 * 4 * (b_padded + n_padded),
            transcendentals=b_padded * n_padded,
        ),
        interpret=interpret,
    )(n_arr, idsp, rowsp, vrowsp, pos_t, vel_t, mass2d, cols8)
    return (
        acc[:b].astype(pos_rows.dtype),
        jerk[:b].astype(pos_rows.dtype),
        pot[:b, 0].astype(pos_rows.dtype),
    )


def make_pallas_force(mass: jax.Array, eps2: float | jax.Array = 0.0,
                      g: float = G_INTERNAL):
    """`force_fn(pos, vel) -> (acc, jerk)` using the tiled kernel (plugs
    into ops.integrators.hermite4_advance)."""

    def force_fn(pos, vel):
        a, j, _ = pallas_acc_jerk_pot(pos, vel, mass, float(eps2), g)
        return a, j

    return force_fn


def make_pallas_acc(mass: jax.Array, eps2: float | jax.Array = 0.0,
                    g: float = G_INTERNAL):
    """`acc_fn(pos) -> acc` (acceleration only) for the leapfrog path."""

    def acc_fn(pos):
        a, _, _ = pallas_acc_jerk_pot(
            pos, jnp.zeros_like(pos), mass, float(eps2), g, with_jerk=False
        )
        return a

    return acc_fn


def make_pallas_force_rows(mass: jax.Array, eps2: float | jax.Array = 0.0,
                           g: float = G_INTERNAL):
    """`force_rows_fn(pos_rows, vel_rows, row_ids, pos_all, vel_all) ->
    (acc, jerk)` for the block-timestep fast-group subcycle."""

    def force_rows_fn(pr, vr, ids, p_all, v_all):
        # a <= 64-row call (the ultra tier) uses a matching small row tile
        # so it is not padded to the default 256 rows
        ti = 64 if pr.shape[0] <= 64 else TILE_I
        a, j, _ = pallas_acc_jerk_pot_rows(
            pr, vr, ids, p_all, v_all, mass, eps2=float(eps2), g=g,
            tile_i=ti,
        )
        return a, j

    return force_rows_fn


# --------------------------------------------------------------------------
# Predicted-columns kernel: the fast-group subcycle's K x N row sweep with
# the Hermite column prediction fused INTO the kernel
# --------------------------------------------------------------------------

def _nbody_predcols_kernel(
    n_ref,            # [1,1] SMEM: true source count
    tau_ref,          # [1,1] SMEM f32: column prediction offset from the
    #                   step-start state
    row_ids_ref,      # [TILE_I, 1] VMEM int32 (see _nbody_kernel)
    pos_row,          # [TILE_I, 3] predicted fast rows (centred, shifted)
    vel_row,          # [TILE_I, 3]
    pos_t,            # [3, Np] centred STEP-START columns
    vel_t,            # [3, Np]
    a_t,              # [3, Np] step-start acceleration (column derivative)
    j_t,              # [3, Np] step-start jerk
    mass2d,           # [1, Np]
    acc_out,          # [TILE_I, 3]
    jerk_out,         # [TILE_I, 3]
    c8_scratch,       # [8, TILE_J] VMEM scratch: the per-tile MXU operand
    *,
    eps2: float,
    g: float,
    n_padded: int,
    use_mxu: bool,
    tile_i: int,
    tile_j: int,
):
    """K x N forces on predicted fast rows from columns PREDICTED IN-KERNEL.

    The unfused subcycle materialises the full predicted column set every
    substep in XLA (predict_all + fast-row scatter, sim ops on [N,3] HBM
    arrays) before each K x N row sweep — at N=102400 that per-substep O(N)
    prep cost as much as the pair work itself. Here each column tile is
    predicted on the VPU from the step-start (pos, vel, acc, jerk) already
    resident in VMEM:  p(tau) = p + tau v + tau^2/2 a + tau^3/6 j  (the
    same Hermite predictor polynomial, al26_nbody.py's AMUSE predictor
    analogue), so a substep is ONE kernel launch with no O(N) XLA ops.

    Fast columns are NOT overridden with their subcycled state here — pair
    forces are linear in source terms, so the caller adds the exact
    correction  sum_{j in fast} [f(x_j^sub) - f(x_j^pred)]  from a K x K
    dense evaluation (ops.integrators._fast_override_delta)."""
    n_true = n_ref[0, 0]
    tau = tau_ref[0, 0]
    row_ids = row_ids_ref[:, 0:1]

    xi = pos_row[:, 0:1]
    yi = pos_row[:, 1:2]
    zi = pos_row[:, 2:3]
    vxi = vel_row[:, 0:1]
    vyi = vel_row[:, 1:2]
    vzi = vel_row[:, 2:3]

    t2h = 0.5 * tau * tau
    t3h = t2h * tau * (1.0 / 3.0)
    num_j = n_padded // tile_j

    def _cols(jt):
        """Predict the [3, tile_j] column block at tau, plus per-pair w."""
        j0 = jt * tile_j
        ds = pl.ds(j0, tile_j)
        p = pos_t[:, ds]
        v = vel_t[:, ds]
        a = a_t[:, ds]
        jj = j_t[:, ds]
        pj3 = p + tau * v + t2h * a + t3h * jj       # [3, tile_j]
        vj3 = v + tau * a + t2h * jj
        mj = mass2d[0:1, ds]

        dx = pj3[0:1, :] - xi                        # [tile_i, tile_j]
        dy = pj3[1:2, :] - yi
        dz = pj3[2:3, :] - zi
        r2 = dx * dx + dy * dy + dz * dz + eps2

        col_ids = j0 + jax.lax.broadcasted_iota(jnp.int32, (1, tile_j), 1)
        valid = (col_ids != row_ids) & (col_ids < n_true)
        inv_r = jax.lax.rsqrt(r2)
        inv_r = jnp.where(valid, inv_r, 0.0)
        inv_r2 = inv_r * inv_r
        w = mj * (inv_r * inv_r2)                    # m_j / r^3, masked
        return j0, pj3, vj3, w, inv_r2, dx, dy, dz

    def body(jt, carry):
        ax, ay, az, jx, jy, jz = carry
        j0, pj3, vj3, w, inv_r2, dx, dy, dz = _cols(jt)
        dvx = vj3[0:1, :] - vxi
        dvy = vj3[1:2, :] - vyi
        dvz = vj3[2:3, :] - vzi
        ax = ax + jnp.sum(w * dx, axis=1, keepdims=True)
        ay = ay + jnp.sum(w * dy, axis=1, keepdims=True)
        az = az + jnp.sum(w * dz, axis=1, keepdims=True)
        s = 3.0 * (dx * dvx + dy * dvy + dz * dvz) * inv_r2
        jx = jx + jnp.sum(w * (dvx - s * dx), axis=1, keepdims=True)
        jy = jy + jnp.sum(w * (dvy - s * dy), axis=1, keepdims=True)
        jz = jz + jnp.sum(w * (dvz - s * dz), axis=1, keepdims=True)
        return ax, ay, az, jx, jy, jz

    def body_mxu(jt, carry):
        # same MXU offload as _nbody_kernel.body_mxu, with the C8 operand
        # (x, y, z, vx, vy, vz, 1, |x|^2) built per tile from the
        # PREDICTED columns in VMEM scratch
        Sw, Sws = carry
        j0, pj3, vj3, w, inv_r2, dx, dy, dz = _cols(jt)
        c8_scratch[0:3, :] = pj3
        c8_scratch[3:6, :] = vj3
        c8_scratch[6:7, :] = jnp.ones((1, tile_j), jnp.float32)
        c8_scratch[7:8, :] = jnp.sum(pj3 * pj3, axis=0, keepdims=True)
        c8t = c8_scratch[:, :]
        dn = (((1,), (1,)), ((), ()))
        Sw = Sw + jax.lax.dot_general(
            w, c8t, dn, preferred_element_type=jnp.float32)
        dvx = vj3[0:1, :] - vxi
        dvy = vj3[1:2, :] - vyi
        dvz = vj3[2:3, :] - vzi
        s = (dx * dvx + dy * dvy + dz * dvz) * inv_r2
        Sws = Sws + jax.lax.dot_general(
            w * s, c8t, dn, preferred_element_type=jnp.float32)
        return Sw, Sws

    bounds = (jnp.int32(0), jnp.int32(num_j))
    if use_mxu:
        zeros8 = jnp.zeros((tile_i, 8), jnp.float32)
        Sw, Sws = jax.lax.fori_loop(bounds[0], bounds[1], body_mxu,
                                    (zeros8, zeros8))
        sw1 = Sw[:, 6:7]
        ax = Sw[:, 0:1] - xi * sw1
        ay = Sw[:, 1:2] - yi * sw1
        az = Sw[:, 2:3] - zi * sw1
        sws1 = Sws[:, 6:7]
        jx = (Sw[:, 3:4] - vxi * sw1) - 3.0 * (Sws[:, 0:1] - xi * sws1)
        jy = (Sw[:, 4:5] - vyi * sw1) - 3.0 * (Sws[:, 1:2] - yi * sws1)
        jz = (Sw[:, 5:6] - vzi * sw1) - 3.0 * (Sws[:, 2:3] - zi * sws1)
    else:
        zeros = jnp.zeros((tile_i, 1), jnp.float32)
        ax, ay, az, jx, jy, jz = jax.lax.fori_loop(
            bounds[0], bounds[1], body, (zeros,) * 6
        )
    acc_out[:, 0:1] = g * ax
    acc_out[:, 1:2] = g * ay
    acc_out[:, 2:3] = g * az
    jerk_out[:, 0:1] = g * jx
    jerk_out[:, 1:2] = g * jy
    jerk_out[:, 2:3] = g * jz


def make_pred_force_rows(
    pos0: jax.Array,   # [N,3] step-start positions
    vel0: jax.Array,   # [N,3]
    a0: jax.Array,     # [N,3] step-start acceleration
    j0: jax.Array,     # [N,3] step-start jerk
    mass: jax.Array,   # [N]
    eps2: float = 0.0,
    g: float = G_INTERNAL,
    interpret: bool | None = None,
    use_mxu: bool = True,
    tile_i: int = TILE_I,
    tile_j: int | None = None,
):
    """`rows_at(pos_rows, vel_rows, row_ids, tau) -> (acc, jerk)` with the
    column prediction fused into the kernel (_nbody_predcols_kernel).

    The one-time column prep (mean-centring, padding, [3,N] transposes)
    happens HERE, outside the substep loop; each substep then costs one
    kernel launch. Centring uses the step-start means; predicted columns
    from centred inputs drift by tau * c_vel, so the row states are shifted
    by c_pos + tau * c_vel per call to stay translation-consistent (forces
    are invariant, so outputs need no uncentring)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not interpret and jax.config.jax_enable_x64:
        raise RuntimeError(
            "the Pallas N-body kernel cannot compile with jax_enable_x64 "
            "(Mosaic has no i64 support); disable x64 or use the jnp "
            "force path (ops.nbody)"
        )
    if eps2 == 0.0:
        eps2 = 1e-30  # Mosaic hang guard, see pallas_acc_jerk_pot_rows
    f32 = jnp.float32
    n = pos0.shape[0]
    if tile_j is None:
        # wide tiles are MXU-body-only, as in pallas_acc_jerk_pot_rows
        tile_j = _auto_tile_j(n, 0) if use_mxu else TILE_J
    _check_tiles(tile_i, tile_j)
    n_padded = -(-n // tile_j) * tile_j

    c_pos = jnp.mean(pos0, axis=0)
    c_vel = jnp.mean(vel0, axis=0)
    pos_t = _pad_rows((pos0 - c_pos).astype(f32), n_padded).T   # [3, Np]
    vel_t = _pad_rows((vel0 - c_vel).astype(f32), n_padded).T
    a_t = _pad_rows(a0.astype(f32), n_padded).T
    j_t = _pad_rows(j0.astype(f32), n_padded).T
    mass2d = _pad_rows(mass.astype(f32), n_padded)[None, :]
    n_arr = jnp.full((1, 1), n, jnp.int32)

    kernel = functools.partial(
        _nbody_predcols_kernel, eps2=float(eps2), g=float(g),
        n_padded=n_padded, use_mxu=use_mxu, tile_i=tile_i, tile_j=tile_j,
    )

    def rows_at(pos_rows, vel_rows, row_ids, tau):
        dtype = pos_rows.dtype
        b = pos_rows.shape[0]
        b_padded = -(-b // tile_i) * tile_i
        tau32 = tau.astype(f32)
        rowsp = _pad_rows(
            (pos_rows - (c_pos + tau * c_vel)).astype(f32), b_padded)
        vrowsp = _pad_rows((vel_rows - c_vel).astype(f32), b_padded)
        idsp = jnp.pad(row_ids.astype(jnp.int32), (0, b_padded - b),
                       constant_values=-1)[:, None]
        tau_arr = jnp.full((1, 1), tau32, f32)
        grid = (b_padded // tile_i,)
        acc, jerk = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile_i, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_i, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_i, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, n_padded), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, n_padded), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, n_padded), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, n_padded), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_padded), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile_i, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_i, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b_padded, 3), f32),
                jax.ShapeDtypeStruct((b_padded, 3), f32),
            ],
            scratch_shapes=[pltpu.VMEM((8, tile_j), f32)],
            cost_estimate=pl.CostEstimate(
                flops=50 * b_padded * n_padded,
                bytes_accessed=13 * 4 * (b_padded + n_padded),
                transcendentals=b_padded * n_padded,
            ),
            interpret=interpret,
        )(n_arr, tau_arr, idsp, rowsp, vrowsp,
          pos_t, vel_t, a_t, j_t, mass2d)
        return acc[:b].astype(dtype), jerk[:b].astype(dtype)

    return rows_at
