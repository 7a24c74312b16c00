"""Pallas TPU kernel: the Barnes-Hut tier's exact near field.

ops.tree resolves the MAC-failing (target block, source block) leaf
pairs with an XLA ``lax.scan`` over gathered [L, L] tiles
(tree._p2p_near_field). That is correct and portable, but on the real
chip the gather/scatter scan only reaches parity with the *exact*
direct-summation Pallas kernel (measured: 1.16x at N=131072, 0.94x at
N=4e5) — the ~8x pair-work reduction the tree buys algorithmically is
given back in launch/gather overhead. This module is the kernel that
cashes it in: the flat pair list drives a ``PrefetchScalarGridSpec``
grid, one (target, source) [L, L] tile per grid step,

  * the target block's rows and the per-target accumulators are selected
    by a scalar-prefetched index map (the pair list is target-major, so
    each output block is resident in VMEM for its whole contiguous run
    of pairs: zeroed on first visit, accumulated in place, written back
    once when the target changes — the classic revisited-output
    reduction pattern);
  * ALL source columns stay resident in VMEM in the direct kernel's
    lane-major [3, Np] layout (ops/pallas_nbody.py) and each step slices
    its source block with one aligned dynamic slice — no gathers at all;
  * padding pairs are routed to a dummy target block B (discarded), so
    they cost one tile of dead work instead of a masked scatter;
  * self pairs mask by sorted global index (each star occupies exactly
    one (block, slot)), and pad columns mask by ``gcol < n`` exactly as
    the direct kernel masks its padding columns.

Same physics conventions as tree._p2p_near_field: forces softened by
``eps2``, potential optionally by ``pot_eps2`` (one sweep serves the
integrator and the virial radius), G applied per accumulate. Equality
against the XLA near field is pinned in tests/test_tree.py.

Reference parity: this near field is the exact-P2P half of the
reference's default BHTree gravity solver (al26_nbody.py:59,1712-1714);
accuracy class is set by the MAC in ops.tree, not here — this kernel is
bit-for-bit the same pair sum, just scheduled for the TPU.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..units import G_INTERNAL


def _near_kernel(
    ti_ref,           # [P] int32 prefetch: target block per pair (B = dummy)
    sj_ref,           # [P] int32 prefetch: source block per pair
    nn_ref,           # [1] int32 prefetch: true (unpadded) star count
    eps_ref,          # [1, 2] SMEM f32: (eps2, pot_eps2) — runtime values,
    #                   cfg softenings arrive traced through tree_acc_pot
    tgt_ref,          # [L, 3] VMEM: this pair's target block rows
    pos_src_ref,      # [3, Np] VMEM: ALL sorted columns, lane-major
    mass_ref,         # [1, Np] VMEM: sorted masses (pad = 0)
    acc_ref,          # [L, 3] VMEM out: target block acceleration
    pot_ref,          # [L, 1] VMEM out: target block potential
    *,
    leaf: int,
    g: float,
    with_pot_eps2: bool,
):
    c = pl.program_id(0)
    ti_c = ti_ref[c]
    sj_c = sj_ref[c]
    n_true = nn_ref[0]
    eps2 = eps_ref[0, 0]

    # the pair list is target-major: a target block's pairs are one
    # contiguous run of grid steps, so "first visit" is simply "the
    # target changed" (or step 0) and the accumulator is zeroed then
    first = jnp.logical_or(c == 0, ti_c != ti_ref[jnp.maximum(c - 1, 0)])

    @pl.when(first)
    def _init():
        acc_ref[:, :] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
        pot_ref[:, :] = jnp.zeros(pot_ref.shape, pot_ref.dtype)

    j0 = pl.multiple_of(sj_c * leaf, leaf)
    cols = pos_src_ref[:, pl.ds(j0, leaf)]            # [3, L]
    mj = mass_ref[0:1, pl.ds(j0, leaf)]               # [1, L]

    xi = tgt_ref[:, 0:1]                              # [L, 1]
    yi = tgt_ref[:, 1:2]
    zi = tgt_ref[:, 2:3]
    dx = cols[0:1, :] - xi                            # [L, L]
    dy = cols[1:2, :] - yi
    dz = cols[2:3, :] - zi
    r2 = dx * dx + dy * dy + dz * dz + eps2

    # sorted global indices: each star owns exactly one (block, slot), so
    # grow == gcol IS the self pair; gcol >= n_true are padding slots
    # (zero mass, but their replicated positions would make w = 0 * inf
    # NaN against the real star they duplicate — the same mask the direct
    # kernel applies to its padding columns, pallas_nbody.py:156-163)
    grow = ti_c * leaf + jax.lax.broadcasted_iota(jnp.int32, (leaf, 1), 0)
    gcol = j0 + jax.lax.broadcasted_iota(jnp.int32, (1, leaf), 1)
    valid = (gcol != grow) & (gcol < n_true)

    inv_r = jnp.where(valid, jax.lax.rsqrt(r2), 0.0)
    w = mj * (inv_r * inv_r * inv_r)                  # m_j / r^3, masked

    acc_ref[:, 0:1] += g * jnp.sum(w * dx, axis=1, keepdims=True)
    acc_ref[:, 1:2] += g * jnp.sum(w * dy, axis=1, keepdims=True)
    acc_ref[:, 2:3] += g * jnp.sum(w * dz, axis=1, keepdims=True)

    if with_pot_eps2:
        # separately-softened potential (tree._p2p_near_field convention:
        # one sweep returns BHTree-softened forces AND the near-raw
        # potential the virial radius needs)
        pot_eps2 = eps_ref[0, 1]
        inv_r = jnp.where(valid, jax.lax.rsqrt(r2 - eps2 + pot_eps2), 0.0)
    pot_ref[:, 0:1] += -g * jnp.sum(mj * inv_r, axis=1, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("leaf", "kavg", "g", "interpret"),
)
def pallas_p2p_near_field(
    pos_s: jax.Array,     # [B, L, 3] sorted, padded block positions
    mass_s: jax.Array,    # [B, L] sorted, padded masses (pad = 0)
    p2p: jax.Array,       # [B, B] bool: target block i needs source block j
    n_true: jax.Array,    # scalar int: unpadded star count
    eps2: jax.Array | float,
    *,
    leaf: int,
    kavg: int,
    g: float = G_INTERNAL,
    pot_eps2: jax.Array | float | None = None,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(acc [B,L,3], pot [B,L], overflow) — drop-in for the XLA
    tree._p2p_near_field, computed in f32 (the tier's production dtype;
    inputs are cast in, outputs cast back).

    The [B, B] mask is packed into one flat target-major pair list padded
    to the static ``kavg * B`` budget (excess pairs are dropped and
    ``overflow`` set — callers treat that as an error, ops.tree poisons);
    each grid step resolves one exact [L, L] pair tile.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not interpret and jax.config.jax_enable_x64:
        raise RuntimeError(
            "the Pallas tree near-field kernel cannot compile with "
            "jax_enable_x64 (Mosaic has no i64 support); disable x64 or "
            "use the XLA near field (ops.tree._p2p_near_field)"
        )
    f32 = jnp.float32
    b, L, _ = pos_s.shape
    assert L == leaf
    npd = b * leaf
    budget = min(kavg * b, b * b)
    # eps2 == 0 floor (numerically inert — self pairs masked, real pair
    # distances >> 1e-15; same guard as pallas_acc_jerk_pot_rows)
    eps2 = jnp.maximum(jnp.asarray(eps2, f32), 1e-30)
    eps_arr = jnp.stack(
        [eps2, jnp.asarray(0.0 if pot_eps2 is None else pot_eps2, f32)]
    ).reshape(1, 2)

    flat = p2p.reshape(-1)
    overflow = jnp.sum(flat) > budget
    idx = jnp.argsort(~flat, stable=True)[:budget]
    ok = flat[idx]
    # padding pairs go to the dummy target block b (zeros, discarded) so
    # they can never re-zero a real block's finished accumulator; their
    # source index is irrelevant (block 0 is always resident)
    ti = jnp.where(ok, (idx // b), b).astype(jnp.int32)
    sj = jnp.where(ok, (idx % b), 0).astype(jnp.int32)
    nn = jnp.asarray(n_true, jnp.int32).reshape(1)

    pos_f = pos_s.astype(f32)
    tgt_rows = jnp.concatenate(
        [pos_f.reshape(npd, 3), jnp.zeros((leaf, 3), f32)], axis=0
    )                                                  # [(B+1)*L, 3]
    pos_src = pos_f.reshape(npd, 3).T                  # [3, Np] lane-major
    mass2d = mass_s.astype(f32).reshape(1, npd)

    kernel = functools.partial(
        _near_kernel, leaf=leaf, g=float(g),
        with_pot_eps2=pot_eps2 is not None,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(budget,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda c, ti, sj, nn: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((leaf, 3), lambda c, ti, sj, nn: (ti[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, npd), lambda c, ti, sj, nn: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npd), lambda c, ti, sj, nn: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((leaf, 3), lambda c, ti, sj, nn: (ti[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((leaf, 1), lambda c, ti, sj, nn: (ti[c], 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    acc, pot = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((npd + leaf, 3), f32),
            jax.ShapeDtypeStruct((npd + leaf, 1), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=30 * budget * leaf * leaf,
            bytes_accessed=4 * (budget * leaf * 7 + 4 * npd),
            transcendentals=budget * leaf * leaf,
        ),
        interpret=interpret,
    )(ti, sj, nn, eps_arr, tgt_rows, pos_src, mass2d)

    dtype = pos_s.dtype
    return (
        acc[:npd].reshape(b, leaf, 3).astype(dtype),
        pot[:npd, 0].reshape(b, leaf).astype(dtype),
        overflow,
    )
