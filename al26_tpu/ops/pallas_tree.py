"""Pallas TPU kernel: the Barnes-Hut tier's exact near field.

ops.tree resolves the MAC-failing (target block, source block) leaf
pairs with an XLA ``lax.scan`` over gathered [L, L] tiles
(tree._p2p_near_field). That is correct and portable, but on the real
chip the gather/scatter scan only reaches parity with the *exact*
direct-summation Pallas kernel (measured: 1.16x at N=131072, 0.94x at
N=4e5) — the pair-work reduction the tree buys algorithmically is given
back in launch/gather overhead. This module is the kernel that cashes
it in: the flat pair list drives a ``PrefetchScalarGridSpec`` grid, one
(target, source) [L, L] tile per grid step.

Round-5 redesign (the round-4 kernel could not COMPILE at the N it
exists for: a single prefetched pair list of kavg*B int32 entries
exceeds the chip's 1 MiB SMEM at N = 4e5, and keeping all source
columns resident in VMEM put an N-ceiling right behind it):

  * the pair list is cut into SMEM-safe SEGMENTS, one ``pallas_call``
    per segment (a static python loop), partial outputs summed;
  * every segment carries one guaranteed, force-masked DIAGONAL pair
    per leaf block, so every output block is visited — and therefore
    zero-initialised — in every call (this also closes the advisor-r4
    hole where an un-visited block's out-buffer was returned
    uninitialised);
  * target AND source blocks stream through scalar-prefetched block
    index maps (sources were previously a resident [3, Np] VMEM array);
    per-step VMEM is now independent of N. Source re-fetches pipeline
    under the [L, L] tile arithmetic;
  * a per-pair ``ok`` word predicates the whole tile off for masked
    pairs (budget padding, the diagonal guarantees), so the x2
    auto-sizing slack in the budget costs DMA only, not arithmetic;
  * optional exact pairwise JERK (``with_jerk``) for the Hermite tier.

Budget/overflow semantics are shared with the XLA backend through
tree.near_budget (advisor r4: the two previously rounded differently
and could disagree at the boundary). Self pairs mask by sorted global
index; padding slots mask by ``gcol < n``; equality against the XLA
near field is pinned in tests/test_tree.py.

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

# SMEM holds the three per-pair prefetch words (ti, sj, ok as int32);
# keep a segment's 3 * 4 * (SEG + B) bytes comfortably under the 1 MiB
# SMEM so index maps, loop state and other scalars still fit.
_SEG_SMEM_WORDS = 53248


def _near_kernel(
    ti_ref,           # [P] int32 prefetch: target block per pair (B = dummy)
    sj_ref,           # [P] int32 prefetch: source block per pair
    ok_ref,           # [P] int32 prefetch: 1 = real pair, 0 = masked
    nn_ref,           # [1] int32 prefetch: true (unpadded) star count
    eps_ref,          # [1, 2] SMEM f32: (eps2, pot_eps2) — runtime values,
    #                   cfg softenings arrive traced through tree_acc_jerk_pot
    tgt_ref,          # [L, 3] VMEM: this pair's target block rows
    src_ref,          # [1, 3, L] VMEM: this pair's source block, lane-major
    mass_ref,         # [1, 1, L] VMEM: this pair's source masses (pad = 0)
    *refs,            # with_jerk: tgtv_ref [L,3], srcv_ref [1,3,L] then
    #                   outputs acc [L,3], pot [L,1] (+ jerk [L,3])
    leaf: int,
    g: float,
    with_pot_eps2: bool,
    with_jerk: bool,
):
    if with_jerk:
        tgtv_ref, srcv_ref, acc_ref, pot_ref, jerk_ref = refs
    else:
        acc_ref, pot_ref = refs
        tgtv_ref = srcv_ref = jerk_ref = None
    c = pl.program_id(0)
    ti_c = ti_ref[c]
    sj_c = sj_ref[c]
    n_true = nn_ref[0]
    eps2 = eps_ref[0, 0]

    # the pair list is target-major: a target block's pairs are one
    # contiguous run of grid steps, so "first visit" is simply "the
    # target changed" (or step 0) and the accumulator is zeroed then.
    # Every real block IS visited each call (diagonal guarantee pairs).
    first = jnp.logical_or(c == 0, ti_c != ti_ref[jnp.maximum(c - 1, 0)])

    @pl.when(first)
    def _init():
        acc_ref[:, :] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
        pot_ref[:, :] = jnp.zeros(pot_ref.shape, pot_ref.dtype)
        if with_jerk:
            jerk_ref[:, :] = jnp.zeros(jerk_ref.shape, jerk_ref.dtype)

    @pl.when(ok_ref[c] != 0)
    def _tile():
        cols = src_ref[0]                             # [3, L]
        mj = mass_ref[0]                              # [1, L]

        xi = tgt_ref[:, 0:1]                          # [L, 1]
        yi = tgt_ref[:, 1:2]
        zi = tgt_ref[:, 2:3]
        dx = cols[0:1, :] - xi                        # [L, L]
        dy = cols[1:2, :] - yi
        dz = cols[2:3, :] - zi
        r2 = dx * dx + dy * dy + dz * dz + eps2

        # sorted global indices: each star owns exactly one (block, slot),
        # so grow == gcol IS the self pair; gcol >= n_true are padding
        # slots (zero mass, but their replicated positions would make
        # w = 0 * inf NaN against the real star they duplicate — the same
        # mask the direct kernel applies to its padding columns,
        # pallas_nbody.py:156-163)
        grow = ti_c * leaf + jax.lax.broadcasted_iota(
            jnp.int32, (leaf, 1), 0)
        gcol = sj_c * leaf + jax.lax.broadcasted_iota(
            jnp.int32, (1, leaf), 1)
        valid = (gcol != grow) & (gcol < n_true)

        inv_r = jnp.where(valid, jax.lax.rsqrt(r2), 0.0)
        w = mj * (inv_r * inv_r * inv_r)              # m_j / r^3, masked

        acc_ref[:, 0:1] += g * jnp.sum(w * dx, axis=1, keepdims=True)
        acc_ref[:, 1:2] += g * jnp.sum(w * dy, axis=1, keepdims=True)
        acc_ref[:, 2:3] += g * jnp.sum(w * dz, axis=1, keepdims=True)

        if with_jerk:
            vcols = srcv_ref[0]                       # [3, L]
            dvx = vcols[0:1, :] - tgtv_ref[:, 0:1]
            dvy = vcols[1:2, :] - tgtv_ref[:, 1:2]
            dvz = vcols[2:3, :] - tgtv_ref[:, 2:3]
            rv = dx * dvx + dy * dvy + dz * dvz
            q = (3.0 * rv) * (w * (inv_r * inv_r))    # 3 m rv / r^5
            jerk_ref[:, 0:1] += g * jnp.sum(w * dvx - q * dx, axis=1,
                                            keepdims=True)
            jerk_ref[:, 1:2] += g * jnp.sum(w * dvy - q * dy, axis=1,
                                            keepdims=True)
            jerk_ref[:, 2:3] += g * jnp.sum(w * dvz - q * dz, axis=1,
                                            keepdims=True)

        if with_pot_eps2:
            # separately-softened potential (tree._p2p_near_field
            # convention: one sweep returns BHTree-softened forces AND
            # the near-raw potential the virial radius needs)
            pot_eps2 = eps_ref[0, 1]
            inv_rp = jnp.where(valid, jax.lax.rsqrt(r2 - eps2 + pot_eps2),
                               0.0)
        else:
            inv_rp = inv_r
        pot_ref[:, 0:1] += -g * jnp.sum(mj * inv_rp, axis=1, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("leaf", "kavg", "g", "with_jerk", "interpret"),
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
    vel_s: jax.Array | None = None,   # [B, L, 3] (with_jerk only)
    with_jerk: bool = False,
    interpret: bool | None = None,
) -> Tuple[jax.Array, ...]:
    """(acc [B,L,3], jerk [B,L,3] | None, pot [B,L], overflow) — drop-in
    for the XLA tree._p2p_near_field, computed in f32 (the tier's
    production dtype; inputs are cast in, outputs cast back).

    The [B, B] mask is packed into one flat target-major pair list padded
    to the static ``tree.near_budget(kavg, B)`` (excess pairs are dropped
    and ``overflow`` set — callers treat that as an error, ops.tree
    poisons), then cut into SMEM-safe segments evaluated by one
    ``pallas_call`` each; every segment carries a masked diagonal pair
    per block so all output blocks are defined every call.
    """
    from .tree import near_budget, pack_pair_list

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not interpret and jax.config.jax_enable_x64:
        raise RuntimeError(
            "the Pallas tree near-field kernel cannot compile with "
            "jax_enable_x64 (Mosaic has no i64 support); disable x64 or "
            "use the XLA near field (ops.tree._p2p_near_field)"
        )
    if with_jerk and vel_s is None:
        raise ValueError("with_jerk requires vel_s")
    f32 = jnp.float32
    b, L, _ = pos_s.shape
    assert L == leaf
    npd = b * leaf
    budget = near_budget(kavg, b)
    # eps2 == 0 floor (numerically inert — self pairs masked, real pair
    # distances >> 1e-15; same guard as pallas_acc_jerk_pot_rows)
    eps2 = jnp.maximum(jnp.asarray(eps2, f32), 1e-30)
    eps_arr = jnp.stack(
        [eps2, jnp.asarray(0.0 if pot_eps2 is None else pot_eps2, f32)]
    ).reshape(1, 2)

    ti_g, sj_g, ok_g, overflow = pack_pair_list(p2p, kavg)
    # masked pairs (budget padding) go to the dummy target block b
    # (zeros, discarded) so they can never re-zero a real block's
    # finished accumulator; their source index is irrelevant
    ti_g = jnp.where(ok_g, ti_g, b).astype(jnp.int32)
    ok_g = ok_g.astype(jnp.int32)
    nn = jnp.asarray(n_true, jnp.int32).reshape(1)

    # segment the list: seg real pairs + b diagonal guarantee pairs per
    # call, all under the SMEM word budget
    seg = max(leaf, min(budget, _SEG_SMEM_WORDS - b))
    n_calls = -(-budget // seg)
    pad_to = n_calls * seg
    if pad_to > budget:
        extra = pad_to - budget
        ti_g = jnp.concatenate([ti_g, jnp.full(extra, b, jnp.int32)])
        sj_g = jnp.concatenate([sj_g, jnp.zeros(extra, jnp.int32)])
        ok_g = jnp.concatenate([ok_g, jnp.zeros(extra, jnp.int32)])

    diag = jnp.arange(b, dtype=jnp.int32)

    pos_f = pos_s.astype(f32)
    tgt_rows = jnp.concatenate(
        [pos_f.reshape(npd, 3), jnp.zeros((leaf, 3), f32)], axis=0
    )                                                  # [(B+1)*L, 3]
    src_blocks = jnp.swapaxes(pos_f, 1, 2)             # [B, 3, L] lane-major
    mass_blocks = mass_s.astype(f32).reshape(b, 1, leaf)
    if with_jerk:
        vel_f = vel_s.astype(f32)
        tgtv_rows = jnp.concatenate(
            [vel_f.reshape(npd, 3), jnp.zeros((leaf, 3), f32)], axis=0
        )
        srcv_blocks = jnp.swapaxes(vel_f, 1, 2)

    kernel = functools.partial(
        _near_kernel, leaf=leaf, g=float(g),
        with_pot_eps2=pot_eps2 is not None, with_jerk=with_jerk,
    )
    in_specs = [
        pl.BlockSpec((1, 2), lambda c, ti, sj, ok, nn: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((leaf, 3), lambda c, ti, sj, ok, nn: (ti[c], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, leaf), lambda c, ti, sj, ok, nn: (sj[c], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, leaf), lambda c, ti, sj, ok, nn: (sj[c], 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [eps_arr, tgt_rows, src_blocks, mass_blocks]
    if with_jerk:
        in_specs += [
            pl.BlockSpec((leaf, 3), lambda c, ti, sj, ok, nn: (ti[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, leaf),
                         lambda c, ti, sj, ok, nn: (sj[c], 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [tgtv_rows, srcv_blocks]
    out_specs = [
        pl.BlockSpec((leaf, 3), lambda c, ti, sj, ok, nn: (ti[c], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((leaf, 1), lambda c, ti, sj, ok, nn: (ti[c], 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((npd + leaf, 3), f32),
        jax.ShapeDtypeStruct((npd + leaf, 1), f32),
    ]
    if with_jerk:
        out_specs.append(
            pl.BlockSpec((leaf, 3), lambda c, ti, sj, ok, nn: (ti[c], 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((npd + leaf, 3), f32))

    # per-segment pair lists: one segment of real pairs + the b diagonal
    # guarantee pairs, re-sorted target-major (stable: a block's real
    # pairs stay ahead of its diagonal pair — any in-run position works,
    # the run start zeroes)
    seg_lists = []
    zeros_b = jnp.zeros(b, jnp.int32)
    for k in range(n_calls):
        ti_k = jnp.concatenate([ti_g[k * seg:(k + 1) * seg], diag])
        sj_k = jnp.concatenate([sj_g[k * seg:(k + 1) * seg], diag])
        ok_k = jnp.concatenate([ok_g[k * seg:(k + 1) * seg], zeros_b])
        order = jnp.argsort(ti_k, stable=True)
        seg_lists.append((ti_k[order], sj_k[order], ok_k[order]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(seg + b,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    call = functools.partial(
        pl.pallas_call,
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=(50 if with_jerk else 30) * (seg + b) * leaf * leaf,
            bytes_accessed=4 * (seg + b) * leaf * (13 if with_jerk
                                                   else 7),
            transcendentals=(seg + b) * leaf * leaf,
        ),
        interpret=interpret,
    )

    if n_calls == 1:
        ti_k, sj_k, ok_k = seg_lists[0]
        outs = call()(ti_k, sj_k, ok_k, nn, *operands)
        acc, pot = outs[0][:npd], outs[1][:npd]
        jerk = outs[2][:npd] if with_jerk else None
    else:
        # lax.scan over the stacked segments: the calls are independent
        # as dataflow, and XLA's scheduler would otherwise run all
        # n_calls custom-calls before the adds — keeping every call's
        # (npd, 3) outputs (256 MiB each after (8,128) tile padding at
        # N = 4e5) live simultaneously: measured 25.3 GiB of HLO temps,
        # an OOM. The scan carries the accumulators, so exactly one
        # call's outputs are live at a time.
        ti_st = jnp.stack([s[0] for s in seg_lists])
        sj_st = jnp.stack([s[1] for s in seg_lists])
        ok_st = jnp.stack([s[2] for s in seg_lists])

        def body(carry, seg_k):
            ti_k, sj_k, ok_k = seg_k
            outs = call()(ti_k, sj_k, ok_k, nn, *operands)
            acc_c, pot_c, jerk_c = carry
            acc_c = acc_c + outs[0][:npd]
            pot_c = pot_c + outs[1][:npd]
            if with_jerk:
                jerk_c = jerk_c + outs[2][:npd]
            return (acc_c, pot_c, jerk_c), None

        init = (jnp.zeros((npd, 3), f32), jnp.zeros((npd, 1), f32),
                jnp.zeros((npd, 3), f32) if with_jerk
                else jnp.zeros((), f32))
        (acc, pot, jerk), _ = jax.lax.scan(body, init,
                                           (ti_st, sj_st, ok_st))
        if not with_jerk:
            jerk = None

    dtype = pos_s.dtype
    return (
        acc.reshape(b, leaf, 3).astype(dtype),
        jerk.reshape(b, leaf, 3).astype(dtype) if with_jerk else None,
        pot[:, 0].reshape(b, leaf).astype(dtype),
        overflow,
    )
