"""Ensemble (Monte-Carlo) parallelism: whole-cluster realizations vmapped
over a batch axis and sharded across chips.

This is the scientifically dominant parallel axis of the domain
(SURVEY.md §2c item 4): the reference runs many independent cluster
realizations as separate shell-level jobs in `pt-*/` folders and aggregates
them offline. Here an ensemble is a single batched SimState — one program,
one launch, N_ens clusters — with the batch axis laid across the device
mesh so each chip integrates its own subset of realizations with zero
communication.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SimConfig
from ..sim.init import init_cluster
from ..sim.step import step

ENS_AXIS = "ens"


def make_ensemble_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (ENS_AXIS,))


def init_ensemble(cfg: SimConfig, n_realizations: int,
                  data_dir: Optional[str] = None):
    """Initialise `n_realizations` independent clusters (seeds
    cfg.seed, cfg.seed+1, ...) and stack them into one batched
    (SimState, SimAux). Massive-star slot arrays are padded to a common
    width so shapes match."""
    states, auxes, cfgs = [], [], []
    for k in range(n_realizations):
        # host-side init: one batched device transfer at the end instead of
        # ~45 per realization (matters on a tunneled TPU)
        s, a, c = init_cluster(cfg.replace(seed=cfg.seed + k), data_dir,
                               as_numpy=True)
        states.append(s)
        auxes.append(a)
        cfgs.append(c)
    width = max(a.hm_idx.shape[0] for a in auxes)
    auxes = [
        dataclasses.replace(
            a,
            hm_idx=np.pad(np.asarray(a.hm_idx),
                          (0, width - a.hm_idx.shape[0])),
            hm_slot_valid=np.pad(
                np.asarray(a.hm_slot_valid),
                (0, width - a.hm_slot_valid.shape[0])
            ),  # pads with False: padded slots never contribute
        )
        for a in auxes
    ]
    # AGB grids may differ in length only if data files differ; they don't.
    # stack on host, transfer each stacked array once
    batch_state = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *states)
    batch_aux = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *auxes)
    return batch_state, batch_aux, cfgs


def shard_ensemble(batch_state, batch_aux, mesh: Mesh):
    """Lay the realization axis across the mesh (pure data parallelism)."""

    def place(x):
        spec = P(ENS_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, batch_state), jax.tree.map(place, batch_aux)


def ensemble_step(batch_state, batch_aux, cfg: SimConfig):
    """One physics step for every realization (vmapped; XLA keeps the batch
    axis sharded if the inputs are)."""
    return jax.vmap(lambda s, a: step(s, a, cfg))(batch_state, batch_aux)


def ensemble_run_steps(batch_state, batch_aux, cfg: SimConfig, n_steps: int):
    def body(s, _):
        return ensemble_step(s, batch_aux, cfg), None

    out, _ = jax.lax.scan(body, batch_state, None, length=n_steps)
    return out


ensemble_run_steps = jax.jit(
    ensemble_run_steps, static_argnames=("cfg", "n_steps")
)
