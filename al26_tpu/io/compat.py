"""Reference-compatible checkpoint object model.

The reference pickles a `State{cluster: amuse Particles, converter,
metadata}` per checkpoint (al26_nbody.py:281-293) and its post-processing
reads back ~30 unit-tagged per-star attributes (`cluster.mass_26al_local`,
`cluster.tau_disk`, `metadata.args.n`, ...; plotting/postprocess.py:74-98,
plot_slr_statistics.py:40-53). This module provides AMUSE-free equivalents:

  * `Particles` — a SoA table whose attribute access returns unit-tagged
    `Quantity` arrays (`.value_in(msol)` etc.), supporting len/iter/index
    exactly as the consumers use it;
  * `Metadata` / `Args` / `Converter` / `State` — matching field names;
  * `cluster_to_particles` / `particles_to_cluster` — lossless mapping
    between the device `Cluster` pytree and the reference attribute names
    (isotope/channel axes <-> `mass_{26al,60fe}_{local,global,sne,agb}`);
  * `tolerant_unpickler` — loads state pickles written by the REFERENCE
    (which embed AMUSE classes) without AMUSE installed, by stubbing
    unknown classes and extracting the numeric payloads.
"""
from __future__ import annotations

import io as _io
import pickle
from datetime import datetime

import numpy as np

from ..state import CHANNEL_NAMES, ISO_NAMES, N_CH, N_ISO
from ..units import Quantity, au, msol, myr, pc, pcmyr

# attribute name -> Unit for the reference's per-star columns
_UNIT_BY_ATTR = {
    "mass": msol, "radius": au,
    "x": pc, "y": pc, "z": pc,
    "vx": pcmyr, "vy": pcmyr, "vz": pcmyr,
    "m_disk_gas": msol, "m_disk_dust": msol,
    "r_disk": pc, "tau_disk": myr,
    "mass_27al": msol, "mass_56fe": msol,
    "total_wind_loss": msol,
    "wind_yield_26al": msol, "wind_yield_60fe": msol,
    "sn_yield_26al": msol, "sn_yield_60fe": msol,
    "initial_mass": msol, "mdot": msol / myr, "age": myr,
}
for _iso in ISO_NAMES:
    for _ch in CHANNEL_NAMES:
        _UNIT_BY_ATTR[f"mass_{_iso}_{_ch}"] = msol
        _UNIT_BY_ATTR[f"mass_{_iso}_{_ch}_final"] = msol
    _UNIT_BY_ATTR[f"mass_{_iso}_agb_raw"] = msol

class Star:
    """One row of a Particles table (attribute access per star, as used by
    postprocess.py:90-106)."""

    __slots__ = ("_p", "_i")

    def __init__(self, particles: "Particles", i: int):
        object.__setattr__(self, "_p", particles)
        object.__setattr__(self, "_i", i)

    def __getattr__(self, name):
        col = getattr(self._p, name)
        return col[self._i]


class Particles:
    """AMUSE-free particle table: dict of numpy columns, attribute access
    returns unit-tagged Quantities (raw arrays for dimensionless columns)."""

    def __init__(self, columns: dict[str, np.ndarray]):
        self.__dict__["_columns"] = dict(columns)

    def __getattr__(self, name):
        cols = self.__dict__["_columns"]
        if name not in cols:
            raise AttributeError(name)
        a = cols[name]
        unit = _UNIT_BY_ATTR.get(name)
        if unit is None:
            return a
        return Quantity(a, unit)

    def __setattr__(self, name, value):
        if isinstance(value, Quantity):
            unit = _UNIT_BY_ATTR.get(name)
            self.__dict__["_columns"][name] = np.asarray(
                value.value_in(unit) if unit else value.value
            )
        else:
            self.__dict__["_columns"][name] = np.asarray(value)

    def __len__(self):
        return len(next(iter(self.__dict__["_columns"].values())))

    def __iter__(self):
        for i in range(len(self)):
            yield Star(self, i)

    def __getitem__(self, i):
        if isinstance(i, (int, np.integer)):
            return Star(self, int(i) % len(self))
        return Particles({k: v[i] for k, v in self.__dict__["_columns"].items()})

    def columns(self) -> dict[str, np.ndarray]:
        return self.__dict__["_columns"]

    # pickle support
    def __getstate__(self):
        return self.__dict__["_columns"]

    def __setstate__(self, columns):
        self.__dict__["_columns"] = columns


class Args:
    """Pickle-friendly argparse.Namespace stand-in: the reference stores its
    parsed args inside Metadata (al26_nbody.py:91) and postprocess reads
    `metadata.args.n` / `.rc` (postprocess.py:77-78)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __repr__(self):
        return f"Args({self.__dict__!r})"


class Converter:
    """Unit-converter stand-in recording the nbody scaling the reference
    builds with nbody_to_si(Rc, Mcluster) (al26_nbody.py:1516)."""

    def __init__(self, rc_pc: float, mass_msun: float):
        self.rc_pc = rc_pc
        self.mass_msun = mass_msun


class Metadata:
    """Matches the reference Metadata fields (al26_nbody.py:83-123)."""

    def __init__(self, args: Args, t_f_myr: float, filename: str = ""):
        self.sim_start = datetime.now()
        self.sim_start_str = self.sim_start.strftime("%d/%m/%Y %H:%M:%S")
        self.args = args
        self.model = getattr(args, "model", "plummer")
        self.nstars = getattr(args, "n", None)
        self.cluster_radius = getattr(args, "rc", None)
        if filename:
            self.filename = filename
        else:
            self.filename = "sim-" + self.sim_start.strftime("%Y-%m-%d-%H-%M-%S")
        self.time = Quantity(0.0, myr)
        self.t_f = Quantity(t_f_myr, myr)
        self.completion = 0.0
        self.most_recent_checkpoint = 0
        self.update_access_time()

    def update(self, current_time_myr: float, increment_checkpoint: bool = True):
        if increment_checkpoint:
            self.most_recent_checkpoint += 1
        self.time = Quantity(current_time_myr, myr)
        self.completion = current_time_myr / self.t_f.value_in(myr)
        self.update_access_time()

    def update_access_time(self):
        self.sim_last = datetime.now()
        self.sim_last_str = self.sim_last.strftime("%d/%m/%Y %H:%M:%S")


class State:
    """Checkpoint bundle (al26_nbody.py:281-293)."""

    def __init__(self, cluster: Particles, converter, metadata: Metadata):
        self.cluster = cluster
        self.converter = converter
        self.metadata = metadata


# ---------------------------------------------------------------------------
# Cluster pytree <-> reference attribute layout
# ---------------------------------------------------------------------------
def cluster_to_particles(c: "Cluster | dict") -> Particles:
    """Map the device Cluster (or its numpy dict, or a host-side numpy
    Cluster) to reference-named columns (al26_nbody.py:1540-1604 attribute
    set)."""
    from ..state import cluster_to_numpy

    d = cluster_to_numpy(c) if not isinstance(c, dict) else c
    n = len(d["mass"])
    cols: dict[str, np.ndarray] = {
        "key": np.arange(1, n + 1, dtype=np.int64),
        "mass": d["mass"],
        "initial_mass": d["m0"],
        "radius": np.zeros(n),
        "x": d["pos"][:, 0], "y": d["pos"][:, 1], "z": d["pos"][:, 2],
        "vx": d["vel"][:, 0], "vy": d["vel"][:, 1], "vz": d["vel"][:, 2],
        "mdot": d["mdot"],
        "kicked": d["kicked"], "disk_alive": d["disk_alive"],
        "m_disk_gas": d["m_disk_gas"], "m_disk_dust": d["m_disk_dust"],
        "r_disk": d["r_disk"], "tau_disk": d["tau_disk"],
        "mass_27al": d["mass_27al"], "mass_56fe": d["mass_56fe"],
        "total_wind_loss": d["total_wind_loss"],
        "is_interloper": d["is_interloper"],
    }
    for s, iso in enumerate(ISO_NAMES):
        for ci, ch in enumerate(CHANNEL_NAMES):
            cols[f"mass_{iso}_{ch}"] = d["slr"][:, s, ci]
            cols[f"mass_{iso}_{ch}_final"] = d["slr_final"][:, s, ci]
        cols[f"mass_{iso}_agb_raw"] = d["agb_raw"][:, s]
        cols[f"wind_ratio_{iso}"] = d["wind_ratio"][:, s]
        cols[f"sn_yield_{iso}"] = d["sn_yield"][:, s]
    return Particles(cols)


def particles_to_cluster(p: Particles, dtype=None):
    """Inverse mapping: rebuild the Cluster pytree from a Particles table
    (used on checkpoint resume)."""
    import jax.numpy as jnp

    from ..state import cluster_from_numpy

    cols = p.columns()
    n = len(p)
    get = lambda k, default=0.0: np.asarray(
        cols.get(k, np.full(n, default))
    )
    slr = np.zeros((n, N_ISO, N_CH))
    slr_final = np.zeros((n, N_ISO, N_CH))
    agb_raw = np.zeros((n, N_ISO))
    wind_ratio = np.zeros((n, N_ISO))
    sn_yield = np.zeros((n, N_ISO))
    for s, iso in enumerate(ISO_NAMES):
        for ci, ch in enumerate(CHANNEL_NAMES):
            slr[:, s, ci] = get(f"mass_{iso}_{ch}")
            slr_final[:, s, ci] = get(f"mass_{iso}_{ch}_final")
        agb_raw[:, s] = get(f"mass_{iso}_agb_raw")
        wind_ratio[:, s] = get(f"wind_ratio_{iso}")
        sn_yield[:, s] = get(f"sn_yield_{iso}")
    d = {
        "pos": np.stack([get("x"), get("y"), get("z")], -1),
        "vel": np.stack([get("vx"), get("vy"), get("vz")], -1),
        "mass": get("mass"),
        "m0": get("initial_mass") if "initial_mass" in cols else get("mass"),
        "mdot": get("mdot"),
        "kicked": np.asarray(cols.get("kicked", np.zeros(n, bool)), bool),
        "r_disk": get("r_disk"), "tau_disk": get("tau_disk"),
        "disk_alive": np.asarray(cols.get("disk_alive", np.zeros(n, bool)), bool),
        "m_disk_gas": get("m_disk_gas"), "m_disk_dust": get("m_disk_dust"),
        "mass_27al": get("mass_27al"), "mass_56fe": get("mass_56fe"),
        "slr": slr, "slr_final": slr_final, "agb_raw": agb_raw,
        "wind_ratio": wind_ratio, "sn_yield": sn_yield,
        "total_wind_loss": get("total_wind_loss"),
        "is_interloper": np.asarray(
            cols.get("is_interloper", np.zeros(n, bool)), bool
        ),
    }
    kw = {} if dtype is None else {"dtype": dtype}
    return cluster_from_numpy(d, **kw)


# ---------------------------------------------------------------------------
# Tolerant unpickling of REFERENCE-written state files (no AMUSE needed)
# ---------------------------------------------------------------------------
class _Stub:
    """Generic stand-in for an unimportable class: records constructor args
    and state so the payload can be mined afterwards."""

    _stub_class = "?"

    def __init__(self, *args, **kw):
        self._stub_args = args
        self._stub_kw = kw

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self._stub_state = state


def _make_stub(module: str, name: str):
    return type(name, (_Stub,), {"_stub_class": f"{module}.{name}"})


class _TolerantUnpickler(pickle.Unpickler):
    """Resolve reference/AMUSE class paths to local shims or stubs."""

    _REDIRECT = {
        ("al26_nbody", "State"): State,
        ("al26_nbody", "Metadata"): Metadata,
        ("al26_nbody", "Args"): Args,
        ("argparse", "Namespace"): Args,
    }

    def find_class(self, module, name):
        key = (module.split(".")[-1], name)
        if key in self._REDIRECT:
            return self._REDIRECT[key]
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return _make_stub(module, name)


def tolerant_loads(data: bytes):
    return _TolerantUnpickler(_io.BytesIO(data)).load()
