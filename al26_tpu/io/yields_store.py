"""Yields time-series store.

Port of the reference `Yields` class (al26_nbody.py:125-279): append-only
per-checkpoint snapshots of every star's SLR reservoirs plus cluster-wide
sums, serialised as zstd-compressed UBJSON (`marinate`/`plate`), and an
append-only CSV of the global sums. Attribute names, file layout and the
CSV header are identical to the reference so its post-processing pipeline
(plotting/postprocess.py, plot_slr_statistics.py) consumes our files
unchanged.
"""
from __future__ import annotations

import numpy as np

from ..state import ISO_NAMES
from . import ubjson
from .compression import compress, decompress

# time-series attributes: per-star snapshot lists (al26_nbody.py:134-155)
_SERIES = [
    f"{ch}_{iso}" for iso in ISO_NAMES
    for ch in ("local", "global", "sne", "agb", "agb_raw")
]
_SUMS = [
    f"sum_{ch}_{iso}" for iso in ISO_NAMES
    for ch in ("local", "global", "sne", "agb")
]
_FINALS = [
    f"{ch}_{iso}_final" for iso in ISO_NAMES
    for ch in ("local", "global", "sne", "agb")
]


class Yields:
    def __init__(self, filename: str) -> None:
        self.filename = filename
        self.time: list = []
        for name in _SERIES:
            setattr(self, name, [])
        for name in _SUMS:
            setattr(self, name, [])
        for name in _FINALS:
            setattr(self, name, [])
        self.first_write = True

    # -- state update (al26_nbody.py:169-220) ------------------------------
    def update_state(self, model_time_myr: float, particles) -> None:
        """Append a snapshot. `particles` is an al26_tpu.io.compat.Particles
        table (or anything exposing the reference's mass_* attributes with
        .value_in)."""
        from ..units import msol

        self.time.append(float(model_time_myr))
        for iso in ISO_NAMES:
            for ch in ("local", "global", "sne", "agb", "agb_raw"):
                vals = getattr(particles, f"mass_{iso}_{ch}").value_in(msol)
                getattr(self, f"{ch}_{iso}").append(list(map(float, vals)))
                if ch != "agb_raw":
                    getattr(self, f"sum_{ch}_{iso}").append(float(np.sum(vals)))
                    setattr(
                        self, f"{ch}_{iso}_final",
                        list(map(float, getattr(
                            particles, f"mass_{iso}_{ch}_final"
                        ).value_in(msol))),
                    )
        if self.first_write:
            self.write_csv_header()
            self.first_write = False
        self.write_to_csv()

    # -- CSV (al26_nbody.py:221-241) -------------------------------
    def write_csv_header(self) -> None:
        with open(f"{self.filename}-cluster-yields.csv", "w") as f:
            f.write("time,local_26al,global_26al,sne_26al,"
                    "local_60fe,global_60fe,sne_60fe\n")

    def write_to_csv(self) -> None:
        with open(f"{self.filename}-cluster-yields.csv", "a") as f:
            f.write(
                "{:.6e},{:.6e},{:.6e},{:.6e},{:.6e},{:.6e},{:.6e}\n".format(
                    self.time[-1],
                    self.sum_local_26al[-1],
                    self.sum_global_26al[-1],
                    self.sum_sne_26al[-1],
                    self.sum_local_60fe[-1],
                    self.sum_global_60fe[-1],
                    self.sum_sne_60fe[-1],
                )
            )

    # -- serialisation (al26_nbody.py:242-279) ----------------------------
    def marinate(self, filename: str) -> None:
        """Serialise all attributes to zstd-compressed UBJSON."""
        marinade = dict(self.__dict__.items())
        with open(filename, "wb") as f:
            f.write(compress(ubjson.dumpb(marinade)))

    def plate(self, filename: str) -> None:
        """Restore attributes from a marinated file (also reads files
        written by the reference's py-ubjson)."""
        with open(filename, "rb") as f:
            preserve = ubjson.loadb(decompress(f.read()))
        for attr in self.__dict__:
            if attr in preserve:
                self.__dict__[attr] = preserve[attr]

    def as_arrays(self) -> "Yields":
        """Convert list attributes to numpy arrays in place
        (read_yields behaviour, al26_plot.py:52-64)."""
        for attr, value in self.__dict__.items():
            if isinstance(value, list):
                self.__dict__[attr] = np.asarray(value)
        return self
