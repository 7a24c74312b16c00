"""Yields time-series store.

Port of the reference `Yields` class (al26_nbody.py:125-279): append-only
per-checkpoint snapshots of every star's SLR reservoirs plus cluster-wide
sums, serialised as zstd-compressed UBJSON (`marinate`/`plate`), and an
append-only CSV of the global sums. Attribute names, file layout and the
CSV header are identical to the reference so its post-processing pipeline
(plotting/postprocess.py, plot_slr_statistics.py) consumes our files
unchanged.
Round-2 extra: an APPENDABLE framed variant (`marinate_frame` /
`plate_frames`, file `<base>-yields.ubjf`). The reference rewrites the
whole blob at every save (al26_nbody.py:242-264) — O(k) data per save,
O(k^2) over a run; the framed file appends one zstd frame per snapshot
(O(N) per save) and is crash-tolerant (a torn trailing frame is ignored
on read). The reference-format blob is still written at the end of a run
so the reference's own post-processing keeps working on completed runs.
"""
from __future__ import annotations

import os

import numpy as np

from ..state import ISO_NAMES
from . import ubjson
from .compression import compress, decompress

_FRAMES_MAGIC = b"AL26YF01"
_FRAME_TAG = b"FRME"

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

    # -- appendable framed format (round-2 extra; module docstring) --------
    def marinate_frame(self, filename: str) -> None:
        """Append the LATEST snapshot as one zstd frame: the last element
        of every time-series list plus the current *_final snapshots
        (finals are whole-cluster overwrites per save, so the last frame
        always carries the current ones)."""
        frame: dict = {"time": self.time[-1]}
        for name in _SERIES:
            frame[name] = getattr(self, name)[-1]
        for name in _SUMS:
            frame[name] = getattr(self, name)[-1]
        for name in _FINALS:
            frame[name] = getattr(self, name)
        payload = compress(ubjson.dumpb(frame))
        fresh = not os.path.exists(filename)
        with open(filename, "ab") as f:
            if fresh:
                f.write(_FRAMES_MAGIC)
            f.write(_FRAME_TAG + len(payload).to_bytes(8, "little"))
            f.write(payload)

    def plate_frames(self, filename: str) -> None:
        """Restore the store from a framed file. A torn trailing frame
        (crash mid-append) is dropped; anything else malformed raises."""
        with open(filename, "rb") as f:
            data = f.read()
        if data[:8] != _FRAMES_MAGIC:
            raise IOError(f"{filename}: not an al26 framed yields file")
        frames = []
        off = 8
        while off < len(data):
            head = data[off:off + 12]
            if len(head) < 12 or head[:4] != _FRAME_TAG:
                if off + 12 >= len(data):
                    break  # torn header at EOF
                raise IOError(f"{filename}: corrupt frame header @ {off}")
            ln = int.from_bytes(head[4:12], "little")
            off += 12
            if off + ln > len(data):
                break  # torn payload at EOF: keep the complete prefix
            frames.append(ubjson.loadb(decompress(data[off:off + ln])))
            off += ln
        self.time = []
        for name in _SERIES + _SUMS:
            setattr(self, name, [])
        for fr in frames:
            self.time.append(fr["time"])
            for name in _SERIES + _SUMS:
                getattr(self, name).append(fr[name])
        if frames:
            for name in _FINALS:
                setattr(self, name, frames[-1][name])
        self.first_write = not frames

    def as_arrays(self) -> "Yields":
        """Convert list attributes to numpy arrays in place
        (read_yields behaviour, al26_plot.py:52-64)."""
        for attr, value in self.__dict__.items():
            if isinstance(value, list):
                self.__dict__[attr] = np.asarray(value)
        return self
