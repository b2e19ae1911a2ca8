"""Live diagnostics on the reference spectrum-thread cadence.

The reference's specthread refreshes a 3-bit sample histogram and a
Welch power spectrum every SPEC_MS=200 ms of wall time from the latest
SPEC_LEN=7 ms of ring data (src/sdrspec.c:29-110).  Here the cadence is
STREAM time (deterministic for replay; equal to wall time when running
real-time): the receiver calls :meth:`maybe_update` once per block and
the monitor recomputes whenever the stream crosses the next grid point.
Frames are kept in a bounded deque for a UI/plot consumer; ``on_frame``
receives each frame as it is produced (the gnuplot-pipe role,
src/sdrplot.c).
"""
from __future__ import annotations

import collections
import dataclasses

import numpy as np

from ..constants import SPEC_LEN, SPEC_MS
from .spectrum import sample_histogram, welch_spectrum


@dataclasses.dataclass
class SpecFrame:
    t_stream: float            # stream time of the snapshot (s)
    hist_edges: np.ndarray     # histogram bin edges (3-bit view)
    hist_counts: np.ndarray
    freq_hz: np.ndarray        # spectrum frequency axis
    pspec_db: np.ndarray       # averaged power spectrum (dB)


class SpectrumMonitor:
    """Periodic IF histogram + spectrum snapshots from a frontend."""

    def __init__(self, frontend, f_sf: float, iq: bool,
                 spec_ms: int = SPEC_MS, keep: int = 32, nbit: int = 3,
                 on_frame=None):
        self.fe = frontend
        self.f_sf = f_sf
        self.iq = bool(iq)
        self.spec_ms = int(spec_ms)
        self.nbit = nbit
        self.on_frame = on_frame
        self.frames: collections.deque[SpecFrame] = collections.deque(
            maxlen=keep)
        self._next_k = 0
        self._nint = int(SPEC_LEN * 1e-3 * f_sf)        # 7 ms of samples

    @property
    def latest(self) -> SpecFrame | None:
        return self.frames[-1] if self.frames else None

    def maybe_update(self, base: int) -> None:
        """Snapshot if stream sample index ``base`` crossed the next
        SPEC_MS grid point (catching up emits ONE frame, not a backlog —
        the reference thread also just samples the latest data)."""
        t_ms = base / self.f_sf * 1000.0
        if t_ms < self._next_k * self.spec_ms:
            return
        self._next_k = int(t_ms // self.spec_ms) + 1
        start = max(0, base - self._nint)
        x = self.fe.read(start, self._nint)
        edges, counts = sample_histogram(x, nbit=self.nbit)
        freq, pdb = welch_spectrum(x, self.f_sf, iq=self.iq,
                                   seed=self._next_k)
        frame = SpecFrame(t_stream=base / self.f_sf, hist_edges=edges,
                          hist_counts=counts, freq_hz=freq, pspec_db=pdb)
        self.frames.append(frame)
        if self.on_frame is not None:
            self.on_frame(frame)
