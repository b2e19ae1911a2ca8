"""Live USB front-end interface (driver contract + stubs).

The reference drives four USB front-ends in-process (src/rcv/*: RTL-SDR
via librtlsdr, BladeRF via libbladeRF, SiGe GN3S via libusb/FX2, NSL
STEREO via libnslstereo).  This container has no USB hardware or vendor
libraries, so live capture is expressed as a contract: a ``LiveFrontend``
produces the same byte stream its file-replay twin consumes
(io.formats), either from an external capture process writing a
pipe/file, or from a future in-process driver.

``StreamFrontend`` adapts any growing file/FIFO written by an external
grabber (e.g. ``rtl_sdr -f 1575420000 -s 2048000 - > fifo``) to the
``read(start, n)`` contract, blocking until the producer catches up —
the ring-buffer handoff of the reference (sdrrcv.c:469-531) with the
filesystem as the ring.
"""
from __future__ import annotations

import os
import time

import numpy as np

from .frontend import FrontendSpec, _bytes_per_sample, _unpack


class LiveFrontend:
    """Abstract live front end: subclass with a real driver binding."""

    def __init__(self, spec: FrontendSpec):
        self.spec = spec

    def read(self, start: int, n: int) -> np.ndarray:   # pragma: no cover
        raise NotImplementedError(
            "no in-process USB driver in this build; capture with the "
            "vendor tool (rtl_sdr, bladeRF-cli, ...) and use "
            "StreamFrontend or FileFrontend on its output")

    @property
    def nsamples(self) -> int:                          # pragma: no cover
        raise NotImplementedError


class StreamFrontend:
    """Follows a growing capture file / FIFO from an external grabber.

    ``read`` blocks (sleep-poll, like the reference's sleepms(1) wait in
    sdrtracking, src/sdrtrk.c:30-50) until the producer has written the
    requested span, then decodes it with the spec's byte format.
    """

    def __init__(self, path: str, spec: FrontendSpec,
                 poll_s: float = 0.05, timeout_s: float = 30.0):
        self.path = path
        self.spec = spec
        self.bps = _bytes_per_sample(spec)
        self.poll_s = poll_s
        self.timeout_s = timeout_s
        self._fp = open(path, "rb")
        self.eof = False

    def close(self):
        self._fp.close()

    @property
    def nsamples(self) -> int:
        """Current known stream length (grows while the producer runs)."""
        return os.fstat(self._fp.fileno()).st_size // self.bps

    def read(self, start: int, n: int) -> np.ndarray:
        need = (start + n) * self.bps
        deadline = time.monotonic() + self.timeout_s
        while os.fstat(self._fp.fileno()).st_size < need:
            if time.monotonic() > deadline:
                self.eof = True
                break
            time.sleep(self.poll_s)
        self._fp.seek(start * self.bps)
        raw = self._fp.read(n * self.bps)
        got = len(raw) // self.bps
        x = _unpack(self.spec, raw[:got * self.bps])
        if got < n:
            pad = np.zeros((n - got,) + x.shape[1:], np.float32)
            x = np.concatenate([x, pad], axis=0)
        return x
