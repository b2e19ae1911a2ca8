"""Per-channel observable history — the setobsdata equivalent.

Maintains the 80-deep rolling record (tow, codei, cnt, remcode-in-samples,
L, D, SNR) the epoch aligner interpolates over, with the reference's exact
carrier-phase accumulation and SNR smoothing (src/sdrtrk.c:160-208).

Batched: one call consumes a whole block of tracker outputs for one
channel, appending an entry per loop-filter event (flagloopfilter==2,
i.e. the reference's swloop cadence, src/sdrmain.c:277-302).
"""
from __future__ import annotations

import numpy as np

from ..constants import DPI, OBSINTERPN, SNSMOOTHMS


class ObsHistory:
    """History ring for one channel (newest entry at index 0, matching the
    reference's shiftdata-down layout)."""

    def __init__(self, ctime: float, f_sf: float, crate: float,
                 loop_periods: int, depth: int = OBSINTERPN):
        self.ctime = ctime                # code period (s)
        self.f_sf = f_sf
        self.crate = crate
        self.loop = loop_periods          # periods per loop-filter update
        self.depth = depth
        self.tow = np.zeros(depth)
        self.codei = np.zeros(depth, dtype=np.int64)
        self.cnt = np.zeros(depth, dtype=np.int64)
        self.remc = np.zeros(depth)       # remcode in samples
        self.L = np.zeros(depth)
        self.D = np.zeros(depth)
        self.S = np.zeros(depth)
        self.codeisum = np.zeros(depth, dtype=np.int64)
        self.nrec = 0
        self._L_acc = 0.0
        self._isum = 0.0
        self._loopcnt = 0
        self._flag_remcarr_added = False
        self._flag_polarity_added = False

    # ------------------------------------------------------------------ #
    def _push(self, tow, codei, cnt, remc, L, D):
        for a in (self.tow, self.codei, self.cnt, self.remc, self.L, self.D):
            a[1:] = a[:-1]
        self.tow[0] = tow
        self.codei[0] = codei
        self.cnt[0] = cnt
        self.remc[0] = remc
        self.L[0] = L
        self.D[0] = D
        self.nrec += 1

    # ------------------------------------------------------------------ #
    def update(self, *, cnts, bufflocs, ns, dcarr, remcode, dcode,
               sum_i, flagloopfilter, remcarr,
               firstsftow: float, firstsfcnt: int,
               flagsyncf: bool, polarity: int) -> None:
        """Consume one block of per-period tracker outputs for this channel.

        Arguments are 1-D arrays over code periods (see track.loop
        .TrackOutputs): ``cnts`` period counters, ``bufflocs`` absolute
        sample index of each period start, ``ns`` period lengths,
        ``dcarr``/``dcode`` the post-update NCO offsets (Hz),
        ``remcode`` chips / ``remcarr`` cycles at period start,
        ``sum_i`` accumulated prompt-I taps (steps, ntaps),
        ``flagloopfilter`` 0/1/2.
        """
        upd = np.nonzero(np.asarray(flagloopfilter) == 2)[0]
        for k in upd:
            k = int(k)
            tow = firstsftow + (int(cnts[k]) - firstsfcnt) * self.ctime
            codefreq = self.crate + float(dcode[k])
            remc_samp = float(remcode[k]) * self.f_sf / codefreq
            D = -float(dcarr[k])

            # one-time phase anchors (src/sdrtrk.c:180-196)
            if not self._flag_remcarr_added:
                self._L_acc -= float(remcarr[k]) * DPI / DPI  # cycles
                self._flag_remcarr_added = True
            if flagsyncf and not self._flag_polarity_added:
                if polarity == 1:
                    self._L_acc += 0.5
                self._flag_polarity_added = True
            # delta-range accumulation (src/sdrtrk.c:198)
            self._L_acc += D * (self.loop * float(ns[k]) / self.f_sf)

            self._push(tow, int(bufflocs[k]), int(cnts[k]),
                       remc_samp, self._L_acc, D)

            # SNR smoothing every SNSMOOTHMS (src/sdrtrk.c:200-208 with the
            # snrflag cadence of src/sdrmain.c:284-288)
            self._isum += abs(float(sum_i[k][0]))
            if self._loopcnt % max(1, SNSMOOTHMS //
                                   max(1, int(self.loop * self.ctime * 1000))
                                   ) == 0:
                self.S[1:] = self.S[:-1]
                self.codeisum[1:] = self.codeisum[:-1]
                with np.errstate(divide="ignore"):
                    self.S[0] = (10.0 * np.log(self._isum / 100.0 / 100.0)
                                 + np.log(500.0) + 5.0)
                self.codeisum[0] = int(bufflocs[k])
                self._isum = 0.0
            self._loopcnt += 1

    @property
    def full(self) -> bool:
        return self.nrec >= self.depth
