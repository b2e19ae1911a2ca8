"""Block-streamed receiver orchestration.

The reference's thread-per-channel runtime (src/sdrmain.c:105-332) becomes
one synchronous pipeline per front end:

    for each block of IF samples:
        acquisition program  (all unlocked channels, batched)
        tracking scan        (all locked channels, one lax.scan)
        nav framers          (host, batched per channel)
        observable history + epoch alignment + RINEX/RTCM output

The absolute sample index replaces the ring-buffer clock
(sdrstat.buffcnt*fendbuffsize); acquisition retry every ~ACQSLEEP of
stream replaces the 2 s sleep (src/sdracq.c:57-59).
"""
from __future__ import annotations

import dataclasses
import os
import time

import numpy as np

from ..acquire import Acquirer
from ..constants import (ACQSLEEP, CodeType, SYS_GPS, SYS_GLO, SYS_SBS,
                         SYS_QZS, OBSINTERPN)
from ..diag.tracklog import TrackLogger
from ..nav import NavChannel
from ..nav.sbas import gen_novatel_sbasmsg
from ..obs.rtcm import encode_1019, encode_1020, encode_1044, encode_msm7
from ..sat import satno, satno2id
from .tcpout import TcpServer
from ..obs.epoch import ChannelObsInput, EpochAligner, SdrObs
from ..obs.history import ObsHistory
from ..obs.rinex import RinexObsWriter, RinexNavWriter
from ..ops.nco import NSPAN
from ..track import FastTracker, Tracker
from ..track.state import loop_interval
from .config import ReceiverConfig

try:
    import jax.numpy as jnp
except ImportError:                                    # pragma: no cover
    jnp = None


@dataclasses.dataclass
class ChannelRuntime:
    """Mutable per-channel receiver state (beyond the device pytree)."""
    idx: int                 # index within its tracker group
    cfg: object              # ChannelConfig
    nav: NavChannel
    hist: ObsHistory
    locked: bool = False
    synced: bool = False
    last_acq_attempt: float = -1e9
    cn0: float = 0.0
    peak_prompt: float = 0.0


class Receiver:
    """One front-end group receiver (all channels share f_sf/f_if/dtype).

    ``frontend`` provides ``read(start, n)`` + ``nsamples`` (io.FileFrontend
    or any duck-typed source, e.g. a synthesizer for tests).
    """

    def __init__(self, cfg: ReceiverConfig, frontend, ftype: int = 1,
                 nsteps_per_block: int = 400):
        self.cfg = cfg
        self.frontend = frontend
        spec = cfg.fends[ftype - 1]
        self.spec = spec
        chans = [c for c in cfg.channels if c.ftype == ftype]
        if not chans:
            raise ValueError("no channels for this front end")
        self.prns = [c.prn for c in chans]
        self.ctypes = [c.ctype for c in chans]
        foffsets = [spec.foffset + c.foffset_fdma for c in chans]
        f_cfs = [c.f_cf for c in chans]

        self.acq = Acquirer(self.prns, self.ctypes, spec.f_sf, spec.f_if,
                            spec.dtype, foffsets=foffsets)
        self.trk = Tracker(cfg.track, self.prns, self.ctypes, spec.f_sf,
                           spec.f_if, spec.dtype, foffsets=foffsets,
                           f_cfs=f_cfs)
        try:
            # steady-state fast path (L periods/step); falls back to the
            # per-period scan during acquisition/pull-in or for mixed
            # loop-cadence channel groups
            self.fast = FastTracker(self.trk)
        except ValueError:
            self.fast = None
        self.state = self.trk.init_state()
        self.nsamp = self.trk.n_nom
        self.nsteps = int(nsteps_per_block)
        self.block_len = (self.nsteps * self.nsamp + self.trk.nwin
                          + NSPAN * self.nsteps + 2 * self.nsamp + 64)
        self.base = 0                      # abs sample index of block start
        self.channels = []
        for i, c in enumerate(chans):
            nav = NavChannel(c.ctype, c.prn, sat=0, ref_week=cfg.ref_week)
            # deep enough to cover one block's worth of loop updates (so
            # no epoch falls off before _emit_epochs sees it), per channel
            depth = max(OBSINTERPN,
                        2 * self.nsteps // loop_interval(c.ctype) + 8)
            hist = ObsHistory(
                ctime=float(self.trk.ctime[i]), f_sf=spec.f_sf,
                crate=float(self.trk.crate[i]),
                loop_periods=loop_interval(c.ctype), depth=depth)
            self.channels.append(ChannelRuntime(idx=i, cfg=c, nav=nav,
                                                hist=hist))
        self.aligner = EpochAligner(cfg.outms)
        self.outms_ms = int(cfg.outms)
        self._oldreftow = 0.0
        self.obs_writer: RinexObsWriter | None = None
        self.nav_writer: RinexNavWriter | None = None
        if cfg.rinex:
            ts = time.gmtime()
            stamp = time.strftime("%Y%m%d%H%M%S", ts)
            date = [ts.tm_year, ts.tm_mon, ts.tm_mday, ts.tm_hour,
                    ts.tm_min, ts.tm_sec]
            os.makedirs(cfg.rinexpath, exist_ok=True)
            self.obs_writer = RinexObsWriter(
                os.path.join(cfg.rinexpath, f"sdr_{stamp}.obs"), date)
            self.nav_writer = RinexNavWriter(
                os.path.join(cfg.rinexpath, f"sdr_{stamp}.nav"), date)
        self.rtcm_srv = TcpServer(cfg.rtcmport) if cfg.rtcm else None
        self.sbas_srv = TcpServer(cfg.sbasport) if cfg.sbas else None
        self.loggers = {}
        if cfg.log:
            os.makedirs(cfg.logpath, exist_ok=True)
            for ch in self.channels:
                sid = satno2id(satno(ch.cfg.sys, ch.cfg.prn)) or \
                    f"C{ch.cfg.prn:02d}"
                self.loggers[ch.idx] = TrackLogger(
                    cfg.logpath, sid, cfg.track.corrn, cfg.track.corrd,
                    float(self.trk.crate[ch.idx]), spec.f_if)
        self.epochs_written = 0
        self.ephs_written = 0
        self.events = []

    # ------------------------------------------------------------------ #
    def _try_acquire(self, block_np: np.ndarray) -> None:
        t_stream = self.base / self.spec.f_sf
        pend = [ch for ch in self.channels if not ch.locked and
                t_stream - ch.last_acq_attempt >= ACQSLEEP / 1000.0 - 1e-9]
        if not pend:
            return
        need = (self.acq.intg + 2) * self.nsamp
        res = self.acq.search(block_np[:need])
        for ch in pend:
            i = ch.idx
            ch.last_acq_attempt = t_stream
            if bool(res.acquired[i]):
                ch.locked = True
                ch.cn0 = float(res.cn0[i])
                self.state = self.trk.start_channels(
                    self.state, [i], [int(res.codei[i])],
                    [float(res.dcarr[i])])
                self.events.append(
                    ("acq", t_stream, ch.cfg.prn, float(res.cn0[i]),
                     float(res.peakr[i])))

    # ------------------------------------------------------------------ #
    def _feed_nav_and_obs(self, out, cnt0: np.ndarray) -> None:
        for ch in self.channels:
            if not ch.locked:
                continue
            i = ch.idx
            was_started = int(cnt0[i])
            steps = out.ip.shape[0]
            # a channel acquired THIS block produced outputs only from its
            # start; cnt0 is 0 for it and all steps are valid
            evs = ch.nav.update(
                out.ip[:, i],
                self.base + out.loc[:, i].astype(np.int64),
                was_started)
            for e in evs:
                self.events.append(("nav:" + e.kind,
                                    self.base / self.spec.f_sf,
                                    ch.cfg.prn, e.sfid, e.tow))
            if ch.nav.flagsync and not ch.synced:
                self.state = self.trk.set_bit_sync(self.state, i,
                                                   ch.nav.sync_offset)
                ch.synced = True
            if ch.cfg.ctype == CodeType.L1SBAS and self.sbas_srv:
                self._send_sbas(ch, evs)
            if i in self.loggers:
                self.loggers[i].log_block(out, i, ch.nav, ch.hist,
                                          int(cnt0[i]))
            if self.cfg.relock and ch.synced:
                self._check_lock(ch, out)
            if ch.nav.flagdec:
                ch.hist.update(
                    cnts=was_started + np.arange(steps),
                    bufflocs=self.base + out.loc[:, i].astype(np.int64),
                    ns=out.n[:, i], dcarr=out.dcarr[:, i],
                    remcode=out.remcode[:, i], dcode=out.dcode[:, i],
                    sum_i=out.sum_i[:, i], remcarr=out.remcarr[:, i],
                    flagloopfilter=out.flagloopfilter[:, i],
                    firstsftow=ch.nav.firstsftow,
                    firstsfcnt=ch.nav.firstsfcnt,
                    flagsyncf=ch.nav.flagsyncf, polarity=ch.nav.polarity)

    # ------------------------------------------------------------------ #
    def _send_sbas(self, ch, evs) -> None:
        """NovAtel-framed SBAS messages over TCP (src/sdrnav_sbs.c:100-140
        incl. the cross-channel week borrow when MT12 hasn't arrived)."""
        if not any(e.kind == "decode" for e in evs):
            return
        sb = ch.nav.sbas
        if sb.week == 0:
            for other in self.channels:
                if other.nav.flagdec and other.nav.eph.week_gpst:
                    sb.week = other.nav.eph.week_gpst
                    sb.tow = other.hist.tow[0]
                    break
        if sb.week:
            gen_novatel_sbasmsg(sb)
            self.sbas_srv.send(bytes(sb.novatelmsg))

    def _check_lock(self, ch, out) -> None:
        """Loss-of-lock detection (absent in the reference — a channel
        that fades keeps integrating noise forever, SURVEY.md §5); gated
        by ReceiverConfig.relock.  Declares loss when the prompt coherent
        sum stays below the noise-consistent threshold for a whole block,
        then resets the channel to reacquire."""
        i = ch.idx
        upd = out.flagloopfilter[:, i] == 2
        if not np.any(upd):
            return
        p = np.abs(out.sum_i[upd, i, 0]) + np.abs(out.sum_q[upd, i, 0])
        # coherent prompt over `loop` periods: lock keeps |sum| well above
        # the single-period noise scale; use a relative dropout test
        if np.median(p) < 0.05 * max(ch.peak_prompt, 1e-9):
            ch.locked = False
            ch.synced = False
            ch.nav = NavChannel(ch.cfg.ctype, ch.cfg.prn,
                                ref_week=self.cfg.ref_week)
            ch.hist.nrec = 0
            ch.last_acq_attempt = -1e9
            self.events.append(("lol", self.base / self.spec.f_sf,
                                ch.cfg.prn))
        else:
            ch.peak_prompt = max(ch.peak_prompt, float(np.median(p)))

    # ------------------------------------------------------------------ #
    def _emit_epochs(self) -> list[list[SdrObs]]:
        # gate on a FULL history: interp1's neighborhood search assumes
        # monotonic sample indices, so zero-filled young histories are
        # unusable (the reference tolerates garbage early epochs instead)
        ready = [ch for ch in self.channels
                 if ch.nav.flagdec and ch.nav.eph.week_gpst != 0
                 and ch.hist.full]
        if not ready:
            return []
        inputs = [ChannelObsInput(
            hist=ch.hist, sys=ch.cfg.sys, prn=ch.nav.prn,
            week=ch.nav.eph.week_gpst, nsamp=self.nsamp,
            ctime=float(self.trk.ctime[ch.idx]), ti=self.trk.ti,
            firstsf=ch.nav.firstsf, firstsfcnt=ch.nav.firstsfcnt)
            for ch in ready]
        newest = min(float(c.hist.tow[0]) for c in inputs)
        lo = self._oldreftow if self._oldreftow > 0 else newest - 0.6
        epochs = []
        # integer epoch indices on the outms grid (float division would
        # re-emit boundary epochs)
        k = int(np.floor(lo * 1000.0 / self.outms_ms + 1e-6)) + 1
        while k * self.outms_ms <= newest * 1000.0 + 1e-3:
            t = k * self.outms_ms / 1000.0
            obs = self.aligner._epoch_at(inputs, t)
            if obs:
                epochs.append(obs)
                if self.obs_writer:
                    self.obs_writer.write_epoch(obs)
                if self.rtcm_srv:
                    by_sys = {}
                    for o in obs:
                        by_sys.setdefault(o.sys, []).append(
                            (o.prn, o.P, o.L, o.D, o.S))
                    for sysid, lst in by_sys.items():
                        self.rtcm_srv.send(encode_msm7(
                            sysid, lst, obs[0].week, obs[0].tow))
                self.epochs_written += 1
            k += 1
        self._oldreftow = newest
        # nav records on ephemeris update (src/sdrsync.c:137-156)
        for ch in self.channels:
            eph = ch.nav.eph
            if eph.update and eph.cnt >= eph.cntth:
                eph.cnt = 0
                eph.update = False
                self.ephs_written += 1
                if self.nav_writer:
                    if ch.cfg.ctype == CodeType.G1:
                        self.nav_writer.write_geph(ch.nav.prn, eph.geph)
                    elif ch.cfg.ctype == CodeType.L1CA:
                        self.nav_writer.write_eph(ch.cfg.sys, ch.cfg.prn,
                                                 eph.eph)
                if self.rtcm_srv:
                    if ch.cfg.ctype == CodeType.G1:
                        self.rtcm_srv.send(encode_1020(ch.nav.prn,
                                                       eph.geph))
                    elif ch.cfg.ctype == CodeType.L1CA and \
                            ch.cfg.sys == SYS_QZS:
                        self.rtcm_srv.send(encode_1044(ch.cfg.prn,
                                                       eph.eph))
                    elif ch.cfg.ctype == CodeType.L1CA and \
                            ch.cfg.sys == SYS_GPS:
                        self.rtcm_srv.send(encode_1019(ch.cfg.prn,
                                                       eph.eph))
        return epochs

    # ------------------------------------------------------------------ #
    def save_checkpoint(self, path: str) -> None:
        """Snapshot the full receiver state: absolute sample index, the
        device tracking pytree, and each channel's nav/observable state —
        the resume story SURVEY.md §5 specifies (the reference has none)."""
        import pickle
        st = {f: np.asarray(getattr(self.state, f))
              for f in self.state.__dataclass_fields__}
        with open(path, "wb") as f:
            pickle.dump(dict(
                base=self.base, oldreftow=self._oldreftow,
                state=st,
                channels=[(ch.locked, ch.synced, ch.last_acq_attempt,
                           ch.cn0, ch.peak_prompt, ch.nav, ch.hist)
                          for ch in self.channels],
                epochs=self.epochs_written, ephs=self.ephs_written), f)

    def load_checkpoint(self, path: str) -> None:
        """Restore a snapshot produced by save_checkpoint (same config)."""
        import pickle
        with open(path, "rb") as f:
            d = pickle.load(f)
        self.base = d["base"]
        self._oldreftow = d["oldreftow"]
        self.state = dataclasses.replace(
            self.state, **{k: jnp.asarray(v) for k, v in d["state"].items()})
        for ch, (locked, synced, laa, cn0, pk, nav, hist) in zip(
                self.channels, d["channels"]):
            ch.locked, ch.synced = locked, synced
            ch.last_acq_attempt, ch.cn0, ch.peak_prompt = laa, cn0, pk
            ch.nav, ch.hist = nav, hist
        self.epochs_written = d["epochs"]
        self.ephs_written = d["ephs"]

    def run_seconds(self, seconds: float | None = None,
                    progress=None) -> dict:
        """Process the stream (whole file by default).  Returns summary
        statistics.  ``progress``: optional callable(t_stream_seconds)."""
        t_start = time.time()
        advance = self.nsteps * self.nsamp
        end_sample = self.frontend.nsamples
        if seconds is not None:
            end_sample = min(end_sample,
                             int(seconds * self.spec.f_sf))
        nblocks = 0
        while self.base + self.block_len <= end_sample:
            block_np = self.frontend.read(self.base, self.block_len)
            self._try_acquire(block_np)
            if not any(ch.locked for ch in self.channels):
                self.base += advance
                nblocks += 1
                continue
            cnt0 = np.asarray(self.state.cnt)
            block = jnp.asarray(block_np)
            use_fast = (self.fast is not None
                        and self.nsteps % self.fast.L == 0
                        and all(ch.synced for ch in self.channels
                                if ch.locked))
            eng = self.fast if use_fast else self.trk
            self.state, out = eng.run_block(self.state, block, self.nsteps)
            self._feed_nav_and_obs(out, cnt0)
            self._emit_epochs()
            self.state = self.trk.rebase(self.state, advance)
            self.base += advance
            nblocks += 1
            if progress:
                progress(self.base / self.spec.f_sf)
        wall = time.time() - t_start
        return dict(
            samples=self.base, seconds=self.base / self.spec.f_sf,
            wall=wall, msps=self.base / 1e6 / max(wall, 1e-9),
            blocks=nblocks,
            locked=[ch.cfg.prn for ch in self.channels if ch.locked],
            decoded=[ch.cfg.prn for ch in self.channels if ch.nav.flagdec],
            epochs=self.epochs_written, ephs=self.ephs_written,
        )
