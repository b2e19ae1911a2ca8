"""Pull-in watchdog (RELOCK=1): loss-of-lock detection BEFORE bit sync.

_check_lock's noise-floor test only runs once a channel is bit-synced;
a satellite that fades during pull-in, or a false lock that survives
ACQCONFIRM, would otherwise integrate noise forever — the reference
failure mode (no relock at all, src/sdracq.c:57-59).  The watchdog
resets any locked channel with no nav bit sync ``pullin_timeout``
seconds after acquisition, sharing the lol event path.
"""
import numpy as np
import pytest

from gnsslib_tpu import sim
from gnsslib_tpu.constants import DType, FrontendType
from gnsslib_tpu.io.frontend import FileFrontend, FrontendSpec
from gnsslib_tpu.runtime.config import ChannelConfig, ReceiverConfig
from gnsslib_tpu.runtime.receiver import Receiver
from gnsslib_tpu.track.state import TrackConfig

F_SF = 4.092e6
F_IF = 1.023e6
TOW0 = 352800.0


def _spec():
    return FrontendSpec(fend=FrontendType.FILE, f_cf=1.57542e9, f_sf=F_SF,
                        f_if=F_IF, dtype=DType.REAL)


def test_false_lock_watchdog(tmp_path):
    """A forced false lock (pure-noise capture, acquisition decision
    overridden once) must be reset by the watchdog within
    pullin_timeout, and the channel must NOT re-lock afterwards."""
    rng = np.random.default_rng(7)
    n = int(9.0 * F_SF)
    path = tmp_path / "noise.bin"
    rng.integers(-8, 8, n, endpoint=True).astype(np.int8).tofile(path)
    spec = _spec()
    cfg = ReceiverConfig(
        channels=[ChannelConfig(prn=5)], fends=[spec], files=[str(path)],
        track=TrackConfig(corrn=4, corrd=2, corrp=2),
        outms=400, rinex=False, relock=True, pullin_timeout=2.0)
    rx = Receiver(cfg, FileFrontend(str(path), spec))

    real = rx._acq_search
    forced = []

    def fake():
        res = real()
        if not forced:
            forced.append(True)
            res.acquired = np.ones_like(np.asarray(res.acquired))
            res.codei = np.full_like(np.asarray(res.codei), 1234)
            res.cn0 = np.full_like(np.asarray(res.cn0), 45.0)
            res.peakr = np.full_like(np.asarray(res.peakr), 9.9)
        else:
            res.acquired = np.zeros_like(np.asarray(res.acquired))
        return res

    rx._acq_search = fake
    rx.run_seconds()

    acq = [e for e in rx.events if e[0] == "acq"]
    lol = [e for e in rx.events if e[0] == "lol"]
    assert acq, "forced acquisition never applied"
    assert lol, "watchdog never reset the false lock"
    # reset fires one watchdog interval after the (false) lock, within
    # block granularity
    assert lol[0][1] - acq[0][1] == pytest.approx(2.0, abs=1.2)
    ch = rx.channels[0]
    assert not ch.locked and not ch.synced
    # the false lock never reached bit sync (the watchdog's premise)
    assert not [e for e in rx.events if e[0] == "nav:bitsync"]


def test_fade_during_pullin(tmp_path):
    """A satellite that disappears right after acquisition (before nav
    bit sync completes) must be detected and reset — then reacquired
    when it returns."""
    eph = sim.example_eph(prn=9, week=2200, toe_tow=TOW0)
    frames = sim.lnav_bit_stream(eph, TOW0 + 6.0, nframes=3)
    pad = np.concatenate([np.tile([1, -1], 149), [1, 1]]).astype(np.int8)
    ch = sim.SimChannel(prn=9, doppler=700.0, code_phase=-120.0,
                        carr_phase=0.2,
                        nav_bits=np.concatenate([pad, frames]))
    noise = sim.noise_std_for_cn0(1.0, 47.0, F_SF, DType.REAL)
    seconds = 14.0
    fade_on, fade_off = 1.0, 9.0          # dark in [1, 9) s
    n = int(seconds * F_SF)
    path = tmp_path / "fade_pullin.bin"
    with open(path, "wb") as f:
        step = int(0.5 * F_SF)
        for t0 in range(0, n, step):
            t_s = t0 / F_SF
            act = [] if fade_on <= t_s < fade_off else [ch]
            x = sim.synthesize(act, F_SF, F_IF, DType.REAL,
                               min(step, n - t0), noise_std=noise,
                               seed=1000 + t0, t0=t0)
            sim.quantize_int8(x, 16.0).tofile(f)
    spec = _spec()
    cfg = ReceiverConfig(
        channels=[ChannelConfig(prn=9)], fends=[spec], files=[str(path)],
        track=TrackConfig(corrn=4, corrd=2, corrp=2),
        outms=400, rinex=False, relock=True, pullin_timeout=2.0)
    rx = Receiver(cfg, FileFrontend(str(path), spec))
    rx.run_seconds()

    ev = rx.events
    acq = [e for e in ev if e[0] in ("acq", "hot")]
    lol = [e for e in ev if e[0] == "lol"]
    assert acq and acq[0][1] < fade_on + 0.5, "fixture: no early lock"
    assert lol, "pull-in fade never detected"
    # the watchdog (not the post-sync noise-floor test) caught it: no
    # bit sync happened before the reset
    syncs = [e for e in ev if e[0] == "nav:bitsync" and e[1] < lol[0][1]]
    assert not syncs, "fixture raced: bit sync before the fade"
    # the acq event is stamped at search DISPATCH; the channel starts
    # tracking acq_pipeline_depth blocks later, so the watchdog window
    # (anchored at the start) shifts by depth blocks of stream
    block_s = rx.nsteps * 4092 / F_SF
    late = rx.acq_pipeline_depth * block_s
    assert lol[0][1] - acq[0][1] == pytest.approx(2.0 + late, abs=1.3)
    # reacquired once the signal returned (ACQSLEEP retry cadence)
    reacq = [e for e in ev
             if e[0] in ("acq", "hot") and e[1] > lol[0][1]]
    assert reacq and reacq[0][1] >= fade_off - 0.5
    chh = rx.channels[0]
    assert chh.locked, "satellite not re-locked at end"
