"""High-dynamics tracking against simulation truth.

At a 30 Hz/s Doppler ramp the REFERENCE receiver corrupts: it blanks
pseudoranges and slips TOW (observed via tools/parity_vs_reference.py —
its parity scenario therefore runs at 10 Hz/s, the strongest ramp the
reference survives).  This framework must track the full 30 Hz/s ramp:
every epoch clean, reported Doppler following truth, pseudorange rate
consistent with the code Doppler.
"""
import numpy as np
import pytest

from gnsslib_tpu import sim
from gnsslib_tpu.constants import CLIGHT, DType, FrontendType
from gnsslib_tpu.io.frontend import FileFrontend, FrontendSpec
from gnsslib_tpu.runtime.config import ChannelConfig, ReceiverConfig
from gnsslib_tpu.runtime.receiver import Receiver
from gnsslib_tpu.track.state import TrackConfig

F_SF = 4.092e6
F_IF = 1.023e6
TOW0 = 352800.0
RATE = 30.0                    # Hz/s Doppler ramp
D0 = {3: 800.0, 21: 2600.0}    # Doppler at t=0
SECONDS = 26.0


@pytest.fixture(scope="module")
def ramp_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("highdyn")
    chans = []
    for prn, d in ((3, 300), (21, 1300)):
        eph = sim.example_eph(prn=prn, week=2200, toe_tow=TOW0)
        frames = sim.lnav_bit_stream(eph, TOW0 + 6.0, nframes=5)
        pad = np.concatenate([np.tile([1, -1], 149), [1, 1]]).astype(np.int8)
        chans.append(sim.SimChannel(
            prn=prn, doppler=D0[prn], doppler_rate=RATE,
            code_phase=-d * 1.023e6 / F_SF, carr_phase=0.1 * prn,
            nav_bits=np.concatenate([pad, frames])))
    noise = sim.noise_std_for_cn0(1.0, 45.0, F_SF, DType.REAL)
    n = int(SECONDS * F_SF)
    path = tmp / "ramp.bin"
    with open(path, "wb") as f:
        step = int(F_SF)
        for t0 in range(0, n, step):
            x = sim.synthesize(chans, F_SF, F_IF, DType.REAL,
                               min(step, n - t0), noise_std=noise,
                               seed=1000 + t0, t0=t0)
            sim.quantize_int8(x, 4.0).tofile(f)
    spec = FrontendSpec(fend=FrontendType.FILE, f_cf=1.57542e9, f_sf=F_SF,
                        f_if=F_IF, dtype=DType.REAL)
    cfg = ReceiverConfig(
        channels=[ChannelConfig(prn=3), ChannelConfig(prn=21)],
        fends=[spec], files=[str(path)],
        track=TrackConfig(corrn=4, corrd=2, corrp=2),
        outms=400, rinex=True, rinexpath=str(tmp / "out"))
    rx = Receiver(cfg, FileFrontend(str(path), spec))
    rx.run_seconds()
    return rx, tmp


def _parse_epochs(obs_path):
    import re
    out = {}
    cur = None
    for ln in open(obs_path).read().splitlines():
        if ln.startswith(">"):
            f = ln.split()
            cur = float(f[4]) * 3600 + float(f[5]) * 60 + float(f[6])
        elif cur is not None and re.match(r"G ?\d", ln):
            prn = int(ln[1:3])
            vals = []
            for k in range(4):
                s = ln[3 + 16 * k:3 + 16 * k + 14].strip()
                vals.append(float(s) if s else np.nan)
            out.setdefault(prn, []).append((cur,) + tuple(vals))
    return out


def test_ramp_tracked_to_truth(ramp_run):
    rx, tmp = ramp_run
    import os
    out = tmp / "out"
    obs = [p for p in os.listdir(out) if p.endswith(".obs")][0]
    rec = _parse_epochs(out / obs)
    assert set(rec) == {3, 21}
    for prn, rows in rec.items():
        rows = np.asarray(rows)          # (n, 5): tod P L D S
        assert len(rows) >= 20, f"PRN {prn}: only {len(rows)} epochs"
        # every epoch complete — no blank fields (the reference's 30 Hz/s
        # failure mode)
        assert np.isfinite(rows).all(), f"PRN {prn}: blank fields"
        t = rows[:, 0] - rows[0, 0]
        D = rows[:, 3]
        # Doppler follows the ramp: slope within 2%, absolute within 2 Hz
        fit = np.polyfit(t, D, 1)
        assert abs(fit[0] - RATE) < 0.6, f"PRN {prn}: dD/dt {fit[0]}"
        resid = D - np.polyval(fit, t)     # jitter about the fitted ramp
        assert np.abs(resid).max() < 3.0, f"PRN {prn}: Doppler resid"
    # pseudorange physics, clock-free: the between-satellite differential
    # range rate must equal lambda_cf * dDoppler (the common epoch-anchor
    # drift cancels in the difference)
    lam = CLIGHT / 1.57542e9
    r3 = {r[0]: r for r in rec[3]}
    r21 = {r[0]: r for r in rec[21]}
    common = sorted(set(r3) & set(r21))
    assert len(common) >= 20
    t = np.asarray(common)
    dP = np.array([r3[k][1] - r21[k][1] for k in common])
    dD = np.array([r3[k][3] - r21[k][3] for k in common])
    slope = np.polyfit(t - t[0], dP, 1)[0]
    assert abs(slope - lam * dD.mean()) < 3.0, (slope, lam * dD.mean())


def test_ramp_lock_and_decode(ramp_run):
    rx, _ = ramp_run
    for ch in rx.channels:
        assert ch.locked and ch.nav.flagdec, ch.cfg.prn
    assert not [e for e in rx.events if e[0] == "lol"]
