"""Observable-formation tests: interp1, history accumulation, epoch
pseudoranges on fabricated geometry, RINEX format round-trip."""
import numpy as np
import pytest

from gnsslib_tpu.constants import CLIGHT, PTIMING, SYS_GPS
from gnsslib_tpu.gtime import gpst2time
from gnsslib_tpu.nav.eph import Eph, Geph
from gnsslib_tpu.obs import (EpochAligner, ObsHistory, RinexNavWriter,
                             RinexObsWriter, interp1)
from gnsslib_tpu.obs.epoch import ChannelObsInput


def test_interp1_linear_and_cubic():
    x = np.arange(10, dtype=float)
    y = 3.0 * x - 7.0
    assert interp1(x, y, 4.3) == pytest.approx(3 * 4.3 - 7, abs=1e-9)
    # reference interp1 is 3-point (quadratic) Lagrange — exact on deg<=2
    y2 = 4.0 * x**2 - 2 * x + 5
    t = 6.78
    assert interp1(x, y2, t) == pytest.approx(4 * t**2 - 2 * t + 5, rel=1e-9)
    # descending x (history is newest-first) must work too
    assert interp1(x[::-1], y[::-1], 4.3) == pytest.approx(3 * 4.3 - 7,
                                                           abs=1e-9)


def _mk_hist(loop=10, ctime=1e-3, f_sf=2.046e6, crate=1.023e6, depth=80):
    return ObsHistory(ctime=ctime, f_sf=f_sf, crate=crate,
                      loop_periods=loop, depth=depth)


def _feed(hist, nsteps, cnt0=0, buf0=0, nsamp=2046, dcarr=-100.0,
          firstsftow=100000.0, firstsfcnt=0):
    """Feed a synthetic block where every loop-th period updates."""
    cnts = cnt0 + np.arange(nsteps)
    flf = np.where(cnts % hist.loop == 0, 2, 0)
    hist.update(
        cnts=cnts, bufflocs=buf0 + cnts * nsamp,
        ns=np.full(nsteps, nsamp), dcarr=np.full(nsteps, dcarr),
        remcode=np.zeros(nsteps), dcode=np.zeros(nsteps),
        sum_i=np.full((nsteps, 3), 500.0), remcarr=np.zeros(nsteps),
        flagloopfilter=flf, firstsftow=firstsftow, firstsfcnt=firstsfcnt,
        flagsyncf=True, polarity=-1)
    return cnts


def test_history_tow_and_doppler():
    h = _mk_hist()
    _feed(h, 100)
    assert h.nrec == 10
    # newest entry: cnt 99, tow = 100000 + 99*1ms
    assert h.cnt[0] == 90
    assert h.tow[0] == pytest.approx(100000.090)
    assert h.D[0] == pytest.approx(100.0)   # D = -dcarr
    # L accumulates D*loop*n/f_sf per update
    dt = 10 * 2046 / 2.046e6
    assert h.L[0] == pytest.approx(100.0 * dt * 10, rel=1e-9)


def test_epoch_pseudorange_geometry():
    """Two channels with a known sample-delay difference: P2-P1 must equal
    c*ti*(d2-d1)."""
    f_sf, nsamp, ctime = 2.046e6, 2046, 1e-3
    ti = 1.0 / f_sf
    d1, d2 = 500, 1500      # signal delays (samples)
    tow0 = 100000.0
    chans = []
    for d in (d1, d2):
        h = _mk_hist()
        # channel's period k starts at sample d + k*nsamp
        _feed(h, 400, buf0=d, firstsftow=tow0, firstsfcnt=0)
        chans.append(ChannelObsInput(
            hist=h, sys=SYS_GPS, prn=1 if d == d1 else 2, week=2200,
            nsamp=nsamp, ctime=ctime, ti=ti, firstsf=d, firstsfcnt=0))
    al = EpochAligner(outms=200)
    obs = al._epoch_at(chans, tow0 + 0.2)
    assert obs is not None
    dP = obs[1].P - obs[0].P
    assert dP == pytest.approx(CLIGHT * ti * (d2 - d1), rel=1e-12)
    assert obs[0].tow == pytest.approx(tow0 + 0.2 + PTIMING / 1000)
    # absolute P plausibility: near c*PTIMING (the designed pseudo-delay)
    assert obs[0].P == pytest.approx(CLIGHT * PTIMING / 1000, rel=0.05)


def test_epoch_gate():
    h = _mk_hist()
    _feed(h, 400)
    ch = ChannelObsInput(hist=h, sys=SYS_GPS, prn=1, week=2200, nsamp=2046,
                         ctime=1e-3, ti=1 / 2.046e6, firstsf=0,
                         firstsfcnt=0)
    al = EpochAligner(outms=400)
    # newest tow = 100000.399 -> not on the 400 ms grid
    assert al.try_epoch([ch]) is None


def test_rinex_obs_format(tmp_path):
    from gnsslib_tpu.obs.epoch import SdrObs
    p = tmp_path / "t.obs"
    w = RinexObsWriter(str(p), [2026, 8, 16, 12, 0, 0])
    w.write_epoch([SdrObs(sys=SYS_GPS, prn=5, week=2200, tow=352800.0,
                          P=21234567.123, L=123456.789, D=1234.5, S=45.0)])
    lines = p.read_text().splitlines()
    # header matches the reference golden layout (labels in col 61-80)
    assert lines[0][60:].strip() == "RINEX VERSION / TYPE"
    assert lines[0].startswith("     3.02           OBSERVATION DATA")
    labels = [ln[60:].strip() for ln in lines]
    assert "END OF HEADER" in labels
    i = labels.index("END OF HEADER")
    epoch = lines[i + 1]
    assert epoch.startswith(">")
    # week 2200 + tow 352800 s = 2022-03-10 02:00:00 GPST
    y, m, d, hh = epoch.split()[1:5]
    assert (y, m, d, hh) == ("2022", "3", "10", "2")
    sat = lines[i + 2]
    assert sat.startswith("G05")
    assert "21234567.123" in sat and "123456.789" in sat


def test_rinex_nav_format(tmp_path):
    p = tmp_path / "t.nav"
    w = RinexNavWriter(str(p), [2026, 8, 16, 12, 0, 0])
    e = Eph(week=2200, iode=44, iodc=44, toe=gpst2time(2200, 352800.0),
            toc=gpst2time(2200, 352800.0), ttr=gpst2time(2200, 352500.0),
            A=26559850.0, e=0.01, toes=352800.0, f0=1.2e-4)
    w.write_eph(SYS_GPS, 7, e)
    text = p.read_text()
    lines = text.splitlines()
    assert lines[0].startswith("     3.02           N: GNSS NAV DATA")
    body = lines[3:]
    assert body[0].startswith("G07 ")
    assert len(body) == 8
    # every 19-char field parses as a float (RTKLIB outnavf format)
    for ln in body[1:]:
        s = ln[4:]
        for k in range(0, len(s), 19):
            field = s[k:k + 19].replace("E", "e")
            float(field)
    # f0 survives the round trip
    v = float(body[0][23:42].replace("E", "e"))
    assert v == pytest.approx(1.2e-4, rel=1e-11)


def test_rinex_gnav_format(tmp_path):
    p = tmp_path / "t.nav"
    w = RinexNavWriter(str(p))
    g = Geph(iode=30, frq=-2, toe=gpst2time(2200, 352800.0),
             tof=gpst2time(2200, 352700.0),
             pos=[1.2e7, -2.3e7, 5.6e6], vel=[100.0, -200.0, 300.0],
             acc=[1e-6, 2e-6, -3e-6], taun=1e-7, gamn=1e-12)
    w.write_geph(5, g)
    lines = p.read_text().splitlines()
    body = lines[3:]
    assert body[0].startswith("R05 ")
    assert len(body) == 4
    # -taun in first field
    v = float(body[0][23:42].replace("E", "e"))
    assert v == pytest.approx(-1e-7, rel=1e-9)


def test_diag_spectrum_and_histogram():
    from gnsslib_tpu.diag import sample_histogram, welch_spectrum
    f_sf, f_tone = 2.048e6, 0.3e6
    n = int(0.2 * f_sf)
    rng = np.random.default_rng(3)
    i = np.arange(n)
    x = (3.0 * np.cos(2 * np.pi * f_tone * i / f_sf)
         + rng.normal(0, 0.5, n)).astype(np.float32)
    freq, pdb = welch_spectrum(x, f_sf, nfft=4096, nloop=20)
    peak = freq[np.argmax(pdb)]
    assert abs(peak - f_tone) < 2 * f_sf / 4096, peak
    edges, counts = sample_histogram(x, nbit=4)
    assert counts.sum() == n
    assert len(edges) == 16
    # mass concentrated within +-4 for a +-3.5 signal
    assert counts[4:12].sum() > 0.9 * n


def test_hatch_smoother_reduces_code_noise():
    """Hatch filter: smoothed P converges to the carrier-implied range;
    resets on cycle slip and on tow gaps."""
    import numpy as np
    from gnsslib_tpu.constants import CLIGHT, SYS_GPS
    from gnsslib_tpu.obs.epoch import SdrObs
    from gnsslib_tpu.obs.smooth import HatchSmoother

    lam = CLIGHT / 1.57542e9
    rng = np.random.default_rng(3)
    n = 120
    true = 2.2e7 + 100.0 * np.arange(n)            # 100 m/s range rate
    noise = rng.normal(0.0, 3.0, n)                # 3 m code noise
    sm = HatchSmoother(window=20)
    raw_err, smo_err = [], []
    for k in range(n):
        o = SdrObs(sys=SYS_GPS, prn=5, week=2200, tow=1000.0 + 0.4 * k,
                   P=true[k] + noise[k], L=true[k] / lam, D=0.0, S=45.0)
        raw_err.append(noise[k])
        sm.smooth([o])
        smo_err.append(o.P - true[k])
    # steady-state smoothing: ~sqrt(20) noise reduction
    assert np.std(smo_err[40:]) < 0.45 * np.std(raw_err[40:])

    # cycle slip (carrier jumps 200 m) -> filter resets, no bias carried
    o = SdrObs(sys=SYS_GPS, prn=5, week=2200, tow=1000.0 + 0.4 * n,
               P=true[-1] + 100.0, L=(true[-1] + 300.0) / lam, D=0, S=45)
    sm.smooth([o])
    assert o.P == true[-1] + 100.0                  # passed through (reset)

    # tow gap -> reset
    o2 = SdrObs(sys=SYS_GPS, prn=5, week=2200, tow=2000.0,
                P=5.0e6, L=5.0e6 / lam, D=0, S=45)
    sm.smooth([o2])
    assert o2.P == 5.0e6
