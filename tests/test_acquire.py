"""Acquisition tests on synthesized IF signals with known truth.

Mirrors BASELINE.md staged config 1: single/multi-PRN FFT acquisition must
recover (codei, Doppler bin, peak ratio) and reject absent PRNs.
"""
import numpy as np

from gnsslib_tpu import sim
from gnsslib_tpu.acquire import Acquirer
from gnsslib_tpu.constants import CodeType, DType

F_SF = 16.368e6
F_IF = 4.092e6
NSAMP = 16368


def test_acquisition_multi_prn_real_sampling():
    truth = {
        2: (3000.0, 2500),    # prn: (doppler Hz, code offset samples)
        9: (-1800.0, 11111),
        17: (200.0, 0),
        23: (-4600.0, 16000),
    }
    chans = []
    for prn, (dop, off) in truth.items():
        chans.append(sim.SimChannel(
            prn=prn, doppler=dop,
            code_phase=-off * 1.023e6 / F_SF,
            carr_phase=0.37 * prn, amplitude=1.0))
    nsamples = 12 * NSAMP
    noise = sim.noise_std_for_cn0(1.0, 45.0, F_SF, DType.REAL)
    data = sim.synthesize(chans, F_SF, F_IF, DType.REAL, nsamples,
                          noise_std=noise, seed=42)

    prns = [2, 5, 9, 17, 23]     # prn 5 is absent -> must not acquire
    acq = Acquirer(prns, [CodeType.L1CA] * 5, F_SF, F_IF, DType.REAL,
                   intg=10)
    res = acq.search(np.asarray(data, np.float32))

    for i, prn in enumerate(prns):
        if prn == 5:
            assert not res.acquired[i], "absent PRN must fail the peak test"
            continue
        dop, off = truth[prn]
        assert res.acquired[i], f"PRN {prn} not acquired"
        # Doppler within one 200 Hz step; detected dcarr = -D
        assert abs(res.dcarr[i] + dop) <= 200.0 + 1e-6
        # code phase within 1 sample (code Doppler drift < 1 sample here)
        derr = min(abs(res.codei[i] - off), NSAMP - abs(res.codei[i] - off))
        assert derr <= 1, f"PRN {prn}: codei {res.codei[i]} vs {off}"
        assert res.cn0[i] > 38.0


def test_acquisition_iq_sampling():
    f_sf, f_if = 2.048e6, 0.0
    nsamp = 2048
    ch = sim.SimChannel(prn=12, doppler=1500.0,
                        code_phase=-500 * 1.023e6 / f_sf)
    noise = sim.noise_std_for_cn0(1.0, 45.0, f_sf, DType.IQ)
    x = sim.synthesize([ch], f_sf, f_if, DType.IQ, 12 * nsamp,
                       noise_std=noise, seed=7)
    data = (x[:, 0] + 1j * x[:, 1]).astype(np.complex64)
    acq = Acquirer([12], [CodeType.L1CA], f_sf, f_if, DType.IQ, intg=10)
    res = acq.search(data)
    assert res.acquired[0]
    assert abs(res.dcarr[0] + 1500.0) <= 200.0 + 1e-6
    derr = min(abs(res.codei[0] - 500), nsamp - abs(res.codei[0] - 500))
    assert derr <= 1


def test_acquisition_glonass_fdma():
    """GLONASS channel with FDMA foffset acquires at the offset grid."""
    f_sf, f_if = 16.368e6, 4.092e6
    foff = 2 * 0.5625e6  # frequency slot k=2
    nsamp = int(f_sf * 511 / 0.511e6)
    ch = sim.SimChannel(prn=2, ctype=CodeType.G1, doppler=-1000.0,
                        code_phase=0.0, foffset=foff, f_cf=1.602e9 + foff)
    noise = sim.noise_std_for_cn0(1.0, 48.0, f_sf, DType.REAL)
    x = sim.synthesize([ch], f_sf, f_if, DType.REAL, 12 * nsamp,
                       noise_std=noise, seed=3)
    acq = Acquirer([2], [CodeType.G1], f_sf, f_if, DType.REAL,
                   foffsets=[foff], intg=10)
    assert acq.nsamp == nsamp
    res = acq.search(np.asarray(x, np.float32))
    assert res.acquired[0]
    assert abs(res.dcarr[0] - 1000.0) <= 200.0 + 1e-6
    assert abs(res.acqfreq[0] - (f_if + foff + 1000.0)) <= 200.0 + 1e-6


def test_acquisition_confirm_guard():
    """False-lock guard: a true peak persists across the even/odd
    integration halves; a noise peak lands in a different cell each half.
    With the threshold floored at 1.0 every channel "passes" the peak
    test, so the guard is the only thing separating them."""
    f_sf, f_if = 4.092e6, 1.023e6
    nsamp = 4092
    ch = sim.SimChannel(prn=7, doppler=900.0,
                        code_phase=-1234 * 1.023e6 / f_sf)
    noise = sim.noise_std_for_cn0(1.0, 45.0, f_sf, DType.REAL)
    x = sim.synthesize([ch], f_sf, f_if, DType.REAL, 12 * nsamp,
                       noise_std=noise, seed=7)
    data = np.asarray(x, np.float32)

    # prn 7 present, prn 13/29 absent (pure noise for them)
    acq = Acquirer([7, 13, 29], [CodeType.L1CA] * 3, f_sf, f_if,
                   DType.REAL, intg=10, thresh=1.0, confirm=True)
    res = acq.search(data)
    assert res.confirmed[0], "true signal must confirm"
    assert res.acquired[0]
    derr = min(abs(res.codei[0] - 1234), nsamp - abs(res.codei[0] - 1234))
    assert derr <= 1
    # every channel beats thresh=1.0 by construction...
    assert np.all(res.peakr > 1.0)
    # ...but the noise channels' halves disagree (agreement probability
    # ~ (9 bins x 4 chips)/(71 bins x 4092 samples) per channel)
    assert not res.confirmed[1] and not res.confirmed[2]
    assert not res.acquired[1] and not res.acquired[2]

    # confirm=False preserves the reference behavior (first-pass accept)
    acq0 = Acquirer([7, 13, 29], [CodeType.L1CA] * 3, f_sf, f_if,
                    DType.REAL, intg=10, thresh=1.0, confirm=False)
    res0 = acq0.search(data)
    assert np.all(res0.acquired), "thresh=1.0 accepts everything unguarded"


def test_acquisition_decimated_matches_full_rate():
    """Coarse/fine search (acquire/search.py decim>1; no reference
    analogue — sdracq.c always runs the FFT grid at full rate): the
    decimated FFT stage plus full-rate refinement must reproduce the
    full-rate search's decisions and EXACT code-phase cell at the
    16.368 Msps post-processing envelope (where decim auto-selects 4)."""
    f_sf, f_if = 16.368e6, 4.092e6
    prns = [2, 5, 9, 17, 23]             # 5 absent -> must not acquire
    chans = [sim.SimChannel(prn=p, doppler=137.0 * p - 400.0,
                            code_phase=31.0 * p)
             for p in prns if p != 5]
    data = np.asarray(sim.synthesize(chans, f_sf, f_if, DType.REAL,
                                     12 * 16368, noise_std=2.0, seed=5),
                      np.float32)
    a_d = Acquirer(prns, [CodeType.L1CA] * 5, f_sf, f_if, DType.REAL,
                   intg=10)
    a_1 = Acquirer(prns, [CodeType.L1CA] * 5, f_sf, f_if, DType.REAL,
                   intg=10, decim=1)
    assert a_d.decim == 4 and a_1.decim == 1
    r_d, r_1 = a_d.search(data), a_1.search(data)
    np.testing.assert_array_equal(r_d.acquired, r_1.acquired)
    present = [i for i, p in enumerate(prns) if p != 5]
    np.testing.assert_array_equal(r_d.codei[present], r_1.codei[present])
    np.testing.assert_array_equal(r_d.freqi[present], r_1.freqi[present])
    # statistics on the coarse surface: same C/N0 within the straddle loss
    assert np.all(np.abs(r_d.cn0[present] - r_1.cn0[present]) < 1.5)
