"""FastTracker (L-periods-per-step steady-state path) vs the per-period
reference path: identical bookkeeping, matching loops and prompts."""
import numpy as np
import jax.numpy as jnp
import pytest

from gnsslib_tpu import sim
from gnsslib_tpu.constants import CodeType, DType
from gnsslib_tpu.nav import NavChannel
from gnsslib_tpu.track import FastTracker, TrackConfig, Tracker

F_SF = 4.092e6
F_IF = 1.023e6
NSAMP = 4092
CFG = TrackConfig(corrn=4, corrd=2, corrp=2)


def _locked_state(doppler=900.0, codei=800, seconds=7.0, cn0=45.0, seed=3):
    rng = np.random.default_rng(5)
    bits = (1 - 2 * rng.integers(0, 2, 512)).astype(np.int8)
    ch = sim.SimChannel(prn=7, doppler=doppler,
                        code_phase=-codei * 1.023e6 / F_SF,
                        carr_phase=0.3, nav_bits=bits)
    noise = sim.noise_std_for_cn0(1.0, cn0, F_SF, DType.REAL)
    data = np.asarray(sim.synthesize([ch], F_SF, F_IF, DType.REAL,
                                     int(seconds * F_SF), noise_std=noise,
                                     seed=seed), np.float32)
    trk = Tracker(CFG, [7], [CodeType.L1CA], F_SF, F_IF, DType.REAL)
    st = trk.init_state()
    st = trk.start_channels(st, [0], [codei], [-doppler])
    block = jnp.asarray(data)
    st, out = trk.run_block(st, block, 5600)
    nav = NavChannel(CodeType.L1CA, 7)
    nav.update(out.ip[:, 0], out.loc[:, 0].astype(np.int64), 0)
    assert nav.flagsync, "test fixture failed to bit-sync"
    st = trk.set_bit_sync(st, 0, nav.sync_offset)
    return trk, st, block


def test_fast_matches_slow_steady_state():
    trk, st, block = _locked_state()
    st_s, out_s = trk.run_block(st, block, 1000)
    ft = FastTracker(trk)
    st_f, out_f = ft.run_block(st, block, 1000)

    # sample bookkeeping identical up to the closed-form vs iterative
    # rounding composition (at most 1 sample, transiently)
    assert np.max(np.abs(out_s.loc - out_f.loc)) <= 1
    assert int(np.asarray(st_s.loc)[0]) == int(np.asarray(st_f.loc)[0])
    assert abs(float(np.asarray(st_s.remcode)[0])
               - float(np.asarray(st_f.remcode)[0])) < 2e-3
    # prompt stream effectively identical
    corr = np.corrcoef(out_s.ip[:, 0], out_f.ip[:, 0])[0, 1]
    assert corr > 0.99, corr
    # carrier loop agrees to well under the noise jitter
    assert out_s.dcarr[-1, 0] == pytest.approx(out_f.dcarr[-1, 0], abs=0.5)
    # exactly one loop-filter update per L periods, at the same periods
    s_upd = np.nonzero(out_s.flagloopfilter[:, 0] == 2)[0]
    f_upd = np.nonzero(out_f.flagloopfilter[:, 0] == 2)[0]
    assert np.array_equal(s_upd, f_upd)


def test_fast_requires_table_and_sync_cadence():
    import dataclasses
    trk = Tracker(dataclasses.replace(CFG, resample="exact"), [7],
                  [CodeType.L1CA], F_SF, F_IF, DType.REAL)
    with pytest.raises(ValueError):
        FastTracker(trk)
    trk2 = Tracker(CFG, [7], [CodeType.L1CA], F_SF, F_IF, DType.REAL)
    ft = FastTracker(trk2)
    with pytest.raises(ValueError):
        ft.run_block(ft.init_state(), jnp.zeros(100000, jnp.float32), 1001)


def test_fast_diag_matches_xla():
    """The MXU Gram-diagonal correlator (_taps_diag) matches the XLA
    einsum formulation through the full FastTracker, including I/Q
    bookkeeping, loop-filter updates, and sample accounting.

    The two runs' f32 states diverge at summation-order level; when the
    code phase drifts across a chip-commensurate table breakpoint
    (4 samples/chip here) that divergence can flip one period's replica
    by a table quantum, so a couple of isolated one-period excursions
    are expected and bounded rather than forbidden (same behaviour as
    pallas-vs-xla on long runs)."""
    trk, st, block = _locked_state()
    fx = FastTracker(trk, use_pallas=False)
    fd = FastTracker(trk, use_pallas=False)
    fd.corr = "diag"
    _, out_x = fx.run_block(st, block, 600)
    _, out_d = fd.run_block(st, block, 600)
    assert np.array_equal(out_x.loc, out_d.loc)
    scale = np.max(np.abs(out_x.ip))
    for a, b in ((out_x.ip, out_d.ip), (out_x.qp, out_d.qp)):
        d = np.abs(a - b)
        outliers = int(np.sum(d > 5e-3 * scale))
        assert outliers <= 3, (outliers, float(d.max()))
        assert np.median(d) < 1e-3 * scale
        corr = np.corrcoef(a[:, 0], b[:, 0])[0, 1]
        assert corr > 0.999, corr
    np.testing.assert_allclose(out_x.dcarr, out_d.dcarr, atol=0.5)
    s_upd = np.nonzero(out_x.flagloopfilter[:, 0] == 2)[0]
    d_upd = np.nonzero(out_d.flagloopfilter[:, 0] == 2)[0]
    assert np.array_equal(s_upd, d_upd)


def test_fast_fused_and_diag2_match_diag():
    """The fused Pallas mix+Gram kernel (interpret mode on CPU) and the
    single-dot diag2 formulation match the two-dot diag correlator
    through the full FastTracker: same windows, same split-Gram layout,
    same extractor — only summation order and one bf16 rounding site
    differ.  Uses the non-128-multiple row count (K=33 -> padded to 64)
    so the padding paths are exercised.  band-interpret runs the
    band-resident kernel (in-kernel window fetch from the VMEM-resident
    row-phase planes) through the Pallas interpreter — the backend with
    the most novel indexing gets the same equivalence gate."""
    trk, st, block = _locked_state()
    fd = FastTracker(trk, use_pallas=False)
    fd.corr = "diag"
    _, out_d = fd.run_block(st, block, 600)
    scale = np.max(np.abs(out_d.ip))
    for corr in ("fused-interpret", "diag2", "band-interpret"):
        fv = FastTracker(trk, use_pallas=False)
        fv.corr = corr
        _, out_v = fv.run_block(st, block, 600)
        assert np.array_equal(out_d.loc, out_v.loc), corr
        for a, b in ((out_d.ip, out_v.ip), (out_d.qp, out_v.qp)):
            d = np.abs(a - b)
            outliers = int(np.sum(d > 5e-3 * scale))
            assert outliers <= 3, (corr, outliers, float(d.max()))
            assert np.median(d) < 1e-3 * scale, corr
            c = np.corrcoef(a[:, 0], b[:, 0])[0, 1]
            assert c > 0.999, (corr, c)
        np.testing.assert_allclose(out_d.dcarr, out_v.dcarr, atol=0.5)


def test_fast_band_out_of_band_raises():
    """A channel geometry whose window starts exceed the VMEM-resident
    band (channel spread beyond one code period) must be flagged in
    telemetry and raised at collect, not silently produce wrong taps."""
    trk, st, block = _locked_state()
    trk2 = Tracker(CFG, [7, 8], [CodeType.L1CA] * 2, F_SF, F_IF,
                   DType.REAL)
    st2 = trk2.init_state()
    # band span is ~(L+1)*n_nom + nwin + 512 samples; separate the two
    # channels by far more than that so the second start falls outside
    spread = (trk2.n_nom * 14)
    st2 = trk2.start_channels(st2, [0, 1], [800, 800 + spread],
                              [-900.0, -900.0])
    for c in range(2):
        st2 = trk2.set_bit_sync(st2, c, 0)
    fb = FastTracker(trk2, use_pallas=False)
    fb.corr = "band-interpret"
    with pytest.raises(RuntimeError, match="band"):
        fb.run_block(st2, block, 10)


def test_fast_band_tolerates_inactive_channels():
    """An unlocked channel's block-relative loc runs far negative (rebase
    subtracts the advance every block whether or not the channel is
    active) — the band backend must clamp those windows and exclude them
    from the out-of-band flag, matching diag on the active channel
    (receivers track 12 of 32 configured PRNs all day)."""
    trk, st, block = _locked_state()
    trk2 = Tracker(CFG, [7, 8], [CodeType.L1CA] * 2, F_SF, F_IF,
                   DType.REAL)
    st2 = trk2.init_state()
    # drive the (still-inactive) channels' loc far negative, then
    # activate only channel 0 at a sane position
    st2 = trk2.rebase(st2, 40 * trk2.n_nom)
    st2 = trk2.start_channels(st2, [0], [800], [-900.0])
    st2 = trk2.set_bit_sync(st2, 0, 0)
    outs = {}
    for corr in ("diag", "band-interpret"):
        f = FastTracker(trk2, use_pallas=False)
        f.corr = corr
        _, outs[corr] = f.run_block(st2, block, 100)    # must not raise
    a, b = outs["diag"], outs["band-interpret"]
    np.testing.assert_array_equal(a.loc[:, 0], b.loc[:, 0])
    scale = np.max(np.abs(a.ip[:, 0])) or 1.0
    assert np.median(np.abs(a.ip[:, 0] - b.ip[:, 0])) < 1e-3 * scale


def test_corr_setter_rejects_wide_split_geometry():
    """Backends built on the 64-lane split-Gram layout (diag2/fused/band)
    silently drop tap terms when 2*smax > 64; the corr setter must refuse
    such geometries (ADVICE r3: fast.py _split_D used unconditionally)."""
    wide = TrackConfig(corrn=12, corrd=3, corrp=6)      # smax=36
    trkw = Tracker(wide, [7], [CodeType.L1CA], F_SF, F_IF, DType.REAL)
    fw = FastTracker(trkw, use_pallas=False)
    assert 2 * fw.smax > 64
    fw.corr = "diag"                                    # wide-Gram: fine
    for corr in ("diag2", "fused", "fused-interpret", "band",
                 "band-interpret"):
        with pytest.raises(ValueError, match="2\\*smax"):
            fw.corr = corr


def test_fast_diag_matches_xla_iq():
    """Diag correlator with a complex (I/Q-stacked) front end.

    The two formulations' f32 rounding differs (factored vs per-sample
    carrier), and this scenario is chip-commensurate (4 samples/chip):
    once the trajectories drift across a replica-table breakpoint, whole
    periods diverge at full scale — a chaotic amplification, not a
    numerics bug (the round-2 formulation shows the same blowup under a
    different XLA partitioning, and the real-valued fixture above stays
    within 3 outliers over 600 steps).  So: demand exactness on a
    pre-divergence horizon, bulk agreement by median, and that BOTH
    formulations preserve the lock (prompt energy) — the chaotic
    whole-run outlier count itself is not a meaningful statistic."""
    f_sf, f_if, C = 4.092e6, 0.0, 2
    chans = [sim.SimChannel(prn=p, doppler=400.0 * p, code_phase=50.0 * p)
             for p in (2, 9)]
    data = sim.synthesize(chans, f_sf, f_if, DType.IQ, int(1.2 * f_sf),
                          noise_std=1.0, seed=11)
    block = jnp.asarray(np.asarray(data, np.float32))     # (n, 2) I/Q
    trk = Tracker(CFG, [2, 9], [CodeType.L1CA] * C, f_sf, f_if, DType.IQ)
    st = trk.init_state()
    st = trk.start_channels(st, [0, 1], [0, 0], [-400.0, -3600.0])
    st, _ = trk.run_block(st, block, 300)
    for c in range(C):
        st = trk.set_bit_sync(st, c, 0)
    fx = FastTracker(trk, use_pallas=False)
    fd = FastTracker(trk, use_pallas=False)
    fd.corr = "diag"
    _, out_x = fx.run_block(st, block, 200)
    _, out_d = fd.run_block(st, block, 200)
    assert np.array_equal(out_x.loc, out_d.loc)
    scale = np.max(np.abs(out_x.ip))
    d = np.abs(out_x.ip - out_d.ip)
    # exact-horizon agreement before chaotic divergence can act
    assert int(np.sum(d[:60] > 5e-3 * scale)) <= 2, float(d[:60].max())
    # bulk agreement over the whole run (full-scale one-period
    # excursions are isolated; the typical period matches)
    assert np.median(d) < 2e-3 * scale
    # both formulations hold the lock: per-channel prompt energy agrees
    # and stays far above the noise floor for the whole run
    e_x = np.mean(np.abs(out_x.ip), axis=0)
    e_d = np.mean(np.abs(out_d.ip), axis=0)
    np.testing.assert_allclose(e_d, e_x, rtol=0.15)
    tail_x = np.mean(np.abs(out_x.ip[-50:]), axis=0)
    tail_d = np.mean(np.abs(out_d.ip[-50:]), axis=0)
    assert np.all(tail_x > 0.3 * e_x) and np.all(tail_d > 0.3 * e_d)


def test_factored_carrier_phase_accuracy():
    """The diag correlator's factored carrier (theta_k + phi_j angle
    addition, _taps_diag) must stay within a bounded phase error of the
    exact f64 carrier across the whole window — a drift-style bug would
    slip past the IQ equivalence test above (whose post-horizon gate
    tolerates chaotic divergence), so the angles are checked directly."""
    rng = np.random.default_rng(4)
    K = 129
    jj64 = np.arange(128, dtype=np.float64)
    kk64 = np.arange(K, dtype=np.float64) * 128.0
    for _ in range(20):
        ftot = np.float32(rng.uniform(-0.5, 0.5))
        rem = np.float32(rng.uniform(0.0, 1.0))
        # factored f32 path, exactly as _taps_diag computes it
        kk = (np.arange(K, dtype=np.float32) * np.float32(128.0))
        th = (2 * np.pi) * (((ftot * kk) % 1.0 + rem) % 1.0)
        ck = np.cos(th, dtype=np.float32)[:, None]
        sk = np.sin(th, dtype=np.float32)[:, None]
        phj = ((2 * np.pi) * (ftot * np.arange(128, dtype=np.float32)))
        cj = np.cos(phj, dtype=np.float32)[None, :]
        sj = np.sin(phj, dtype=np.float32)[None, :]
        cosv = ck * cj - sk * sj
        sinv = sk * cj + ck * sj
        # exact f64 carrier at every sample index
        i64 = kk64[:, None] + jj64[None, :]
        ang = 2 * np.pi * ((np.float64(ftot) * i64 + np.float64(rem))
                           % 1.0)
        # phase error in radians via the chord length
        err = np.hypot(cosv - np.cos(ang), sinv - np.sin(ang))
        # bounded absolutely (3e-4 cycles — far below tracking jitter)..
        assert float(err.max()) < 2e-3, float(err.max())
        # ..and no worse than the direct per-sample f32 form the round-2
        # path used: both share the dominant ftot*i product rounding
        # (which GROWS with i), so the factored form must track it, not
        # add its own drift on top
        i32 = i64.astype(np.float32)
        ang32 = ((2 * np.pi)
                 * (((ftot * i32) % 1.0 + rem) % 1.0)).astype(np.float32)
        err_dir = np.hypot(np.cos(ang32, dtype=np.float32) - np.cos(ang),
                           np.sin(ang32, dtype=np.float32) - np.sin(ang))
        assert float(err.max()) < 2.0 * float(err_dir.max()) + 2e-4, \
            (float(err.max()), float(err_dir.max()))


def test_fast_pallas_interpret_matches_xla():
    """The fused Pallas correlator path (interpret mode on CPU) matches
    the XLA formulation through the full FastTracker."""
    f_sf = 1.023e6          # 1 sample/chip: small kernel shapes
    ch = sim.SimChannel(prn=3, doppler=300.0, code_phase=-100.0,
                        carr_phase=0.1)
    data = np.asarray(sim.synthesize([ch], f_sf, f_sf / 4, DType.REAL,
                                     int(0.35 * f_sf)), np.float32)
    cfg = TrackConfig(corrn=1, corrd=1, corrp=1)
    trk = Tracker(cfg, [3], [CodeType.L1CA], f_sf, f_sf / 4, DType.REAL)
    st = trk.init_state()
    st = trk.start_channels(st, [0], [100], [-300.0])
    block = jnp.asarray(data)
    st, _ = trk.run_block(st, block, 200)
    st = trk.set_bit_sync(st, 0, 0)
    fx = FastTracker(trk, use_pallas=False)
    fp = FastTracker(trk, use_pallas="interpret")
    _, out_x = fx.run_block(st, block, 60)
    _, out_p = fp.run_block(st, block, 60)
    assert np.array_equal(out_x.loc, out_p.loc)
    np.testing.assert_allclose(out_x.ip, out_p.ip, rtol=5e-3, atol=3.0)
    np.testing.assert_allclose(out_x.dcarr, out_p.dcarr, atol=0.5)
