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
