"""Channel sharding over the virtual 8-device mesh: sharded programs must
reproduce the single-device results exactly (no cross-channel coupling)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnsslib_tpu import sim
from gnsslib_tpu.acquire import Acquirer
from gnsslib_tpu.constants import CodeType, DType
from gnsslib_tpu.parallel import ShardedAcquirer, ShardedTracker, make_mesh
from gnsslib_tpu.track import TrackConfig, Tracker

F_SF = 1.023e6          # 1 sample/chip: tiny shapes
F_IF = F_SF / 4
C = 8

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def _signal(n):
    chans = [sim.SimChannel(prn=p, doppler=200.0 * p - 900.0,
                            code_phase=50.0 * p, carr_phase=0.1 * p)
             for p in range(1, 5)]
    return np.asarray(sim.synthesize(chans, F_SF, F_IF, DType.REAL, n,
                                     noise_std=0.5, seed=9), np.float32)


def test_sharded_tracker_matches_single():
    cfg = TrackConfig(corrn=1, corrd=1, corrp=1)
    prns = list(range(1, C + 1))
    trk = Tracker(cfg, prns, [CodeType.L1CA] * C, F_SF, F_IF, DType.REAL)
    mesh = make_mesh(8)
    strk = ShardedTracker(trk, mesh)
    nsteps = 12
    data = _signal(nsteps * trk.n_nom + trk.nwin + 8 * nsteps + 3000)
    block = jnp.asarray(data)
    st0 = trk.init_state()
    st0 = trk.start_channels(st0, list(range(C)), [10 * p for p in prns],
                             [100.0 * p - 400.0 for p in prns])
    st_a, out_a = trk.run_block(st0, block, nsteps)
    st_b, out_b = strk.run_block(st0, block, nsteps)
    np.testing.assert_allclose(out_a.ip, out_b.ip, rtol=1e-5, atol=1e-3)
    np.testing.assert_array_equal(out_a.loc, out_b.loc)
    np.testing.assert_allclose(np.asarray(st_a.remcode),
                               np.asarray(st_b.remcode), atol=1e-6)


def test_sharded_acquirer_matches_single():
    prns = list(range(1, C + 1))
    acq = Acquirer(prns, [CodeType.L1CA] * C, F_SF, F_IF, DType.REAL,
                   intg=3)
    mesh = make_mesh(8)
    sacq = ShardedAcquirer(acq, mesh)
    data = _signal((acq.intg + 2) * acq.nsamp)
    ra = acq.search(data)
    rb = sacq.search(data)
    np.testing.assert_array_equal(ra.codei, rb.codei)
    np.testing.assert_array_equal(ra.freqi, rb.freqi)
    np.testing.assert_allclose(ra.cn0, rb.cn0, rtol=1e-4)
    np.testing.assert_array_equal(ra.acquired, rb.acquired)
