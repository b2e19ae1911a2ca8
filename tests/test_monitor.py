"""Periodic diagnostics: SPEC_MS-cadence spectrum/histogram during a run
(the reference's live spectrum thread, src/sdrspec.c:29-110)."""
import numpy as np

from gnsslib_tpu import sim
from gnsslib_tpu.constants import DType, FrontendType, SPEC_MS
from gnsslib_tpu.io.frontend import FileFrontend, FrontendSpec
from gnsslib_tpu.runtime.config import ChannelConfig, ReceiverConfig
from gnsslib_tpu.runtime.receiver import Receiver
from gnsslib_tpu.track.state import TrackConfig

F_SF = 4.092e6
F_IF = 1.023e6


def test_spectrum_monitor_cadence(tmp_path):
    seconds = 2.0
    x = sim.synthesize(
        [sim.SimChannel(prn=5, doppler=800.0, code_phase=100.0)],
        F_SF, F_IF, DType.REAL, int(seconds * F_SF), noise_std=1.0, seed=2)
    path = tmp_path / "sig.bin"
    sim.quantize_int8(x, 16.0).tofile(path)
    spec = FrontendSpec(fend=FrontendType.FILE, f_cf=1.57542e9, f_sf=F_SF,
                        f_if=F_IF, dtype=DType.REAL)
    cfg = ReceiverConfig(
        channels=[ChannelConfig(prn=5)], fends=[spec], files=[str(path)],
        track=TrackConfig(corrn=4, corrd=2, corrp=2),
        outms=400, rinex=False, spec=True)
    rx = Receiver(cfg, FileFrontend(str(path), spec),
                  nsteps_per_block=100)            # 100 ms blocks
    rx.run_seconds()
    frames = list(rx.spec_monitor.frames)
    # one frame per SPEC_MS grid point covered by the stream
    expect = int(seconds * 1000 / SPEC_MS)
    assert expect - 2 <= len(frames) <= expect + 1, len(frames)
    dt = np.diff([f.t_stream for f in frames])
    assert np.all(np.abs(dt - SPEC_MS / 1000.0) < 0.101), dt
    f0 = frames[-1]
    # histogram counts cover all 7 ms of samples; spectrum peaks near IF
    assert f0.hist_counts.sum() == int(0.007 * F_SF)
    pk = f0.freq_hz[np.argmax(f0.pspec_db)]
    assert abs(pk - F_IF) < 0.05e6, pk
    # acquisition surface captured at lock (reference pltacq view): the
    # peak cell should sit at the acquired code phase
    assert 5 in rx.acq_views
    v = rx.acq_views[5]
    assert v["surface"].shape == (rx.acq.nfreq, rx.acq.nsamp)
    f_pk, c_pk = np.unravel_index(np.argmax(v["surface"]),
                                  v["surface"].shape)
    assert abs(int(c_pk) - v["codei"]) <= 2
    # correlator tap shape tracked live (reference plttrk view): prompt
    # tap dominates in lock
    assert 5 in rx.corr_views
    cv = rx.corr_views[5]
    assert cv["mag"].shape == cv["offsets"].shape
    assert np.argmax(cv["mag"]) == 0       # tap order [P, E1, L1, ...]
