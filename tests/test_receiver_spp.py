"""IF samples -> position: the full closed loop.

Synthesize a physics-consistent 6-satellite constellation (true broadcast
orbits, light-time, Sagnac, SV clocks — sim.geometry_scenario) for a
known receiver location, run the complete receiver (acquisition,
tracking, LNAV decode, epoch-aligned pseudoranges), and require the
single-point solutions to land on the true position.
"""
import numpy as np
import pytest

from gnsslib_tpu import sim
from gnsslib_tpu.constants import DType, PTIMING

# 4.096 Msps: deliberately NOT chip-commensurate (4.0039 samples/chip).
# At an integer samples-per-chip rate the synthesized signal's chip edges
# all share one fractional-sample offset, so the signal itself carries a
# sample-QUANTIZED delay (+-0.5 sample = +-37 m sawtooth as the geometry
# slides) that no receiver can remove; with an incommensurate rate the
# edge offsets sweep uniformly across each code period and average out —
# exactly why real front ends never sample at an integer multiple of the
# chip rate.
F_SF = 4.096e6
F_IF = 1.023e6
WEEK, TOW0 = 2200, 352800.0
T_OBS = 25.0                    # linearization anchor (stream seconds)
# subframes 1..3 (the full ephemeris) span stream t=6..24 s; SPP fixes
# begin once subframe 3 lands (~24.2 s)
SECONDS = 27.0
RCV = np.array([-3954844.0, 3354936.0, 3700264.0])   # Tokyo-ish ECEF


@pytest.fixture(scope="module")
def spp_run(tmp_path_factory):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from gnsslib_tpu.constants import FrontendType
    from gnsslib_tpu.io.frontend import FileFrontend, FrontendSpec
    from gnsslib_tpu.runtime.config import ReceiverConfig, ChannelConfig
    from gnsslib_tpu.runtime.receiver import Receiver
    from gnsslib_tpu.track.state import TrackConfig

    tmp = tmp_path_factory.mktemp("spp")
    cands = []
    k = 0
    for omg0 in (-0.9, -0.55, -0.2, 0.15, 0.5, 0.85):
        for m0 in (-0.6, 0.0, 0.6):
            k += 1
            cands.append(sim.example_eph(prn=k, week=WEEK, toe_tow=TOW0,
                                         m0=m0, omg0=omg0))
    geo = sim.geometry_scenario(cands, RCV, TOW0 + T_OBS, TOW0,
                                min_elev_deg=15.0)[:6]
    assert len(geo) == 6
    eph_by_prn = {e.prn: e for e in cands}

    chans = []
    pad = np.concatenate([np.tile([1, -1], 149), [1, 1]]).astype(np.int8)
    for g in geo:
        frames = sim.lnav_bit_stream(eph_by_prn[g["prn"]], TOW0 + 6.0,
                                     nframes=4)
        chans.append(sim.SimChannel(
            prn=g["prn"], doppler=g["doppler"],
            code_phase=g["code_phase"], carr_phase=0.11 * g["prn"],
            nav_bits=np.concatenate([pad, frames])))
    noise = sim.noise_std_for_cn0(1.0, 46.0, F_SF, DType.REAL)
    path = tmp / "const.bin"
    n = int(SECONDS * F_SF)
    with open(path, "wb") as f:
        step = int(F_SF)
        for t0 in range(0, n, step):
            x = sim.synthesize(chans, F_SF, F_IF, DType.REAL,
                               min(step, n - t0), noise_std=noise,
                               seed=500 + t0, t0=t0)
            sim.quantize_int8(x, 16.0).tofile(f)

    spec = FrontendSpec(fend=FrontendType.FILE, f_cf=1.57542e9, f_sf=F_SF,
                        f_if=F_IF, dtype=DType.REAL)
    cfg = ReceiverConfig(
        channels=[ChannelConfig(prn=g["prn"]) for g in geo],
        fends=[spec], files=[str(path)],
        # interp_replica: the nearest-neighbour replica's S-curve bias at
        # 4 samples/chip wanders +-15 m as each code phase slides through
        # sample alignment — position-domain poison; the interpolated
        # table removes it
        track=TrackConfig(corrn=4, corrd=2, corrp=2, interp_replica=True),
        outms=400, rinex=True, rinexpath=str(tmp / "out"), spp=True)
    rx = Receiver(cfg, FileFrontend(str(path), spec))
    rx.run_seconds()
    rx.close()
    return rx


def test_spp_positions_recover_truth(spp_run):
    rx = spp_run
    assert sum(ch.nav.flagdec for ch in rx.channels) == 6
    fixes = rx.hub.positions
    assert len(fixes) >= 3, f"only {len(fixes)} SPP fixes"
    errs = [float(np.linalg.norm(pos - RCV))
            for _, tow, pos, clk, nsat in fixes]
    # fix nearest the linearization anchor
    anchor_tow = TOW0 + T_OBS + PTIMING / 1000.0
    i_anchor = int(np.argmin([abs(f[1] - anchor_tow) for f in fixes]))
    assert errs[i_anchor] < 30.0, f"anchor fix error {errs[i_anchor]:.1f} m"
    assert np.median(errs) < 30.0, f"median error {np.median(errs):.1f} m"
    assert all(n == 6 for *_, n in fixes)


def test_spp_pos_file_written(spp_run, tmp_path):
    """OutputHub writes the .pos file (same timestamp as the RINEX
    files) and its lines carry sane geodetic coordinates."""
    import math
    import os
    from gnsslib_tpu.obs.spp import ecef2llh
    rx = spp_run
    _, tow, pos, clk, nsat = rx.hub.positions[-1]
    lat, lon, h = ecef2llh(pos)
    assert abs(math.degrees(lat) - 35.7) < 0.1
    assert abs(math.degrees(lon) - 139.7) < 0.1
    outdir = os.path.dirname(rx.obs_writer.path)
    posfiles = [f for f in os.listdir(outdir) if f.endswith(".pos")]
    assert len(posfiles) == 1
    assert posfiles[0][:-4] == os.path.basename(rx.obs_writer.path)[:-4]
    lines = [ln for ln in open(os.path.join(outdir, posfiles[0]))
             if not ln.startswith("%")]
    assert len(lines) == len(rx.hub.positions)
    f = lines[-1].split()
    assert abs(float(f[7]) - 35.7) < 0.1      # lat column
    assert abs(float(f[8]) - 139.7) < 0.1     # lon column
    assert float(f[11]) < 20.0                # gdop column


def test_spp_velocity_and_dop_from_tracking(spp_run):
    """The tracked Dopplers yield near-zero velocity for the static
    receiver; DOP factors are reported."""
    rx = spp_run
    _, tow, sol = rx.hub.solutions[-1]
    assert sol.vel is not None
    assert float(np.linalg.norm(sol.vel)) < 1.0, sol.vel
    assert sol.dop and sol.dop["gdop"] < 10.0


def test_hotstart_aided_handoff(spp_run):
    """Position/ephemeris-aided hot start: with one satellite's FFT
    acquisition suppressed and its ephemeris supplied as assistance
    (A-GNSS style, injected into hub.ephs — a satellite's own ephemeris
    is otherwise only known after ITS nav decode), the receiver derives
    its code-boundary sample and Doppler from the fix + broadcast orbit
    and starts tracking directly.  The prediction must land within DLL
    pull-in range of the simulated truth (sub-chip code phase, a few Hz
    Doppler)."""
    import copy
    from gnsslib_tpu.constants import SYS_GPS
    from gnsslib_tpu.constants import FrontendType
    from gnsslib_tpu.io.frontend import FileFrontend, FrontendSpec
    from gnsslib_tpu.runtime.config import ReceiverConfig, ChannelConfig
    from gnsslib_tpu.runtime.receiver import Receiver
    from gnsslib_tpu.track.state import TrackConfig

    rx0 = spp_run
    path = rx0.frontend.path
    spec = rx0.spec
    prns = [c.cfg.prn for c in rx0.channels]
    blocked = prns[-1]
    cfg = ReceiverConfig(
        channels=[ChannelConfig(prn=p) for p in prns],
        fends=[spec], files=[path],
        track=TrackConfig(corrn=4, corrd=2, corrp=2, interp_replica=True),
        outms=400, rinex=False, spp=True, hotstart=True)
    rx = Receiver(cfg, FileFrontend(path, spec))
    orig = rx._acq_search

    def suppress():
        res = orig()
        res.acquired[prns.index(blocked)] = False
        return res
    rx._acq_search = suppress

    # truth reconstruction (same deterministic build as the fixture) +
    # assistance injection for the suppressed satellite
    cands = []
    k = 0
    for omg0 in (-0.9, -0.55, -0.2, 0.15, 0.5, 0.85):
        for m0 in (-0.6, 0.0, 0.6):
            k += 1
            cands.append(sim.example_eph(prn=k, week=WEEK, toe_tow=TOW0,
                                         m0=m0, omg0=omg0))
    geo = sim.geometry_scenario(cands, RCV, TOW0 + T_OBS, TOW0,
                                min_elev_deg=15.0)[:6]
    rx.hub.ephs[(SYS_GPS, blocked)] = copy.deepcopy(
        next(c for c in cands if c.prn == blocked).eph)
    rx.run_seconds()

    hot = [e for e in rx.events if e[0] == "hot"]
    assert len(hot) == 1 and hot[0][2] == blocked, rx.events
    ch = next(c for c in rx.channels if c.cfg.prn == blocked)
    assert ch.locked
    _, t_hot, _, negD_pred, loc_pred = hot[0]
    g = next(x for x in geo if x["prn"] == blocked)
    D_true = g["doppler"]
    assert abs(-negD_pred - D_true) < 5.0, (negD_pred, D_true)

    base = int(round(t_hot * F_SF))          # block start at hot event
    t0 = (base + loc_pred) / F_SF
    crate_rx = 1.023e6 * (1.0 - D_true / 1.57542e9)
    chips = (g["code_phase"] + crate_rx * t0) % 1023.0
    err_chips = min(chips, 1023.0 - chips)
    err_samples = err_chips * F_SF / 1.023e6
    assert err_samples < 3.0, f"boundary error {err_samples:.2f} samples"
