"""Mixed GPS+GLONASS IF samples -> position.

The capstone cross-constellation closed loop: five GPS satellites plus a
GLONASS FDMA satellite whose broadcast state vector is bit-encoded into
the G1 superframe strings, synthesized with physics-true delays from
their own broadcast models, tracked, decoded, and solved — the GLONASS
leg of the SPP stack (geph registration, RK4 orbit, per-fcn carrier)
exercised through the real receiver.
"""
import numpy as np
import pytest

from gnsslib_tpu import sim
from gnsslib_tpu.constants import (CodeType, DType, DFRQ1_GLO, FREQ1_GLO,
                                   SYS_GLO)
from gnsslib_tpu.gtime import gpst2time

F_SF = 4.096e6            # incommensurate with both chip rates
F_IF = 1.023e6
WEEK = 2200
# (TOW0-18) % 30 == 0 so the G1 string-1 time fields are exact; GPS
# frames start at TOW0+6 (sfid 4 -> full eph once sf3 lands at t=36)
TOW0 = 352818.0
T_OBS = 38.0
SECONDS = 40.0
GLO_FCN, GLO_SLOT, GLO_IODE = 2, 11, 20   # iode 20 -> toe = TOW0 exactly
RCV = np.array([-3954844.0, 3354936.0, 3700264.0])


@pytest.fixture(scope="module")
def mixed_run(tmp_path_factory):
    import math

    import jax
    jax.config.update("jax_platforms", "cpu")
    from gnsslib_tpu.constants import FrontendType
    from gnsslib_tpu.io.frontend import FileFrontend, FrontendSpec
    from gnsslib_tpu.nav.eph import Geph
    from gnsslib_tpu.runtime.config import ReceiverConfig, ChannelConfig
    from gnsslib_tpu.runtime.receiver import Receiver
    from gnsslib_tpu.track.state import TrackConfig

    tmp = tmp_path_factory.mktemp("sppglo")

    # --- GPS constellation (4 visible) --------------------------------
    cands = []
    k = 0
    for omg0 in (-0.9, -0.55, -0.2, 0.15, 0.5, 0.85):
        for m0 in (-0.6, 0.0, 0.6):
            k += 1
            cands.append(sim.example_eph(prn=k, week=WEEK,
                                         toe_tow=352800.0,
                                         m0=m0, omg0=omg0))
    # --- GLONASS satellite: zenith-ish state vector at toe == TOW0 ----
    up = RCV / np.linalg.norm(RCV)
    tang = np.cross([0.0, 0.0, 1.0], up)
    tang /= np.linalg.norm(tang)
    v0 = math.sqrt(398600.44e9 / 25508000.0)
    glo = Geph(pos=list(up * 25508000.0), vel=list(tang * v0),
               acc=[0.0, 0.0, 0.0], taun=-3.1e-5, gamn=0.0, dtaun=0.0,
               frq=GLO_FCN, iode=GLO_IODE,
               toe=gpst2time(WEEK, TOW0))
    sim.quantize_geph(glo)

    geo = sim.geometry_scenario(cands + [glo], RCV, TOW0 + T_OBS, TOW0,
                                min_elev_deg=15.0)
    g_glo = geo[-1]                      # the Geph entry (sat prn 0)
    assert not hasattr(cands[-1], "pos") or True
    # five GPS + one GLONASS: the solver estimates one clock PER
    # SYSTEM (inter-system bias), so 6 sats / 5 unknowns leaves one
    # redundancy and the position is GPS-overdetermined
    gps_geo = [g for g in geo[:-1]][:5]
    eph_by_prn = {e.prn: e for e in cands}

    chans = []
    pad = np.concatenate([np.tile([1, -1], 149), [1, 1]]).astype(np.int8)
    for g in gps_geo:
        frames = sim.lnav_bit_stream(eph_by_prn[g["prn"]], TOW0 + 6.0,
                                     nframes=6)
        chans.append(sim.SimChannel(
            prn=g["prn"], doppler=g["doppler"],
            code_phase=g["code_phase"], carr_phase=0.13 * g["prn"],
            nav_bits=np.concatenate([pad, frames])))
    f_cf_glo = FREQ1_GLO + GLO_FCN * DFRQ1_GLO
    glo_bits = sim.g1_symbol_stream(gpst2time(WEEK, TOW0), nframes=3,
                                    iode=GLO_IODE, slot=GLO_SLOT,
                                    geph=glo)
    chans.append(sim.SimChannel(
        prn=GLO_FCN, ctype=CodeType.G1,
        doppler=g_glo["rate"] * f_cf_glo,
        code_phase=g_glo["code_phase"], carr_phase=0.77,
        nav_bits=glo_bits, nav_ms=10.0, f_cf=f_cf_glo,
        foffset=GLO_FCN * DFRQ1_GLO))

    noise = sim.noise_std_for_cn0(1.0, 46.0, F_SF, DType.REAL)
    path = tmp / "mixed.bin"
    n = int(SECONDS * F_SF)
    with open(path, "wb") as f:
        step = int(F_SF)
        for t0 in range(0, n, step):
            x = sim.synthesize(chans, F_SF, F_IF, DType.REAL,
                               min(step, n - t0), noise_std=noise,
                               seed=900 + t0, t0=t0)
            sim.quantize_int8(x, 16.0).tofile(f)

    spec = FrontendSpec(fend=FrontendType.FILE, f_cf=1.57542e9, f_sf=F_SF,
                        f_if=F_IF, dtype=DType.REAL)
    cfg = ReceiverConfig(
        channels=[ChannelConfig(prn=g["prn"]) for g in gps_geo]
        + [ChannelConfig(prn=GLO_FCN, sys=SYS_GLO, ctype=CodeType.G1)],
        fends=[spec], files=[str(path)],
        track=TrackConfig(corrn=4, corrd=2, corrp=2, interp_replica=True),
        outms=400, rinex=False, spp=True)
    rx = Receiver(cfg, FileFrontend(str(path), spec))
    rx.run_seconds()
    info = dict(path=str(path), spec=spec, cfg=cfg, gps_geo=gps_geo,
                g_glo=g_glo, glo=glo, f_cf_glo=f_cf_glo)
    return rx, info


def test_mixed_gps_glonass_position(mixed_run):
    rx, _ = mixed_run
    assert all(ch.nav.flagdec for ch in rx.channels), \
        [(ch.cfg.prn, ch.nav.flagdec) for ch in rx.channels]
    glo_ch = rx.channels[-1]
    assert glo_ch.nav.prn == GLO_SLOT
    assert (SYS_GLO, GLO_SLOT) in rx.hub.ephs, list(rx.hub.ephs)
    fixes = rx.hub.positions
    assert len(fixes) >= 2, f"only {len(fixes)} fixes"
    # early fixes may predate the last GPS channel's history fill; the
    # settled fixes must use all six satellites (incl. GLONASS)
    full = [(pos, n) for _, tow, pos, clk, n in fixes if n == 6]
    assert len(full) >= 2, [n for *_, n in fixes]
    assert fixes[-1][-1] == 6
    errs = [float(np.linalg.norm(pos - RCV)) for pos, _ in full]
    assert min(errs) < 40.0 and np.median(errs) < 60.0, errs
    # the inter-system clock difference includes the half-chip
    # nearest-neighbour convention offset (0.5/0.511M - 0.5/1.023M
    # seconds ~ 146.8 m); check it is estimated in that vicinity
    from gnsslib_tpu.constants import SYS_GPS
    _, _, sol = rx.hub.solutions[-1]
    isb = sol.clk_sys[SYS_GLO] - sol.clk_sys[SYS_GPS]
    assert 100.0 < isb < 200.0, isb


def test_hotstart_glonass(mixed_run):
    """GLONASS hot start: with the G1 FFT acquisition suppressed and its
    geph supplied as slot-keyed assistance (frq = FDMA number), the
    receiver predicts the G1 code boundary and per-fcn Doppler from the
    GPS-only fix and starts the channel directly."""
    import copy
    import dataclasses
    from gnsslib_tpu.io.frontend import FileFrontend
    from gnsslib_tpu.runtime.receiver import Receiver

    rx0, info = mixed_run
    cfg = dataclasses.replace(info["cfg"], hotstart=True)
    rx = Receiver(cfg, FileFrontend(info["path"], info["spec"]))
    glo_idx = len(rx.channels) - 1
    orig = rx._acq_search

    def suppress():
        res = orig()
        res.acquired[glo_idx] = False
        return res
    rx._acq_search = suppress
    assist = copy.deepcopy(info["glo"])
    assist.frq = GLO_FCN
    rx.hub.ephs[(SYS_GLO, GLO_SLOT)] = assist
    rx.run_seconds()

    hot = [e for e in rx.events if e[0] == "hot"]
    assert len(hot) == 1 and hot[0][2] == GLO_FCN, rx.events
    _, t_hot, _, negD_pred, loc_pred = hot[0]
    g = info["g_glo"]
    D_sig = g["rate"] * info["f_cf_glo"]
    # the hot start predicts the PHYSICAL Doppler at t_hot; the sim
    # signal is the constant-Doppler tangent anchored at T_OBS, so the
    # two legitimately diverge by LOS-acceleration * (T_OBS - t_hot)
    # (~4 Hz/s for this zenith GLONASS sat).  What matters is staying
    # inside the FLL pull-in range of the actual signal.
    assert abs(-negD_pred - D_sig) < 80.0, (negD_pred, D_sig, t_hot)
    base = int(round(t_hot * F_SF))
    t0 = (base + loc_pred) / F_SF
    crate_rx = 0.511e6 * (1.0 - D_sig / info["f_cf_glo"])
    chips = (g["code_phase"] + crate_rx * t0) % 511.0
    err_chips = min(chips, 511.0 - chips)
    err_samples = err_chips * F_SF / 0.511e6
    # G1 at ~8 samples/chip: DLL pull-in needs sub-chip accuracy
    assert err_samples < 6.0, f"boundary error {err_samples:.2f} samples"
    # functional: the hot-started channel pulls in and reaches bit sync
    # (and usually full decode) in the remaining stream
    glo_ch = rx.channels[-1]
    assert glo_ch.locked and glo_ch.nav.flagsync, \
        (glo_ch.locked, glo_ch.nav.flagsync)
