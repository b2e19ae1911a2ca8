"""Satellite position / single-point positioning tests (obs/satpos.py,
obs/spp.py) — closed-form orbit invariants and exact-measurement solver
recovery; the full IF-to-position loop lives in test_receiver_spp.py."""
import math

import numpy as np

from gnsslib_tpu import sim
from gnsslib_tpu.constants import CLIGHT, SYS_GPS
from gnsslib_tpu.gtime import gpst2time
from gnsslib_tpu.obs.epoch import SdrObs
from gnsslib_tpu.obs.satpos import MU_GPS, eph2pos, geph2pos
from gnsslib_tpu.obs.spp import ecef2llh, spp_solve

WEEK, TOW = 2200, 352800.0
# Tokyo-ish receiver position (ECEF, m)
RCV = np.array([-3954844.0, 3354936.0, 3700264.0])


def test_eph2pos_orbit_invariants():
    e = sim.example_eph(prn=5, week=WEEK, toe_tow=TOW)
    ep = e.eph
    for dt in (0.0, 300.0, 1800.0, -900.0):
        rs, dts = eph2pos(ep, gpst2time(WEEK, TOW + dt))
        r = np.linalg.norm(rs)
        # radius bounded by the (slightly harmonic-corrected) ellipse
        assert ep.A * (1 - ep.e) - 500 < r < ep.A * (1 + ep.e) + 500
        # |z| <= r*sin(i)
        assert abs(rs[2]) <= r * math.sin(ep.i0) + 1e3
        assert abs(dts - ep.f0) < 1e-7       # clock ~ f0 (tiny f1, rel.)
    # speed from finite difference ~ sqrt(mu/a) for near-circular MEO
    r1, _ = eph2pos(ep, gpst2time(WEEK, TOW))
    r2, _ = eph2pos(ep, gpst2time(WEEK, TOW + 1.0))
    v_inertial = math.sqrt(MU_GPS / ep.A)
    v_ecef = np.linalg.norm(r2 - r1)
    # ECEF speed = inertial (~3.87 km/s) +- up to omega_e*r (~1.94 km/s)
    assert abs(v_ecef - v_inertial) < 2000.0


def test_geph2pos_integration():
    from gnsslib_tpu.nav.eph import Geph
    from gnsslib_tpu.obs.satpos import _glo_deriv
    g = Geph()
    r0, v0 = 25508000.0, math.sqrt(398600.44e9 / 25508000.0)
    g.pos = [r0, 0.0, 0.0]
    g.vel = [0.0, v0 * math.cos(math.radians(64.8)),
             v0 * math.sin(math.radians(64.8))]
    g.acc = [0.0, 0.0, 0.0]
    g.toe = gpst2time(WEEK, TOW)
    # exact at toe
    rs0, _ = geph2pos(g, gpst2time(WEEK, TOW))
    np.testing.assert_allclose(rs0, g.pos, atol=1e-6)
    # short-dt Taylor expansion of the ICD equations of motion
    dt = 5.0
    acc = _glo_deriv(np.array(g.pos + g.vel), np.zeros(3))[3:]
    taylor = np.array(g.pos) + dt * np.array(g.vel) + 0.5 * dt * dt * acc
    rs5, _ = geph2pos(g, gpst2time(WEEK, TOW + dt))
    np.testing.assert_allclose(rs5, taylor, atol=0.05)
    # RK4 step-size convergence: h=60 vs h=7.5 agree to sub-mm at 900 s
    rs_a, _ = geph2pos(g, gpst2time(WEEK, TOW + 900.0), step=60.0)
    rs_b, _ = geph2pos(g, gpst2time(WEEK, TOW + 900.0), step=7.5)
    np.testing.assert_allclose(rs_a, rs_b, atol=1e-3)
    # backward integration mirrors forward
    rs_m, _ = geph2pos(g, gpst2time(WEEK, TOW - 900.0))
    assert 2.0e7 < np.linalg.norm(rs_m) < 3.5e7


def _constellation():
    """Six visible, geometry-spread satellites for RCV."""
    cands = []
    k = 0
    for omg0 in (-0.9, -0.55, -0.2, 0.15, 0.5, 0.85):
        for m0 in (-0.6, 0.0, 0.6):
            k += 1
            cands.append(sim.example_eph(prn=k, week=WEEK, toe_tow=TOW,
                                         m0=m0, omg0=omg0))
    geo = sim.geometry_scenario(cands, RCV, TOW + 14.0, TOW,
                                min_elev_deg=15.0)
    assert len(geo) >= 6, f"only {len(geo)} visible"
    eph_by_prn = {e.prn: e.eph for e in cands}
    return geo[:6], eph_by_prn


def test_spp_recovers_position_exact():
    geo, eph_by_prn = _constellation()
    clk_true = 123.456                      # receiver clock bias (m)
    obs = [SdrObs(sys=SYS_GPS, prn=g["prn"], week=WEEK, tow=TOW + 14.0,
                  P=CLIGHT * g["tau"] + clk_true, L=0.0, D=0.0, S=45.0)
           for g in geo]
    ephs = {(SYS_GPS, g["prn"]): eph_by_prn[g["prn"]] for g in geo}
    sol = spp_solve(obs, ephs)
    assert sol.ok and sol.nsat == 6
    err = np.linalg.norm(sol.pos - RCV)
    assert err < 1e-2, f"position error {err} m"
    assert abs(sol.clk - clk_true) < 1e-2
    assert np.max(np.abs(sol.resid)) < 1e-3


def test_spp_underdetermined():
    geo, eph_by_prn = _constellation()
    obs = [SdrObs(sys=SYS_GPS, prn=g["prn"], week=WEEK, tow=TOW + 14.0,
                  P=CLIGHT * g["tau"], L=0.0, D=0.0, S=45.0)
           for g in geo[:3]]
    ephs = {(SYS_GPS, g["prn"]): eph_by_prn[g["prn"]] for g in geo}
    assert not spp_solve(obs, ephs).ok


def test_ecef2llh():
    lat, lon, h = ecef2llh(RCV)
    assert abs(math.degrees(lat) - 35.7) < 0.5
    assert abs(math.degrees(lon) - 139.7) < 0.5
    assert -100.0 < h < 1000.0
    # roundtrip: rebuild ECEF from llh
    a, f = 6378137.0, 1.0 / 298.257223563
    e2 = f * (2.0 - f)
    v = a / math.sqrt(1.0 - e2 * math.sin(lat) ** 2)
    x = np.array([(v + h) * math.cos(lat) * math.cos(lon),
                  (v + h) * math.cos(lat) * math.sin(lon),
                  (v * (1.0 - e2) + h) * math.sin(lat)])
    np.testing.assert_allclose(x, RCV, atol=1e-3)


def test_spp_velocity_and_dop():
    """Doppler LS recovers a static receiver's velocity (~0) and an
    injected clock drift; DOP factors are sane for the 6-sat geometry."""
    geo, eph_by_prn = _constellation()
    clk_drift_true = 4.2                    # m/s
    obs = []
    for g in geo:
        D = g["doppler"] + clk_drift_true * 1.57542e9 / CLIGHT
        obs.append(SdrObs(sys=SYS_GPS, prn=g["prn"], week=WEEK,
                          tow=TOW + 14.0, P=CLIGHT * g["tau"] + 100.0,
                          L=0.0, D=D, S=45.0))
    ephs = {(SYS_GPS, g["prn"]): eph_by_prn[g["prn"]] for g in geo}
    sol = spp_solve(obs, ephs)
    assert sol.ok
    assert sol.vel is not None
    assert np.linalg.norm(sol.vel) < 0.25, sol.vel
    assert abs(sol.clk_drift - clk_drift_true) < 0.25
    assert sol.dop and 1.0 < sol.dop["gdop"] < 10.0
    assert sol.dop["pdop"] < sol.dop["gdop"]
    assert sol.dop["hdop"] > 0 and sol.dop["vdop"] > 0


def test_spp_raim_excludes_faulty_satellite():
    """A 500 m bias on one of 6 satellites: plain LS is pulled ~100 m off;
    RAIM exclusion restores the exact solution."""
    geo, eph_by_prn = _constellation()
    obs = []
    for i, g in enumerate(geo):
        bias = 500.0 if i == 2 else 0.0
        obs.append(SdrObs(sys=SYS_GPS, prn=g["prn"], week=WEEK,
                          tow=TOW + 14.0, P=CLIGHT * g["tau"] + 50.0 + bias,
                          L=0.0, D=0.0, S=45.0))
    ephs = {(SYS_GPS, g["prn"]): eph_by_prn[g["prn"]] for g in geo}
    plain = spp_solve(obs, ephs)
    assert plain.ok and np.linalg.norm(plain.pos - RCV) > 30.0
    raim = spp_solve(obs, ephs, raim_thresh=10.0)
    assert raim.ok and raim.nsat == 5
    assert np.linalg.norm(raim.pos - RCV) < 0.05
    assert np.max(np.abs(raim.resid)) < 1e-3


def test_spp_mixed_gps_glonass():
    """Mixed-constellation solve: 4 GPS + 2 GLONASS with exact
    pseudoranges built through the same light-time/Sagnac/SV-clock model
    the solver inverts (GLONASS leg: geph2pos RK4 + taun clock)."""
    from gnsslib_tpu.constants import SYS_GLO
    from gnsslib_tpu.gtime import timeadd
    from gnsslib_tpu.nav.eph import Geph
    from gnsslib_tpu.obs.satpos import OMGE, satpos_any
    from gnsslib_tpu.constants import CLIGHT as C

    geo, eph_by_prn = _constellation()
    t_rx = gpst2time(WEEK, TOW + 14.0)

    def delay_of(e):
        # flight-time iteration identical to sim.geometry_scenario
        tau_f = 0.075
        for _ in range(4):
            rs, dts = satpos_any(e, timeadd(t_rx, -tau_f))
            a = OMGE * tau_f
            rs_r = np.array([math.cos(a) * rs[0] + math.sin(a) * rs[1],
                             -math.sin(a) * rs[0] + math.cos(a) * rs[1],
                             rs[2]])
            tau_f = float(np.linalg.norm(rs_r - RCV)) / C
        return tau_f - dts

    obs, ephs = [], {}
    for g in geo[:4]:
        e = eph_by_prn[g["prn"]]
        obs.append(SdrObs(sys=SYS_GPS, prn=g["prn"], week=WEEK,
                          tow=TOW + 14.0, P=C * delay_of(e) + 77.0,
                          L=0.0, D=0.0, S=45.0))
        ephs[(SYS_GPS, g["prn"])] = e
    # two GLONASS satellites: state vectors on the 25508 km shell along
    # two visible GPS directions (guaranteed above the horizon), with
    # plausible tangential velocities and a taun clock
    for slot, (fcn, gref) in enumerate(zip((-3, 4), geo[4:6]), start=1):
        rdir = gref["rs"] / np.linalg.norm(gref["rs"])
        pos = rdir * 25508000.0
        tang = np.cross([0.0, 0.0, 1.0], rdir)
        tang /= np.linalg.norm(tang)
        v0 = math.sqrt(398600.44e9 / 25508000.0)
        g = Geph(pos=list(pos), vel=list(tang * v0),
                 acc=[0.0, 0.0, 0.0], taun=2.0e-5, gamn=0.0,
                 frq=fcn, toe=gpst2time(WEEK, TOW))
        obs.append(SdrObs(sys=SYS_GLO, prn=slot, week=WEEK,
                          tow=TOW + 14.0, P=C * delay_of(g) + 77.0,
                          L=0.0, D=0.0, S=44.0, fcn=fcn))
        ephs[(SYS_GLO, slot)] = g
    sol = spp_solve(obs, ephs)
    assert sol.ok and sol.nsat == 6
    err = np.linalg.norm(sol.pos - RCV)
    assert err < 0.05, f"mixed-constellation error {err} m"
    assert abs(sol.clk - 77.0) < 0.05
