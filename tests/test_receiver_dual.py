"""Dual front-end receiver integration: both RF paths of a packed NSL
STEREO capture in ONE run — FE1 (max2769-style, 2-bit real) carrying GPS
L1CA and FE2 (max2112-style, 3-bit I/Q) carrying GLONASS G1 — merged by a
shared OutputHub into a single RINEX observation stream with cross-path
pseudoranges (reference: sdrmain.c channel threads over both paths +
one sync thread; stereo packing rcv/stereo/stereo.c:184-205)."""
import os
import re

import numpy as np
import pytest

from gnsslib_tpu import sim
from gnsslib_tpu.constants import (CLIGHT, DType, PTIMING, CodeType, FREQ1,
                                   FREQ1_GLO, DFRQ1_GLO)
from gnsslib_tpu.gtime import gpst2time
from gnsslib_tpu.runtime.cli import main as cli_main

F_SF = 4.092e6                 # shared byte clock: one packed byte/sample
F_IF1 = 1.023e6                # FE1 real IF
TOWREF = 352818.0
GPS_PRN, GPS_DELAY, GPS_DOPP = 5, 400, 600.0
GLO_FCN, GLO_SLOT, GLO_DELAY, GLO_DOPP = 1, 13, 900, -1400.0
SECONDS = 38.0


@pytest.fixture(scope="module")
def ran_receiver(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rxdual")
    eph = sim.example_eph(prn=GPS_PRN, week=2200, toe_tow=TOWREF)
    frames = sim.lnav_bit_stream(eph, TOWREF + 6.0, nframes=5)
    pad = np.concatenate([np.tile([1, -1], 149), [1, 1]]).astype(np.int8)
    gps = sim.SimChannel(
        prn=GPS_PRN, doppler=GPS_DOPP,
        code_phase=-GPS_DELAY * 1.023e6 / F_SF, carr_phase=0.2,
        nav_bits=np.concatenate([pad, frames]))
    glo_bits = sim.g1_symbol_stream(gpst2time(2200, TOWREF), nframes=3,
                                    iode=44, slot=GLO_SLOT)
    glo = sim.SimChannel(
        prn=GLO_FCN, ctype=CodeType.G1, doppler=GLO_DOPP,
        code_phase=-GLO_DELAY * 0.511e6 / F_SF, carr_phase=0.7,
        nav_bits=glo_bits, nav_ms=10.0,
        f_cf=FREQ1_GLO + GLO_FCN * DFRQ1_GLO,
        foffset=GLO_FCN * DFRQ1_GLO)
    n1 = sim.noise_std_for_cn0(1.0, 47.0, F_SF, DType.REAL)
    n2 = sim.noise_std_for_cn0(1.0, 47.0, F_SF, DType.IQ)
    path = tmp / "sim_stereo.bin"
    n = int(SECONDS * F_SF)
    with open(path, "wb") as f:
        step = int(F_SF)
        for t0 in range(0, n, step):
            m = min(step, n - t0)
            fe1 = sim.synthesize([gps], F_SF, F_IF1, DType.REAL, m,
                                 noise_std=n1, seed=5000 + t0, t0=t0)
            fe2 = sim.synthesize([glo], F_SF, 0.0, DType.IQ, m,
                                 noise_std=n2, seed=6000 + t0, t0=t0)
            # AGC-style scaling: noise sigma ~ 1.2 LSB (2-bit FE1),
            # ~2.5 LSB (3-bit FE2)
            sim.pack_stereo(fe1, fe2, scale1=1.2 / n1,
                            scale2=2.5 / n2).tofile(f)

    fend = tmp / "fend.ini"
    fend.write_text(f"""[FEND]
TYPE     =FILESTEREO
CF1      =1575.42e6
SF1      ={F_SF}
IF1      ={F_IF1}
DTYPE1   =1
FILE1    ={path}
CF2      =1602.0e6
SF2      ={F_SF}
IF2      =0.0
DTYPE2   =2
[TRACK]
CORRN    =4
CORRD    =2
CORRP    =2
""")
    cfg = tmp / "rx.ini"
    cfg.write_text(f"""[RCV]
FENDCONF ={fend}
[CHANNEL]
NCH      =2
PRN      ={GPS_PRN},{GLO_FCN}
SYS      =1,4
CTYPE    =1,20
FTYPE    =1,2
[OUTPUT]
OUTMS    =400
RINEX    =1
RINEXPATH={tmp}/out
""")
    rc = cli_main([str(cfg), "--quiet"])
    assert rc == 0
    out = tmp / "out"
    obs = [p for p in os.listdir(out) if p.endswith(".obs")][0]
    nav = [p for p in os.listdir(out) if p.endswith(".nav")][0]
    return (out / obs).read_text(), (out / nav).read_text()


def test_pack_stereo_roundtrip():
    from gnsslib_tpu.io import formats
    rng = np.random.default_rng(7)
    fe1 = rng.normal(0.0, 1.5, 256)
    fe2 = rng.normal(0.0, 3.0, (256, 2))
    b = sim.pack_stereo(fe1, fe2).tobytes()
    u1 = formats.unpack_stereo_fe1(np.frombuffer(b, np.uint8))
    u2 = formats.unpack_stereo_fe2(np.frombuffer(b, np.uint8))
    # unpacked values are the quantized levels of the inputs
    lev1 = np.clip(2 * np.floor((fe1 + 4) / 2) - 3, -3, 3)
    lev2 = np.clip(2 * np.floor(fe2 / 2) + 1, -7, 7)
    assert np.array_equal(u1, lev1.astype(np.float32))
    assert np.array_equal(u2, lev2.astype(np.float32))


def test_dual_epoch_has_both_paths(ran_receiver):
    obs_text, _ = ran_receiver
    lines = obs_text.splitlines()
    epochs = [i for i, ln in enumerate(lines) if ln.startswith(">")]
    assert len(epochs) >= 6, f"only {len(epochs)} epochs"
    last = epochs[-1]
    sats = {lines[last + 1][:3], lines[last + 2][:3]}
    assert sats == {f"G{GPS_PRN:02d}", f"R{GLO_SLOT:02d}"}


def test_dual_cross_path_pseudoranges(ran_receiver):
    """Cross-path P difference follows the geometry: both paths share one
    sample clock, so FE2's GLONASS range is directly comparable to FE1's
    GPS range at the common epoch."""
    obs_text, _ = ran_receiver
    lines = obs_text.splitlines()
    from gnsslib_tpu.gtime import epoch2time, time2gpst
    last = max(i for i, ln in enumerate(lines) if ln.startswith(">"))
    ep = [float(x) for x in lines[last].split()[1:7]]
    tow, _ = time2gpst(epoch2time(ep))
    t = tow - PTIMING / 1000.0 - TOWREF
    P = {}
    D = {}
    for ln in lines[last + 1:last + 3]:
        P[ln[:3]] = float(ln[3:17])
        D[ln[:3]] = float(ln[3 + 2 * 16:3 + 2 * 16 + 14])
    g, r = f"G{GPS_PRN:02d}", f"R{GLO_SLOT:02d}"
    assert D[g] == pytest.approx(GPS_DOPP, abs=2.0)
    assert D[r] == pytest.approx(GLO_DOPP, abs=2.0)
    drift = CLIGHT * (GLO_DOPP / (FREQ1_GLO + GLO_FCN * DFRQ1_GLO)
                      - GPS_DOPP / FREQ1) * t
    dP_expect = CLIGHT / F_SF * (GLO_DELAY - GPS_DELAY) + drift
    assert P[r] - P[g] == pytest.approx(dP_expect, abs=25.0)


def test_dual_nav_records_from_both_paths(ran_receiver):
    _, nav_text = ran_receiver
    lines = nav_text.splitlines()
    assert [ln for ln in lines if re.match(r"G\d\d \d{4} ", ln)]
    assert [ln for ln in lines if re.match(r"R\d\d \d{4} ", ln)]
