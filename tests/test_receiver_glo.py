"""Mixed GPS + GLONASS receiver integration (BASELINE staged config 4):
FDMA front-end offsets, G1 meander/time-mark framing, geph merge, and a
mixed-constellation RINEX epoch with cross-system pseudoranges."""
import os
import re

import numpy as np
import pytest

from gnsslib_tpu import sim
from gnsslib_tpu.constants import (CLIGHT, DType, PTIMING, SYS_GLO, SYS_GPS,
                                   CodeType, FREQ1, FREQ1_GLO, DFRQ1_GLO)
from gnsslib_tpu.gtime import gpst2time
from gnsslib_tpu.runtime.cli import main as cli_main

F_SF = 4.092e6
F_IF = 1.023e6
NSAMP = 4092
# GPST tow of signal t=0; (TOWREF-18) % 30 == 0 so the GLONASS string-1
# time fields are exactly representable (tk has 30 s resolution in UTC(SU))
TOWREF = 352818.0
GPS_PRN, GPS_DELAY, GPS_DOPP = 5, 400, 600.0
GLO_FCN, GLO_SLOT, GLO_DELAY, GLO_DOPP = 1, 13, 900, -1400.0
SECONDS = 38.0


@pytest.fixture(scope="module")
def ran_receiver(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rxglo")
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
    noise = sim.noise_std_for_cn0(1.0, 47.0, F_SF, DType.REAL)
    path = tmp / "sim_mixed.bin"
    n = int(SECONDS * F_SF)
    with open(path, "wb") as f:
        step = int(F_SF)
        for t0 in range(0, n, step):
            x = sim.synthesize([gps, glo], F_SF, F_IF, DType.REAL,
                               min(step, n - t0), noise_std=noise,
                               seed=4000 + t0, t0=t0)
            sim.quantize_int8(x, 16.0).tofile(f)

    fend = tmp / "fend.ini"
    fend.write_text(f"""[FEND]
TYPE     =FILE
CF1      =1575.42e6
SF1      ={F_SF}
IF1      ={F_IF}
DTYPE1   =1
FILE1    ={path}
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
FTYPE    =1,1
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


def test_mixed_epoch_has_both_systems(ran_receiver):
    obs_text, _ = ran_receiver
    lines = obs_text.splitlines()
    epochs = [i for i, ln in enumerate(lines) if ln.startswith(">")]
    assert len(epochs) >= 6, f"only {len(epochs)} epochs"
    last = epochs[-1]
    sats = {lines[last + 1][:3], lines[last + 2][:3]}
    # GLONASS channel reports the slot learned from string 4
    assert sats == {f"G{GPS_PRN:02d}", f"R{GLO_SLOT:02d}"}


def test_mixed_pseudoranges(ran_receiver):
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
    # range difference: initial delays + per-system Doppler divergence
    drift = CLIGHT * (GLO_DOPP / (FREQ1_GLO + GLO_FCN * DFRQ1_GLO)
                      - GPS_DOPP / FREQ1) * t
    dP_expect = CLIGHT / F_SF * (GLO_DELAY - GPS_DELAY) + drift
    assert P[r] - P[g] == pytest.approx(dP_expect, abs=20.0)


def test_mixed_nav_records(ran_receiver):
    _, nav_text = ran_receiver
    lines = nav_text.splitlines()
    g = [ln for ln in lines if re.match(r"G\d\d \d{4} ", ln)]
    r = [ln for ln in lines if re.match(r"R\d\d \d{4} ", ln)]
    assert g and r, (len(g), len(r))
    assert r[0].startswith(f"R{GLO_SLOT:02d}")
    # GLONASS iode encoded in the record? iode drives toe minutes; check
    # the frequency number via... frq is not in RINEX; check taun field 0
    v = float(g[0][23:42].replace("E", "e"))
    assert v == pytest.approx(2.3e-4, rel=1e-6)   # GPS f0
