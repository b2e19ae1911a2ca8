"""Golden parity: build and run the ACTUAL reference C receiver (with the
tools/refshim fftw3f/fec shims) on a synthesized capture and compare its
RINEX observables against this framework's (tools/parity_vs_reference)."""
import os
import shutil

import pytest

REF = os.environ.get("GNSSLIB_REFERENCE", "/root/reference")

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(os.path.join(REF, "src")) and shutil.which("gcc")),
    reason="reference sources or gcc unavailable")


def _run(scenario):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from parity_vs_reference import run
    return run(scenario=scenario)


def test_obs_parity_vs_reference_receiver():
    stats = _run("gps")
    assert stats["n_common"] >= 20
    assert stats["p_rms_clockfree"] < 5.0, stats   # combined DLL jitter
    assert stats["d_rms"] < 0.3, stats
    assert stats["l_spread"] < 0.05, stats


def test_obs_parity_vs_reference_glonass():
    """GPS+GLONASS mixed capture against the reference with its missing
    CTYPE_G1 dispatch wired (patched copy, as upstream does).  The raw
    pseudoranges differ by a constant all-satellite offset (a receiver-
    clock definition difference: which channel anchors the common-epoch
    sample); the clock-free comparison is the meaningful one."""
    stats = _run("glo")
    assert stats["n_common"] >= 20
    assert stats["p_rms_clockfree"] < 5.0, stats
    assert stats["d_rms"] < 0.3, stats
    assert stats["l_spread"] < 0.05, stats


def test_rinex_nav_records_byte_exact_vs_rtklib(tmp_path):
    """Our RINEX 3.02 nav record writers vs the ACTUAL RTKLIB
    outrnxnavb/outrnxgnavb (reference lib/RTKLIB/src/rinex.c:2257/2343),
    byte-for-byte, at UTC day / week / leap-adjacent toe values — the
    GLONASS gpst->utc shift moves 00:00:0x GPST toes onto the previous
    UTC day, which is where toe rounding could diverge."""
    import subprocess
    rtk = os.path.join(REF, "lib", "RTKLIB", "src")
    shim = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "refshim")
    objs = []
    # -DENAGLO: the fork's Makefile omits it (bin/Makefile:17 — GLONASS
    # satno() no-ops, a latent quirk like the missing CTYPE_G1 dispatch);
    # it gates satellite-number validity only, not record formatting, and
    # upstream RTKLIB consumers define it, so the oracle does too.
    for unit in ("rtkcmn", "rinex"):
        obj = str(tmp_path / (unit + ".o"))
        subprocess.run(["gcc", "-c", "-O2", "-w", "-DENAGLO", "-I" + rtk,
                        os.path.join(rtk, unit + ".c"), "-o", obj],
                       check=True, capture_output=True)
        objs.append(obj)
    exe = str(tmp_path / "gnav_oracle")
    subprocess.run(["gcc", "-O2", "-w", "-DENAGLO", "-I" + rtk,
                    os.path.join(shim, "gnav_oracle.c"), *objs,
                    "-o", exe, "-lm", "-lpthread"],
                   check=True, capture_output=True)

    day = 86400.0
    cases = []
    for tow in (352800.0,            # mid-day (nominal 15-min tb grid)
                3 * day + 18.0,      # exactly UTC 00:00:00
                3 * day + 17.0,      # UTC 23:59:59 previous day
                3 * day + 17.5,      # fractional second at the boundary
                3 * day + 17.9999999,  # %2.0f rounding of 59.9999999
                18.0,                # UTC week boundary
                17.5,                # previous week, fractional
                6 * day + 10800.0 + 18.0):  # GLONASS tb 03:00 UTC mark
        cases.append((2200, tow, 0))
        cases.append((2200, tow, 1))
    cases.append((1800, 3 * day + 16.0, 0))   # 2014: 16 leap seconds
    cases.append((1800, 3 * day + 16.0, 1))

    feed = "".join(f"{w} {t:.9f} {k}\n" for (w, t, k) in cases)
    oracle_path = str(tmp_path / "oracle.nav")
    subprocess.run([exe, oracle_path], input=feed.encode(),
                   check=True, capture_output=True)
    # KNOWN 1-char delta: the linked RTKLIB vintage space-pads the sat id
    # ("R 5", rinex.c:161-174 "%2d"); RINEX 3.02 canon (and RTKLIB >=2.4.3)
    # zero-pads ("R05"), which this framework emits.  Normalize the oracle
    # id; every other byte must match exactly.
    def zeropad(line):
        return (line[0] + line[1:3].replace(" ", "0") + line[3:]
                if line[:1].isalpha() else line)
    oracle = [zeropad(l) for l in open(oracle_path).read().splitlines()]

    from gnsslib_tpu.gtime import gpst2time, timeadd
    from gnsslib_tpu.nav.eph import Eph, Geph
    from gnsslib_tpu.obs.rinex import RinexNavWriter
    from gnsslib_tpu.constants import SYS_GPS
    ours_path = str(tmp_path / "ours.nav")
    w = RinexNavWriter(ours_path)
    for week, tow, kind in cases:
        toe = gpst2time(week, tow)
        if kind == 0:
            g = Geph(iode=42, frq=-4, toe=toe, tof=timeadd(toe, -15.0),
                     pos=[11123456.789, -12987654.321, 19456789.123],
                     vel=[1234.5678, -2345.6789, 345.9],
                     acc=[1.862645e-06, -9.313226e-07, 2.793968e-06],
                     taun=1.9073486e-05, gamn=9.094947e-13)
            w.write_geph(5, g)
        else:
            e = Eph(iode=77, iodc=77, sva=2, svh=0, week=week,
                    toe=toe, toc=toe, ttr=timeadd(toe, -7200.0),
                    A=26559850.641, e=0.012, i0=0.96, OMG0=1.2,
                    omg=-2.1, M0=0.5, deln=4.3e-09, OMGd=-8e-09,
                    idot=3.1e-10, crc=287.4, crs=-52.1, cuc=-2.7e-06,
                    cus=7.6e-06, cic=1.1e-07, cis=-6.0e-08, toes=tow,
                    fit=4.0, f0=3.2e-04, f1=-1.8e-11, f2=0.0,
                    tgd=[-1.2e-08, 0.0], code=1, flag=0)
            w.write_eph(SYS_GPS, 7, e)
    lines = open(ours_path).read().splitlines()
    body = lines[lines.index(
        " " * 60 + "END OF HEADER" + " " * 7) + 1:]
    assert len(body) == len(oracle)
    for i, (got, want) in enumerate(zip(body, oracle)):
        assert got == want, f"record line {i}:\n ours={got!r}\n rtk ={want!r}"
