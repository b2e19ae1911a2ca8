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
