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


def test_obs_parity_vs_reference_receiver():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from parity_vs_reference import run
    stats = run()
    assert stats["n_common"] >= 20
    assert stats["p_rms"] < 5.0, stats       # combined DLL jitter budget
    assert stats["d_rms"] < 0.3, stats
    assert stats["l_spread"] < 0.05, stats
