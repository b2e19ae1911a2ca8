"""gnsslib_tpu — a TPU-native GNSS software-defined-radio receiver framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
erlangnetwork-gnsslib-sdr (GNSS-SDRLIB fork): FFT-based acquisition,
multi-correlator DLL/PLL/FLL closed-loop tracking, navigation-message
decoding (GPS L1CA, GLONASS G1, SBAS L1), and pseudorange / carrier-phase /
Doppler / SNR observable generation with RINEX 3.02 and RTCM3 output.

Architecture (TPU-first, not a port of the reference's pthread design):

* ``codes``    — PRN ranging-code generators (pure NumPy, precomputed to
                 device arrays).  Reference: src/sdrcode.c.
* ``ops``      — the DSP kernel library: batched carrier wipe-off, code
                 resampling, multi-tap correlators (MXU einsum + Pallas),
                 batched FFT correlation.  Reference: src/sdrcmn.c.
* ``acquire``  — (channel, doppler, code-phase) parallel search with
                 non-coherent integration, jit-compiled & shardable.
                 Reference: src/sdracq.c.
* ``track``    — per-code-period closed loops as ``lax.scan`` over time with
                 a channel-axis state pytree (vmapped channels).
                 Reference: src/sdrtrk.c.
* ``nav``      — bit sync, frame sync, LNAV/GLONASS/SBAS decode, FEC
                 (host-side NumPy/C++: branch-heavy, O(50 bits/s)).
                 Reference: src/sdrnav*.c.
* ``obs``      — epoch-aligned observable formation, RINEX 3.02 writer,
                 RTCM3 encoder, TCP servers.  Reference: src/sdrsync.c,
                 src/sdrout.c.
* ``io``       — front-end HAL: file replay of every supported byte format
                 (int8 IF, RTL-SDR u8, GN3S 1/2/4-bit, STEREO packed),
                 block loader with absolute sample indexing.
                 Reference: src/sdrrcv.c, src/rcv/*.
* ``runtime``  — configuration (INI-compatible), receiver orchestration, CLI.
                 Reference: src/sdrinit.c, src/sdrmain.c.
* ``parallel`` — device meshes, channel/Doppler sharding via shard_map/pjit.
* ``native``   — C++ runtime library (Viterbi27, CRC24Q/32, sample unpack)
                 loaded via ctypes, with NumPy fallbacks.
* ``diag``     — spectrum analyzer, histogram, correlator-shape diagnostics.
                 Reference: src/sdrspec.c, src/sdrplot.c.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: first-compile of the acquisition /
# tracking programs can take minutes (especially via the TPU
# remote-compile path); cache them across processes.  Opt out with
# GNSSLIB_TPU_NO_CACHE=1.
def _default_cache_dir() -> str:
    """Machine-keyed cache path: XLA:CPU AOT entries bake in the host's
    CPU feature set, and a cache written on one machine SIGILLs (or
    error-spams) on another — key the directory by a CPU-flags hash."""
    import hashlib
    import platform
    key = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    key += "_" + hashlib.sha1(
                        line.encode()).hexdigest()[:10]
                    break
    except OSError:              # pragma: no cover - non-Linux
        pass
    return _os.path.expanduser(f"~/.cache/gnsslib_tpu_xla_{key}")


if not _os.environ.get("GNSSLIB_TPU_NO_CACHE"):
    try:
        import jax as _jax
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("GNSSLIB_TPU_CACHE_DIR",
                            _default_cache_dir()))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:            # pragma: no cover - jax-less install
        pass

from . import constants  # noqa: F401,E402
