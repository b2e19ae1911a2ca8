"""Native C++ kernels vs NumPy references (skip if no compiler)."""
import numpy as np
import pytest

from gnsslib_tpu import native
from gnsslib_tpu.io import formats
from gnsslib_tpu.nav.bits import crc24q
from gnsslib_tpu.nav.viterbi import conv27_encode, viterbi27_decode

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def test_native_viterbi_matches_python():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 300)
    sym = conv27_encode(bits).astype(np.float64)
    noisy = np.clip(sym + rng.normal(0, 50, sym.shape), 0, 255)
    py = viterbi27_decode(noisy, 290)
    nat = native.viterbi27_decode(noisy.astype(np.uint8), 290)
    assert np.array_equal(py, nat)


def test_native_crc24q():
    rng = np.random.default_rng(1)
    for n in (1, 29, 300):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert native.crc24q_native(data) == crc24q(data)


def test_native_unpackers_match_numpy():
    import ctypes
    rng = np.random.default_rng(2)
    raw = rng.integers(0, 256, 4096, dtype=np.uint8)
    lib = native._lib

    def run(name, nout):
        out = np.empty(nout, np.float32)
        getattr(lib, name)(native._u8ptr(np.ascontiguousarray(raw)),
                           len(raw),
                           out.ctypes.data_as(
                               ctypes.POINTER(ctypes.c_float)))
        return out

    assert np.array_equal(run("unpack_rtlsdr", 4096),
                          formats.unpack_rtlsdr(raw.tobytes()).ravel())
    assert np.array_equal(run("unpack_gn3s_v3_2bit", 4096),
                          formats.unpack_gn3s_v3_2bit(raw.tobytes()))
    assert np.array_equal(run("unpack_gn3s_v3_4bit", 8192),
                          formats.unpack_gn3s_v3_4bit(raw.tobytes()).ravel())
    assert np.array_equal(run("unpack_stereo_fe1", 4096),
                          formats.unpack_stereo_fe1(raw.tobytes()))
    assert np.array_equal(run("unpack_stereo_fe2", 8192),
                          formats.unpack_stereo_fe2(raw.tobytes()).ravel())
