"""PRN code generator tests against ICD-published truths.

The reference has no unit tests (SURVEY.md §4); these pin the generators to
closed-form spec values: first-10-chip octals for C/A (IS-GPS-200 table
3-I), GLONASS m-sequence structure, Gold-code correlation bounds, and L1C
balance properties.
"""
import numpy as np
import pytest

from gnsslib_tpu import codes
from gnsslib_tpu.constants import CodeType


def chips_to_octal(code, n=10):
    """First n chips (+1 -> bit 1) as an octal string, MSB first."""
    bits = (code[:n] > 0).astype(int)
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return oct(val)[2:].zfill((n + 2) // 3)


# IS-GPS-200 table 3-I: first 10 chips of the C/A code, octal
L1CA_FIRST10 = {
    1: "1440", 2: "1620", 3: "1710", 4: "1744", 5: "1133",
    6: "1455", 7: "1131", 8: "1454", 9: "1626", 10: "1504",
    11: "1642", 12: "1750", 13: "1764", 14: "1772", 15: "1775",
    16: "1776", 17: "1156", 18: "1467", 19: "1633", 20: "1715",
    21: "1746", 22: "1763", 23: "1063", 24: "1706", 25: "1743",
    26: "1761", 27: "1770", 28: "1774", 29: "1127", 30: "1453",
    31: "1625", 32: "1712",
}


@pytest.mark.parametrize("prn,expect", sorted(L1CA_FIRST10.items()))
def test_l1ca_first_chips(prn, expect):
    code, crate = codes.gencode(prn, CodeType.L1CA)
    assert len(code) == 1023
    assert crate == 1.023e6
    assert chips_to_octal(code) == expect


def test_l1ca_is_pm_one_and_balanced():
    for prn in (1, 7, 32, 120, 193):
        code, _ = codes.gencode(prn, CodeType.L1CA)
        assert set(np.unique(code)) <= {-1, 1}
        # Gold codes of length 1023 have 512 ones / 511 zeros
        assert abs(int(code.sum())) == 1


def test_l1ca_cross_correlation_bound():
    """Gold codes: cross-correlation takes values in {-65, -1, 63}."""
    c1, _ = codes.gencode(1, CodeType.L1CA)
    c2, _ = codes.gencode(2, CodeType.L1CA)
    xc = np.fft.ifft(np.fft.fft(c1) * np.conj(np.fft.fft(c2))).real
    vals = set(np.round(xc).astype(int))
    assert vals <= {-65, -1, 63}


def test_l1ca_autocorrelation_peak():
    c1, _ = codes.gencode(1, CodeType.L1CA)
    ac = np.fft.ifft(np.abs(np.fft.fft(c1)) ** 2).real
    assert round(ac[0]) == 1023
    assert np.max(np.abs(np.round(ac[1:]))) <= 65


def test_sbas_uses_l1ca_codes():
    c_sbas, crate = codes.gencode(120, CodeType.L1SBAS)
    c_l1ca, _ = codes.gencode(120, CodeType.L1CA)
    assert np.array_equal(c_sbas, c_l1ca)
    assert crate == 1.023e6


def test_glonass_g1_properties():
    code, crate = codes.gencode(1, CodeType.G1)
    assert len(code) == 511
    assert crate == 0.511e6
    # m-sequence: perfect two-valued autocorrelation (511, -1)
    ac = np.fft.ifft(np.abs(np.fft.fft(code)) ** 2).real
    assert round(ac[0]) == 511
    assert np.allclose(np.round(ac[1:]), -1)
    # all-ones seed, output from stage 7: the first 7 chips are 1, then the
    # feedback (stage5 xor stage9 = 0 for the all-ones state) reaches the tap
    first9 = "".join("1" if c > 0 else "0" for c in code[:9])
    assert first9 == "111111100"


def test_nh_codes():
    nh10, r10 = codes.gencode(1, CodeType.NH10)
    nh20, r20 = codes.gencode(1, CodeType.NH20)
    assert len(nh10) == 10 and r10 == 1000.0
    assert len(nh20) == 20 and r20 == 500.0
    assert np.array_equal(nh10, [-1, -1, -1, -1, 1, 1, -1, 1, -1, 1])


def test_l1c_pilot_data_lengths():
    cp, rate_p = codes.gencode(1, CodeType.L1CP)
    cd, rate_d = codes.gencode(1, CodeType.L1CD)
    # BOC(1,1): 2 samples per chip
    assert len(cp) == 2 * 10230 and len(cd) == 2 * 10230
    assert rate_p == rate_d == 2 * 1.023e6
    assert set(np.unique(cp)) <= {-1, 1}
    # pilot and data components differ
    assert not np.array_equal(cp, cd)


def test_l1c_weil_balance():
    """L1C Weil codes are near-balanced (|sum| small vs length)."""
    from gnsslib_tpu.codes.l1c import gencode_l1cp
    raw = gencode_l1cp(1)
    assert len(raw) == 10230
    assert abs(int(raw.sum())) < 200


def test_l1c_overlay():
    co, rate = codes.gencode(1, CodeType.L1CO)
    assert len(co) == 1800 and rate == 100.0
    assert set(np.unique(co)) <= {-1, 1}
    # PRN>=64 mixes in the S2 register -> different structure than PRN 1
    co64, _ = codes.gencode(64, CodeType.L1CO)
    assert not np.array_equal(co, co64)


def test_boc_modulation():
    c = np.array([1, -1, 1], dtype=np.int8)
    out, mult = codes.boc(c, 1, 1)
    assert mult == 2
    assert np.array_equal(out, [-1, 1, 1, -1, -1, 1])
