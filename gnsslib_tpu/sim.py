"""GNSS IF-signal synthesizer — the framework's test oracle.

The reference verifies itself against >100 MB real captures
(test/testdata_download_link.txt); this module replaces those fixtures with
deterministic synthesized IF streams whose ground truth (code phase,
Doppler, C/N0, nav bits) is known exactly, enabling closed-loop unit tests
the reference never had (SURVEY.md §4).

Sign conventions follow the reference receiver so recovered values compare
directly (see ops.carrier.mix_carrier): a satellite simulated with Doppler
``D`` is acquired at carrier frequency ``f_if + foffset - D`` and reported
by the tracker as Doppler ``D`` (src/sdrtrk.c:177).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from . import codes
from .constants import DType, CodeType


@dataclasses.dataclass
class SimChannel:
    """One simulated satellite signal."""
    prn: int
    ctype: int = CodeType.L1CA
    doppler: float = 0.0          # receiver-convention Doppler D (Hz)
    code_phase: float = 0.0       # code phase at t=0 (chips, [0, clen))
    carr_phase: float = 0.0       # carrier phase at t=0 (cycles)
    amplitude: float = 1.0
    nav_bits: np.ndarray | None = None   # ±1 bits at nav_ms boundaries
    nav_ms: float = 20.0          # nav bit length (ms)
    f_cf: float = 1.57542e9       # carrier frequency for code-Doppler aiding
    foffset: float = 0.0          # FDMA / clock offset (Hz)


def synthesize(channels, f_sf: float, f_if: float, dtype: int,
               nsamples: int, noise_std: float = 0.0, seed: int = 0,
               t0: float = 0.0) -> np.ndarray:
    """Synthesize an IF sample stream.

    Returns float64 samples: shape (nsamples,) for real sampling (DTYPEI)
    or (nsamples, 2) I/Q for complex sampling (DTYPEIQ).  Quantize with
    :func:`quantize_int8` to produce file-format bytes.
    """
    rng = np.random.default_rng(seed)
    t = (t0 + np.arange(nsamples, dtype=np.float64)) / f_sf
    if dtype == DType.IQ:
        out = np.zeros((nsamples, 2), dtype=np.float64)
    else:
        out = np.zeros(nsamples, dtype=np.float64)

    for ch in channels:
        code, crate = codes.gencode(ch.prn, ch.ctype)
        clen = len(code)
        # code Doppler consistent with carrier aiding:
        # received code rate = crate * (1 - D / f_cf)
        crate_rx = crate * (1.0 - ch.doppler / ch.f_cf)
        chips = ch.code_phase + crate_rx * t
        chip_idx = np.floor(chips).astype(np.int64)
        c = code[np.mod(chip_idx, clen)].astype(np.float64)
        if ch.nav_bits is not None:
            bit_period_chips = crate * ch.nav_ms * 1e-3
            bit_idx = np.floor(chips / bit_period_chips).astype(np.int64)
            c = c * np.asarray(ch.nav_bits, dtype=np.float64)[
                np.mod(bit_idx, len(ch.nav_bits))]
        # receiver acquires at carrfreq = f_if + foffset - D
        f_carr = f_if + ch.foffset - ch.doppler
        phase = 2.0 * np.pi * (f_carr * t + ch.carr_phase)
        if dtype == DType.IQ:
            # receiver mixes by e^{+j 2π f̂ t}; signal must be e^{-jφ}
            out[:, 0] += ch.amplitude * c * np.cos(phase)
            out[:, 1] += ch.amplitude * c * (-np.sin(phase))
        else:
            out += ch.amplitude * c * np.cos(phase)

    if noise_std > 0.0:
        out += rng.normal(0.0, noise_std, out.shape)
    return out


def noise_std_for_cn0(amplitude: float, cn0_dbhz: float, f_sf: float,
                      dtype: int) -> float:
    """Per-sample noise sigma giving the requested C/N0.

    Real sampling: C/N0 = A²·f_sf / (2σ²); I/Q: C/N0 = A²·f_sf / (2σ²)
    with σ per I/Q component (signal power A²/2 per component).
    """
    cn0 = 10.0 ** (cn0_dbhz / 10.0)
    return amplitude * np.sqrt(f_sf / (2.0 * cn0))


def quantize_int8(x: np.ndarray, scale: float = 16.0) -> np.ndarray:
    """Scale and clip to int8 (the plain-IF file byte format, DTYPE I/IQ)."""
    q = np.clip(np.round(x * scale), -128, 127).astype(np.int8)
    return q


def write_if_file(path: str, x: np.ndarray, scale: float = 16.0) -> None:
    """Write samples as the reference's FEND_FILE int8 byte stream.

    Real sampling: one int8 per sample; I/Q: interleaved int8 pairs
    (reference file front-end, src/sdrrcv.c:194-226,505-531).
    """
    quantize_int8(x, scale).ravel().tofile(path)


def lnav_subframe_bits(tow6: int, subframe_id: int, week10: int = 0,
                       prev_d29: int = 0, prev_d30: int = 0,
                       payload_seed: int = 1234) -> np.ndarray:
    """Build one valid 300-bit GPS LNAV subframe (±1, transmitted order).

    Constructs TLM+HOW with correct IS-GPS-200 parity on every word —
    enough structure for preamble search, parity check, and TOW/subframe-ID
    decoding tests.  tow6 is the truncated TOW count (17 bits; TOW of the
    NEXT subframe / 6 s).
    """
    rng = np.random.default_rng(payload_seed + subframe_id)

    def parity(d, b29, b30):
        # IS-GPS-200 20.3.5.2 parity equations (src/sdrnav_gps.c:141-163)
        t = [0] * 25  # d[1..24]
        for i in range(1, 25):
            t[i] = d[i]
        D25 = b29 ^ t[1] ^ t[2] ^ t[3] ^ t[5] ^ t[6] ^ t[10] ^ t[11] ^ t[12] ^ t[13] ^ t[14] ^ t[17] ^ t[18] ^ t[20] ^ t[23]
        D26 = b30 ^ t[2] ^ t[3] ^ t[4] ^ t[6] ^ t[7] ^ t[11] ^ t[12] ^ t[13] ^ t[14] ^ t[15] ^ t[18] ^ t[19] ^ t[21] ^ t[24]
        D27 = b29 ^ t[1] ^ t[3] ^ t[4] ^ t[5] ^ t[7] ^ t[8] ^ t[12] ^ t[13] ^ t[14] ^ t[15] ^ t[16] ^ t[19] ^ t[20] ^ t[22]
        D28 = b30 ^ t[2] ^ t[4] ^ t[5] ^ t[6] ^ t[8] ^ t[9] ^ t[13] ^ t[14] ^ t[15] ^ t[16] ^ t[17] ^ t[20] ^ t[21] ^ t[23]
        D29 = b30 ^ t[1] ^ t[3] ^ t[5] ^ t[6] ^ t[7] ^ t[9] ^ t[10] ^ t[14] ^ t[15] ^ t[16] ^ t[17] ^ t[18] ^ t[21] ^ t[22] ^ t[24]
        D30 = b29 ^ t[3] ^ t[5] ^ t[6] ^ t[8] ^ t[9] ^ t[10] ^ t[11] ^ t[13] ^ t[15] ^ t[19] ^ t[22] ^ t[23] ^ t[24]
        return [D25, D26, D27, D28, D29, D30]

    words = []
    b29, b30 = prev_d29, prev_d30

    def emit(d24):
        nonlocal b29, b30
        # transmitted d1..d24 are source bits XOR previous D30
        dtx = [0] + [b ^ b30 for b in d24]
        par = parity(dtx, b29, b30)
        w = dtx[1:25] + par
        b29, b30 = par[4], par[5]
        words.append(w)

    # word 1: TLM — preamble 10001011, 16 bits message, 2 reserved
    tlm = [1, 0, 0, 0, 1, 0, 1, 1] + list(rng.integers(0, 2, 14)) + [0, 0]
    emit(tlm)
    # word 2: HOW — 17-bit TOW, alert=0, AS=0, subframe id, 2 parity-solve bits
    how = [int(b) for b in format(tow6 & 0x1FFFF, "017b")]
    how += [0, 0] + [int(b) for b in format(subframe_id & 7, "03b")]
    # choose t23,t24 so that D29=D30=0 (IS-GPS-200 HOW constraint)
    for t23 in (0, 1):
        for t24 in (0, 1):
            cand = how + [t23, t24]
            dtx = [0] + [b ^ b30 for b in cand]
            par = parity(dtx, b29, b30)
            if par[4] == 0 and par[5] == 0:
                emit(cand)
                break
        else:
            continue
        break
    # word 3: for subframe 1, bits 61-70 are week (10) etc.; fill week then random
    if subframe_id == 1:
        w3 = [int(b) for b in format(week10 & 0x3FF, "010b")]
        w3 += list(rng.integers(0, 2, 14))
    else:
        w3 = list(rng.integers(0, 2, 24))
    emit(w3)
    for _ in range(4, 11):
        emit(list(rng.integers(0, 2, 24)))

    bits01 = np.concatenate([np.asarray(w) for w in words])
    assert bits01.shape == (300,)
    # ±1 convention: the receiver maps +1 correlation to bit 0 / -1 to bit 1?
    # The reference packs bit=-1 as binary 1 (bits2byte, src/sdrnav.c:166).
    return (1 - 2 * bits01).astype(np.int8)
