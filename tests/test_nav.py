"""Navigation decode layer tests: bit utils, CRC, Viterbi, LNAV/G1/SBAS
round-trips, and the full framer state machine on synthetic bit streams."""
import numpy as np
import pytest

from gnsslib_tpu import sim
from gnsslib_tpu.constants import CodeType
from gnsslib_tpu.nav import (bits2byte, conv27_encode, crc24q, crc32_rtk,
                             decode_frame_l1ca, encode_frame_l1ca, getbits,
                             getbitu, viterbi27_decode, NavChannel, SdrEph)
from gnsslib_tpu.nav.bits import byte2bits, interleave, setbitu, setbits
from gnsslib_tpu.nav.framer import nav_params
from gnsslib_tpu.nav.glonass import encode_string_g1, TIMEMARK_G1
from gnsslib_tpu.nav.lnav import paritycheck_l1ca
from gnsslib_tpu.nav.sbas import encode_sbas_message, check_crc_sbas


# --- bit utilities -----------------------------------------------------------

def test_getbitu_setbitu_roundtrip():
    rng = np.random.default_rng(0)
    buf = bytearray(16)
    fields = []
    pos = 0
    while pos < 100:
        length = int(rng.integers(1, 25))
        val = int(rng.integers(0, 1 << length))
        setbitu(buf, pos, length, val)
        fields.append((pos, length, val))
        pos += length
    for pos, length, val in fields:
        assert getbitu(buf, pos, length) == val


def test_getbits_sign():
    buf = bytearray(4)
    setbits(buf, 3, 9, -137)
    assert getbits(buf, 3, 9) == -137
    setbits(buf, 12, 9, 137)
    assert getbits(buf, 12, 9) == 137


def test_bits2byte_conventions():
    # -1 -> binary 1 (reference src/sdrnav.c:154-176)
    bits = np.array([1, -1, 1, 1, -1, -1, 1, -1])
    b = bits2byte(bits, 8, 1)
    assert b[0] == 0b01001101
    assert np.array_equal(byte2bits(bytes(b), 8), bits)
    # right alignment pads at the front
    b2 = bits2byte(np.array([-1, -1, -1, -1]), 4, 1, right=True)
    assert b2[0] == 0x0F


def test_interleave():
    x = np.arange(12)
    y = interleave(x, 3, 4)
    assert np.array_equal(y.reshape(3, 4), x.reshape(4, 3).T)


def _crc24_slow(data):
    crc = 0
    for byte in data:
        crc ^= byte << 16
        for _ in range(8):
            crc <<= 1
            if crc & 0x1000000:
                crc ^= 0x1864CFB
    return crc & 0xFFFFFF


def test_crc24q_matches_bitwise():
    rng = np.random.default_rng(1)
    for n in (1, 5, 29):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert crc24q(data) == _crc24_slow(data)


def test_crc32_rtk_known():
    # independent bitwise model of RTKLIB rtk_crc32
    def slow(data):
        crc = 0
        for b in data:
            crc ^= b
            for _ in range(8):
                crc = (crc >> 1) ^ 0xEDB88320 if crc & 1 else crc >> 1
        return crc
    data = b"erlang-gnss-tpu"
    assert crc32_rtk(data) == slow(data)


# --- Viterbi -----------------------------------------------------------------

def test_viterbi_roundtrip_clean():
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 200)
    sym = conv27_encode(np.concatenate([bits, np.zeros(6, np.int64)]))
    dec = viterbi27_decode(sym, 200, start_state=0)
    assert np.array_equal(dec, bits)


def test_viterbi_soft_noise():
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 150)
    sym = conv27_encode(np.concatenate([bits, np.zeros(6, np.int64)])
                        ).astype(np.float64)
    noisy = np.clip(sym + rng.normal(0, 60, sym.shape), 0, 255)
    dec = viterbi27_decode(noisy, 150, start_state=0)
    assert np.array_equal(dec, bits)


def test_viterbi_midstream_equal_init():
    """Unknown encoder start state: equal-metric init still recovers the
    tail bits (first few may differ)."""
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, 300)
    sym = conv27_encode(bits)
    # drop the first 25 bits' symbols: mid-stream capture
    dec = viterbi27_decode(sym[50:], 300 - 25 - 6)
    assert np.array_equal(dec[10:], bits[35:-6][:len(dec) - 10])


# --- LNAV encode/decode ------------------------------------------------------

def test_lnav_parity_all_words():
    eph = sim.example_eph(prn=5)
    for sfid in (1, 2, 3, 4, 5):
        sf = encode_frame_l1ca(eph, sfid, 58801, 0, 0)
        for w in range(10):
            prev = np.array([1, 1]) if w == 0 else sf[w * 30 - 2:w * 30]
            word = np.concatenate([prev, sf[w * 30:(w + 1) * 30]]).copy()
            if word[1] == -1:
                word[2:26] *= -1
            assert paritycheck_l1ca(word), f"sfid {sfid} word {w}"


def test_lnav_eph_roundtrip():
    eph = sim.example_eph(prn=7)
    dec = SdrEph()
    for sfid in (1, 2, 3):
        sf = encode_frame_l1ca(eph, sfid, 58800 + sfid, 0, 0)
        # receiver-side un-inversion of data bits by previous D30*
        bits = np.concatenate([[1, 1], sf]).copy()
        for w in range(10):
            if bits[w * 30 + 1] == -1:
                bits[w * 30 + 2:w * 30 + 26] *= -1
        buff = bits2byte(bits[2:], 300, 38)
        assert decode_frame_l1ca(buff, dec, ref_week=2200) == sfid
    e0, e1 = eph.eph, dec.eph
    for f in ("week", "iode", "iodc", "sva", "svh", "code", "flag", "toes",
              "fit"):
        assert getattr(e0, f) == getattr(e1, f), f
    for f in ("A", "e", "i0", "OMG0", "omg", "M0", "deln", "OMGd", "idot",
              "crc", "crs", "cuc", "cus", "cic", "cis", "f0", "f1", "f2"):
        assert getattr(e0, f) == pytest.approx(getattr(e1, f), abs=1e-18), f
    assert e0.tgd[0] == pytest.approx(e1.tgd[0])
    assert e0.toc.time == e1.toc.time
    assert dec.tow_gpst == (58800 + 3) * 6.0


# --- framer: GPS L1CA --------------------------------------------------------

def _ip_stream_from_bits(bits, rate, amp=1000.0, noise=0.0, seed=0):
    """Expand ±1 bits to per-period prompt-I values."""
    rng = np.random.default_rng(seed)
    ip = np.repeat(np.asarray(bits, np.float64) * amp, rate)
    if noise:
        ip = ip + rng.normal(0, noise, ip.shape)
    return ip


def test_framer_l1ca_full_decode():
    eph = sim.example_eph(prn=9)
    tow_start = 352800.0
    bits = sim.lnav_bit_stream(eph, tow_start, nframes=2)
    # pad 7 junk bits at the front so the preamble is NOT trivially aligned,
    # and prepend 2.2 s of alternating bits for bit sync to converge
    rng = np.random.default_rng(5)
    lead = np.concatenate([np.tile([1, -1], 80), rng.integers(0, 2, 7) * 2 - 1])
    allbits = np.concatenate([lead, bits])
    ip = _ip_stream_from_bits(allbits, 20, noise=150.0, seed=6)

    nc = NavChannel(CodeType.L1CA, prn=9, ref_week=2200)
    nsamp = 16368  # pretend 1 ms periods at 16.368 MHz
    bl = np.arange(len(ip), dtype=np.int64) * nsamp
    events = []
    # feed in uneven chunks to exercise batch boundaries
    pos = 0
    for chunk in (1500, 700, 3000, 2000, 50000):
        e = nc.update(ip[pos:pos + chunk], bl[pos:pos + chunk], pos)
        events.extend(e)
        pos += chunk
        if pos >= len(ip):
            break

    kinds = [e.kind for e in events]
    assert "bitsync" in kinds and "preamble" in kinds and "decode" in kinds
    assert nc.flagsync and nc.flagtow and nc.flagdec
    # decoded tow at the preamble event = tow of the *next* subframe
    assert nc.firstsftow == tow_start + 6.0
    # the preamble event lands exactly at the frame boundary period
    pre = next(e for e in events if e.kind == "preamble")
    frame_start_bit = len(lead) + 300
    assert pre.buffloc == (frame_start_bit * 20 - 1) * nsamp
    # ephemeris recovered after subframes 1-3 of the second frame
    assert nc.eph.eph.iode == eph.eph.iode
    assert nc.eph.eph.A == pytest.approx(eph.eph.A)
    assert nc.eph.week_gpst == 2200


def test_framer_bitsync_offset():
    """sync_offset drives the device loop cadence: (cnt+1-offset) % 20 == 0
    exactly at bit boundaries."""
    bits = np.tile([1, -1], 200)
    ip = _ip_stream_from_bits(bits, 20)
    off = 13  # bit boundaries at period 13, 33, ...
    ip = np.concatenate([np.zeros(off), ip])
    nc = NavChannel(CodeType.L1CA, prn=1)
    nc.update(ip[:4000], np.zeros(4000, np.int64), 0)
    assert nc.flagsync
    assert (nc.synci + 1) % 20 == off % 20


# --- framer: GLONASS G1 ------------------------------------------------------

def _g1_line_symbols(strings_bits01):
    """Concatenate encoded strings + time marks into the 100 sps symbol
    stream (each string: 170 data symbols then 30 time-mark symbols)."""
    out = []
    for s in strings_bits01:
        out.append(encode_string_g1(s))
        out.append(TIMEMARK_G1)
    return np.concatenate(out)


def _g1_string(sid, fields=()):
    """85-bit string (0/1): idle 0 + 4-bit id + payload fields."""
    buf = bytearray(11)
    setbitu(buf, 1, 4, sid)
    for pos, length, val in fields:
        setbitu(buf, pos, length, val)
    bits01 = np.unpackbits(np.frombuffer(bytes(buf), np.uint8))[:85]
    return bits01.astype(np.int64)


def test_framer_g1_decode():
    # string 4 carries nt + prn; string 5 carries n4
    strings = [
        _g1_string(1, [(9, 5, 8), (14, 6, 15), (20, 1, 1)]),   # tk
        _g1_string(2, [(9, 7, 44)]),                            # iode
        _g1_string(3, []),
        _g1_string(4, [(59, 11, 1234), (70, 5, 13)]),           # nt, prn
        _g1_string(5, [(49, 5, 7)]),                            # n4
    ]
    sym = _g1_line_symbols(strings * 3)
    ip = _ip_stream_from_bits(sym, 10, noise=100.0, seed=8)
    # lead-in for bit sync (alternating 10 ms symbols = 2.2 s)
    lead = _ip_stream_from_bits(np.tile([1, -1], 110), 10)
    ip = np.concatenate([lead, ip])
    nc = NavChannel(CodeType.G1, prn=0)
    nc.update(ip, np.arange(len(ip), dtype=np.int64) * 511, 0)
    assert nc.flagsync and nc.flagtow
    assert any(e.kind == "decode" for e in nc.events) or nc.eph.cnt > 0
    assert nc.eph.geph.iode == 44
    assert nc.eph.nt == 1234
    assert nc.prn == 13          # PRN (slot) learned from string 4
    assert nc.eph.n4 == 7


# --- framer: SBAS ------------------------------------------------------------

def test_sbas_crc_roundtrip():
    rng = np.random.default_rng(9)
    msg = encode_sbas_message(12, rng.integers(0, 2, 212), 0x53)
    assert check_crc_sbas(msg)
    assert not check_crc_sbas(-msg)  # polarity flip breaks CRC as stored
    assert check_crc_sbas(-msg, polarity=-1)


def test_framer_sbas_decode():
    rng = np.random.default_rng(10)
    preambles = [0x53, 0x9A, 0xC6]
    towms = 400000
    msgs = []
    for k in range(6):
        if k % 3 == 0:
            # MT12: tow at bit 107 (20 bits), week at 127 (10 bits)
            payload = np.zeros(212, np.int64)
            tow_field = towms // 1000 + k  # seconds
            for i in range(20):
                payload[107 - 14 + i] = (tow_field >> (19 - i)) & 1
            wk = 2200 - 1024
            for i in range(10):
                payload[127 - 14 + i] = (wk >> (9 - i)) & 1
            msgs.append(encode_sbas_message(12, payload, preambles[k % 3]))
        else:
            msgs.append(encode_sbas_message(
                63, rng.integers(0, 2, 212), preambles[k % 3]))
    bits01 = ((1 - np.concatenate(msgs)) // 2).astype(np.int64)
    sym = conv27_encode(bits01)                      # 0/255 symbols
    sympm = np.where(sym == 0, 1, -1)                # logical 0 -> +1
    ip = _ip_stream_from_bits(sympm, 2, noise=80.0, seed=11)
    lead = _ip_stream_from_bits(np.tile([1, -1], 600), 2)
    ip = np.concatenate([lead, ip])
    nc = NavChannel(CodeType.L1SBAS, prn=129)
    events = []
    pos = 0
    for chunk in (3000, 3000, 3000, 50000):
        events.extend(nc.update(ip[pos:pos + chunk],
                                np.arange(pos, pos + chunk, dtype=np.int64),
                                pos))
        pos += chunk
        if pos >= len(ip):
            break
    assert nc.flagsync and nc.flagtow
    decs = [e for e in events if e.kind == "decode"]
    assert decs, "no SBAS message decoded"
    assert nc.sbas.week == 2200
    assert nc.sbas.tow > 0


def test_nav_params_cadence():
    p = nav_params(CodeType.L1CA)
    assert (p.rate, p.flen, p.update) == (20, 300, 6000)
    p = nav_params(CodeType.L1SBAS)
    assert (p.rate, p.flen, p.update) == (2, 1500, 1000)
    p = nav_params(CodeType.G1)
    assert (p.rate, p.flen, p.update) == (10, 200, 2000)


def test_framer_g1_state_vector_roundtrip():
    """g1_symbol_stream(geph=...) encodes the ICD state vector; the
    framer decodes it back exactly after quantize_geph."""
    import copy
    from gnsslib_tpu import sim
    from gnsslib_tpu.gtime import gpst2time
    from gnsslib_tpu.nav.eph import Geph

    g = Geph(pos=[11234567.891, -19876543.210, 12345678.9],
             vel=[-1234.5678, 2345.6789, -987.6543],
             acc=[-2.5e-6, 1.5e-6, 0.0],
             taun=-4.2e-5, gamn=9.1e-13, dtaun=2.8e-9)
    sim.quantize_geph(g)
    t0 = gpst2time(2200, 352800.0 + 18.0)   # UTC+leap alignment arbitrary
    sym = sim.g1_symbol_stream(t0, nframes=2, iode=44, slot=9, geph=g)
    ip = _ip_stream_from_bits(sym, 10, noise=80.0, seed=12)
    lead = _ip_stream_from_bits(np.tile([1, -1], 110), 10)
    ip = np.concatenate([lead, ip])
    nc = NavChannel(CodeType.G1, prn=0)
    nc.update(ip, np.arange(len(ip), dtype=np.int64) * 511, 0)
    assert nc.eph.geph.iode == 44 and nc.prn == 9
    d = nc.eph.geph
    np.testing.assert_allclose(d.pos, g.pos, atol=1e-6)
    np.testing.assert_allclose(d.vel, g.vel, atol=1e-9)
    np.testing.assert_allclose(d.acc, g.acc, atol=1e-12)
    assert abs(d.taun - g.taun) < 1e-12
    assert abs(d.gamn - g.gamn) < 1e-16
