"""RTCM3 encoder + TCP output tests: framing/CRC, field round-trips."""
import socket
import time

import numpy as np
import pytest

from gnsslib_tpu import sim
from gnsslib_tpu.constants import CLIGHT, SYS_GPS, SYS_GLO
from gnsslib_tpu.gtime import gpst2time
from gnsslib_tpu.nav.bits import crc24q, getbitu, getbits
from gnsslib_tpu.nav.eph import Geph
from gnsslib_tpu.obs.rtcm import (RANGE_MS, encode_1019, encode_1020,
                                  encode_msm7, frame_rtcm3)
from gnsslib_tpu.runtime.tcpout import TcpServer


def _check_frame(msg: bytes):
    assert msg[0] == 0xD3
    nbyte = getbitu(msg, 14, 10)
    assert len(msg) == 3 + nbyte + 3
    assert crc24q(msg[:3 + nbyte]) == int.from_bytes(msg[3 + nbyte:], "big")
    return msg[3:3 + nbyte]


def test_1019_roundtrip():
    eph = sim.example_eph(prn=9, week=2200, toe_tow=352800.0).eph
    eph.ttr = gpst2time(2200, 352500.0)
    msg = encode_1019(9, eph)
    body = _check_frame(msg)
    assert getbitu(body, 0, 12) == 1019
    assert getbitu(body, 12, 6) == 9
    assert getbitu(body, 18, 10) == 2200 % 1024
    # iode at bit 48+14+... : 12+6+10+4+2+14 = 48 -> iode 8 bits
    assert getbitu(body, 48, 8) == eph.iode
    # sqrtA offset: 12+6+10+4+2+14+8+16+8+16+22+10+16+16+32+16+32+16 = 256
    sqrtA = getbitu(body, 256, 32)
    assert sqrtA * 2.0 ** -19 == pytest.approx(np.sqrt(eph.A), rel=1e-9)
    assert getbitu(body, 288, 16) * 16.0 == eph.toes


def test_1020_roundtrip():
    g = Geph(iode=40, frq=-3, svh=0, age=1,
             toe=gpst2time(2200, 352800.0), tof=gpst2time(2200, 352700.0),
             pos=[12e6, -15e6, 18e6], vel=[1000.0, -2000.0, 500.0],
             acc=[1e-6, -2e-6, 3e-6], taun=5e-7, gamn=1e-12, dtaun=1e-9)
    msg = encode_1020(5, g)
    body = _check_frame(msg)
    assert getbitu(body, 0, 12) == 1020
    assert getbitu(body, 12, 6) == 5
    assert getbitu(body, 18, 5) == -3 + 7
    # vel[0] sign-magnitude at offset 12+6+5+4+5+6+1+1+1+7 = 48, 24 bits
    sgn = -1 if getbitu(body, 48, 1) else 1
    mag = getbitu(body, 49, 23)
    assert sgn * mag * 2.0 ** -20 * 1e3 == pytest.approx(1000.0, abs=1.0)


def test_msm7_header_and_ranges():
    obs = [(3, 21000000.0, 110e6, 1234.5, 45.0),
           (17, 23000000.0, 120e6, -2345.5, 40.0)]
    msg = encode_msm7(SYS_GPS, obs, 2200, 352800.4)
    body = _check_frame(msg)
    assert getbitu(body, 0, 12) == 1077
    assert getbitu(body, 24, 30) == int(352800.4 * 1000)
    # satellite mask bits 169.. (12+12+30+1+3+7+2+2+1+3 = 73): 64 bits
    satmask = [getbitu(body, 73 + j, 1) for j in range(64)]
    assert satmask[2] == 1 and satmask[16] == 1 and sum(satmask) == 2
    sigmask = [getbitu(body, 137 + j, 1) for j in range(32)]
    assert sigmask[1] == 1 and sum(sigmask) == 1
    # rough ranges: after cellmask (2 cells): 169+2=171: 8-bit int ms
    i = 171
    int_ms = getbitu(body, i, 8)
    assert int_ms == int(21000000.0 / RANGE_MS)


def test_tcp_server_broadcast():
    srv = TcpServer(0)            # ephemeral port; srv.port = bound port
    try:
        cli = socket.create_connection(("127.0.0.1", srv.port), timeout=2)
        t0 = time.time()
        while srv.nclients == 0 and time.time() - t0 < 2:
            time.sleep(0.01)
        assert srv.nclients == 1
        srv.send(b"hello-rtcm")
        cli.settimeout(2)
        assert cli.recv(64) == b"hello-rtcm"
        cli.close()
        time.sleep(0.05)
        srv.send(b"x")   # dead client dropped without raising
    finally:
        srv.close()


def test_frame_padding():
    payload = bytearray(10)
    payload[0] = 0xAB
    msg = frame_rtcm3(payload, 73)   # 73 bits -> 10 bytes
    body = _check_frame(msg)
    assert len(body) == 10


def test_1044_roundtrip():
    from gnsslib_tpu.obs.rtcm import encode_1044
    eph = sim.example_eph(prn=195, week=2200, toe_tow=352800.0).eph
    msg = encode_1044(195, eph)
    body = _check_frame(msg)
    assert getbitu(body, 0, 12) == 1044
    assert getbitu(body, 12, 4) == 3
    # toc (16b at 16), af2(8), af1(16), af0(22), iode at 78
    assert getbitu(body, 78, 8) == eph.iode
