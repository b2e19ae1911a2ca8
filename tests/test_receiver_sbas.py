"""SBAS end-to-end through the receiver: Viterbi FEC framing, MT12 time,
mixed GPS+SBAS RINEX epochs, NovAtel stream over TCP."""
import os
import socket
import threading
import time

import numpy as np
import pytest

from gnsslib_tpu import sim
from gnsslib_tpu.constants import DType, CodeType
from gnsslib_tpu.nav.sbas import encode_sbas_message
from gnsslib_tpu.nav.viterbi import conv27_encode
from gnsslib_tpu.runtime.cli import main as cli_main

F_SF = 4.092e6
F_IF = 1.023e6
TOWREF = 352818.0
SBAS_PRN, SBAS_DELAY = 129, 700
GPS_PRN, GPS_DELAY = 7, 200
SECONDS = 16.0
def _free_port() -> int:
    """OS-assigned free port (fixed ports collide under pytest-xdist)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


PORT = _free_port()


def _sbas_symbol_stream(nmsgs: int):
    """±1 line symbols: 250-bit messages (1 s each), MT12 every 3rd with
    tow encoding the message-start second, preambles cycling 53/9A/C6."""
    preambles = [0x53, 0x9A, 0xC6]
    rng = np.random.default_rng(12)
    msgs = []
    for k in range(nmsgs):
        if k % 3 == 0:
            payload = np.zeros(212, np.int64)
            # the framer decodes the OLDEST of the 3 buffered messages and
            # anchors firstsf at the newest message's end (+3 s), and the
            # decoder adds +1 (src/sdrnav_sbs.c:75): field = start + 2
            tow_field = int(TOWREF) + k + 2
            for i in range(20):
                payload[107 - 14 + i] = (tow_field >> (19 - i)) & 1
            wk = (2200 - 1024) & 0x3FF
            for i in range(10):
                payload[127 - 14 + i] = (wk >> (9 - i)) & 1
            msgs.append(encode_sbas_message(12, payload, preambles[k % 3]))
        else:
            msgs.append(encode_sbas_message(63, rng.integers(0, 2, 212),
                                            preambles[k % 3]))
    bits01 = ((1 - np.concatenate(msgs)) // 2).astype(np.int64)
    sym = conv27_encode(bits01)
    return np.where(sym == 0, 1, -1).astype(np.int8)


@pytest.fixture(scope="module")
def ran_receiver(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rxsbas")
    eph = sim.example_eph(prn=GPS_PRN, week=2200, toe_tow=TOWREF)
    frames = sim.lnav_bit_stream(eph, TOWREF + 6.0, nframes=4)
    pad = np.concatenate([np.tile([1, -1], 149), [1, 1]]).astype(np.int8)
    gps = sim.SimChannel(prn=GPS_PRN,
                         doppler=700.0,
                         code_phase=-GPS_DELAY * 1.023e6 / F_SF,
                         carr_phase=0.4,
                         nav_bits=np.concatenate([pad, frames]))
    sbas = sim.SimChannel(prn=SBAS_PRN, ctype=CodeType.L1SBAS,
                          doppler=-900.0,
                          code_phase=-SBAS_DELAY * 1.023e6 / F_SF,
                          carr_phase=0.9, nav_ms=2.0,
                          nav_bits=_sbas_symbol_stream(int(SECONDS) + 2))
    noise = sim.noise_std_for_cn0(1.0, 47.0, F_SF, DType.REAL)
    path = tmp / "sim_sbas.bin"
    n = int(SECONDS * F_SF)
    with open(path, "wb") as f:
        for t0 in range(0, n, int(F_SF)):
            x = sim.synthesize([gps, sbas], F_SF, F_IF, DType.REAL,
                               min(int(F_SF), n - t0), noise_std=noise,
                               seed=7000 + t0, t0=t0)
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
PRN      ={GPS_PRN},{SBAS_PRN}
SYS      =1,2
CTYPE    =1,27
FTYPE    =1,1
[OUTPUT]
OUTMS    =400
RINEX    =1
RINEXPATH={tmp}/out
SBAS     =1
SBASPORT ={PORT}
""")
    captured = bytearray()

    def client():
        for _ in range(200):
            try:
                s = socket.create_connection(("127.0.0.1", PORT),
                                             timeout=0.5)
                break
            except OSError:
                time.sleep(0.1)
        else:
            return
        s.settimeout(0.5)
        while True:
            try:
                d = s.recv(65536)
            except socket.timeout:
                continue
            except OSError:
                return
            if not d:
                return
            captured.extend(d)

    th = threading.Thread(target=client, daemon=True)
    th.start()
    rc = cli_main([str(cfg), "--quiet"])
    assert rc == 0
    time.sleep(0.3)
    out = tmp / "out"
    obs = [(out / p).read_text() for p in os.listdir(out)
           if p.endswith(".obs")][0]
    return obs, bytes(captured)


def test_sbas_in_rinex_epochs(ran_receiver):
    obs_text, _ = ran_receiver
    lines = obs_text.splitlines()
    epochs = [i for i, ln in enumerate(lines) if ln.startswith(">")]
    assert epochs, "no epochs"
    last = epochs[-1]
    nsat = int(lines[last].split()[-1])
    sats = {lines[last + 1 + k][:3] for k in range(nsat)}
    assert f"S{SBAS_PRN - 100}" in sats, sats
    assert f"G{GPS_PRN:02d}" in sats, sats


def test_sbas_novatel_stream(ran_receiver):
    _, captured = ran_receiver
    # NovAtel OEM6 RAWSBASFRAME: sync AA 44 12, msg id 973
    assert len(captured) >= 80, len(captured)
    i = captured.find(b"\xaa\x44\x12")
    assert i >= 0
    msgid = captured[i + 4] | (captured[i + 5] << 8)
    assert msgid == 973
    from gnsslib_tpu.nav.bits import crc32_rtk
    frame = captured[i:i + 80]
    crc = int.from_bytes(frame[76:80], "little")
    assert crc == crc32_rtk(frame[:76])
