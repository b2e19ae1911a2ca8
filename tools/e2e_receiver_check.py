"""End-to-end verify: IF synth -> acquisition -> tracking -> nav decode.

Drives the public gnsslib_tpu API exactly as a receiver would: block-wise
streaming, acquisition handoff, device tracking scan, host nav framer.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # run from any cwd
import sys
import time

import numpy as np
import jax.numpy as jnp

from gnsslib_tpu import sim
from gnsslib_tpu.acquire import Acquirer
from gnsslib_tpu.constants import CodeType, DType
from gnsslib_tpu.nav import NavChannel
from gnsslib_tpu.track import TrackConfig, Tracker

F_SF = 4.092e6
F_IF = 1.023e6
NSAMP = 4092
PRN = 17
DOPPLER = 1234.0
CODEI_TRUE = 2345
SECONDS = 55.0
TOW_START = 352800.0

def main():
    eph = sim.example_eph(prn=PRN, week=2200)
    bits = sim.lnav_bit_stream(eph, TOW_START, nframes=8)   # 8*30 s of bits
    print(f"nav bit stream: {len(bits)} bits")

    ch = sim.SimChannel(prn=PRN, doppler=DOPPLER,
                        code_phase=-CODEI_TRUE * 1.023e6 / F_SF,
                        carr_phase=0.37, nav_bits=bits)
    noise = sim.noise_std_for_cn0(1.0, 45.0, F_SF, DType.REAL)

    # --- acquisition on the first 11 ms -------------------------------------
    acq = Acquirer([PRN], [CodeType.L1CA], F_SF, F_IF, DType.REAL)
    head = sim.synthesize([ch], F_SF, F_IF, DType.REAL, 12 * NSAMP,
                          noise_std=noise, seed=1)
    t0 = time.time()
    res = acq.search(np.asarray(head, np.float32))
    print(f"acq: acquired={res.acquired[0]} codei={res.codei[0]} "
          f"dcarr={res.dcarr[0]:+.0f} Hz cn0={res.cn0[0]:.1f} dB-Hz "
          f"peakr={res.peakr[0]:.2f}  ({time.time()-t0:.1f}s)")
    assert res.acquired[0], "acquisition failed"
    err_code = (int(res.codei[0]) - CODEI_TRUE) % NSAMP
    err_code = min(err_code, NSAMP - err_code)
    assert err_code <= 2, f"code phase error {err_code} samples"
    assert abs(res.dcarr[0] + DOPPLER) <= 100.0, res.dcarr[0]

    # --- tracking + nav, block-streamed --------------------------------------
    cfg = TrackConfig(corrn=4, corrd=2, corrp=2)
    trk = Tracker(cfg, [PRN], [CodeType.L1CA], F_SF, F_IF, DType.REAL)
    st = trk.init_state()
    st = trk.start_channels(st, [0], [int(res.codei[0])], [float(res.dcarr[0])])
    nav = NavChannel(CodeType.L1CA, prn=PRN, ref_week=2200)

    nsteps = 950
    margin = trk.nwin + 8 * nsteps + 16
    block_len = nsteps * NSAMP + margin
    base = 0                       # absolute sample index of block start
    total_steps = int(SECONDS * 1000)
    done = 0
    t0 = time.time()
    synced = False
    while done < total_steps:
        data = sim.synthesize([ch], F_SF, F_IF, DType.REAL, block_len,
                              noise_std=noise, seed=100 + done, t0=base)
        block = jnp.asarray(np.asarray(data, np.float32))
        cnt0 = int(np.asarray(st.cnt)[0])
        st, out = trk.run_block(st, block, nsteps)
        events = nav.update(out.ip[:, 0], base + out.loc[:, 0].astype(np.int64),
                            cnt0)
        for e in events:
            print(f"  [t={done/1000.0:5.1f}s] nav event: {e.kind} cnt={e.cnt} "
                  f"sfid={e.sfid} tow={e.tow} week={e.week}")
        if nav.flagsync and not synced:
            st = trk.set_bit_sync(st, 0, nav.sync_offset)
            synced = True
            print(f"  bit sync at offset {nav.sync_offset}; switching to prm2")
        advance = nsteps * NSAMP
        st = trk.rebase(st, advance)
        base += advance
        done += nsteps
        if nav.eph.cnt >= 3 and nav.flagdec:
            break
    dt = time.time() - t0
    msps = base / 1e6 / dt
    print(f"tracked {done/1000.0:.1f} s of signal in {dt:.1f} s "
          f"({msps:.1f} Msamples/s, {base/1e6/ (done/1000.0):.3f} Msps stream)")

    # --- checks ---------------------------------------------------------------
    assert nav.flagsync, "no bit sync"
    assert nav.flagtow, "no preamble/tow"
    assert nav.flagdec, "no decode"
    print(f"firstsftow={nav.firstsftow} (expect multiple of 6 in frame)")
    e = nav.eph.eph
    ok = (e.iode == eph.eph.iode and e.iodc == eph.eph.iodc
          and abs(e.A - eph.eph.A) < 1e-3 and e.week == 2200)
    print(f"eph: week={e.week} iode={e.iode} iodc={e.iodc} A={e.A:.3f} "
          f"e={e.e:.6f} (truth A={eph.eph.A:.3f})")
    assert ok, "ephemeris mismatch"
    d_end = -np.mean(out.dcarr[-50:, 0])
    print(f"tracked Doppler {d_end:+.2f} Hz (truth {DOPPLER:+.1f})")
    assert abs(d_end - DOPPLER) < 5.0
    print("E2E PASS")

if __name__ == "__main__":
    sys.exit(main())
