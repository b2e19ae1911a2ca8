"""Per-stage wall-time breakdown of the Receiver loop on the cached
capture from tools/receiver_throughput.py (run that first).

Monkeypatches stage boundaries to attribute time: frontend read, block
host->device transfer, acquisition, track dispatch, telemetry collect,
host nav/obs, epoch emit.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # run from any cwd
import sys
import time

import numpy as np


def main():
    from gnsslib_tpu.constants import DType, FrontendType
    from gnsslib_tpu.io.frontend import FileFrontend, FrontendSpec
    from gnsslib_tpu.runtime.config import ReceiverConfig, ChannelConfig
    from gnsslib_tpu.runtime import receiver as rxmod
    from gnsslib_tpu.track.state import TrackConfig
    from tools.receiver_throughput import CACHE, F_SF, F_IF

    pipeline = "--sequential" not in sys.argv
    nsteps = 400
    if "--nsteps" in sys.argv:
        nsteps = int(sys.argv[sys.argv.index("--nsteps") + 1])

    spec = FrontendSpec(fend=FrontendType.FILE, f_cf=1.57542e9, f_sf=F_SF,
                        f_if=F_IF, dtype=DType.REAL)
    cfg = ReceiverConfig(
        channels=[ChannelConfig(prn=p) for p in range(1, 33)],
        fends=[spec], files=[CACHE],
        track=TrackConfig(corrn=6, corrd=3, corrp=6),
        outms=400, rinex=False)

    T = {}

    def timed(obj, name, label):
        fn = getattr(obj, name)

        def wrap(*a, **k):
            t0 = time.time()
            r = fn(*a, **k)
            T.setdefault(label, []).append(time.time() - t0)
            return r
        setattr(obj, name, wrap)

    rx = rxmod.Receiver(cfg, FileFrontend(CACHE, spec), pipeline=pipeline,
                        nsteps_per_block=nsteps)
    # warm pass for compiles
    rx.run_seconds()
    rx = rxmod.Receiver(cfg, FileFrontend(CACHE, spec), pipeline=pipeline,
                        nsteps_per_block=nsteps)
    timed(rx.frontend, "read", "frontend.read")
    timed(rx.cache, "get", "cache.get")
    timed(rx.cache, "_upload", "cache.upload")
    timed(rx, "_try_acquire", "acquire")
    # NOTE: do NOT wrap rx._acq_search — replacing the bound method would
    # defeat the pipelined-acquisition identity check and silently force
    # the synchronous path; time the Acquirer's start/collect instead
    timed(rx.acq, "search_dev_start", "acq.dispatch")
    timed(rx.acq, "search_dev_collect", "acq.collect")
    timed(rx.fast, "run_block_start", "fast.dispatch")
    timed(rx.fast, "run_block_collect", "fast.collect")
    timed(rx.fast, "run_block", "fast.run_block")
    timed(rx.trk, "run_block", "slow.run_block")
    timed(rx.trk, "rebase", "rebase")
    timed(rx, "_feed_nav_and_obs", "nav+obs(host)")
    timed(rx, "_emit_epochs", "emit")
    # main-thread blocking time: the scheduled joins of the background
    # fetches (acq decisions / block telemetry) — the bg threads' own
    # device_get time shows under acq.collect / fast.collect
    timed(rx, "_collect", "telem.join+feed")
    timed(rx, "_collect_acq", "acq.join+apply")

    t0 = time.time()
    s = rx.run_seconds()
    total = time.time() - t0
    print(f"mode={'pipelined' if pipeline else 'sequential'}  "
          f"total {total:.1f}s for {s['seconds']:.1f}s of signal "
          f"({s['msps']:.1f} Msps)")
    for k in sorted(T, key=lambda k: -sum(T[k])):
        v = np.asarray(T[k])
        tail = " ".join(f"{x:.3f}" for x in v[-3:])
        print(f"  {k:16s} {v.sum():7.2f}s  x{len(v)}  "
              f"med {np.median(v):6.3f}  last3 [{tail}]")
    # nested: acquire includes acquire.search; dispatch/collect under
    # step_block; fast.run_block calls dispatch+collect
    return 0


if __name__ == "__main__":
    sys.exit(main())
