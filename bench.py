"""Headline benchmark: 32-channel L1CA tracking throughput on one chip.

Measures steady-state IF samples/s through the full device tracking scan
(carrier wipe-off + 13-tap correlator + DLL/PLL/FLL per ms per channel) at
the reference's post-processing envelope (16.368 Msps real IF,
frontend/iffile.ini) with all 32 channels of the reference default config
(bin/gnss-sdrcli.ini NCH=32).

Baseline: the reference's implicit real-time envelope — sustaining the
capture rate (16.368 Msps) with 32 channels on a commodity CPU
(BASELINE.md).  vs_baseline = measured Msps / 16.368.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Robustness contract (round-1 lesson: BENCH_r01 was rc=124/parsed=null —
the TPU relay hung during init and nothing was ever printed):

* the parent process NEVER imports jax; all measurement happens in child
  processes it can kill;
* a CPU measurement child (forced cpu backend) runs first/concurrently as
  the guaranteed-to-land fallback number;
* the TPU child streams progressively better results line-by-line; the
  parent keeps the best seen so far;
* a hard walltime budget (BENCH_BUDGET_S, default 780 s) plus SIGTERM/
  SIGINT handlers guarantee the JSON line is printed before the driver's
  timeout, whatever the relay does.
"""
import json
import os
import signal
import subprocess
import sys
import time


METRIC = "track_32ch_l1ca_throughput"
F_SF_MSPS = 16.368


# ===================================================================== #
# measurement child: python bench.py --measure {tpu|cpu}
# ===================================================================== #

def measure(platform: str) -> int:
    """Run the 32-ch FastTracker throughput measurement on one backend.

    Streams result lines (JSON) to stdout as they improve; the parent
    keeps the last one.  Diagnostics go to stderr prefixed with '#'.
    """
    t_start = time.time()
    budget = float(os.environ.get("BENCH_CHILD_BUDGET_S", "1e9"))

    import numpy as np
    import jax
    if platform == "cpu":
        # NOTE: the axon plugin overrides JAX_PLATFORMS=cpu from the
        # environment; only the in-process config update really selects
        # the host backend.
        jax.config.update("jax_platforms", "cpu")
    jax.devices()
    import jax.numpy as jnp
    from gnsslib_tpu.constants import CodeType, DType
    from gnsslib_tpu.track import FastTracker, TrackConfig, Tracker

    f_sf = 16.368e6
    f_if = 4.092e6
    C = 32
    # 2 s of signal per device call on TPU; CPU uses a lighter workload
    # (same program, fewer steps) so the fallback number always lands
    nsteps = 2000 if platform == "tpu" else 200
    prns = list(range(1, 33))

    cfg = TrackConfig(corrn=6, corrd=3, corrp=6)      # iffile.ini geometry
    trk = Tracker(cfg, prns, [CodeType.L1CA] * C, f_sf, f_if, DType.REAL)
    fast = FastTracker(trk)
    nsamp = trk.n_nom
    block_len = nsteps * nsamp + trk.nwin + 8 * nsteps + 2 * nsamp + 64

    # throughput does not depend on signal content (the loops run
    # regardless of lock): an int8-alphabet noise block stands in for the
    # multi-satellite synthesis, which costs minutes at this length
    rng = np.random.default_rng(3)
    block = jnp.asarray(
        rng.integers(-64, 64, size=block_len).astype(np.float32))

    st = trk.init_state()
    st = trk.start_channels(st, list(range(C)),
                            [int(97 * p) % nsamp for p in prns],
                            [250.0 * (p % 13) - 1500.0 for p in prns])
    for c in range(C):
        st = trk.set_bit_sync(st, c, c % 10)

    best_wall = [None]

    def emit(wall_s: float) -> None:
        if best_wall[0] is not None and wall_s >= best_wall[0]:
            return
        best_wall[0] = wall_s
        msps = nsteps * nsamp / 1e6 / wall_s
        print(json.dumps({
            "metric": METRIC,
            "value": round(msps, 3),
            "unit": "Msamples/s",
            "vs_baseline": round(msps / F_SF_MSPS, 3),
            "device": platform,
        }), flush=True)

    # warmup / compile (steady-state fast path: L periods per device step)
    t0 = time.time()
    st, out = fast.run_block(st, block, nsteps)
    compile_s = time.time() - t0
    print(f"# {platform}: compile+first block {compile_s:.1f}s",
          file=sys.stderr, flush=True)

    # first timed pass: a single sequential block — emit immediately so a
    # result exists as early as possible
    t0 = time.time()
    st, out = fast.run_block(st, block, nsteps)
    emit(time.time() - t0)

    # steady-state measurement: pipelined blocks (dispatch block k+1
    # before collecting block k's telemetry, run_block_start/collect) so
    # the device->host transfer overlaps the next block's compute — the
    # receiver's sustainable streaming mode.  Multiple passes, best pass
    # emitted after each (the relay has multi-hundred-ms session
    # stragglers that say nothing about the sustainable rate).
    passes, blocks = (3, 3) if platform == "tpu" else (2, 2)
    for _ in range(passes):
        if time.time() - t_start > budget - 5.0:
            break
        st = trk.start_channels(st, list(range(C)), [0] * C, [0.0] * C)
        t0 = time.time()
        pending = None
        for _b in range(blocks):
            st, handle = fast.run_block_start(st, block, nsteps)
            if pending is not None:
                fast.run_block_collect(pending)
            pending = handle
        fast.run_block_collect(pending)
        emit((time.time() - t0) / blocks)
    print(f"# {platform}: device={jax.devices()[0].platform} "
          f"total {time.time() - t_start:.1f}s", file=sys.stderr, flush=True)
    return 0


# ===================================================================== #
# parent: orchestrate children under a hard walltime budget
# ===================================================================== #

class _Child:
    def __init__(self, platform: str, child_budget: float):
        env = dict(os.environ)
        env["BENCH_CHILD_BUDGET_S"] = str(child_budget)
        # keep /root/.axon_site importable (TPU plugin bootstraps from
        # sitecustomize there); never REPLACE the path
        self.platform = platform
        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--measure", platform],
            stdout=subprocess.PIPE, stderr=sys.stderr, env=env)
        os.set_blocking(self.proc.stdout.fileno(), False)
        self.result = None
        self._buf = ""

    def poll(self):
        """Drain stdout; keep the last parseable JSON line."""
        try:
            chunk = self.proc.stdout.read()
        except (OSError, ValueError):
            chunk = None
        if chunk:
            self._buf += chunk.decode("utf-8", "replace")
            *lines, self._buf = self._buf.split("\n")
            for ln in lines:
                ln = ln.strip()
                if ln.startswith("{"):
                    try:
                        self.result = json.loads(ln)
                    except json.JSONDecodeError:
                        pass
        return self.proc.poll()

    def kill(self):
        if self.proc.poll() is None:
            self.proc.kill()
            try:
                self.proc.wait(timeout=5)
            except subprocess.TimeoutExpired:
                pass


def main() -> int:
    t0 = time.time()
    budget = float(os.environ.get("BENCH_BUDGET_S", "780"))
    reserve = 15.0
    emitted = []

    def best_result():
        tpu_r = tpu.result if tpu is not None else None
        cpu_r = cpu.result if cpu is not None else None
        return tpu_r or cpu_r

    def emit_and_exit(signum=None, frame=None):
        if not emitted:
            emitted.append(True)
            r = best_result() or {
                "metric": METRIC, "value": 0.0, "unit": "Msamples/s",
                "vs_baseline": 0.0, "error": "no measurement landed",
            }
            r = {k: r[k] for k in
                 ("metric", "value", "unit", "vs_baseline")} | (
                {"device": r["device"]} if "device" in r else {})
            print(json.dumps(r), flush=True)
        for c in (tpu, cpu):
            if c is not None:
                c.kill()
        os._exit(0)

    tpu = cpu = None
    signal.signal(signal.SIGTERM, emit_and_exit)
    signal.signal(signal.SIGINT, emit_and_exit)

    child_budget = budget - reserve
    cpu = _Child("cpu", min(child_budget, 420.0))
    tpu = _Child("tpu", child_budget)

    while time.time() - t0 < budget - reserve:
        rc_tpu = tpu.poll()
        cpu.poll()
        if rc_tpu is not None:
            if tpu.result is not None:
                break                       # TPU number landed: done
            # TPU child died without a result: fall back to CPU
            if cpu.poll() is not None:
                break
        time.sleep(0.5)

    # final drain before reporting
    tpu.poll()
    cpu.poll()
    emit_and_exit()
    return 0


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--measure":
        sys.exit(measure(sys.argv[2]))
    sys.exit(main())
