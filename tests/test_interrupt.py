"""Graceful interruption: SIGINT mid-run -> flush, complete RINEX,
resumable checkpoint (reference keythread/quitsdr teardown,
src/sdrmain.c:59-80,190-218 — the reference only offers 'q'; a signal
kills it with buffers unflushed)."""
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from gnsslib_tpu import sim
from gnsslib_tpu.constants import DType

F_SF = 4.092e6
F_IF = 1.023e6
TOW0 = 352800.0
SECONDS = 21.0


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("intr")
    chans = []
    for prn, d in ((3, 300), (21, 1300)):
        eph = sim.example_eph(prn=prn, week=2200, toe_tow=TOW0)
        frames = sim.lnav_bit_stream(eph, TOW0 + 6.0, nframes=4)
        pad = np.concatenate([np.tile([1, -1], 149), [1, 1]]).astype(np.int8)
        chans.append(sim.SimChannel(
            prn=prn, doppler=500.0 + 100.0 * prn,
            code_phase=-d * 1.023e6 / F_SF, carr_phase=0.1 * prn,
            nav_bits=np.concatenate([pad, frames])))
    noise = sim.noise_std_for_cn0(1.0, 47.0, F_SF, DType.REAL)
    n = int(SECONDS * F_SF)
    path = tmp / "intr_l1ca.bin"
    with open(path, "wb") as f:
        step = int(F_SF)
        for t0 in range(0, n, step):
            x = sim.synthesize(chans, F_SF, F_IF, DType.REAL,
                               min(step, n - t0), noise_std=noise,
                               seed=1000 + t0, t0=t0)
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
DLLB1    =5.0
PLLB1    =30.0
FLLB1    =200.0
DLLB2    =1.0
PLLB2    =10.0
FLLB2    =50.0
""")
    cfg = tmp / "rx.ini"
    cfg.write_text(f"""[RCV]
FENDCONF ={fend}
[CHANNEL]
NCH      =2
PRN      =3,21
SYS      =1,1
CTYPE    =1,1
FTYPE    =1,1
[OUTPUT]
OUTMS    =400
RINEX    =1
RINEXPATH={tmp}/out
""")
    return tmp, cfg


def _spawn(cfg, extra, tmp):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (os.path.dirname(os.path.dirname(__file__)),
                    env.get("PYTHONPATH", "")) if p)
    return subprocess.Popen(
        [sys.executable, "-m", "gnsslib_tpu", str(cfg)] + extra,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=str(tmp))


def _epoch_count(outdir):
    obs = [p for p in os.listdir(outdir) if p.endswith(".obs")] \
        if os.path.isdir(outdir) else []
    if not obs:
        return 0, None
    latest = max(obs, key=lambda p: os.path.getmtime(
        os.path.join(outdir, p)))
    text = open(os.path.join(outdir, latest), errors="replace").read()
    return sum(1 for ln in text.splitlines() if ln.startswith(">")), \
        os.path.join(outdir, latest)


def test_sigint_flushes_and_checkpoint_resumes(setup):
    tmp, cfg = setup
    outdir = tmp / "out"
    ck = tmp / "ck.pkl"
    proc = _spawn(cfg, ["--quiet", "--checkpoint", str(ck)], tmp)
    # wait until the run has produced at least one observation epoch,
    # then interrupt it mid-stream
    deadline = time.time() + 900
    try:
        while time.time() < deadline:
            if proc.poll() is not None:
                out = proc.stdout.read().decode(errors="replace")
                pytest.fail(f"CLI exited before interrupt: {out[-2000:]}")
            n, _ = _epoch_count(outdir)
            if n >= 1:
                break
            time.sleep(1.0)
        else:
            pytest.fail("no epoch appeared before the deadline")
        proc.send_signal(signal.SIGINT)
        out, _ = proc.communicate(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out.decode(errors="replace")[-2000:]

    # RINEX closed complete: parseable epoch lines, nonempty file
    n_epochs, obs_path = _epoch_count(outdir)
    assert n_epochs >= 1 and obs_path
    text = open(obs_path).read()
    assert "END OF HEADER" in text
    # every epoch header is followed by its full satellite records
    lines = text.splitlines()
    for i, ln in enumerate(lines):
        if ln.startswith(">"):
            nsat = int(ln.split()[-1])
            assert len(lines) > i + nsat, "truncated final epoch"

    # the auto-saved checkpoint resumes and produces MORE epochs
    assert ck.exists()
    proc2 = _spawn(cfg, ["--quiet", "--resume", str(ck)], tmp)
    out2, _ = proc2.communicate(timeout=900)
    assert proc2.returncode == 0, out2.decode(errors="replace")[-2000:]
    n2, _ = _epoch_count(outdir)
    assert n2 >= 1, "resumed run produced no epochs"
