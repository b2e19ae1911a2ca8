"""Microbenchmark the fused correlator kernel variants on the live device.

Splits the per-super-step kernel cost into: carrier transcendentals,
tap-shift reductions, and memory. Run with
PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_kernel.py
"""
from __future__ import annotations
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # run from any cwd

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PI = np.pi


def _frac(x):
    return x - jnp.floor(x)


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    return (time.time() - t0) / reps


def make(kernel_body, nout, B, nwin, W, smax, offsets, rc_dtype=jnp.float32):
    kernel = functools.partial(kernel_body, offsets=offsets, smax=smax,
                               nwin=nwin)
    col = lambda x: x.reshape(B, 1)

    @jax.jit
    def run(win, rc, rem, ftot, n):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, nout), jnp.float32),
            grid=(B // 8,),
            in_specs=[
                pl.BlockSpec((8, nwin), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, W), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, nout), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
        )(win, rc, col(rem), col(ftot), col(n))
    return run


def k_full(win_ref, rc_ref, rem_ref, ftot_ref, n_ref, out_ref,
           *, offsets, smax, nwin):
    i = jax.lax.broadcasted_iota(jnp.int32, (8, nwin), 1).astype(jnp.float32)
    ph = _frac(_frac(ftot_ref[:, :] * i) + rem_ref[:, :])
    ang = (2.0 * PI) * ph
    cosv, sinv = jnp.cos(ang), jnp.sin(ang)
    mask = (i < n_ref[:, :]).astype(jnp.float32)
    w = win_ref[:, :]
    wc = w * cosv * mask
    ws = w * sinv * mask
    cols = []
    for t, o in enumerate(offsets):
        rep = rc_ref[:, smax + o:smax + o + nwin]
        cols.append(jnp.sum(rep * wc, axis=1))
        cols.append(jnp.sum(rep * ws, axis=1))
    out_ref[:, :] = jnp.stack(cols, axis=1)


def k_nosin(win_ref, rc_ref, rem_ref, ftot_ref, n_ref, out_ref,
            *, offsets, smax, nwin):
    i = jax.lax.broadcasted_iota(jnp.int32, (8, nwin), 1).astype(jnp.float32)
    ph = _frac(_frac(ftot_ref[:, :] * i) + rem_ref[:, :])
    cosv = 1.0 - ph * ph          # stand-in polynomial (2 ops)
    sinv = ph
    mask = (i < n_ref[:, :]).astype(jnp.float32)
    w = win_ref[:, :]
    wc = w * cosv * mask
    ws = w * sinv * mask
    cols = []
    for t, o in enumerate(offsets):
        rep = rc_ref[:, smax + o:smax + o + nwin]
        cols.append(jnp.sum(rep * wc, axis=1))
        cols.append(jnp.sum(rep * ws, axis=1))
    out_ref[:, :] = jnp.stack(cols, axis=1)


def k_onetap(win_ref, rc_ref, rem_ref, ftot_ref, n_ref, out_ref,
             *, offsets, smax, nwin):
    i = jax.lax.broadcasted_iota(jnp.int32, (8, nwin), 1).astype(jnp.float32)
    ph = _frac(_frac(ftot_ref[:, :] * i) + rem_ref[:, :])
    ang = (2.0 * PI) * ph
    cosv, sinv = jnp.cos(ang), jnp.sin(ang)
    mask = (i < n_ref[:, :]).astype(jnp.float32)
    w = win_ref[:, :]
    wc = w * cosv * mask
    ws = w * sinv * mask
    o = offsets[0]
    rep = rc_ref[:, smax + o:smax + o + nwin]
    cols = [jnp.sum(rep * wc, axis=1), jnp.sum(rep * ws, axis=1)]
    for _ in offsets[1:]:
        cols.append(cols[0])
        cols.append(cols[1])
    out_ref[:, :] = jnp.stack(cols[: 2 * len(offsets)], axis=1)


def k_aligned(win_ref, rc_ref, rem_ref, ftot_ref, n_ref, out_ref,
              *, offsets, smax, nwin):
    """Taps at lane-aligned offsets (multiples of 128) — measures how much
    of the tap loop is unaligned-slice lane rotation."""
    i = jax.lax.broadcasted_iota(jnp.int32, (8, nwin), 1).astype(jnp.float32)
    ph = _frac(_frac(ftot_ref[:, :] * i) + rem_ref[:, :])
    ang = (2.0 * PI) * ph
    cosv, sinv = jnp.cos(ang), jnp.sin(ang)
    mask = (i < n_ref[:, :]).astype(jnp.float32)
    w = win_ref[:, :]
    wc = w * cosv * mask
    ws = w * sinv * mask
    cols = []
    for t, _ in enumerate(offsets):
        o = 128 * t
        rep = rc_ref[:, o:o + nwin]
        cols.append(jnp.sum(rep * wc, axis=1))
        cols.append(jnp.sum(rep * ws, axis=1))
    out_ref[:, :] = jnp.stack(cols, axis=1)


def main():
    B, nwin, smax = 320, 16493, 36
    offsets = tuple(range(-18, 19, 3))     # 13 taps, CORRD=3 spacing
    W = nwin + 2 * smax + 1664
    nout = 2 * len(offsets)
    Bp = ((B + 7) // 8) * 8
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.integers(-8, 8, (Bp, nwin)).astype(np.float32))
    rc = jnp.asarray(rng.choice([-1.0, 1.0], (Bp, W)).astype(np.float32))
    rem = jnp.asarray(rng.random(Bp).astype(np.float32))
    ftot = jnp.asarray(0.25 + 0.01 * rng.random(Bp).astype(np.float32))
    n = jnp.asarray(np.full(Bp, nwin - 80, np.float32))

    for name, body in (("full", k_full), ("nosin", k_nosin),
                       ("onetap", k_onetap), ("aligned", k_aligned)):
        run = make(body, nout, Bp, nwin, W, smax, offsets)
        try:
            dt = timeit(run, win, rc, rem, ftot, n)
            print(f"{name:8s} {dt*1e3:7.3f} ms per 320-window batch")
        except Exception as e:
            print(f"{name:8s} FAILED {type(e).__name__}: {e}")


def scan_test():
    """Same kernel, wrapped in lax.scan with constant operands: isolates
    the scan+pallas interaction seen in profile_fast (kconst probe)."""
    B, nwin, smax = 320, 16493, 36
    offsets = tuple(range(-18, 19, 3))
    W = nwin + 2 * smax + 1664
    nout = 2 * len(offsets)
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.integers(-8, 8, (B, nwin)).astype(np.float32))
    rc = jnp.asarray(rng.choice([-1.0, 1.0], (B, W)).astype(np.float32))
    rem = jnp.asarray(rng.random(B).astype(np.float32))
    ftot = jnp.asarray(0.25 + 0.01 * rng.random(B).astype(np.float32))
    n = jnp.asarray(np.full(B, nwin - 80, np.float32))
    run = make(k_full, nout, B, nwin, W, smax, offsets)

    S = 100
    for name, body in (("full", k_full), ("nosin", k_nosin),
                       ("onetap", k_onetap), ("aligned", k_aligned)):
        run = make(body, nout, B, nwin, W, smax, offsets)

        @functools.partial(jax.jit, static_argnames="length")
        def scanned(win, rc, rem, ftot, n, length=S):
            def step(c, _):
                z = run.__wrapped__(win, rc, rem + c * 1e-9, ftot, n)
                return c + jnp.sum(z) * 1e-30, jnp.sum(z)
            return jax.lax.scan(step, 0.0, None, length=length)

        dt = timeit(scanned, win, rc, rem, ftot, n, reps=3)
        print(f"scan {name:8s} {dt/S*1e3:7.4f} ms/iter")


if __name__ == "__main__":
    scan_test()
