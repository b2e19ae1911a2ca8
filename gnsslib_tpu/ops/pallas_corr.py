"""Pallas TPU kernel: fused carrier wipe-off + multi-tap correlation.

The XLA fast path materializes the carrier-mixed window and 13 tap-shifted
replica copies in HBM (the dominant memory traffic).  This kernel keeps
everything in VMEM: per (channel·window) grid cell it loads the raw
sample window and the replica row once, generates the carrier rotation
with VPU transcendentals (total-rate f32 ramp: phase error <= 2.5e-4
cycles over a 16k window — far below the reference's 1/32-LUT carrier),
and reduces all taps in-register.

Layout note: cells are flattened to a leading axis with a singleton
middle dim so every VMEM block is (1, 1, N) — satisfying Mosaic's
last-two-dims rule with N equal to the array dim.

Replica rows are fetched OUTSIDE the kernel with a plain jnp.take row
gather (track/fast.py _replica_rows).  A scalar-prefetch / manual-DMA
in-kernel row fetch was tried and measured WORSE (7.6 ms vs 0.74 ms per
320-window super-step on v5e): per-row (1, W) DMAs dispatch serially,
while XLA's row gather pipelines the same traffic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import PI


def _frac(x):
    return x - jnp.floor(x)


def _kernel(win_ref, rc_ref, rem_ref, ftot_ref, n_ref, out_ref,
            *, offsets, smax, nwin, iq):
    rem = rem_ref[0, 0, 0]
    ftot = ftot_ref[0, 0, 0]
    n = n_ref[0, 0, 0]

    i = jax.lax.broadcasted_iota(jnp.int32, (1, nwin), 1).astype(jnp.float32)
    ph = _frac(_frac(ftot * i) + rem)
    ang = (2.0 * PI) * ph
    cosv = jnp.cos(ang)
    sinv = jnp.sin(ang)
    mask = (i < n.astype(jnp.float32)).astype(jnp.float32)
    if iq:
        wr = win_ref[0, 0, :, 0].reshape(1, nwin)
        wi = win_ref[0, 0, :, 1].reshape(1, nwin)
        wc = (wr * cosv - wi * sinv) * mask
        ws = (wr * sinv + wi * cosv) * mask
    else:
        w = win_ref[0, 0, :].reshape(1, nwin)
        wc = w * cosv * mask
        ws = w * sinv * mask

    # per-tap reductions; scalar results land in SMEM (Mosaic allows
    # scalar stores there, and can't concatenate unaligned slice views)
    for t, o in enumerate(offsets):
        rep = rc_ref[0, 0, smax + o:smax + o + nwin].reshape(1, nwin)
        out_ref[0, 0, 2 * t] = jnp.sum(rep * wc)
        out_ref[0, 0, 2 * t + 1] = jnp.sum(rep * ws)


def correlate_windows_impl(windows, rc, rem, ftot, n, offsets, smax,
                           interpret=False):
    """All-tap correlation for a flattened batch of windows.

    windows: (B, nwin[, 2]) f32 raw samples
    rc:      (B, next) f32 replica rows (next >= nwin + 2*smax)
    rem:     (B,) f32 carrier phase at window start (cycles)
    ftot:    (B,) f32 total carrier rate (cycles/sample)
    n:       (B,) int32 valid samples per window
    Returns (B, 2*ntaps) f32 interleaved [cos_t, sin_t] tap sums —
    cos = real channel, sin = imag channel (ops.correlator convention).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = windows.shape[0]
    nwin = windows.shape[1]
    iq = windows.ndim == 3
    nout = 2 * len(offsets)

    win3 = windows.reshape((B, 1, nwin, 2) if iq else (B, 1, nwin))
    rc3 = rc.reshape(B, 1, rc.shape[1])
    rem2 = rem.reshape(B, 1, 1)
    ftot2 = ftot.reshape(B, 1, 1)
    n2 = n.reshape(B, 1, 1)

    win_spec = pl.BlockSpec(
        (1, 1, nwin, 2) if iq else (1, 1, nwin),
        (lambda b: (b, 0, 0, 0)) if iq else (lambda b: (b, 0, 0)),
        memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel, offsets=tuple(int(o) for o in offsets), smax=int(smax),
        nwin=int(nwin), iq=iq)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1, nout), jnp.float32),
        grid=(B,),
        in_specs=[
            win_spec,
            pl.BlockSpec((1, 1, rc.shape[1]), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, nout), lambda b: (b, 0, 0),
                               memory_space=pltpu.SMEM),
        interpret=interpret,
    )(win3, rc3, rem2, ftot2, n2)
    return out.reshape(B, nout)   # [cos_t, sin_t] interleaved


correlate_windows = jax.jit(
    correlate_windows_impl,
    static_argnames=("offsets", "smax", "interpret"))


# --- multi-window cells: 8 windows per grid step ---------------------------

def _kernel8(win_ref, rc_ref, rem_ref, ftot_ref, n_ref, out_ref,
             *, offsets, smax, nwin, iq):
    i = jax.lax.broadcasted_iota(jnp.int32, (8, nwin), 1).astype(jnp.float32)
    rem = rem_ref[:, :]                   # (8, 1) VMEM column
    ftot = ftot_ref[:, :]
    n = n_ref[:, :]
    ph = _frac(_frac(ftot * i) + rem)
    ang = (2.0 * PI) * ph
    cosv = jnp.cos(ang)
    sinv = jnp.sin(ang)
    mask = (i < n).astype(jnp.float32)
    if iq:
        wr = win_ref[:, :, 0]
        wi = win_ref[:, :, 1]
        wc = (wr * cosv - wi * sinv) * mask
        ws = (wr * sinv + wi * cosv) * mask
    else:
        w = win_ref[:, :]
        wc = w * cosv * mask
        ws = w * sinv * mask
    cols = []
    for t, o in enumerate(offsets):
        rep = rc_ref[:, smax + o:smax + o + nwin]
        cols.append(jnp.sum(rep * wc, axis=1))
        cols.append(jnp.sum(rep * ws, axis=1))
    out_ref[:, :] = jnp.stack(cols, axis=1)


def correlate_windows8_impl(windows, rc, rem, ftot, n, offsets, smax,
                            interpret=False):
    """Like correlate_windows_impl but with 8 windows per grid cell —
    amortizes per-cell dispatch so the kernel stays fast inside a
    sequential scan.  B must be a multiple of 8 (pad with zero-n rows)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = windows.shape[0]
    assert B % 8 == 0, "pad the batch to a multiple of 8"
    nwin = windows.shape[1]
    iq = windows.ndim == 3
    nout = 2 * len(offsets)

    win_spec = pl.BlockSpec(
        (8, nwin, 2) if iq else (8, nwin),
        (lambda b: (b, 0, 0)) if iq else (lambda b: (b, 0)),
        memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel8, offsets=tuple(int(o) for o in offsets), smax=int(smax),
        nwin=int(nwin), iq=iq)
    col = lambda x: x.reshape(B, 1)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, nout), jnp.float32),
        grid=(B // 8,),
        in_specs=[
            win_spec,
            pl.BlockSpec((8, rc.shape[1]), lambda b: (b, 0),
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
        interpret=interpret,
    )(windows, rc, col(rem), col(ftot), col(n.astype(jnp.float32)))


# --- bf16/int8 cells: 16 windows per grid step ------------------------------

def _kernel16(win_ref, rc_ref, rem_ref, ftot_ref, n_ref, out_ref,
              *, offsets, smax, nwin, iq):
    """Like _kernel8 with reduced-precision streams: bf16 windows (exact
    for 8-bit front-end samples), int8 replica rows (the table's native
    dtype), bf16 tap products with f32 accumulation.  Measured relerr vs
    the f32 kernel ~1.3e-3 on the tap sums — far below the reference's
    own 1/32-LUT carrier quantization — and ~0.3 ms less per 320-window
    super-step (half the window stream, quarter the replica stream,
    double the VPU multiply rate)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (16, nwin), 1).astype(jnp.float32)
    rem = rem_ref[:, :]
    ftot = ftot_ref[:, :]
    n = n_ref[:, :]
    ph = _frac(_frac(ftot * i) + rem)
    ang = (2.0 * PI) * ph
    cosv = jnp.cos(ang)
    sinv = jnp.sin(ang)
    mask = (i < n).astype(jnp.float32)
    if iq:
        wr = win_ref[:, :, 0].astype(jnp.float32)
        wi = win_ref[:, :, 1].astype(jnp.float32)
        wc = ((wr * cosv - wi * sinv) * mask).astype(jnp.bfloat16)
        ws = ((wr * sinv + wi * cosv) * mask).astype(jnp.bfloat16)
    else:
        w = win_ref[:, :].astype(jnp.float32)
        wc = (w * cosv * mask).astype(jnp.bfloat16)
        ws = (w * sinv * mask).astype(jnp.bfloat16)
    cols = []
    for t, o in enumerate(offsets):
        rep = rc_ref[:, smax + o:smax + o + nwin].astype(jnp.bfloat16)
        cols.append(jnp.sum((rep * wc).astype(jnp.float32), axis=1))
        cols.append(jnp.sum((rep * ws).astype(jnp.float32), axis=1))
    out_ref[:, :] = jnp.stack(cols, axis=1)


def correlate_windows16_impl(windows, rc, rem, ftot, n, offsets, smax,
                             interpret=False):
    """16-windows-per-cell variant of correlate_windows8_impl taking
    bf16 ``windows`` and int8 ``rc`` (tap math in bf16, accumulate f32).
    B must be a multiple of 16 (pad with zero-n rows)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = windows.shape[0]
    assert B % 16 == 0, "pad the batch to a multiple of 16"
    nwin = windows.shape[1]
    iq = windows.ndim == 3
    nout = 2 * len(offsets)

    win_spec = pl.BlockSpec(
        (16, nwin, 2) if iq else (16, nwin),
        (lambda b: (b, 0, 0)) if iq else (lambda b: (b, 0)),
        memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel16, offsets=tuple(int(o) for o in offsets), smax=int(smax),
        nwin=int(nwin), iq=iq)
    col = lambda x: x.reshape(B, 1)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, nout), jnp.float32),
        grid=(B // 16,),
        in_specs=[
            win_spec,
            pl.BlockSpec((16, rc.shape[1]), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, nout), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(windows, rc, col(rem), col(ftot), col(n.astype(jnp.float32)))
