"""Reductions and interpolation (reference maxvd/meanvd/interp1,
src/sdrcmn.c:396-552), vectorized with masks instead of index loops.

The exclusion band is circular over the code-phase axis (the reference
wraps exinds/exinde modulo nsamp, src/sdracq.c:81-83) and is expressed as a
boolean predicate so the whole acquisition check stays inside jit.
"""
from __future__ import annotations

import jax.numpy as jnp


def exclusion_mask(n: int, lo, hi):
    """True where index is OUTSIDE the circular band [lo, hi].

    Matches the reference's two cases (src/sdrcmn.c:465-469): when
    lo<=hi exclude [lo,hi]; when the band wraps (lo>hi) exclude
    [lo,n)∪[0,hi].
    """
    i = jnp.arange(n, dtype=jnp.int32)
    plain = (i < lo) | (i > hi)
    wrapped = (i < lo) & (i > hi)
    return jnp.where(lo <= hi, plain, wrapped)


def masked_max(x, mask):
    """(max value, argmax) over the last axis restricted to mask."""
    neg = jnp.full_like(x, -jnp.inf)
    xm = jnp.where(mask, x, neg)
    idx = jnp.argmax(xm, axis=-1)
    val = jnp.take_along_axis(xm, idx[..., None], axis=-1)[..., 0]
    return val, idx.astype(jnp.int32)


def masked_mean(x, mask):
    """Mean over the last axis restricted to mask."""
    s = jnp.sum(jnp.where(mask, x, 0.0), axis=-1)
    c = jnp.sum(mask, axis=-1).astype(x.dtype)
    return s / jnp.maximum(c, 1)


def lagrange_interp(x, y, t):
    """Interpolate y(t) through the 4 nearest points of (x, y).

    NumPy/JAX port of the reference's interp1 (src/sdrcmn.c:498-552):
    ascending x assumed; picks a 3-4 point neighbourhood around t and
    evaluates the Lagrange form.  Used for carrier-phase/Doppler epoch
    alignment; small n, runs host-side under NumPy semantics too.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.shape[0]
    # nearest index to t
    k = jnp.clip(jnp.searchsorted(x, t), 2, n - 2)
    idx = k[..., None] + jnp.arange(-2, 2)
    xs = x[idx]
    ys = y[idx]
    t_ = t[..., None] if jnp.ndim(t) else t
    num = t_ - xs
    z = 0.0
    for i in range(4):
        s = ys[..., i]
        for j in range(4):
            if j != i:
                s = s * num[..., j] / (xs[..., i] - xs[..., j])
        z = z + s
    return z
