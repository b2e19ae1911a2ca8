"""Code resampling (the reference's rescode, src/sdrcmn.c:597-621).

Nearest-neighbour (floor) resampling of a ±1 ranging code to the sampling
grid, expressed as a single gather so XLA vectorizes it.  Chip indices are
assembled from the host-precomputed exact integer/fractional ramp (see
ops.nco.CodeTables) plus the small per-step residuals, so float32 never
sees a large product.

The extended output covers [-smax, n + smax) sample offsets so every
correlator tap is a static slice of one gather result.
"""
from __future__ import annotations

import jax.numpy as jnp

from .nco import CodeTables


def code_chip_indices(next_: int, remcode, dci, smax: int,
                      tables: CodeTables):
    """Chip index (mod clen) for extended sample positions i-smax.

    chip(i) = floor(remcode + (i - smax)*(ci0 + dci)) mod clen, computed as
    base_int[i] + floor(base_frac[i] + remcode + dci*i - (ci0+dci)*smax).
    """
    i = jnp.arange(next_, dtype=jnp.float32)
    shift = remcode + dci * i - (tables.ci0 + dci) * smax
    corr = jnp.floor(tables.chip_frac[:next_] + shift).astype(jnp.int32)
    idx = tables.chip_int[:next_] + corr
    return jnp.mod(idx, tables.clen)


def resample_code(code, idx):
    """Gather the ±1 code at precomputed chip indices -> float32."""
    return jnp.take(code, idx, axis=-1).astype(jnp.float32)
