"""Carrier wipe-off (the reference's mixcarr, src/sdrcmn.c:622-668).

The reference multiplies int8 samples by a 32-entry int16 sin/cos LUT
(1/32-LSB quantization).  Here: an exact complex rotator
``data * exp(-2πj·phase)`` evaluated on the VPU, with the phase ramp
assembled from a host-precomputed f64-exact base table plus small f32
residuals (see ops.nco).  Fuses with downstream correlation under jit.
"""
from __future__ import annotations

import jax.numpy as jnp

from .nco import CarrierTables, frac

TWO_PI = 6.283185307179586


def carrier_phase(nwin: int, d_cps, remcarr, tables: CarrierTables):
    """Phase ramp (cycles mod 1) for a window of nwin samples.

    phase[i] = frac(base[i] + d_cps*i + remcarr); d_cps is the small
    cycles-per-sample residual (carrfreq - f_base)*ti.
    """
    i = jnp.arange(nwin, dtype=jnp.float32)
    return frac(tables.base_phase[:nwin] + frac(d_cps * i) + remcarr)


def mix_carrier(data, phase_cycles):
    """Wipe the local carrier off ``data``: data * exp(+2πj*phase).

    data: (n,) float32 (real sampling) or complex64 (I/Q sampling).
    Returns complex64.  The rotation sense matches the reference
    (I = cos·dI - sin·dQ, Q = sin·dI + cos·dQ = e^{+jφ}·d,
    src/sdrcmn.c:652-664); correspondingly Doppler is reported as
    D = -(carrfreq - f_if - foffset), the reference's sign convention
    (src/sdrtrk.c:177).
    """
    ph = TWO_PI * phase_cycles
    rot = jnp.cos(ph) + 1j * jnp.sin(ph)
    return (data * rot).astype(jnp.complex64)
