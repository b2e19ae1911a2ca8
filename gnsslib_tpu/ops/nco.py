"""Numerically-exact NCO base tables for carrier and code phase.

The tracking loops carry only *small* state (Doppler offsets, sub-chip
remainders).  Every large-magnitude phase ramp — thousands of carrier
cycles or code chips across a millisecond window — is precomputed here on
the host in float64 and stored as:

* carrier: ``base_phase[i] = frac(f_if_effective * ti * i)`` (cycles, f32)
* code:    ``base_chip_int[i] + base_chip_frac[i] = ci0 * i`` (chips,
  int32 + f32)

so the device only ever adds O(1)-magnitude float32 corrections before a
``frac``/``floor``.  This replaces the reference's running accumulators
(mixcarr phase, rescode coff — src/sdrcmn.c:633-668, 608-621) whose
precision came from C doubles.

Per-period whole-block advances (``n`` samples of carrier cycles or code
chips, n ∈ {nominal-2 .. nominal+2}) are likewise precomputed into 5-entry
lookup tables indexed by ``n - n_nominal``.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

# how far one code period's sample count may deviate from nominal
NSPAN = 2  # n ∈ [n_nom - NSPAN, n_nom + NSPAN]


@dataclasses.dataclass(frozen=True)
class CarrierTables:
    """Host-precomputed carrier phase ramps for one channel config.

    f_base is the deterministic part of the mixed carrier (f_if + foffset);
    the device adds only the small residual d = carrfreq - f_base.
    """
    base_phase: jnp.ndarray      # (nwin,) f32, frac(f_base*ti*i) cycles
    adv_cycles: jnp.ndarray      # (2*NSPAN+1,) f32, frac(f_base*ti*(n_nom+k))
    n_nom: int
    ti: float

    @staticmethod
    def build(f_base: float, ti: float, nwin: int, n_nom: int) -> "CarrierTables":
        i = np.arange(nwin, dtype=np.float64)
        base = np.mod(f_base * ti * i, 1.0).astype(np.float32)
        ks = n_nom + np.arange(-NSPAN, NSPAN + 1, dtype=np.float64)
        adv = np.mod(f_base * ti * ks, 1.0).astype(np.float32)
        return CarrierTables(jnp.asarray(base), jnp.asarray(adv), n_nom, ti)


@dataclasses.dataclass(frozen=True)
class CodeTables:
    """Host-precomputed code-phase ramps for one channel config.

    ci0 = crate_nominal * ti (chips/sample).  The device adds the small
    residual dci = (codefreq - crate)*ti and the sub-chip remainder.
    """
    chip_int: jnp.ndarray        # (next,) int32, floor(ci0*i)
    chip_frac: jnp.ndarray       # (next,) f32, ci0*i - floor(ci0*i)
    adv_chips: jnp.ndarray       # (2*NSPAN+1,) f32, ci0*(n_nom+k) - clen
    n_nom: int
    clen: int
    ci0: float
    ti: float

    @staticmethod
    def build(crate: float, ti: float, next_: int, n_nom: int,
              clen: int) -> "CodeTables":
        ci0 = crate * ti
        i = np.arange(next_, dtype=np.float64) * ci0
        ii = np.floor(i)
        ks = n_nom + np.arange(-NSPAN, NSPAN + 1, dtype=np.float64)
        adv = (ci0 * ks - clen).astype(np.float32)
        return CodeTables(
            jnp.asarray(ii.astype(np.int32)),
            jnp.asarray((i - ii).astype(np.float32)),
            jnp.asarray(adv),
            n_nom, clen, ci0, ti,
        )


def frac(x):
    """Fractional part in [0, 1)."""
    return x - jnp.floor(x)


def advance_carrier(remcarr, d_cps, n, tables: CarrierTables):
    """Carrier phase remainder after n samples: frac(rem + f*ti*n).

    d_cps = (carrfreq - f_base) * ti, the small cycles-per-sample residual.
    """
    k = n - tables.n_nom + NSPAN
    big = tables.adv_cycles[k]
    small = frac(d_cps * n.astype(jnp.float32))
    return frac(remcarr + big + small)


def advance_code(remcode, dci, n, tables: CodeTables):
    """Code phase remainder after one period of n samples.

    remcode' = remcode + n*ci - clen, computed as the precomputed exact
    (n*ci0 - clen) plus the small n*dci, so there is no catastrophic
    cancellation between ~clen-sized terms.
    """
    k = n - tables.n_nom + NSPAN
    return remcode + tables.adv_chips[k] + dci * n.astype(jnp.float32)


def period_samples(remcode, dci, tables: CodeTables):
    """Number of samples in the code period starting at phase ``remcode``.

    n = round((clen - remcode)/ci), clamped to the table span.  Rounding
    (vs the reference's floor, src/sdrtrk.c:31) keeps remcode in
    [-ci/2, ci/2] so block boundaries track code boundaries within half a
    sample with no representative-wraparound pathology.
    """
    ci = tables.ci0 + dci
    n = jnp.round((tables.clen - remcode) / ci).astype(jnp.int32)
    return jnp.clip(n, tables.n_nom - NSPAN, tables.n_nom + NSPAN)
