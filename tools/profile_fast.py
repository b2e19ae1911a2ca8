"""Stage-level timing of the FastTracker super-step on the live device.

Times, per super-step (L=10 code periods x 32 ch @ 16.368 Msps):
  full    - the shipped fast path (geo + row gather + pallas corr + filter)
  xla     - same with the XLA einsum correlator
  nocorr  - geo + filter with correlation outputs zeroed (scan floor)
  gather  - geo + replica row gather only
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_fast.py
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

from gnsslib_tpu import sim
from gnsslib_tpu.constants import CodeType, DType
from gnsslib_tpu.track import TrackConfig, Tracker, FastTracker


def _sync(out):
    # block_until_ready is a NO-OP through the axon relay (measured: an
    # 8192^3 matmul "completes" in 62 us).  device_get of one scalar is
    # the only reliable barrier.
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(jnp.ravel(leaf)[0])


def timeit(fn, *args, reps=6):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / reps


def main():
    f_sf, f_if, C, S = 16.368e6, 4.092e6, 32, 50
    prns = list(range(1, 33))
    cfg = TrackConfig(corrn=6, corrd=3, corrp=6)
    trk = Tracker(cfg, prns, [CodeType.L1CA] * C, f_sf, f_if, DType.REAL)
    fast = FastTracker(trk)
    L, nsamp = fast.L, trk.n_nom
    nsteps = S * L
    block_len = nsteps * nsamp + trk.nwin + 8 * nsteps + 2 * nsamp + 64
    x = sim.synthesize([sim.SimChannel(prn=1, doppler=500.0)], f_sf, f_if,
                       DType.REAL, block_len, noise_std=1.5, seed=3)
    block = jnp.asarray(np.asarray(x, np.float32))

    st = trk.init_state()
    st = trk.start_channels(st, list(range(C)), [0] * C, [0.0] * C)
    for c in range(C):
        st = trk.set_bit_sync(st, c, c % 10)
    carry = jax.device_get(trk._state_to_dict(st))
    carry = jax.device_put(carry)

    consts, fconsts = trk._consts, fast._fconsts

    def run_variant(tag, use_pallas, corr=None):
        fast.use_pallas = use_pallas
        fast.corr = corr or ("pallas" if use_pallas else "xla")

        @functools.partial(jax.jit, static_argnums=4)
        def f(carry, block, consts, fconsts, nsuper):
            return fast.run_steps(carry, block, consts, fconsts, nsuper)
        t0 = time.time()
        o = f(carry, block, consts, fconsts, S)
        jax.block_until_ready(o)
        comp = time.time() - t0
        dt = timeit(f, carry, block, consts, fconsts, S)
        print(f"{tag:8s} {dt/S*1e3:7.3f} ms/step  "
              f"({nsteps*nsamp/dt/1e6:6.1f} Msps)  compile {comp:.1f}s")

    if "--duel" in _sys.argv:
        # VERDICT r3 #5: session-to-session relay variance exceeded the
        # backend deltas in one-shot timings.  Interleave the candidate
        # backends round-robin in ONE session so every round samples the
        # same relay weather, and report per-backend median + spread.
        import collections
        cands = ("diag", "diag2", "fused", "band")
        fns = {}
        for tag in cands:
            fast.use_pallas = False
            fast.corr = tag

            @functools.partial(jax.jit, static_argnums=4)
            def f(carry, block, consts, fconsts, nsuper, _fast=fast):
                return _fast.run_steps(carry, block, consts, fconsts,
                                       nsuper)
            t0 = time.time()
            jax.block_until_ready(f(carry, block, consts, fconsts, S))
            print(f"# compile {tag}: {time.time() - t0:.1f}s",
                  flush=True)
            fns[tag] = f
            # NOTE: fast.corr is read at TRACE time; each jit captured
            # its backend because compile happened inside this loop
        rounds = int(_sys.argv[_sys.argv.index("--duel") + 1]) \
            if _sys.argv.index("--duel") + 1 < len(_sys.argv) \
            and _sys.argv[_sys.argv.index("--duel") + 1].isdigit() else 10
        T = collections.defaultdict(list)
        for r in range(rounds):
            for tag in cands:
                T[tag].append(timeit(fns[tag], carry, block, consts,
                                     fconsts, S, reps=4))
        print(f"\nper-backend over {rounds} interleaved rounds "
              "(ms/super-step):")
        for tag in cands:
            v = np.asarray(T[tag]) / S * 1e3
            ms = float(np.median(v))
            print(f"  {tag:6s} med {ms:6.3f}  min {v.min():6.3f}  "
                  f"max {v.max():6.3f}  iqr {np.percentile(v, 75) - np.percentile(v, 25):6.3f}  "
                  f"-> {nsteps * nsamp / (ms * 1e-3 * S) / 1e6:6.1f} Msps")
        return 0

    run_variant("fused", False, corr="fused")
    run_variant("diag2", False, corr="diag2")
    run_variant("band", False, corr="band")
    run_variant("full", True)
    run_variant("diag", False, corr="diag")
    run_variant("xla", False)

    # scan floor: geo + filter, correlation replaced by zeros
    @functools.partial(jax.jit, static_argnums=4)
    def nocorr(carry, block, consts, fconsts, nsuper):
        def step(st, _):
            geo = jax.vmap(functools.partial(fast._geo_only, block)
                           )(consts, fconsts, st)
            cur_i = jnp.zeros((fast.C, fast.L, cfg.ntaps), jnp.float32)
            cur_q = cur_i

            def one(cc, fcc, stc, geoc, ci_, cq_):
                new, out = fast._filter(cc, fcc, stc, geoc, ci_, cq_)
                act = stc["active"]
                merged = {k: jnp.where(act, new[k], stc[k]) if k in new
                          else stc[k] for k in stc}
                return merged, out
            return jax.vmap(one)(consts, fconsts, st, geo, cur_i, cur_q)
        return jax.lax.scan(step, carry, None, length=nsuper)

    t0 = time.time()
    o = nocorr(carry, block, consts, fconsts, S)
    jax.block_until_ready(o)
    comp = time.time() - t0
    dt = timeit(nocorr, carry, block, consts, fconsts, S)
    print(f"{'nocorr':8s} {dt/S*1e3:7.3f} ms/step  compile {comp:.1f}s")

    # geo + row gather only
    @functools.partial(jax.jit, static_argnums=4)
    def gather(carry, block, consts, fconsts, nsuper):
        block2 = fast._block_rows(block)
        def step(st, _):
            geo = jax.vmap(functools.partial(fast._geo_only, block)
                           )(consts, fconsts, st)
            rc = fast._replica_rows(consts, geo["q_idx"])
            win = fast._fetch_windows(block2,
                                      geo["wstart"].reshape(fast.C * fast.L))
            s = jnp.sum(rc[:, ::997]) + jnp.sum(win[:, ::997])
            st = dict(st, remcarr=st["remcarr"] + 1e-12 * s)
            return st, s
        return jax.lax.scan(step, carry, None, length=nsuper)

    t0 = time.time()
    o = gather(carry, block, consts, fconsts, S)
    jax.block_until_ready(o)
    comp = time.time() - t0
    dt = timeit(gather, carry, block, consts, fconsts, S)
    print(f"{'gather':8s} {dt/S*1e3:7.3f} ms/step  compile {comp:.1f}s")

    # geo + FULL materialization of win and rc (sum-consumed, not elidable)
    @functools.partial(jax.jit, static_argnums=4)
    def mater(carry, block, consts, fconsts, nsuper):
        block2 = fast._block_rows(block)
        def step(st, _):
            geo = jax.vmap(functools.partial(fast._geo_only, block)
                           )(consts, fconsts, st)
            rc = fast._replica_rows(consts, geo["q_idx"])
            win = fast._fetch_windows(block2,
                                      geo["wstart"].reshape(fast.C * fast.L))
            s = jnp.sum(rc) + jnp.sum(win)
            st = dict(st, remcarr=st["remcarr"] + 1e-12 * s)
            return st, s
        return jax.lax.scan(step, carry, None, length=nsuper)

    t0 = time.time()
    o = mater(carry, block, consts, fconsts, S)
    jax.block_until_ready(o)
    comp = time.time() - t0
    dt = timeit(mater, carry, block, consts, fconsts, S)
    print(f"{'mater':8s} {dt/S*1e3:7.3f} ms/step  compile {comp:.1f}s")

    # full pipeline but kernel consumes pre-baked constant win/rc (isolates
    # kernel-in-scan dispatch from the producer side)
    from gnsslib_tpu.ops.pallas_corr import correlate_windows8_impl
    C, L = fast.C, fast.L
    B = C * L
    rng = np.random.default_rng(0)
    winc = jnp.asarray(rng.integers(-8, 8, (B, trk.nwin)).astype(np.float32))
    rcc = jnp.asarray(rng.choice([-1.0, 1.0], (B, trk.next))
                      .astype(np.float32))
    offsets = tuple(int(o) for o in np.asarray(fast.offsets))

    @functools.partial(jax.jit, static_argnums=(4,))
    def kconst(carry, block, consts, fconsts, nsuper):
        def step(st, _):
            geo = jax.vmap(functools.partial(fast._geo_only, block)
                           )(consts, fconsts, st)
            ftot = jnp.broadcast_to(
                (fconsts["fbt"] + st["dcps"])[:, None], (C, L))
            z2 = correlate_windows8_impl(
                winc, rcc,
                geo["rem_k"].reshape(B), ftot.reshape(B),
                geo["n_k"].reshape(B), offsets, fast.smax)
            z2 = z2.reshape(C, L, -1)
            cur_q = z2[..., 0::2]
            cur_i = z2[..., 1::2]

            def one(cc, fcc, stc, geoc, ci_, cq_):
                new, out = fast._filter(cc, fcc, stc, geoc, ci_, cq_)
                act = stc["active"]
                merged = {k: jnp.where(act, new[k], stc[k]) if k in new
                          else stc[k] for k in stc}
                return merged, out
            return jax.vmap(one)(consts, fconsts, st, geo, cur_i, cur_q)
        return jax.lax.scan(step, carry, None, length=nsuper)

    t0 = time.time()
    o = kconst(carry, block, consts, fconsts, S)
    jax.block_until_ready(o)
    comp = time.time() - t0
    dt = timeit(kconst, carry, block, consts, fconsts, S)
    print(f"{'kconst':8s} {dt/S*1e3:7.3f} ms/step  compile {comp:.1f}s")

    # real win, const rc — and the reverse — to split the interface cost
    def mk_half(use_real_win, use_real_rc, tag):
        @functools.partial(jax.jit, static_argnums=(4,))
        def half(carry, block, consts, fconsts, nsuper):
            block2 = fast._block_rows(block)
            def step(st, _):
                geo = jax.vmap(functools.partial(fast._geo_only, block)
                               )(consts, fconsts, st)
                ftot = jnp.broadcast_to(
                    (fconsts["fbt"] + st["dcps"])[:, None], (C, L))
                w = (fast._fetch_windows(block2, geo["wstart"].reshape(B))
                     if use_real_win else winc)
                r = (fast._replica_rows(consts, geo["q_idx"])
                     if use_real_rc else rcc)
                z2 = correlate_windows8_impl(
                    w, r, geo["rem_k"].reshape(B), ftot.reshape(B),
                    geo["n_k"].reshape(B), offsets, fast.smax)
                z2 = z2.reshape(C, L, -1)
                cur_q = z2[..., 0::2]
                cur_i = z2[..., 1::2]

                def one(cc, fcc, stc, geoc, ci_, cq_):
                    new, out = fast._filter(cc, fcc, stc, geoc, ci_, cq_)
                    act = stc["active"]
                    merged = {k: jnp.where(act, new[k], stc[k])
                              if k in new else stc[k] for k in stc}
                    return merged, out
                return jax.vmap(one)(consts, fconsts, st, geo, cur_i, cur_q)
            return jax.lax.scan(step, carry, None, length=nsuper)
        dt = timeit(half, carry, block, consts, fconsts, S)
        print(f"{tag:8s} {dt/S*1e3:7.3f} ms/step")

    mk_half(True, False, "realwin")
    mk_half(False, True, "realrc")



if __name__ == "__main__":
    main()
