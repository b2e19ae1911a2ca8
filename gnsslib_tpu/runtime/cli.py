"""erlang-gnss-tpu command line — the reference `erlang-gnss` CLI
(src/sdrmain.c:70-103) for post-processing file replay.

Usage:
    python -m gnsslib_tpu <config.ini> [--seconds N] [--nsteps N] [--quiet]
"""
from __future__ import annotations

import argparse
import os
import sys

from ..io.frontend import FileFrontend
from .config import load_ini
from .receiver import Receiver


def _honor_jax_platforms() -> None:
    """Make JAX_PLATFORMS from the environment authoritative.

    Some PJRT plugins (the axon TPU tunnel) register themselves via
    sitecustomize and override the env var; a user running with
    JAX_PLATFORMS=cpu would silently get the TPU.  Re-assert the user's
    choice through jax.config."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            import jax
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass


def main(argv=None) -> int:
    _honor_jax_platforms()
    ap = argparse.ArgumentParser(
        prog="erlang-gnss-tpu",
        description="TPU-native GNSS SDR receiver (file replay)")
    ap.add_argument("config", help="gnss-sdrcli-style INI file")
    ap.add_argument("--seconds", type=float, default=None,
                    help="limit processing to the first N stream seconds")
    ap.add_argument("--nsteps", type=int, default=400,
                    help="code periods per device block")
    ap.add_argument("--ftype", type=int, default=1,
                    help="front-end RF path to process (1 or 2)")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)

    cfg = load_ini(args.config)
    if not cfg.fends:
        print("error: config has no front end ([FEND] missing?)",
              file=sys.stderr)
        return 1
    path = cfg.files[args.ftype - 1] if len(cfg.files) >= args.ftype else ""
    if not path:
        print("error: no IF file configured (FILE1/FILE2)", file=sys.stderr)
        return 1
    spec = cfg.fends[args.ftype - 1]
    fe = FileFrontend(path, spec)
    rx = Receiver(cfg, fe, ftype=args.ftype, nsteps_per_block=args.nsteps)
    if not args.quiet:
        print(f"erlang-gnss-tpu: {len(rx.channels)} channels, "
              f"f_sf={spec.f_sf/1e6:.3f} MHz, f_if={spec.f_if/1e6:.3f} MHz, "
              f"{fe.nsamples/spec.f_sf:.1f} s of IF data")

    def progress(t):
        if not args.quiet:
            locked = sum(ch.locked for ch in rx.channels)
            dec = sum(ch.nav.flagdec for ch in rx.channels)
            print(f"\r  t={t:7.1f}s locked={locked} decoded={dec} "
                  f"epochs={rx.epochs_written}", end="", flush=True)

    stats = rx.run_seconds(args.seconds, progress=progress)
    if not args.quiet:
        print()
        for ev in rx.events:
            print("  event:", ev)
        print(f"done: {stats['seconds']:.1f} s in {stats['wall']:.1f} s "
              f"({stats['msps']:.2f} Msamples/s); locked PRNs "
              f"{stats['locked']}, decoded {stats['decoded']}, "
              f"{stats['epochs']} obs epochs, {stats['ephs']} eph records")
        if rx.obs_writer:
            print(f"rinex obs: {rx.obs_writer.path}")
            print(f"rinex nav: {rx.nav_writer.path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
