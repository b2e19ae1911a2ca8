"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The shell environment pins JAX_PLATFORMS=axon (the real TPU tunnel); tests
must run on CPU with 8 virtual devices, and the axon plugin overrides the
env var, so we also force the platform through jax.config after import.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
