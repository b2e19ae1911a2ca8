"""Device mesh construction."""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "ch") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices with one named axis
    (the channel axis — the analogue of the reference's thread-per-channel
    fan-out, src/sdrmain.c:144-149)."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if len(devs) < n_devices:
        raise ValueError(f"need {n_devices} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_devices]), (axis,))
