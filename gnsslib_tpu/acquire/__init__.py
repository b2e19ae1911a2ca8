"""FFT-parallel acquisition (the reference's src/sdracq.c, batched).

The reference loops 71 Doppler bins serially per channel thread inside
``pcorrelator``; here the whole (channel × Doppler × code-phase) grid is
one jit program: shared-window carrier mixing, batched power-of-two FFT
correlation, non-coherent integration over rounds, and the peak-ratio /
C/N0 acceptance test as masked reductions — shardable over channels and
Doppler with ``shard_map`` (see gnsslib_tpu.parallel).
"""
from .search import Acquirer, AcqResult  # noqa: F401
