"""Diagnostics: spectrum analyzer, histogram, tracking logs.

Reference: src/sdrspec.c (live IF spectrum + sample histogram) and the
per-channel CSV tracking logs (src/sdrout.c:386-457).  Rendering is
data-first: spectra/histograms are returned as arrays (plot with any
tool); CSV logs match the reference column layout.
"""
from .monitor import SpecFrame, SpectrumMonitor
from .spectrum import sample_histogram, welch_spectrum
from .tracklog import TrackLogger

__all__ = ["sample_histogram", "welch_spectrum", "TrackLogger",
           "SpecFrame", "SpectrumMonitor"]
