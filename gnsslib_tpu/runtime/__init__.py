"""Receiver runtime: configuration, orchestration, CLI.

Reference: src/sdrinit.c (INI config), src/sdrmain.c (thread orchestration).
The pthread fan-out becomes one block-streamed pipeline: load IF block ->
device acquisition/tracking programs -> host nav/observables/output.
"""
from .config import ReceiverConfig, ChannelConfig, load_ini
from .receiver import (DualReceiver, MultiReceiver, OutputHub,
                       Receiver, build_receiver)

__all__ = ["ReceiverConfig", "ChannelConfig", "load_ini", "Receiver",
           "DualReceiver", "MultiReceiver", "OutputHub", "build_receiver"]
