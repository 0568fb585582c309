"""Timing utilities.

Reference ``src/stop_watch.{hpp,cpp}``: ``ScopeWatch`` (RAII wall-clock
scope with a CUDA sync) and ``Timer``. The device-sync analogue here is
``jax.block_until_ready`` on a sentinel — plus ``value_fetch`` timing
for environments (like the axon TPU tunnel) where block_until_ready
does not actually block; fetching a scalar always does.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


class Timer:
    """Reference Timer (stop_watch.hpp:22-35)."""

    def __init__(self):
        self._t0 = time.monotonic()

    def start(self) -> None:
        self._t0 = time.monotonic()

    def elapsed_seconds(self) -> float:
        return time.monotonic() - self._t0


@contextlib.contextmanager
def scope_watch(name: str, sync_on=None, printer=print):
    """RAII-style timing scope (reference ScopeWatch, stop_watch.cpp:11-25).

    Args:
      name: scope label.
      sync_on: optional array/pytree; its values are fetched before the
        stop so device work inside the scope is included.
    """
    t0 = time.monotonic()
    try:
        yield
    finally:
        if sync_on is not None:
            device_sync(sync_on)
        printer(f"[{name}] {time.monotonic() - t0:.4f} s")


def device_sync(x) -> None:
    """Force completion of device work producing x (value fetch — see
    module docstring for why block_until_ready is not enough)."""
    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(jax.device_get(leaves[0])).ravel()[:1]


class StepTimer:
    """Per-step EMA timer for training loops; negligible overhead, syncs
    only when asked."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema: float | None = None
        self._t0: float | None = None

    def tic(self) -> None:
        self._t0 = time.monotonic()

    def toc(self) -> float:
        dt = time.monotonic() - (self._t0 or time.monotonic())
        self.ema = dt if self.ema is None else (
            self.alpha * dt + (1 - self.alpha) * self.ema)
        return dt
