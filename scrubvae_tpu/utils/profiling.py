"""Tracing / profiling / numerical-tripwire utilities (SURVEY.md section 5).

The reference's equivalents: line_profiler @profile decorators + wall-clock
epoch timing (trainer.py:23,353) and the always-on autograd anomaly detector
(trainer.py:324). TPU-native: jax.profiler traces viewable in TensorBoard /
Perfetto, a step timer, and an opt-in (off by default - the reference's
always-on detector is a large slowdown) NaN-checking mode.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["trace", "StepTimer", "debug_nans", "device_memory_stats"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/scrubvae_trace"):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step/epoch timing with steady-state rate reporting."""

    def __init__(self):
        self.t0: Optional[float] = None
        self.steps = 0

    def start(self):
        self.t0 = time.perf_counter()
        self.steps = 0

    def tick(self, n: int = 1):
        self.steps += n

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - (self.t0 or time.perf_counter())

    def rate(self, per: int = 1) -> float:
        e = self.elapsed
        return (self.steps * per) / e if e > 0 else 0.0


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Opt-in NaN tripwire (jax_debug_nans). The reference leaves torch's
    anomaly detector always on; here it is scoped and off by default."""
    if not enable:
        yield
        return
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them (TPU does)."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
