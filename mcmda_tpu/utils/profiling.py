"""Profiling / tracing (SURVEY section 5: the rebuild's observability layer).

- ``trace(logdir)``: jax.profiler context producing Perfetto/XProf traces.
- ``StepTimer``: wall-clock per-step timing with jax.block_until_ready
  synchronization, reporting the BASELINE throughput metric
  (slices/sec/chip) over a sliding window.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, batch_size: int, num_devices: int = 1,
                 window: int = 50):
        self.batch = batch_size
        self.ndev = max(1, num_devices)
        self.window = window
        self._t = []

    def tick(self, sync_value=None) -> None:
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        self._t.append(time.perf_counter())
        if len(self._t) > self.window + 1:
            self._t.pop(0)

    @property
    def slices_per_sec_per_chip(self) -> float:
        if len(self._t) < 2:
            return 0.0
        dt = (self._t[-1] - self._t[0]) / (len(self._t) - 1)
        return self.batch / dt / self.ndev
