"""Tracing / profiling.

The reference has no tracing beyond per-step second counters
(SURVEY.md section 5.1: AverageMeter("Time"/"Data"), a gitignored
chrome_trace/ dir). Here: jax.profiler integration — on-demand trace
capture to TensorBoard format, an optional live profiler server, and
annotated step scopes — plus the same coarse per-step meters
(train/metrics.py)."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


def start_profiler_server(port: int = 9999) -> None:
    """Live capture endpoint (connect with TensorBoard's profile tab)."""
    jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto: bool = False) -> Iterator[None]:
    """Capture a device trace for the enclosed block:

        with trace("runs/exp/trace"):
            state, _ = train_step(...)
            jax.block_until_ready(state)
    """
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir,
                             create_perfetto_trace=create_perfetto)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope visible in traces (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Per-step wall timing with device sync via host readback (the axon
    tunnel's block_until_ready is unreliable; see bench.py)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.steps = 0
        self.total = 0.0

    def tick(self, sync_value=None) -> float:
        if sync_value is not None:
            import numpy as np

            float(np.asarray(sync_value).sum())
        now = time.perf_counter()
        dt = now - self.t0
        self.t0 = now
        self.steps += 1
        self.total += dt
        return dt

    @property
    def mean(self) -> float:
        return self.total / max(self.steps, 1)
