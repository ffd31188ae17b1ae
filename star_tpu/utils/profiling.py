"""Tracing/profiling helpers (the reference has none — SURVEY.md §5).

* trace(dir): context manager around jax.profiler.trace — produces a
  TensorBoard-loadable trace of device ops.
* annotate(name): TraceAnnotation for named regions inside jitted code paths
  (shows up in the trace timeline).
* StepTimer: host-side wall-clock stats with proper device sync (the axon
  tunnel makes block_until_ready unreliable right after compile; syncing via
  a scalar device_get is the robust pattern — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def sync(x) -> None:
    """Force completion of `x` with a host readback of one scalar."""
    leaf = jax.tree.leaves(x)[0]
    _ = jax.device_get(leaf.ravel()[0])


class StepTimer:
    def __init__(self):
        self.times: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def measure(self, name: str, result_ref=None):
        t0 = time.time()
        yield
        self.times.setdefault(name, []).append(time.time() - t0)

    def timed(self, name: str, fn, *args, warmup: int = 2, iters: int = 5):
        out = None
        for _ in range(warmup):
            out = fn(*args)
            sync(out)
        for _ in range(iters):
            t0 = time.time()
            out = fn(*args)
            sync(out)
            self.times.setdefault(name, []).append(time.time() - t0)
        return out

    def summary(self) -> Dict[str, float]:
        return {k: float(np.median(v)) for k, v in self.times.items()}
