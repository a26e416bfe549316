"""Step timing + JAX profiler helpers.

The reference's only observability is a tqdm postfix (SURVEY.md §5); here
training/solve loops can be timed per step and traced with the XLA profiler
for TensorBoard.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Callable, Optional

import jax
import numpy as np


class StepTimer:
    """Accumulates wall-clock per step with device synchronization."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: Optional[float] = None

    @staticmethod
    def _sync(result):
        """Force completion with a host copy: jax.block_until_ready is a
        NO-OP on the axon TPU backend (docs/performance.md), and unsynced
        timings report dispatch time, not execution time."""
        if result is None:
            return
        for leaf in jax.tree_util.tree_leaves(result):
            np.asarray(leaf)

    @contextlib.contextmanager
    def step(self, result=None):
        t0 = time.perf_counter()
        yield
        self._sync(result)
        self.times.append(time.perf_counter() - t0)

    def time_fn(self, fn: Callable, *args, warmup: int = 1, reps: int = 10):
        """Median wall-clock of a jitted callable (compiles first)."""
        for _ in range(warmup):
            self._sync(fn(*args))
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            self._sync(out)
            self.times.append(time.perf_counter() - t0)
        return self.summary()

    def summary(self) -> dict:
        if not self.times:
            return {"count": 0}
        return {
            "count": len(self.times),
            "median_s": statistics.median(self.times),
            "mean_s": statistics.fmean(self.times),
            "min_s": min(self.times),
            "max_s": max(self.times),
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
