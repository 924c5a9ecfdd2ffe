"""Misc infra utilities (counterpart of reference ttt/infra/utils.py).

- ``set_random_seed``: numpy/python seeding (torch cudnn/tf32 knobs have no
  JAX equivalent; XLA determinism is controlled by PRNG keys).
- ``TimedContext``: wall-clock timing context (reference: infra/utils.py:21-28).
- ``GarbageCollection``: disable automatic GC and collect manually on an
  interval — the same straggler-avoidance trick as the reference
  (infra/utils.py:45-54); relevant here for the host data/feed loop.
- ``get_num_params``.
- ``jax_profiler``: context manager wiring jax.profiler traces (the MFU/
  step-time counterpart is in utils/metrics.py) — the observability the
  reference lacks (SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import gc
import random
import time
from typing import Optional

import numpy as np


def set_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


class TimedContext:
    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.duration = time.perf_counter() - self._start
        return False


class GarbageCollection:
    def __init__(self, gc_freq: int = 50):
        self.gc_freq = max(gc_freq, 1)
        gc.disable()
        gc.collect(1)

    def run(self, step: int) -> None:
        if step % self.gc_freq == 0:
            gc.collect(1)


def get_num_params(params) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


@contextlib.contextmanager
def jax_profiler(log_dir: Optional[str]):
    """Capture a jax.profiler trace (view with TensorBoard / xprof) when a
    directory is given; no-op otherwise."""
    import jax

    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
