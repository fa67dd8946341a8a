"""Profiling helpers: jax trace capture + a do_bench-style micro-timer.

Replaces the reference's triton.testing.do_bench harness
(training/omni_attention.py:161-239) and adds the kernel-level tracing the
reference lacks (SURVEY §5.1).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture a jax profiler trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def do_bench(fn: Callable, *args, warmup: int = 2, iters: int = 20,
             quantiles=(0.5, 0.2, 0.8)) -> dict:
    """Median/percentile wall-clock of a jitted function, synchronized by a
    scalar fetch (block_until_ready is unreliable on tunneled backends)."""

    def sync(out):
        leaf = out
        while isinstance(leaf, (tuple, list, dict)):
            leaf = (list(leaf.values()) if isinstance(leaf, dict)
                    else list(leaf))[0]
        np.asarray(leaf).ravel()[:1]

    for _ in range(warmup):
        sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append((time.perf_counter() - t0) * 1000)
    times = np.asarray(times)
    qs = np.quantile(times, quantiles)
    return {"ms": float(qs[0]), "ms_lo": float(qs[1]), "ms_hi": float(qs[2]),
            "all_ms": times.tolist()}
