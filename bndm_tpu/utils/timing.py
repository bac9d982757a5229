"""Timing/profiling utilities.

Replaces the reference's manual ``time.time()`` brackets
(iadb_bn.py:302,318-321,774-779) with device-synchronized timing
(``block_until_ready``) and optional ``jax.profiler`` trace capture; reports
the mean excluding warmup, like the reference (iadb_bn.py:378).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


class Timer:
    """Collects per-call wall times; mean excludes the first (warmup) call."""

    def __init__(self, name=""):
        self.name = name
        self.times = []

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    @property
    def mean(self):
        if len(self.times) <= 1:
            return float(np.mean(self.times)) if self.times else float("nan")
        return float(np.mean(self.times[1:]))

    @property
    def total(self):
        return float(np.sum(self.times))


def timed_call(fn, *args, iters=10, warmup=2, **kwargs):
    """Device-synchronized benchmark of ``fn``; returns (mean_s, out)."""
    out = None
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args, **kwargs))
    return (time.perf_counter() - t0) / iters, out


@contextlib.contextmanager
def profile_trace(logdir):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
