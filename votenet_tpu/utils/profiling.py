"""Profiling / tracing utilities.

The reference has no profiler integration — only manual wall-clock loops in
op ``__main__`` blocks (SURVEY §5). Here: a context manager around
``jax.profiler`` traces, a robust device timer (the axon tunnel's
``block_until_ready`` returns early, so completion is forced by fetching a
leaf), and annotation helpers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import numpy as np


def sync(tree):
    """Force completion of a pytree of device arrays (tunnel-safe)."""
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(leaves[0].ravel()[:1])
    return tree


def device_timeit(fn, iters: int = 10, warmup: int = 2) -> float:
    """Average seconds per call; dispatches async, syncs once at the end."""
    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace context; view with tensorboard/xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = None
try:
    import jax.profiler as _jp

    annotate = _jp.TraceAnnotation
except Exception:  # pragma: no cover
    pass
