"""Profiling and timing utilities.

The reference has only ad-hoc stderr timing prints (SURVEY.md §5). Here:
  * `trace(logdir)` — context manager around `jax.profiler.trace` for
    capturing TensorBoard-viewable TPU traces of fit/predict phases;
  * `timed(fn, *args)` — wall-clock with a host-fetch sync (required on
    backends where `block_until_ready` is a no-op, e.g. the axon relay);
  * named scopes are applied at the hot phases in models/gp.py so traces
    show kernel-build / factorize / solve segments.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Tuple

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace; view with TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(out: Any) -> None:
    """Block until `out` is computed, via a tiny device->host fetch."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = tuple(slice(0, 1) for _ in range(getattr(leaf, "ndim", 0)))
    np.asarray(jax.device_get(leaf[idx] if idx else leaf))


def timed(fn: Callable, *args, reps: int = 3, warmup: int = 1) -> Tuple[float, Any]:
    """(best wall-clock seconds, last output); compiles excluded by warmup."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
        sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out
