"""Profiling and debug-mode utilities.

The reference has no tracing/profiling beyond ad-hoc prints (SURVEY §5).
Here:

- `trace(path)`: context manager around jax.profiler traces (view in
  TensorBoard / xprof).
- `timed(fn)`: wall-clock timing harness that CHAINS iterations through the
  device (this platform's block_until_ready does not wait for independent
  dispatches — see bench.py) — pass a self-composable fn.
- `stage_timer`: per-stage wall-clock dict for pipeline breakdowns.
- `checked(fn)`: jax.checkify wrapper surfacing NaN/OOB inside jitted graphs
  (the debug-build sanitizer equivalent).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, x0, iters: int = 10, warmup: int = 1):
    """Honest per-iteration wall time for a self-composable fn(x)->x."""
    x = x0
    for _ in range(warmup):
        x = fn(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters


class stage_timer:
    """with stage_timer() as t:  ...  t.stage('decode'); ...  t.stage('warp')"""

    def __init__(self):
        self.times: Dict[str, float] = {}
        self._last = None
        self._name = None

    def __enter__(self):
        self._last = time.perf_counter()
        return self

    def stage(self, name: str, block_on=None):
        if block_on is not None:
            jax.block_until_ready(block_on)
        now = time.perf_counter()
        self.times[name] = self.times.get(name, 0.0) + (now - self._last)
        self._last = now

    def __exit__(self, *exc):
        return False


def checked(fn: Callable, *, errors=None):
    """Wrap a jittable fn with checkify NaN/div/OOB checks.  Returns a fn that
    raises on the first error with location info (debug builds only — adds
    overhead)."""
    from jax.experimental import checkify

    errors = errors or (
        checkify.float_checks | checkify.index_checks | checkify.div_checks
    )
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper
