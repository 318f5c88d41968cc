"""Profiling / tracing helpers.

The reference had no built-in profiling (its author py-spy'ed externally and
printed wall-clock ETAs, SURVEY.md §5). Here:

* trace(): context manager around jax.profiler.trace — produces a TensorBoard
  /perfetto-loadable trace of device execution.
* StepTimer: cheap steady-state step timing with compile-step exclusion, used
  by bench.py-style measurements.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/signaltrain_tpu_trace"):
    """Capture a device trace: `with profiling.trace('dir'): run_steps()`."""
    with jax.profiler.trace(logdir):
        yield
    print(f"profiler trace written to {logdir}")


class StepTimer:
    """Wall-clock per-step timing that skips warmup/compile iterations.

    >>> timer = StepTimer(warmup=5)
    >>> for i in range(100):
    ...     out = step(...)
    ...     timer.tick(out)
    >>> timer.mean_ms
    """

    def __init__(self, warmup: int = 5):
        self.warmup = warmup
        self._count = 0
        self._t0 = None
        self._timed_steps = 0

    def tick(self, result=None):
        self._count += 1
        if self._count == self.warmup:
            if result is not None:
                jax.block_until_ready(result)
            self._t0 = time.perf_counter()
        elif self._count > self.warmup:
            self._timed_steps += 1
            self._last_result = result

    @property
    def mean_ms(self) -> float:
        if self._t0 is None or self._timed_steps == 0:
            return float("nan")
        if getattr(self, "_last_result", None) is not None:
            jax.block_until_ready(self._last_result)
        return (time.perf_counter() - self._t0) / self._timed_steps * 1e3
