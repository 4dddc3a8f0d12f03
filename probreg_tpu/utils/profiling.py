"""Tracing / profiling utilities (SURVEY.md §5).

The reference has no built-in tracing — timing lives in an example script
(examples/time_measurement.py). Here:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of the XLA programs.
* :class:`IterationTimer` — a registration callback that timestamps every
  EM iteration (host-loop paths) or registration call.
* :func:`time_fn` — steady-state timing of a jitted callable with proper
  device synchronization.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, List

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Profile everything inside the block to ``logdir`` (TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class IterationTimer:
    """Registration callback recording wall-clock per EM iteration.

    Usage::

        timer = IterationTimer()
        cpd.registration_cpd(src, tgt, callbacks=[timer])
        print(timer.laps)
    """

    def __init__(self):
        self.laps: List[float] = []
        self._last = time.perf_counter()

    def __call__(self, _transformation) -> None:
        now = time.perf_counter()
        self.laps.append(now - self._last)
        self._last = now

    @property
    def total(self) -> float:
        return sum(self.laps)


def time_fn(fn: Callable, *args, n_warmup: int = 1, n_iter: int = 10,
            **kwargs) -> float:
    """Median steady-state seconds per call, blocking on outputs."""
    for _ in range(n_warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
