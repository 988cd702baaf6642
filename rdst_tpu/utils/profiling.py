"""Tracing / profiling utilities (SURVEY §5.1).

The reference only hand-rolls wall-clock timers; here the first-class
tools are jax.profiler traces plus throughput counters:

* ``trace(logdir)``: context manager around jax.profiler for TensorBoard
  /Perfetto traces of the jitted steps;
* ``Throughput``: slices/sec & steps/sec accumulator (the BASELINE
  north-star counter), tunnel-safe (reads device scalars only on report);
* ``time_fn``: median-of-k timing of a jitted callable with
  block_until_ready fencing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable


@contextlib.contextmanager
def trace(logdir: str = "/tmp/rdst_tpu_trace"):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """slices/sec & steps/sec counter with warmup exclusion."""

    def __init__(self, warmup_steps: int = 1):
        self.warmup_steps = warmup_steps
        self.steps = 0
        self.items = 0
        self._t0 = None

    def step(self, n_items: int = 1):
        self.steps += 1
        if self.steps == self.warmup_steps:
            self._t0 = time.time()
            self.items = 0
        elif self.steps > self.warmup_steps:
            self.items += n_items

    @property
    def elapsed(self) -> float:
        return time.time() - self._t0 if self._t0 else 0.0

    def report(self) -> dict:
        el = max(self.elapsed, 1e-9)
        return {
            "steps": self.steps,
            "items_per_sec": self.items / el,
            "steps_per_sec": max(self.steps - self.warmup_steps, 0) / el,
        }


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median wall time of a jitted fn (seconds), fenced per call."""
    import jax

    times = []
    for i in range(warmup + iters):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        if i >= warmup:
            times.append(time.time() - t0)
    times.sort()
    return times[len(times) // 2]
