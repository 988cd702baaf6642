"""Tracing / profiling utilities (SURVEY §5.1).

The reference only hand-rolls wall-clock timers; here the first-class
tools are jax.profiler traces plus throughput counters:

* ``trace(logdir)``: context manager around jax.profiler for TensorBoard
  /Perfetto traces of the jitted steps;
* ``Throughput``: slices/sec & steps/sec accumulator (the BASELINE
  north-star counter), tunnel-safe (reads device scalars only on report);
* ``time_fn``: median-of-k timing of a jitted callable, fenced with a
  jax.device_get of the result (block_until_ready does NOT fence on the
  axon dev tunnel — see CLAUDE.md; for chip-rate numbers prefer a
  single-dispatch in-graph fori_loop sweep like bench.py's).
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
        self.warmup_steps = max(1, warmup_steps)  # 0 would never start the clock
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
    """Median wall time of a jitted fn (seconds), fenced per call.

    Fences with jax.device_get (block_until_ready does not fence through
    the axon dev tunnel). Per-call timings still include the dispatch
    RPC there — use an in-graph fori_loop sweep for chip-rate numbers.
    """
    import jax

    times = []
    for i in range(warmup + iters):
        t0 = time.time()
        jax.device_get(fn(*args))
        if i >= warmup:
            times.append(time.time() - t0)
    times.sort()
    return times[len(times) // 2]
