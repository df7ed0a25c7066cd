"""Profiling & observability: step timing, throughput counters, traces.

The reference has no instrumentation beyond a per-epoch verbose println
(SURVEY.md §5, /root/reference/src/Flows.jl:437). This subsystem is the
TPU-native addition: wall-clock step timers that force device completion,
samples/s/chip counters normalized by the local device count, and a thin
wrapper over the JAX profiler for XLA-level traces viewable in
TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any

import jax
import numpy as np

__all__ = ["StepTimer", "Throughput", "trace", "annotate", "device_count"]


def device_count() -> int:
    """Local addressable device count (chips on this host)."""
    return jax.local_device_count()


@dataclasses.dataclass
class StepTimer:
    """Wall-clock timer that blocks on device completion.

    >>> timer = StepTimer()
    >>> with timer.step(result_pytree):  # doctest: +SKIP
    ...     ...
    >>> timer.mean_ms  # doctest: +SKIP
    """

    times: list = dataclasses.field(default_factory=list)
    _t0: float = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, block_on: Any = None) -> float:
        """Stop the timer; ``block_on`` (a pytree of arrays) is waited on
        first so async dispatch doesn't fake the number."""
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @contextlib.contextmanager
    def step(self, block_on: Any = None):
        self.start()
        yield
        self.stop(block_on)

    @property
    def mean_ms(self) -> float:
        return 1e3 * float(np.mean(self.times)) if self.times else 0.0

    @property
    def p50_ms(self) -> float:
        return 1e3 * float(np.percentile(self.times, 50)) if self.times else 0.0

    @property
    def p99_ms(self) -> float:
        return 1e3 * float(np.percentile(self.times, 99)) if self.times else 0.0


@dataclasses.dataclass
class Throughput:
    """samples/s (/chip) counter fed by (count, seconds) pairs."""

    total_items: int = 0
    total_seconds: float = 0.0

    def add(self, items: int, seconds: float) -> None:
        self.total_items += int(items)
        self.total_seconds += float(seconds)

    @property
    def per_sec(self) -> float:
        return self.total_items / self.total_seconds if self.total_seconds else 0.0

    @property
    def per_sec_per_chip(self) -> float:
        return self.per_sec / max(1, device_count())


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA profiler trace (view in TensorBoard / Perfetto).

    >>> with trace('/tmp/jax-trace'):  # doctest: +SKIP
    ...     train(flow, data, epochs=1)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)
