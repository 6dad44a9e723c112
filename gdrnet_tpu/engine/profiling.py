"""Profiling hooks: JAX profiler traces + compute/process timing split.

The reference has no profiler integration — only manual perf_counter splits
in the inference driver (gdrn_evaluator.py:545-624; SURVEY.md §5 "Tracing").
Here: `trace(logdir)` context wraps any region in a jax.profiler trace
(viewable in TensorBoard/XProf/Perfetto), and `StepTimer` reproduces the
reference's warmup-aware compute-vs-process split.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str | None):
    """jax.profiler trace context; no-op when logdir is falsy."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the XProf timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Warmup-aware split timing (gdrn_evaluator.py:545-624 semantics):
    per-step durations accumulate into named buckets, skipping the first
    `warmup` steps; report() gives per-step means."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.totals: dict[str, float] = {}
        self.count = 0
        self._t0: float | None = None
        self._bucket: str | None = None

    def start(self, bucket: str) -> None:
        self._t0 = time.perf_counter()
        self._bucket = bucket

    def stop(self) -> None:
        assert self._t0 is not None and self._bucket is not None
        if self.count >= self.warmup:
            self.totals[self._bucket] = (self.totals.get(self._bucket, 0.0)
                                         + time.perf_counter() - self._t0)
        self._t0 = None

    def step_done(self) -> None:
        self.count += 1

    def report(self) -> dict[str, float]:
        n = max(self.count - self.warmup, 1)
        return {f"{k}_s_per_step": v / n for k, v in self.totals.items()}
