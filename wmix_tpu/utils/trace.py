"""Tracing / profiling instrumentation (SURVEY §5 tracing row).

The reference's observability is printf-level (wmix debug flag); the
TPU rebuild's equivalent is structured:

- `profile(logdir)`: a context manager around `jax.profiler.trace` —
  captures a TensorBoard/XProf trace (XLA compilation, device kernels,
  host transfers) for everything run inside it.
- `annotate(name)`: a `jax.profiler.TraceAnnotation` wrapper so host
  phases (planning, codec work, shm IO) show up as named spans inside
  the device trace.
- `StepTimer`: cheap per-step wall-time accounting for the engine's
  real-time loop — records chunk dispatch latencies and summarizes
  p50/p95/max against the real-time budget.  Enabled in the engine via
  WMIX_TRACE_STEPS=1 (zero overhead otherwise).

Env vars:
  WMIX_TRACE=<logdir>    capture a jax profiler trace for the process
                         lifetime (daemon: around the service loop)
  WMIX_TRACE_STEPS=1     enable StepTimer accounting in engine chains
"""
from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass, field
from typing import List, Optional


def steps_enabled() -> bool:
    return os.environ.get("WMIX_TRACE_STEPS", "") not in ("", "0")


@contextlib.contextmanager
def profile(logdir: str):
    """Capture a jax.profiler trace into `logdir` (view with
    TensorBoard's profile plugin or xprof)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named span inside the device trace; no-op cost when no trace is
    being captured."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


@dataclass
class StepTimer:
    """Wall-time accounting for a real-time step loop.

    >>> t = StepTimer(budget_ms=20.0)
    >>> with t.step():         # per engine chunk
    ...     run_chunk(...)
    >>> t.summary()            # {'n': ..., 'p50_ms': ..., ...}
    """
    budget_ms: Optional[float] = None
    samples: List[float] = field(default_factory=list)
    overruns: int = 0

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = (time.perf_counter() - t0) * 1e3
            self.samples.append(dt)
            if self.budget_ms is not None and dt > self.budget_ms:
                self.overruns += 1

    def summary(self) -> dict:
        if not self.samples:
            return {"n": 0}
        s = sorted(self.samples)
        n = len(s)
        out = {
            "n": n,
            "p50_ms": round(s[n // 2], 3),
            "p95_ms": round(s[min(n - 1, int(n * 0.95))], 3),
            "max_ms": round(s[-1], 3),
            "mean_ms": round(sum(s) / n, 3),
        }
        if self.budget_ms is not None:
            out["budget_ms"] = self.budget_ms
            out["overruns"] = self.overruns
        return out

    def reset(self):
        self.samples.clear()
        self.overruns = 0
