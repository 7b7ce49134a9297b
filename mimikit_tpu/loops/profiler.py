"""Profiling hooks — thin surface over the jax profiler.

The reference has no tracing/profiling at all (SURVEY.md §5.1: tqdm + wall
clock only).  Here: a trace context manager writing TensorBoard-compatible
traces, a step timer with percentile reporting, and annotations.
"""
from __future__ import annotations

import time
from contextlib import contextmanager
from typing import List, Optional

__all__ = ["trace", "StepTimer", "annotate"]


@contextmanager
def trace(logdir: str = "/tmp/mimikit_tpu_trace"):
    """Capture a device trace viewable in TensorBoard / xprof."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextmanager
def annotate(name: str):
    """Named region visible in the trace timeline."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock per-step timing with percentile summary.

    Device completion is fenced with a scalar value read
    (:func:`mimikit_tpu.timing.fence`), NOT ``jax.block_until_ready`` —
    through this image's TPU tunnel the latter returns on dispatch and
    would time dispatch latency (a >100x overstatement; see
    ``mimikit_tpu/timing.py``).  The fence's own ~35 ms round-trip can be
    measured once with :func:`mimikit_tpu.timing.read_rtt` and subtracted
    by the caller; for sub-round-trip steps prefer
    :func:`mimikit_tpu.timing.timeit`, which pipelines calls against a
    single fence."""

    def __init__(self, name: str = "step"):
        self.name = name
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def block_and_stop(self, result):
        from ..timing import fence

        fence(result)
        self.times.append(time.perf_counter() - self._t0)
        return result

    def summary(self, drop_first: int = 1) -> dict:
        import numpy as np

        ts = np.asarray(self.times[drop_first:] or self.times)
        return {
            "name": self.name,
            "n": len(ts),
            "mean_ms": float(ts.mean() * 1e3),
            "p50_ms": float(np.percentile(ts, 50) * 1e3),
            "p95_ms": float(np.percentile(ts, 95) * 1e3),
            "max_ms": float(ts.max() * 1e3),
        }

    def report(self, drop_first: int = 1) -> str:
        s = self.summary(drop_first)
        return (
            f"{s['name']}: n={s['n']} mean={s['mean_ms']:.2f}ms "
            f"p50={s['p50_ms']:.2f}ms p95={s['p95_ms']:.2f}ms"
        )
