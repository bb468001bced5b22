"""Tracing / profiling hooks.

The reference's instrumentation is MATLAB `profile on` + ad-hoc tic/toc
(mono_slam.m:31,98-118, matching.m:101-110 commented timings). Here:
structured per-stage wall-clock accounting plus an optional XLA-level
trace via jax.profiler (viewable in xprof/tensorboard).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulates wall-clock per named stage; thread-safe enough for the
    online pipeline's producer thread (GIL-serialized appends)."""

    def __init__(self) -> None:
        self._acc: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name].append(time.perf_counter() - t0)

    def add(self, name: str, seconds: float) -> None:
        self._acc[name].append(seconds)

    def summary(self) -> dict[str, dict[str, float]]:
        """{stage: {count, total_s, mean_ms, max_ms}}"""
        out = {}
        for name, xs in self._acc.items():
            n = len(xs)
            out[name] = {
                "count": n,
                "total_s": sum(xs),
                "mean_ms": 1e3 * sum(xs) / max(n, 1),
                "max_ms": 1e3 * max(xs) if xs else 0.0,
            }
        return out

    def report(self) -> str:
        lines = [f"{'stage':<24}{'count':>7}{'mean ms':>10}{'max ms':>10}"
                 f"{'total s':>10}"]
        for name, s in sorted(
            self.summary().items(), key=lambda kv: -kv[1]["total_s"]
        ):
            lines.append(
                f"{name:<24}{s['count']:>7}{s['mean_ms']:>10.2f}"
                f"{s['max_ms']:>10.2f}{s['total_s']:>10.3f}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def xla_trace(log_dir: str | None):
    """Wrap a region in a jax.profiler trace (no-op when log_dir is None).

    The device-level analog of the reference's `profile on/off` pair."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
