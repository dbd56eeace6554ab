"""Per-stage step timing and JAX profiler traces.

The reference has no profiler (SURVEY.md §5); TPU-side the right tools are
per-stage wall timing on host and ``jax.profiler`` traces viewable in
TensorBoard/XProf. ``StepTimer`` accumulates named stage durations;
``profile_trace`` context-manages a jax profiler trace directory.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StepTimer:
    """Accumulate wall time per named stage.

    with timer("decode"): ...
    timer.summary() -> {"decode": {"total_s": ..., "count": ..., "mean_ms": ...}}
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, stage: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[stage] += dt
            self.counts[stage] += 1

    def add(self, stage: str, seconds: float) -> None:
        self.totals[stage] += seconds
        self.counts[stage] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for k, total in self.totals.items():
            n = max(1, self.counts[k])
            out[k] = {"total_s": round(total, 4), "count": self.counts[k],
                      "mean_ms": round(total / n * 1000, 3)}
        return out

    def report(self) -> str:
        rows = sorted(self.summary().items(),
                      key=lambda kv: -kv[1]["total_s"])
        return "\n".join(
            f"{k:24s} {v['total_s']:9.3f}s  n={v['count']:<6d} "
            f"mean={v['mean_ms']:.2f}ms" for k, v in rows)


class _NullTimer:
    """No-op StepTimer stand-in so hot loops can time unconditionally."""

    @contextlib.contextmanager
    def __call__(self, stage: str) -> Iterator[None]:
        yield

    def add(self, stage: str, seconds: float) -> None:
        pass

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {}

    def report(self) -> str:
        return ""


NULL_TIMER = _NullTimer()


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace scope; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
