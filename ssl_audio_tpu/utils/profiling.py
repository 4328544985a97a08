"""Profiling / tracing utilities (SURVEY.md §5: the reference only has manual
wall-clock splits in tqdm; here we expose jax.profiler traces plus a
low-overhead step timer with named sections)."""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """data/forward/backward-style named wall-clock sections
    (the reference's split at main.py:44-156)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        return " ".join(
            f"{k}={self.totals[k]:.2f}s({self.totals[k]/max(self.counts[k],1)*1e3:.1f}ms/it)"
            for k in self.totals
        )

    def reset(self):
        self.totals.clear()
        self.counts.clear()
