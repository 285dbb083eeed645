"""Tracing / profiling utilities (SURVEY.md section 5.1: the reference has
only a tqdm bar; this is the structured replacement)."""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulating wall-clock timer for named pipeline stages.

    >>> timer = StageTimer()
    >>> with timer("detector"):
    ...     out = step(x); jax.block_until_ready(out)
    >>> timer.summary()
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "calls": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / max(1, self.counts[name]), 3),
            }
            for name in sorted(self.totals, key=self.totals.get, reverse=True)
        }

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace scope; view with TensorBoard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block(tree):
    """block_until_ready on an arbitrary pytree (timing helper)."""
    return jax.block_until_ready(tree)
