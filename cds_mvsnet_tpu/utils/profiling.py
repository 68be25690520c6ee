"""Profiling/tracing helpers (SURVEY §5.1 — the reference only wall-clocks).

Wraps jax.profiler so pipelines can drop a TensorBoard-compatible device
trace with one context manager, plus a simple section timer whose sync
strategy works under remote-TPU relays (host transfer, not block_until_ready).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import numpy as np

__all__ = ["device_trace", "SectionTimer", "sync"]


def sync(tree) -> None:
    """Reliable device barrier: pull one scalar per leaf group to the host
    (block_until_ready alone does not flush remote-relay execution)."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(jax.device_get(leaves[0].ravel()[0]))


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace into ``logdir`` (view with TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SectionTimer:
    """Accumulating wall-clock timer for named pipeline sections."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            sync(result)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            k: {"total_s": v, "mean_s": v / max(self.counts[k], 1), "n": self.counts[k]}
            for k, v in self.totals.items()
        }
