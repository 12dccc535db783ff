"""Lightweight tracing/profiling utilities.

The reference has no profiling support at all (SURVEY.md §5 — one
commented-out time.time() pair).  This module provides:
- `force_sync(tree)`: true device-completion barrier.  On the axon TPU
  relay, `jax.block_until_ready` returns at *enqueue* time, so wall-clock
  timing requires materializing a scalar;
- `stage_timer`: accumulating context-manager timer with a report;
- `xla_trace`: wrapper around jax.profiler for TensorBoard traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


def force_sync(tree) -> None:
    """Block until every array in `tree` has actually been computed."""
    import jax
    import jax.numpy as jnp

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ravel"):
            float(jnp.asarray(leaf).ravel()[0])


class StageTimer:
    """Accumulates wall-clock per named stage; `report()` prints a table."""

    def __init__(self, sync: bool = False):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def timed(self, name: str, fn, *args, **kwargs):
        t0 = time.time()
        out = fn(*args, **kwargs)
        if self.sync:
            force_sync(out)
        self.totals[name] += time.time() - t0
        self.counts[name] += 1
        return out

    def report(self) -> str:
        lines = [f"{'stage':<28}{'total_s':>10}{'calls':>8}{'ms/call':>10}"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            c = self.counts[name]
            lines.append(f"{name:<28}{total:>10.3f}{c:>8}{total / c * 1000:>10.1f}")
        return "\n".join(lines)


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """TensorBoard-compatible XLA trace of the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
