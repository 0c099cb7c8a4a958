"""Profiling — first-class tracing the reference lacks (SURVEY.md §5:
wall-clock meters only).

  * `trace(dir)` — context manager around jax.profiler for device traces
    viewable in TensorBoard/Perfetto.
  * `PhaseTimer` — named host-side phase accounting (search step phases:
    preprocess / prefill / decode / heads / policy).
  * `device_time` — relay-safe device timing: chains the op and syncs via
    a scalar fetch (block_until_ready can return early through the axon
    relay; see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1)
                for k in self.totals}

    def report(self) -> str:
        lines = [f"{k:24s} {v * 1000:9.2f} ms avg ({self.counts[k]}x)"
                 for k, v in sorted(self.summary().items())]
        return "\n".join(lines)


def device_time(fn: Callable, *args, iters: int = 3) -> float:
    """Median wall seconds per call, synced by a scalar fetch."""
    import jax
    import jax.numpy as jnp

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))

    sync(fn(*args))  # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))
