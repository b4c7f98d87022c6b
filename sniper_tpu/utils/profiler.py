"""Profiling helpers: JAX device traces + host stage timers.

The reference's observability is wall-clock prints (SURVEY.md §5); here
tracing is first-class: ``device_trace`` wraps a block in the JAX
profiler (view in TensorBoard/Perfetto), ``StageTimer`` accumulates named
host-side stage durations with true device sync (np.asarray — NOT
block_until_ready, which returns early through the axon relay).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a JAX profiler trace into log_dir."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree):
    """Force completion of a pytree of device arrays (relay-safe)."""
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "shape"):
            np.asarray(leaf.ravel()[:1] if leaf.size else leaf)
    return tree


class StageTimer:
    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync_tree=None):
        t0 = time.perf_counter()
        yield
        if sync_tree is not None:
            sync(sync_tree)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for k in sorted(self.totals):
            n = self.counts[k]
            lines.append(
                f"{k}: total {self.totals[k]:.3f}s, "
                f"mean {self.totals[k] / max(n, 1) * 1e3:.1f}ms over {n}"
            )
        return "\n".join(lines)
