"""Tracing and per-stage timing — first-class observability.

The reference has no profiling at all (SURVEY.md §5: "none. Only
print(..., flush=True) progress lines"). Here:

- :func:`trace` wraps a block in a ``jax.profiler`` trace, producing a
  TensorBoard-loadable (perfetto) device profile;
- :class:`StageTimer` accumulates named wall-clock stages with device
  synchronization, for quick pipeline breakdowns without a full trace;
- :func:`annotate` adds named regions visible in device profiles
  (``jax.profiler.TraceAnnotation``).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a block onto disk: ``with trace('/tmp/prof'): step(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region in device traces (use as a context manager)."""
    return jax.profiler.TraceAnnotation(name)


def _sync(x=None):
    if x is not None:
        for leaf in jax.tree_util.tree_leaves(x):
            if hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()


class StageTimer:
    """Accumulate wall-clock per named stage.

    NOTE (axon tunnel): block_until_ready can return early over the
    tunnel; pass ``force_host=True`` to synchronize with a tiny host read
    when timing remote devices.
    """

    def __init__(self, force_host: bool = False):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.force_host = force_host

    @contextlib.contextmanager
    def stage(self, name: str, result_ref: list | None = None):
        t0 = time.perf_counter()
        yield
        if result_ref:
            _sync(result_ref[0])
            if self.force_host:
                leaf = jax.tree_util.tree_leaves(result_ref[0])[0]
                np.asarray(leaf.ravel()[0])
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"{name}: total {total:.3f}s, n={n}, mean {total / n * 1e3:.2f}ms"
            )
        return "\n".join(lines)
