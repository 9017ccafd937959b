"""Wall-clock timing helpers for benchmarking jitted functions."""

from __future__ import annotations

import time

import jax
import numpy as np


class Timer:
    """Context-managed wall clock timer (seconds)."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        return False


def _block(tree):
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def median_ms(fn, *args, warmup: int = 2, iters: int = 20) -> float:
    """Median latency in ms of ``fn(*args)`` with device synchronization.

    CAVEAT (axon tunnel): block_until_ready may return before remote
    execution finishes; for tunneled devices measure throughput amortized
    over queued executions with one tiny host read instead (see bench.py).
    """
    for _ in range(warmup):
        _block(fn(*args))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _block(fn(*args))
        samples.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(samples))
