"""Import-and-helper smoke for the driver-facing surfaces.

bench.py and __graft_entry__.py are executed by the round driver on the
real TPU; a trivial import error or helper regression there turns into a
red round artifact. These tests pin everything that can be checked
without the device.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent


def _load(name):
    spec = importlib.util.spec_from_file_location(name, ROOT / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_bench_module_imports_and_oracle_runs():
    bench = _load("bench")
    rng = np.random.default_rng(0)
    ids = np.repeat(np.arange(9), 4)
    X_a = rng.normal(size=(36, 12, 6))
    X_b = rng.normal(size=(36, 12, 6))
    M = bench._numpy_oracle_fit(X_a, X_b, ids, ids)
    assert M.shape == (6, 6) and np.isfinite(M).all()


def test_bench_flops_formula_positive_and_scales():
    bench = _load("bench")
    f1 = bench._seq2seq_flops_per_step(1000, 200, 30, 100, 500, 10, 3, 9)
    f2 = bench._seq2seq_flops_per_step(2000, 200, 30, 100, 500, 10, 3, 9)
    assert f1 > 0 and abs(f2 / f1 - 2.0) < 1e-6  # linear in batch
    # order of magnitude: ~2 TFLOP per train step at reference scale
    assert 5e11 < f1 < 5e12


def test_bench_compile_retry_retries_then_raises():
    bench = _load("bench")
    calls = []

    def flaky(x):
        calls.append(x)
        if len(calls) < 2:
            raise RuntimeError("HTTP 500")
        return "ok"

    assert bench._with_compile_retry(flaky, 1, attempts=3, delay=0.0) == "ok"
    assert len(calls) == 2

    def dead(x):
        raise RuntimeError("always")

    try:
        bench._with_compile_retry(dead, 1, attempts=2, delay=0.0)
        raise AssertionError("should have raised")
    except RuntimeError:
        pass


def test_graft_entry_module_imports():
    g = _load("__graft_entry__")
    assert callable(g.entry) and callable(g.dryrun_multichip)
