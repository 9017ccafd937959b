"""Test configuration: force a virtual 8-device CPU mesh and float64.

Must run before jax is imported anywhere. Real-TPU behavior is exercised by
bench.py and __graft_entry__.py (driver-run); unit tests validate numerics
against float64 numpy/scipy/sklearn oracles and multi-device sharding on a
simulated v5e-8 mesh, per SURVEY.md §4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib  # noqa: E402

import jax  # noqa: E402

# NOTE: float64 is deliberately NOT enabled. In this environment XLA's CPU
# f64 linalg compiles take ~20s per unique shape (vs ~2s for f32), and f32 is
# what the TPU runs anyway. Oracle-parity tests compare f32 JAX results to
# f64 numpy/sklearn oracles with conditioning-justified tolerances.
# The persistent cache makes repeat test runs fast.
_cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
_cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
