"""Test configuration: force a virtual 8-device CPU mesh.

GOTCHA (this environment): ``jax`` is pre-imported at interpreter startup
by a site hook, so ``JAX_PLATFORMS`` in the environment is read before any
test code runs and the default backend would be the tunneled axon TPU
(slow per-op round trips, no f64). The backend is only *initialized* on
first device access, so switching platforms must use
``jax.config.update("jax_platforms", ...)`` BEFORE anything touches
devices — which is what this conftest does. XLA_FLAGS is still read at
backend-init time, so setting it here works.

Real-TPU behavior is exercised by bench.py and __graft_entry__.py
(driver-run); unit tests validate numerics against float64
numpy/scipy/sklearn oracles and multi-device sharding on a simulated
v5e-8 mesh, per SURVEY.md §4.
"""

import os
import pathlib

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already in sys.modules; backend not yet up)

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache keeps repeat runs fast.
_cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
_cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", jax.default_backend()
