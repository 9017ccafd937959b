"""Mesh + sharding helpers (the reference has no multi-device path at all;
see SURVEY.md §2.9 — Lightning single-GPU + Ray actors over localhost).

TPU-native design: one logical ``data`` axis for batch/fold parallelism
(the dominant axis at this model scale: <10M params, pooled batches of
thousands of trials) plus an optional ``model`` axis reserved for tensor
sharding of the kernel-ridge Gram solves and wide GRU layers. Collectives
(psum for gradient reduction) are inserted by XLA from sharding
annotations — no NCCL/MPI analog needed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data_axis: str = "data") -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (data_axis,))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard dim 0 over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a pytree of arrays with dim-0 sharded over the mesh."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim, axis)), batch
    )
