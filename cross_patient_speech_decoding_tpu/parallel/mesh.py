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


def make_sharded_ctc_train_step(model, tx, mesh: Mesh, axis: str = "data"):
    """CTC train step under ``jax.shard_map``: explicit SPMD data parallelism.

    Unlike the sharding-annotation path (train/steps.py + in_shardings,
    where XLA infers the gradient psum), shard_map runs the step body
    per-device on LOCAL shards with an explicit ``pmean`` between the
    gradient and the optimizer update. This is the correct integration
    for the fused Pallas GRU kernels on real multi-chip hardware: each
    device's kernel instance sees only its local batch shard — no
    partitioner guessing around the opaque custom call.

    Params/opt state replicated, batch sharded on dim 0 over ``axis``;
    the dropout key is folded with the device index so shards draw iid
    masks. Per-shard mean losses pmean to the exact global mean when the
    batch divides the mesh.
    """
    import optax

    from cross_patient_speech_decoding_tpu.models.realtime_rnn import (
        adjusted_input_lengths,
    )
    from cross_patient_speech_decoding_tpu.ops.ctc import ctc_loss_mean
    from cross_patient_speech_decoding_tpu.train.state import TrainState

    def local_step(state, batch, key):
        x, labels, input_lens, label_lens = batch
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        in_adj = adjusted_input_lengths(input_lens, model.win_size, model.stride)

        def loss_fn(params):
            logits = model.apply(
                {"params": params}, x, False, rngs={"dropout": key}
            )
            return ctc_loss_mean(logits, in_adj, labels, label_lens, model.blank)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            state.step + 1, new_params, new_opt, state.batch_stats
        )
        return new_state, {"loss": loss}

    repl = P()
    data = P(axis)

    def specs_like(tree, spec):
        return jax.tree_util.tree_map(lambda _: spec, tree)

    def step(state, batch, key):
        mapped = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(specs_like(state, repl), specs_like(batch, data), repl),
            out_specs=(specs_like(state, repl), {"loss": repl}),
            check_vma=False,
        )
        return mapped(state, batch, key)

    return jax.jit(step)
