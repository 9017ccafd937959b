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
    """1-D device mesh over the first ``n_devices`` devices.

    Raises when more devices are requested than exist — a silent
    truncation would run e.g. ``n_devices=8`` single-device on a 1-chip
    host while every downstream divisibility check assumes 8.
    """
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"n_devices={n_devices} requested but only {len(devs)} "
                f"device(s) available ({jax.default_backend()} backend)"
            )
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
    masks.

    ``batch`` may be the plain 4-tuple ``(x, labels, input_lens,
    label_lens)`` — every row counts — or a 5-tuple with a trailing
    ``(B,)`` sample-weight vector. The reduction is the exact GLOBAL
    weighted mean (per-shard weighted SUMS psum'd, then normalized by the
    psum'd weight), so zero-weight padding rows contribute nothing: a
    caller whose batch does not divide the mesh pads with repeated rows
    at weight 0 and gets gradients identical to the unpadded
    single-device step. With unit weights and a divisible batch this
    reduces to the plain pmean-of-means.
    """
    import jax.numpy as jnp
    import optax

    from cross_patient_speech_decoding_tpu.models.realtime_rnn import (
        adjusted_input_lengths,
    )
    from cross_patient_speech_decoding_tpu.ops.ctc import ctc_loss_mean
    from cross_patient_speech_decoding_tpu.train.state import TrainState

    def local_step(state, batch, key):
        if len(batch) == 5:
            x, labels, input_lens, label_lens, w = batch
        else:
            x, labels, input_lens, label_lens = batch
            w = jnp.ones((x.shape[0],), jnp.float32)
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        in_adj = adjusted_input_lengths(input_lens, model.win_size, model.stride)
        w_sum = jnp.sum(w)

        def loss_fn(params):
            logits = model.apply(
                {"params": params}, x, False, rngs={"dropout": key}
            )
            # ctc_loss_mean with weights = sum(per*w)/max(sum(w),1);
            # recover the local weighted SUM so the cross-device
            # normalization can use the exact global weight total
            lm = ctc_loss_mean(
                logits, in_adj, labels, label_lens, model.blank, weights=w
            )
            return lm * jnp.maximum(w_sum, 1.0)

        loss_sum, grads = jax.value_and_grad(loss_fn)(state.params)
        w_tot = jnp.maximum(jax.lax.psum(w_sum, axis), 1.0)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, axis) / w_tot, grads
        )
        loss = jax.lax.psum(loss_sum, axis) / w_tot
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


def _pad_with_weights(batch, n_dev: int):
    """Pad a batch tuple's dim 0 to a multiple of ``n_dev`` by repeating
    leading rows (valid data) and return the matching sample-weight
    vector — 1 for real rows, 0 for padding. Weighted-psum reductions
    then make the padded sharded step EXACTLY equal to the unpadded
    single-device step."""
    import jax.numpy as jnp

    n = batch[0].shape[0]
    pad = (-n) % n_dev
    w = jnp.ones((n,), jnp.float32)
    if pad:
        idx = jnp.arange(pad) % n
        batch = tuple(jnp.concatenate([a, a[idx]]) for a in batch)
        w = jnp.concatenate([w, jnp.zeros((pad,), jnp.float32)])
    return batch, w


def make_padded_sharded_ctc_train_step(model, tx, mesh: Mesh,
                                       axis: str = "data"):
    """Driver-facing wrapper over :func:`make_sharded_ctc_train_step` with
    the SAME ``(state, (x, y, il, ll), key)`` interface as the
    single-device step: batches whose dim 0 does not divide the mesh are
    padded with zero-weight repeated rows (see :func:`_pad_with_weights`).
    Shapes are static per batch size, so each distinct minibatch shape
    traces once.
    """
    raw = make_sharded_ctc_train_step(model, tx, mesh, axis)
    n_dev = mesh.shape[axis]

    def step(state, batch, key):
        batch, w = _pad_with_weights(batch, n_dev)
        return raw(state, (*batch, w), key)

    return jax.jit(step)


def make_sharded_classifier_train_step(model, tx, mesh: Mesh,
                                       axis: str = "data"):
    """Data-parallel CE-classifier step (the TCN/Transformer family,
    reference ``BaseLightningModel.training_step``) under ``shard_map``.

    Same contract as :func:`make_sharded_ctc_train_step`: batch rows
    shard, params/optimizer replicate, gradients/loss/acc reduce as the
    exact GLOBAL weighted mean (optional trailing sample-weight vector;
    zero-weight rows contribute nothing). BatchNorm models compute their
    normalization statistics PER SHARD during the forward (standard DP
    semantics — gradients then differ from the single-device step by the
    local-vs-global batch-stat difference); the returned running
    ``batch_stats`` are pmean'd so the replicated state stays consistent.
    Note one further BN divergence: ZERO-WEIGHT PADDING rows (used to
    round the batch up to the mesh) are excluded from loss/acc/grads but
    still enter the padded shard's per-shard BN statistics — at typical
    padding ratios (<1 shard row in thousands) this is noise-level, but
    exact-BN use cases should pad with duplicated real rows or mask the
    model's normalization themselves. Models without BatchNorm reproduce
    the single-device step exactly.
    """
    import jax.numpy as jnp
    import optax

    from cross_patient_speech_decoding_tpu.train.state import TrainState

    def local_step(state, batch, key):
        if len(batch) == 3:
            x, y, w = batch
        else:
            x, y = batch
            w = jnp.ones((x.shape[0],), jnp.float32)
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        w_sum = jnp.sum(w)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            logits, updates = model.apply(
                variables, x, False,
                mutable=["batch_stats"] if state.batch_stats else [],
                rngs={"dropout": key},
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            new_bs = (
                updates["batch_stats"] if state.batch_stats
                else state.batch_stats
            )
            return jnp.sum(ce * w), (logits, new_bs)

        (loss_sum, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        w_tot = jnp.maximum(jax.lax.psum(w_sum, axis), 1.0)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, axis) / w_tot, grads
        )
        loss = jax.lax.psum(loss_sum, axis) / w_tot
        new_bs = jax.tree_util.tree_map(
            lambda s: jax.lax.pmean(s, axis), new_bs
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        correct = jnp.sum((jnp.argmax(logits, axis=-1) == y) * w)
        acc = jax.lax.psum(correct, axis) / w_tot
        new_state = TrainState(state.step + 1, new_params, new_opt, new_bs)
        return new_state, {"loss": loss, "acc": acc}

    repl = P()
    data = P(axis)

    def specs_like(tree, spec):
        return jax.tree_util.tree_map(lambda _: spec, tree)

    def step(state, batch, key):
        mapped = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(specs_like(state, repl), specs_like(batch, data), repl),
            out_specs=(specs_like(state, repl),
                       {"loss": repl, "acc": repl}),
            check_vma=False,
        )
        return mapped(state, batch, key)

    n_dev = mesh.shape[axis]
    step_jit = jax.jit(step)

    def padded(state, batch, key):
        batch, w = _pad_with_weights(batch, n_dev)
        return step_jit(state, (*batch, w), key)

    return jax.jit(padded)
