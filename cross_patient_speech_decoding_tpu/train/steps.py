"""Jitted train/eval steps for the NN families.

Replaces the reference's Lightning training_step/validation_step methods
(`/root/reference/aligned_decoding/nn_models/models.py:305-390`,
`realtime_sim/realtime_nn_model.py:201-268`) with pure
``(state, batch, key) -> (state, metrics)`` functions that jit into single
XLA programs and shard over a device mesh via input shardings (batch dim 0
on the 'data' axis; XLA inserts the gradient psum).

Loss/metric semantics preserved:
- seq2seq: cross-entropy over flattened (B*seq_len) tokens, teacher forcing
  prob 0.5 in training, 0 in eval; cmat accuracy.
- CTC: CTCLoss('mean' reduction, zero_infinity) on window-adjusted input
  lengths; greedy-decoded PER in eval.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from cross_patient_speech_decoding_tpu.models.realtime_rnn import (
    adjusted_input_lengths,
)
from cross_patient_speech_decoding_tpu.ops.ctc import ctc_loss_mean, greedy_decode
from cross_patient_speech_decoding_tpu.ops.metrics import cmat_acc, per_batch
from cross_patient_speech_decoding_tpu.train.state import TrainState


def _apply(model, state: TrainState, *args, train: bool, rngs=None, **kw):
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    if train and state.batch_stats:
        out, updated = model.apply(
            variables, *args, mutable=["batch_stats"], rngs=rngs, **kw
        )
        return out, updated["batch_stats"]
    out = model.apply(variables, *args, rngs=rngs, **kw)
    return out, state.batch_stats


def make_seq2seq_train_step(model, tx, teacher_forcing: float = 0.5):
    def step(state: TrainState, batch, key):
        x, y = batch
        k_tf, k_do = jax.random.split(key)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            logits, updates = model.apply(
                variables,
                x,
                y,
                teacher_forcing,
                False,
                mutable=["batch_stats"] if state.batch_stats else [],
                rngs={"tf": k_tf, "dropout": k_do},
            )
            flat = logits.reshape(-1, logits.shape[-1])
            labels = y.reshape(-1)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                flat, labels
            ).mean()
            new_bs = (
                updates["batch_stats"] if state.batch_stats else state.batch_stats
            )
            return loss, (flat, labels, new_bs)

        (loss, (flat, labels, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        acc = cmat_acc(labels, jnp.argmax(flat, axis=-1), model.num_classes)
        new_state = TrainState(state.step + 1, new_params, new_opt, new_bs)
        return new_state, {"loss": loss, "acc": acc}

    return step


def make_seq2seq_eval_step(model):
    def step(state: TrainState, batch):
        x, y = batch
        logits, _ = _apply(
            model, state, x, None, 0.0, True, train=False
        )
        flat = logits.reshape(-1, logits.shape[-1])
        labels = y.reshape(-1)
        loss = optax.softmax_cross_entropy_with_integer_labels(flat, labels).mean()
        acc = cmat_acc(labels, jnp.argmax(flat, axis=-1), model.num_classes)
        return {"loss": loss, "acc": acc}

    return step


def make_classifier_train_step(model, tx):
    """Plain cross-entropy classifier step for the TCN/Transformer family
    (the reference's ``BaseLightningModel.training_step``,
    `nn_models/models.py:15-108`: CE loss + confusion-matrix accuracy)."""

    def step(state: TrainState, batch, key):
        x, y = batch

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            logits, updates = model.apply(
                variables, x, False,
                mutable=["batch_stats"] if state.batch_stats else [],
                rngs={"dropout": key},
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()
            new_bs = (
                updates["batch_stats"] if state.batch_stats
                else state.batch_stats
            )
            return loss, (logits, new_bs)

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        acc = cmat_acc(y, jnp.argmax(logits, axis=-1), model.num_classes)
        new_state = TrainState(state.step + 1, new_params, new_opt, new_bs)
        return new_state, {"loss": loss, "acc": acc}

    return step


def make_classifier_eval_step(model):
    def step(state: TrainState, batch):
        x, y = batch
        logits, _ = _apply(model, state, x, True, train=False)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, y
        ).mean()
        acc = cmat_acc(y, jnp.argmax(logits, axis=-1), model.num_classes)
        return {"loss": loss, "acc": acc}

    return step


def make_ctc_train_step(model, tx):
    def step(state: TrainState, batch, key):
        x, labels, input_lens, label_lens = batch
        in_adj = adjusted_input_lengths(input_lens, model.win_size, model.stride)

        def loss_fn(params):
            logits = model.apply(
                {"params": params}, x, False, rngs={"dropout": key}
            )
            return ctc_loss_mean(logits, in_adj, labels, label_lens, model.blank)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            state.step + 1, new_params, new_opt, state.batch_stats
        )
        return new_state, {"loss": loss}

    return step


def make_ctc_eval_step(model):
    def step(state: TrainState, batch):
        x, labels, input_lens, label_lens = batch
        in_adj = adjusted_input_lengths(input_lens, model.win_size, model.stride)
        logits = model.apply({"params": state.params}, x, True)
        loss = ctc_loss_mean(logits, in_adj, labels, label_lens, model.blank)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        n_win = logits.shape[1]
        frame_mask = jnp.arange(n_win)[None, :] < in_adj[:, None]
        decoded, dec_lens = greedy_decode(log_probs, model.blank, frame_mask)
        per = per_batch(decoded, dec_lens, labels, label_lens)
        return {"loss": loss, "per": per}

    return step
