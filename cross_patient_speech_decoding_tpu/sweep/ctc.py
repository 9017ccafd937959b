"""Vmapped CTC-RNN trial batches — one XLA program trains a whole bucket.

Concrete ``train_bucket`` for :func:`sweep.search.run_sweep`, replacing the
reference's per-trial Ray actors (`scripts/tune_ctc_rnn.py:550-634`): all
trials that share architecture (hidden, layers, dropout — static shapes)
train simultaneously, with per-trial learning rate / weight decay injected
as traced optimizer hyperparameters (``optax.inject_hyperparams``) riding a
vmap axis. Epochs run as a ``lax.scan``, so a full rung is a single device
launch.

``make_ctc_cv_bucket_trainer`` adds the reference's per-trial k-fold CV
(``train_func_cv`` averaging val_PER over folds, tune_ctc_rnn.py:550-634):
the (trial x fold) product rides ONE flattened vmap axis — fold membership
enters as per-sample loss weights, so every fold model sees the same
arrays.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cross_patient_speech_decoding_tpu.models.realtime_rnn import (
    RealtimeRNN,
    adjusted_input_lengths,
)
from cross_patient_speech_decoding_tpu.ops.ctc import ctc_loss_mean, greedy_decode
from cross_patient_speech_decoding_tpu.ops.metrics import per_batch


# epoch-scan segment length for the CV trainable (host-side chunking of
# the lax.scan over epochs; see the note at its use site). Env-tunable:
# shorter segments bound the continuous on-device stretch (the flaky
# worker crashes correlate with sustained load — docs/ROUND5.md §9) at
# one ~0.4 s sync per segment.
import os as _os

EPOCH_SEG = int(_os.environ.get("CPSD_EPOCH_SEG", "100"))


def _sync_tiny(tree):
    """Force completion of the queued segment with a tiny scalar read
    (`block_until_ready` can return early through the tunnel —
    CLAUDE.md; a one-element read costs one ~0.4 s roundtrip)."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    _ = float(jnp.ravel(leaf)[0])


def _weighted_ctc_loss(model, params, x, y, in_adj, ll, w, blank, key):
    """Fold-masked CTC loss — the same ``ctc_loss_mean`` as the production
    train steps (one definition of the zero_infinity clamp and
    normalization), reduced with sample weights."""
    logits = model.apply({"params": params}, x, False, rngs={"dropout": key})
    return ctc_loss_mean(logits, in_adj, y, ll, blank_id=blank, weights=w)


def make_ctc_cv_bucket_trainer(
    data_batch,
    fold_train_masks,
    fold_val_masks,
    n_classes: int,
    *,
    win_size: int = 14,
    stride: int = 4,
    blank: int = 0,
    decay_steps: int = 100,
    seed: int = 0,
    mesh=None,
    trial_axis: str = "data",
    model_chunk: int = 0,
):
    """CV variant: train_bucket(configs, epochs) -> mean val PER over folds.

    data_batch: (x, labels, input_lens, label_lens) full arrays;
    fold_train_masks/fold_val_masks: (F, N) per-fold membership. Each of
    the B trials trains F fold models (B*F programs in one vmap); the
    returned metric per trial is the fold-mean val PER — the reference's
    CV trainable contract.

    ``x`` may be (N, T, C) — one array shared by every fold (precomputed
    transforms / no fitting, CTCHeldOutTargetValCVDataModule) — or
    (F, N, T, C): per-fold feature stacks for the leak-free on-the-fly
    PCA+CCA contexts (CTCHeldOutTargetValAlignCVDataModule,
    tune_ctc_rnn_align), where each fold's transforms were fit on that
    fold's train rows only. Labels/lengths are fold-invariant.

    With ``mesh`` given, the flattened (trial x fold) model axis is
    sharded over the mesh (data replicated) when ``B*F`` divides the
    device count — the CV analog of the plain bucket trainer's
    trial-axis sharding.

    ``model_chunk`` bounds how many fold models backpropagate
    CONCURRENTLY (single-device memory control): the flattened model
    axis runs through ``lax.map`` in chunks of that size instead of one
    full vmap. At the fig_5 production geometry (~1.9k pooled trials x
    600 bins, hidden 512 x 3) one model's fwd+bwd residuals are ~6 GB —
    five concurrent fold models exceed HBM, so the reference tuning
    design needs ``model_chunk=1`` (which also keeps the Pallas GRU
    kernels on the hot path: the lax.map body is a plain single-model
    program, not a vmapped one). Mutually exclusive with ``mesh``.
    """
    x, y, il, ll = data_batch
    F = fold_train_masks.shape[0]
    per_fold_x = x.ndim == 4
    if per_fold_x and x.shape[0] != F:
        raise ValueError(
            f"per-fold x has {x.shape[0]} folds, masks have {F}"
        )
    if model_chunk and mesh is not None:
        raise ValueError(
            "model_chunk is a single-device memory bound; with a mesh the "
            "model axis is already sharded — drop one of the two"
        )
    x_one = x[0] if per_fold_x else x

    def train_bucket(cfgs: Sequence[dict], epochs: int):
        # trial/fold models ride a vmap axis: keep the XLA scan GRU, whose
        # small matmuls batch ACROSS models — a Pallas kernel under vmap
        # would serialize per instance on the sequential TPU grid.
        # model_chunk=1 is the exception: the lax.map body is a plain
        # single-model program, so the fused kernels run at full tilt.
        from cross_patient_speech_decoding_tpu.ops.pallas_gru import (
            disable_pallas_gru,
        )

        if model_chunk == 1:
            return _train_bucket(cfgs, epochs)
        with disable_pallas_gru():
            return _train_bucket(cfgs, epochs)

    def _train_bucket(cfgs: Sequence[dict], epochs: int):
        arch = cfgs[0]
        model = RealtimeRNN(
            hidden=arch["hidden"], n_layers=arch["n_layers"],
            n_classes=n_classes, dropout=arch["dropout"],
            win_size=win_size, stride=stride, blank=blank,
        )
        B = len(cfgs)
        # flatten (trial, fold) into one axis
        lrs = jnp.repeat(jnp.asarray([c["lr"] for c in cfgs], jnp.float32), F)
        wds = jnp.repeat(
            jnp.asarray([c["weight_decay"] for c in cfgs], jnp.float32), F
        )
        w_tr = jnp.tile(jnp.asarray(fold_train_masks, jnp.float32), (B, 1))
        w_va = jnp.tile(jnp.asarray(fold_val_masks, jnp.float32), (B, 1))
        # flattened (trial, fold) axis is fold-fastest (matches the tiles)
        fold_ids = jnp.tile(jnp.arange(F), B)

        tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=1e-3, weight_decay=1e-4
        )

        def init_one(key):
            params = model.init({"params": key}, x_one[:1])["params"]
            return params, tx.init(params)

        keys = jax.random.split(jax.random.key(seed), B * F)
        params, opts = jax.vmap(init_one)(keys)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = mesh.shape[trial_axis]
            if (B * F) % n_dev != 0:
                import warnings

                warnings.warn(
                    f"CV bucket of {B} trials x {F} folds does not divide "
                    f"the {n_dev}-device mesh; running UNSHARDED on one "
                    f"device (pad the trial budget or fold count to a "
                    f"multiple of {n_dev} to shard)", stacklevel=2,
                )
            if (B * F) % n_dev == 0:
                model_sh = lambda leaf: NamedSharding(
                    mesh, P(trial_axis, *([None] * (leaf.ndim - 1)))
                )
                shard = lambda tree: jax.tree_util.tree_map(
                    lambda leaf: jax.device_put(leaf, model_sh(leaf)), tree
                )
                params, opts = shard(params), shard(opts)
                lrs, wds, w_tr, w_va, fold_ids = (
                    shard(lrs), shard(wds), shard(w_tr), shard(w_va),
                    shard(fold_ids),
                )

        in_adj = adjusted_input_lengths(il, win_size, stride)

        def per_model(p, o, lr, wd, w, key, f):
            xx = x[f] if per_fold_x else x
            loss, grads = jax.value_and_grad(
                lambda p_: _weighted_ctc_loss(
                    model, p_, xx, y, in_adj, ll, w, blank, key
                )
            )(p)
            frac = jnp.minimum(o.count / decay_steps, 1.0)
            o.hyperparams["learning_rate"] = lr * (1.0 - frac)
            o.hyperparams["weight_decay"] = wd
            updates, o2 = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o2

        def epoch_step(carry, epoch_key):
            params, opts = carry
            mkeys = jax.random.split(epoch_key, B * F)
            if model_chunk:
                params, opts = jax.lax.map(
                    lambda a: per_model(*a),
                    (params, opts, lrs, wds, w_tr, mkeys, fold_ids),
                    batch_size=model_chunk if model_chunk > 1 else None,
                )
            else:
                params, opts = jax.vmap(per_model)(
                    params, opts, lrs, wds, w_tr, mkeys, fold_ids
                )
            return (params, opts), None

        # epoch scan in host-side SEGMENTS: bit-identical key stream and
        # math (the segment boundary only cuts the scan), but (a) a
        # 300-length scan program at production scale crashed the TPU
        # worker where the 100-length one runs (observed round 5), and
        # (b) equal-length segments share one cached program. The tiny
        # per-segment sync bounds the async queue (minutes of queued
        # device work correlate with worker-crash flakes) and localizes
        # any crash to its segment.
        ekeys = jax.random.split(jax.random.key(seed + 1), epochs)
        carry = (params, opts)
        for s0 in range(0, epochs, EPOCH_SEG):
            carry, _ = jax.lax.scan(epoch_step, carry, ekeys[s0:s0 + EPOCH_SEG])
            _sync_tiny(carry[0])
        params, _ = carry

        # data enters eval as EXPLICIT jit arguments: a closed-over
        # device array is embedded into the serialized program as a
        # literal, and at production scale the per-fold feature stack is
        # ~1.5 GB — the tunnel's /remote_compile rejects the request
        # body outright (HTTP 413; observed round 5)
        def eval_one(p, w, f, xd, yd, lld, ia):
            xx = xd[f] if per_fold_x else xd
            logits = model.apply({"params": p}, xx, True)
            lp = jax.nn.log_softmax(logits, axis=-1)
            mask = jnp.arange(logits.shape[1])[None, :] < ia[:, None]
            dec, lens = greedy_decode(lp, blank, mask)
            from cross_patient_speech_decoding_tpu.ops.metrics import (
                edit_distance,
            )

            dists = jax.vmap(edit_distance)(dec, lens, yd, lld)
            return jnp.sum(dists * w) / jnp.maximum(
                jnp.sum(lld * w), 1
            ) * 100.0

        if model_chunk:
            ev = jax.jit(lambda ps, ws, fs, xd, yd, lld, ia: jax.lax.map(
                lambda a: eval_one(*a, xd, yd, lld, ia), (ps, ws, fs),
                batch_size=model_chunk if model_chunk > 1 else None,
            ))
        else:
            ev = jax.jit(lambda ps, ws, fs, xd, yd, lld, ia: jax.vmap(
                lambda p, w, f: eval_one(p, w, f, xd, yd, lld, ia)
            )(ps, ws, fs))
        pers = ev(params, w_va, fold_ids, x, jnp.asarray(y),
                  jnp.asarray(ll), in_adj)
        per_trial = np.asarray(pers).reshape(B, F).mean(axis=1)  # (B*F,)
        return [float(p) for p in per_trial]

    return train_bucket


def make_ctc_bucket_trainer(
    train_batch,
    val_batch,
    n_classes: int,
    *,
    win_size: int = 14,
    stride: int = 4,
    blank: int = 0,
    decay_steps: int = 100,
    seed: int = 0,
    mesh=None,
    trial_axis: str = "data",
):
    """Build train_bucket(configs, epochs) -> list[val_PER].

    train_batch/val_batch: (x, labels, input_lens, label_lens) device
    tuples shared by all trials (the reference trains trials on identical
    fold data, tune_ctc_rnn.py:664-674).

    With ``mesh`` given, the TRIAL axis (params, optimizer states, lr/wd
    vectors) is sharded over the mesh — each chip trains its own slice of
    the trial bucket on replicated data, the multi-chip analog of the
    reference's 10 Ray actors at 0.1 GPU each.
    """
    x_tr, y_tr, il_tr, ll_tr = train_batch

    def train_bucket(cfgs: Sequence[dict], epochs: int):
        # trial/fold models ride a vmap axis: keep the XLA scan GRU, whose
        # small matmuls batch ACROSS models — a Pallas kernel under vmap
        # would serialize per instance on the sequential TPU grid
        from cross_patient_speech_decoding_tpu.ops.pallas_gru import (
            disable_pallas_gru,
        )

        with disable_pallas_gru():
            return _train_bucket(cfgs, epochs)

    def _train_bucket(cfgs: Sequence[dict], epochs: int):
        arch = cfgs[0]
        model = RealtimeRNN(
            hidden=arch["hidden"],
            n_layers=arch["n_layers"],
            n_classes=n_classes,
            dropout=arch["dropout"],
            win_size=win_size,
            stride=stride,
            blank=blank,
        )
        B = len(cfgs)
        lrs = jnp.asarray([c["lr"] for c in cfgs], jnp.float32)
        wds = jnp.asarray([c["weight_decay"] for c in cfgs], jnp.float32)

        tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=1e-3, weight_decay=1e-4
        )

        def init_one(key):
            params = model.init({"params": key}, x_tr[:1])["params"]
            return params, tx.init(params)

        keys = jax.random.split(jax.random.key(seed), B)
        params, opt_states = jax.vmap(init_one)(keys)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = mesh.shape[trial_axis]
            if B % n_dev == 0:
                trial_sh = lambda leaf: NamedSharding(
                    mesh, P(trial_axis, *([None] * (leaf.ndim - 1)))
                )
                shard = lambda tree: jax.tree_util.tree_map(
                    lambda leaf: jax.device_put(leaf, trial_sh(leaf)), tree
                )
                params, opt_states = shard(params), shard(opt_states)
                lrs = jax.device_put(lrs, NamedSharding(mesh, P(trial_axis)))
                wds = jax.device_put(wds, NamedSharding(mesh, P(trial_axis)))

        in_adj = adjusted_input_lengths(il_tr, win_size, stride)

        def loss_fn(p, key):
            logits = model.apply(
                {"params": p}, x_tr, False, rngs={"dropout": key}
            )
            return ctc_loss_mean(logits, in_adj, y_tr, ll_tr, blank)

        def epoch_step(carry, epoch_key):
            params, opts = carry

            def per_trial(p, o, lr, wd, key):
                loss, grads = jax.value_and_grad(loss_fn)(p, key)
                frac = jnp.minimum(o.count / decay_steps, 1.0)
                o.hyperparams["learning_rate"] = lr * (1.0 - frac)
                o.hyperparams["weight_decay"] = wd
                updates, o2 = tx.update(grads, o, p)
                return optax.apply_updates(p, updates), o2, loss

            tkeys = jax.random.split(epoch_key, B)
            params, opts, losses = jax.vmap(per_trial)(
                params, opts, lrs, wds, tkeys
            )
            return (params, opts), losses

        # segmented like the CV trainable (shared cached program per
        # segment; long scans at production scale crashed the worker)
        ekeys = jax.random.split(jax.random.key(seed + 1), epochs)
        carry = (params, opt_states)
        for s0 in range(0, epochs, EPOCH_SEG):
            carry, _ = jax.lax.scan(epoch_step, carry, ekeys[s0:s0 + EPOCH_SEG])
            _sync_tiny(carry[0])
        params, _ = carry

        x_v, y_v, il_v, ll_v = val_batch
        in_adj_v = adjusted_input_lengths(il_v, win_size, stride)

        # data as explicit jit args (closed-over arrays embed as program
        # literals; see the CV trainer's eval note)
        def eval_one(p, xd, yd, lld, ia):
            logits = model.apply({"params": p}, xd, True)
            lp = jax.nn.log_softmax(logits, axis=-1)
            mask = jnp.arange(logits.shape[1])[None, :] < ia[:, None]
            dec, lens = greedy_decode(lp, blank, mask)
            return per_batch(dec, lens, yd, lld)

        pers = jax.jit(lambda ps, xd, yd, lld, ia: jax.vmap(
            lambda p: eval_one(p, xd, yd, lld, ia))(ps)
        )(params, x_v, y_v, ll_v, in_adj_v)
        return [float(p) for p in pers]

    return train_bucket
