"""Fold-parallel NN training — many CV folds train as ONE vmapped program.

The reference's seq2seq experiment trains 50 iterations x 20 folds x 500
epochs sequentially through Lightning (`scripts/train_seq2seq.py:157-189`),
the second-biggest compute sink after the SVM grid (SURVEY.md §3.2). Folds
differ only in which target trials are in-train — so here every fold trains
the SAME pooled array with a per-fold SAMPLE-WEIGHT vector in the loss
(target train rows weighted 1, its held-out rows 0, cross rows 1), and the
fold axis becomes a vmap axis over model parameters and optimizer states.
One XLA program trains all folds simultaneously; with a mesh, folds shard
across chips (they are embarrassingly parallel, like the reference's SLURM
job arrays).

Two-level API:

- :func:`make_seq2seq_fold_trainer_fn` builds ONE jitted
  ``train(X_pool, y_pool, train_weights, test_masks, seed, epochs)``
  (``epochs`` static) whose single trace serves every iteration — and
  every fold CHUNK: at reference scale (20 folds x ~1.2k pooled trials x
  T=200) all folds at once exceed a single chip's HBM, so the driver
  slices the fold axis into equal chunks and reuses the same compiled
  program per chunk.
- :func:`make_seq2seq_fold_trainer` is the array-closing convenience
  wrapper (used by tests/dryrun) with a ``.lower(epochs)`` hook for
  AOT prewarming.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cross_patient_speech_decoding_tpu.ops.metrics import cmat_acc


def make_seq2seq_fold_trainer_fn(
    model,
    *,
    lr: float = 1e-3,
    weight_decay: float = 1e-5,
    decay_iters: int = 20,
    end_factor: float = 0.01,
    clip: float = 0.5,
    teacher_forcing: float = 0.5,
    mesh=None,
    fold_axis: str = "data",
    rnn_impl: str = "scan",
):
    """Build the jitted fold trainer.

    Returns ``train(X_pool, y_pool, train_weights, test_masks, seed,
    epochs) -> (accs (F,), params)`` with ``epochs`` static and ``seed`` a
    traced int — one trace serves all iterations/chunks with the same
    shapes (the 50-iteration reference design would otherwise pay a full
    retrace per iteration).

    Args:
        model: a Seq2SeqRNN (or compatible) flax module.
        rnn_impl: 'scan' forces the XLA scan GRU everywhere (the safe
            default at small scales); 'pallas' lets FusedGRU's normal
            dispatch gate run INSIDE the fold vmap — jax batches the
            fused kernel by prepending the fold axis to its grid (one
            launch, per-fold weight blocks), so folds whose per-fold
            ``B*T`` passes ``pallas_gru.worthwhile`` get the fused layer
            (reference scale: ~1.2k pooled trials x T=200 per fold).

    Call args:
        X_pool: (N, T, C) pooled features (target + aligned cross rows)
            shared by every fold, or (F, N, T, C) per-fold features (the
            leak-free regime where the PCA/CCA alignment is refit on each
            fold's train rows, the reference's per-fold process_aligner).
        y_pool: (N, L) pooled sequence labels (fold-invariant).
        train_weights: (F, N) per-fold sample weights for the loss.
        test_masks: (F, N) per-fold eval masks (target held-out rows).
        seed: RNG seed (init keys from ``seed``, epoch keys ``seed + 1``).
        epochs: scan length (STATIC — baked into the program).
    """
    if rnn_impl not in ("scan", "pallas"):
        raise ValueError(
            f"rnn_impl must be 'scan' or 'pallas', got {rnn_impl!r}"
        )
    if rnn_impl == "pallas" and mesh is not None:
        # the fold axis is both the mesh-sharded axis and the Mosaic
        # kernel's vmap-prepended grid dimension — GSPMD cannot partition
        # that custom call, so it would replicate every fold's weights
        # and activations on every chip, defeating the HBM-motivated
        # chunking. Shard folds across chips at the driver level (one
        # chunk per chip) with rnn_impl='pallas' per chip instead.
        raise ValueError(
            "rnn_impl='pallas' cannot be combined with a mesh: the "
            "sharded fold axis is the Pallas kernel's grid dimension"
        )
    sched = optax.linear_schedule(lr, lr * end_factor, decay_iters)
    tx = optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(sched, weight_decay=weight_decay),
    )

    def train_folds(X_pool, y_pool, train_weights, test_masks, seed, epochs):
        F = train_weights.shape[0]
        per_fold_x = X_pool.ndim == 4
        x_axis = 0 if per_fold_x else None
        x_example = X_pool[0] if per_fold_x else X_pool

        def init_one(key):
            variables = model.init(
                {"params": key, "tf": jax.random.key(0)},
                x_example[:1], y_pool[:1], teacher_forcing,
            )
            return variables["params"], variables.get("batch_stats", {})

        keys = jax.random.split(jax.random.key(seed), F)
        params, batch_stats = jax.vmap(init_one)(keys)
        opt_states = jax.vmap(tx.init)(params)

        if mesh is not None and F % mesh.shape[fold_axis] != 0:
            import warnings

            warnings.warn(
                f"{F} folds do not divide the {mesh.shape[fold_axis]}-"
                f"device mesh; this fold chunk runs UNSHARDED on one "
                f"device", stacklevel=2,
            )
        if mesh is not None and F % mesh.shape[fold_axis] == 0:
            # every vmapped leaf has the fold axis leading (scalars became
            # (F,) under vmap), so a fold-axis constraint is always valid
            from jax.sharding import NamedSharding, PartitionSpec as P

            cst = lambda tree: jax.tree_util.tree_map(
                lambda l: jax.lax.with_sharding_constraint(
                    l,
                    NamedSharding(
                        mesh, P(fold_axis, *([None] * (max(l.ndim, 1) - 1)))
                    ),
                ),
                tree,
            )
            params, batch_stats, opt_states = (
                cst(params), cst(batch_stats), cst(opt_states)
            )

        def loss_fn(p, bs, x, w, key):
            k_tf, k_do = jax.random.split(key)
            variables = {"params": p}
            if bs:
                variables["batch_stats"] = bs
            logits, updates = model.apply(
                variables, x, y_pool, teacher_forcing, False,
                mutable=["batch_stats"] if bs else [],
                rngs={"tf": k_tf, "dropout": k_do},
            )
            flat = logits.reshape(-1, logits.shape[-1])
            labels = y_pool.reshape(-1)
            ce = optax.softmax_cross_entropy_with_integer_labels(flat, labels)
            L = y_pool.shape[1]
            w_tok = jnp.repeat(w, L)
            loss = jnp.sum(ce * w_tok) / jnp.maximum(jnp.sum(w_tok), 1.0)
            new_bs = updates["batch_stats"] if bs else bs
            return loss, new_bs

        def epoch_one(p, o, bs, x, w, key):
            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(p, bs, x, w, key)
            updates, new_o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), new_o, new_bs, loss

        def eval_one(p, bs, x, te):
            variables = {"params": p}
            if bs:
                variables["batch_stats"] = bs
            logits = model.apply(variables, x, None, 0.0, True)
            preds = jnp.argmax(logits, axis=-1).reshape(-1)
            labels = y_pool.reshape(-1)
            L = y_pool.shape[1]
            m = jnp.repeat(te, L)
            return cmat_acc(labels, preds, model.num_classes, m)

        def epoch_step(carry, key):
            p, o, bs = carry
            fold_keys = jax.random.split(key, F)
            p, o, bs, losses = jax.vmap(
                epoch_one, in_axes=(0, 0, 0, x_axis, 0, 0)
            )(p, o, bs, X_pool, train_weights, fold_keys)
            return (p, o, bs), losses

        ekeys = jax.random.split(jax.random.key(seed + 1), epochs)
        (p, o, bs), _ = jax.lax.scan(
            epoch_step, (params, opt_states, batch_stats), ekeys
        )
        accs = jax.vmap(eval_one, in_axes=(0, 0, x_axis, 0))(
            p, bs, X_pool, test_masks
        )
        return accs, p

    def train_folds_scan_rnn(X_pool, y_pool, train_weights, test_masks,
                             seed, epochs):
        # rnn_impl='scan': keep the XLA scan GRU, whose small matmuls
        # batch ACROSS folds — at small per-fold sizes that beats the
        # kernel. rnn_impl='pallas': let the dispatch gate fire inside
        # the vmap (one launch, fold axis prepended to the kernel grid).
        # Measured at reference scale (docs/ROUND3.md): ~36 ms/fold-epoch
        # either way the kernel is launched (fold grid vs per-fold —
        # MXU-bound, batching is cost-neutral), while the scan
        # fold-parallel program reproducibly crashed the remote compile
        # helper at that shape — at reference scale 'pallas' is the only
        # fold-parallel option that compiles.
        from cross_patient_speech_decoding_tpu.ops.pallas_gru import (
            disable_pallas_gru,
        )

        if rnn_impl == "pallas":
            return train_folds(
                X_pool, y_pool, train_weights, test_masks, seed, epochs
            )
        with disable_pallas_gru():
            return train_folds(
                X_pool, y_pool, train_weights, test_masks, seed, epochs
            )

    return jax.jit(train_folds_scan_rnn, static_argnums=5)


class _FoldTrainer:
    """Array-closing wrapper: ``trainer(epochs)`` / ``trainer.lower(epochs)``."""

    def __init__(self, fn, args):
        self._fn = fn
        self._args = args

    def __call__(self, epochs: int):
        return self._fn(*self._args, epochs)

    def lower(self, epochs: int):
        return self._fn.lower(*self._args, epochs)


def make_seq2seq_fold_trainer(
    model,
    X_pool: jax.Array,
    y_pool: jax.Array,
    train_weights: jax.Array,
    test_masks: jax.Array,
    *,
    lr: float = 1e-3,
    weight_decay: float = 1e-5,
    decay_iters: int = 20,
    end_factor: float = 0.01,
    clip: float = 0.5,
    teacher_forcing: float = 0.5,
    seed: int = 0,
    mesh=None,
    fold_axis: str = "data",
    rnn_impl: str = "scan",
):
    """Build train_folds(epochs) -> (accs (F,), params) for F folds.

    Convenience wrapper over :func:`make_seq2seq_fold_trainer_fn` that
    closes over the fold arrays (see the fn's docstring for shapes).
    """
    fn = make_seq2seq_fold_trainer_fn(
        model,
        lr=lr,
        weight_decay=weight_decay,
        decay_iters=decay_iters,
        end_factor=end_factor,
        clip=clip,
        teacher_forcing=teacher_forcing,
        mesh=mesh,
        fold_axis=fold_axis,
        rnn_impl=rnn_impl,
    )
    return _FoldTrainer(
        fn, (X_pool, y_pool, train_weights, test_masks, seed)
    )


def pooled_fold_arrays(tar_feats, tar_y, cross_feats, cross_ys,
                       train_masks: np.ndarray,
                       test_masks: np.ndarray | None = None):
    """Assemble (X_pool, y_pool, train_weights, test_masks) from per-fold
    target masks + always-in-train cross data.

    ``test_masks`` defaults to the train complement over the target rows;
    pass it explicitly when some target rows belong to NEITHER set (e.g.
    augmented copies of test rows, which must be excluded entirely).

    Accepts 3-D per-trial features shared by every fold, or 4-D
    (F, N, T, K) per-fold stacks (leak-free refit regime) — the trial
    axis is then axis 1."""
    trial_axis = 1 if tar_feats.ndim == 4 else 0
    X_pool = jnp.concatenate([tar_feats] + list(cross_feats), axis=trial_axis)
    y_pool = jnp.concatenate([tar_y] + list(cross_ys), axis=0)
    F, N0 = train_masks.shape
    n_cross = X_pool.shape[trial_axis] - N0
    if test_masks is None:
        test_masks = 1.0 - train_masks
    w = np.concatenate(
        [train_masks, np.ones((F, n_cross), train_masks.dtype)], axis=1
    )
    te = np.concatenate(
        [test_masks, np.zeros((F, n_cross), train_masks.dtype)], axis=1
    )
    return X_pool, y_pool, jnp.asarray(w, jnp.float32), jnp.asarray(te, jnp.float32)
