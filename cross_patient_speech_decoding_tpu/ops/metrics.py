"""Decode-quality metrics as pure JAX functions (mask-aware, vmappable).

Covers the reference's metric surface:
- balanced accuracy (sklearn.metrics.balanced_accuracy_score), the headline
  classical metric (`scripts/aligned_decode_svm_ncv.py:447`);
- confusion-matrix accuracy ``cmat_acc`` (`nn_models/models.py:875-889`);
- per-condition Pearson r between aligned latents, ``pt_corr`` /
  ``pt_corr_multi`` (`alignment/metrics.py:12-68`);
- phoneme error rate via batched edit distance
  (`realtime_sim/realtime_nn_model.py:307-324`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def confusion_matrix(
    y_true: jax.Array,
    y_pred: jax.Array,
    n_classes: int,
    sample_mask: jax.Array | None = None,
) -> jax.Array:
    """(n_classes, n_classes) confusion counts; rows=true, cols=pred."""
    w = (
        jnp.ones_like(y_true, dtype=jnp.float32)
        if sample_mask is None
        else sample_mask.astype(jnp.float32)
    )
    idx = y_true * n_classes + y_pred
    flat = jax.ops.segment_sum(w, idx, num_segments=n_classes * n_classes)
    return flat.reshape(n_classes, n_classes)


def balanced_accuracy(
    y_true: jax.Array,
    y_pred: jax.Array,
    n_classes: int,
    sample_mask: jax.Array | None = None,
) -> jax.Array:
    """Mean per-class recall over classes present in y_true (sklearn parity)."""
    cm = confusion_matrix(y_true, y_pred, n_classes, sample_mask)
    support = jnp.sum(cm, axis=1)
    recall = jnp.diag(cm) / jnp.maximum(support, 1.0)
    present = (support > 0).astype(recall.dtype)
    return jnp.sum(recall * present) / jnp.maximum(jnp.sum(present), 1.0)


def cmat_acc(
    y_true: jax.Array,
    y_pred: jax.Array,
    n_classes: int,
    sample_mask: jax.Array | None = None,
) -> jax.Array:
    """trace(confusion) / sum(confusion) — the reference's NN accuracy."""
    cm = confusion_matrix(y_true, y_pred, n_classes, sample_mask)
    return jnp.trace(cm) / jnp.maximum(jnp.sum(cm), 1.0)


def cmat_acc_iter(y_true_iter, y_pred_iter):
    """Confusion-matrix accuracy per (y_true, y_pred) pair — the figure
    notebooks' ``cmat_wrap`` helper (fig_3.ipynb and 15 others).

    Pure numpy on purpose: inputs are host arrays from saved result
    files, and each device dispatch would pay the dev tunnel's ~0.4 s
    D2H sync for a trivial reduction (CLAUDE.md)."""
    import numpy as np

    out = []
    for t, p in zip(y_true_iter, y_pred_iter):
        t = np.asarray(t).ravel()
        p = np.asarray(p).ravel()
        out.append(float(np.mean(t == p)) if t.size else 0.0)
    return np.array(out)


def pearson_r(x: jax.Array, y: jax.Array, axis: int = -1) -> jax.Array:
    """Pearson correlation along an axis."""
    xc = x - jnp.mean(x, axis=axis, keepdims=True)
    yc = y - jnp.mean(y, axis=axis, keepdims=True)
    num = jnp.sum(xc * yc, axis=axis)
    den = jnp.sqrt(jnp.sum(xc**2, axis=axis) * jnp.sum(yc**2, axis=axis))
    return num / jnp.maximum(den, jnp.finfo(x.dtype).tiny)


def _pearson_p_two_sided(r: jax.Array, n: int) -> jax.Array:
    """Two-sided p-value of a Pearson r over n samples (t-distribution,
    the scipy.stats.pearsonr null): p = I_{df/(df+t^2)}(df/2, 1/2)."""
    df = float(n - 2)
    r2 = jnp.clip(r * r, 0.0, 1.0)
    t2 = r2 * df / jnp.maximum(1.0 - r2, 0.0)  # inf at |r| == 1 -> p = 0
    return jax.scipy.special.betainc(df / 2.0, 0.5, df / (df + t2))


def pt_corr(
    target: jax.Array,
    to_corr: jax.Array,
    class_mask: jax.Array | None = None,
    p_vals: bool = False,
):
    """Alignment quality: per-condition Pearson r between aligned latents.

    The reference contract (alignment/metrics.py:41-68): each condition's
    (T, K) trajectory is flattened across time and features and correlated,
    giving ONE r per condition.

    Args:
        target, to_corr: (n_classes, T, K) aligned condition-averaged
            trajectories.
        class_mask: optional (n_classes,) validity (masked shared-class
            pipeline extension); invalid conditions get r = 0, p = 1.
        p_vals: also return two-sided p-values (``pearsonr`` null).

    Returns:
        (n_classes,) per-condition r, or (r, p) when ``p_vals``.
    """
    C = target.shape[0]
    a = target.reshape(C, -1)
    b = to_corr.reshape(C, -1)
    r = pearson_r(a, b, axis=-1)
    if class_mask is not None:
        r = r * class_mask.astype(r.dtype)
    if not p_vals:
        return r
    p = _pearson_p_two_sided(r, a.shape[1])
    if class_mask is not None:
        p = jnp.where(class_mask > 0, p, 1.0)
    return r, p


def pt_corr_multi(
    target: jax.Array,
    to_corr_list,
    class_mask: jax.Array | None = None,
    p_vals: bool = False,
):
    """``pt_corr`` of a target view against several comparison views
    (reference ``pt_corr_multi``, alignment/metrics.py:12-39).

    Args:
        target: (n_classes, T, K) reference trajectories.
        to_corr_list: sequence of same-shape comparison views.

    Returns:
        (n_views, n_classes) per-condition correlations, or a
        (correlations, p_values) pair of that shape when ``p_vals``.
    """
    out = [pt_corr(target, c, class_mask, p_vals) for c in to_corr_list]
    if p_vals:
        return (
            jnp.stack([o[0] for o in out]),
            jnp.stack([o[1] for o in out]),
        )
    return jnp.stack(out)


def pt_corr_dims(
    L_a: jax.Array,
    L_b: jax.Array,
    class_mask: jax.Array | None = None,
) -> jax.Array:
    """Per-latent-dim alignment quality: Pearson r along time for each
    (condition, dim), averaged over valid conditions — the per-dimension
    companion to :func:`pt_corr` used by the alignment-quality figures.

    Returns:
        (K,) per-dim correlation averaged over valid classes.
    """
    r = pearson_r(
        jnp.moveaxis(L_a, 1, -1), jnp.moveaxis(L_b, 1, -1), axis=-1
    )  # (C, K)
    if class_mask is None:
        return jnp.mean(r, axis=0)
    w = class_mask.astype(r.dtype)[:, None]
    return jnp.sum(r * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)


def edit_distance(
    pred: jax.Array,
    pred_len: jax.Array,
    target: jax.Array,
    target_len: jax.Array,
) -> jax.Array:
    """Levenshtein distance between padded integer sequences (scan DP).

    Static-shape Wagner-Fischer over the padded max lengths with masking;
    vmappable over a batch. ``pred`` (P,), ``target`` (L,).
    """
    P = pred.shape[0]
    L = target.shape[0]
    big = jnp.asarray(P + L + 1, jnp.float32)

    # dp row over target prefix lengths 0..L
    row0 = jnp.arange(L + 1, dtype=jnp.float32)
    row0 = jnp.where(jnp.arange(L + 1) <= target_len, row0, big)

    def step(row, i):
        valid_i = i < pred_len
        p = pred[i]

        def scan_col(left, j):
            # row[j] = dp[i][j], row[j-1] = dp[i][j-1], left = dp[i+1][j-1]
            cost = jnp.where(p == target[j - 1], 0.0, 1.0)
            val = jnp.minimum(
                jnp.minimum(row[j] + 1.0, left + 1.0), row[j - 1] + cost
            )
            val = jnp.where(j <= target_len, val, big)
            return val, val

        left0 = row[0] + 1.0  # dp[i+1][0] = i + 1
        _, vals = jax.lax.scan(scan_col, left0, jnp.arange(1, L + 1))
        new_row = jnp.concatenate([jnp.array([left0]), vals])
        new_row = jnp.where(valid_i, new_row, row)
        return new_row, None

    row, _ = jax.lax.scan(step, row0, jnp.arange(P))
    return row[target_len]


def per_batch(
    preds: jax.Array,
    pred_lens: jax.Array,
    targets: jax.Array,
    target_lens: jax.Array,
) -> jax.Array:
    """Phoneme error rate (%) = sum(edit distances) / sum(target lens) * 100.

    Matches reference ``calc_PER`` (realtime_nn_model.py:307-324).
    """
    dists = jax.vmap(edit_distance)(preds, pred_lens, targets, target_lens)
    return jnp.sum(dists) / jnp.maximum(jnp.sum(target_lens), 1) * 100.0
