"""Fold-preparation pipelines — the reference datamodules as pure functions.

The reference wraps fold preparation in Lightning DataModules with
HDF5 fold caches (`/root/reference/aligned_decoding/nn_models/data_utils/
datamodules.py`, `realtime_sim/realtime_datamodule.py`). In this framework
fold prep is a pure function returning device-ready arrays — no disk cache
needed because preprocessing is jitted and cheap, and fold masks make CV a
batch axis. The mapping:

- :func:`simple_folds`            <-> SimpleMicroDataModule (:21-208):
  single-patient stratified k-fold with val split and augmentation concat;
- :func:`aligned_folds`           <-> AlignedMicroDataModule (:211-439) /
  ``process_aligner`` (:515-573): per-fold PCA (variance fraction) +
  per-source AlignCCA to target + pooling; val/test projected through the
  target PCA;
- :func:`aligned_folds` with ``align_before_split=True``
                                  <-> AlignedMicroValDataModule (:442-512);
- :func:`ctc_holdout`             <-> CTCHeldOutDataModule family
  (realtime_datamodule.py:23-254): train/val/test split, optional pooling
  of (optionally aligned) cross-patient data into train — the contexts of
  train_ctc_rnn; the CV variants are the same function driven by fold
  masks (:404-724).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cross_patient_speech_decoding_tpu.data.splits import (
    stratified_kfold_masks,
    train_val_test_masks,
)
from cross_patient_speech_decoding_tpu.decoders.pooled import (
    PatientArrays,
    _fit_pca_latents,
    _transform_latents,
)
from cross_patient_speech_decoding_tpu.ops.cca import (
    fit_cca_aligner,
    transform_b_to_a,
)


class FoldData(NamedTuple):
    """One fold's arrays: (X, y) train / val / test."""

    train: tuple
    val: tuple
    test: tuple


def _split_val(idx: np.ndarray, val_frac: float, rng):
    idx = rng.permutation(idx)
    n_val = int(round(len(idx) * val_frac))
    return idx[n_val:], idx[:n_val]


def simple_folds(
    X: np.ndarray,
    y: np.ndarray,
    n_folds: int = 20,
    val_frac: float = 0.1,
    seed: int = 0,
    augment=None,
):
    """Single-patient stratified k-fold with val split.

    ``augment``: optional callable (key, X_train, y_train) ->
    (X_aug, y_aug) concatenated onto train (the reference's augmentation
    concat, datamodules.py:78-82).
    """
    rng = np.random.default_rng(seed)
    tr_m, te_m = stratified_kfold_masks(y, n_folds, rng)
    folds = []
    for k in range(n_folds):
        tr_idx = np.where(tr_m[k] > 0)[0]
        te_idx = np.where(te_m[k] > 0)[0]
        tr_idx, va_idx = _split_val(tr_idx, val_frac, rng)
        X_tr, y_tr = X[tr_idx], y[tr_idx]
        if augment is not None:
            key = jax.random.key(seed * 1000 + k)
            X_aug, y_aug = augment(key, jnp.asarray(X_tr), jnp.asarray(y_tr))
            X_tr = np.concatenate([X_tr, np.asarray(X_aug)])
            y_tr = np.concatenate([y_tr, np.asarray(y_aug)])
        folds.append(
            FoldData(
                train=(X_tr, y_tr),
                val=(X[va_idx], y[va_idx]),
                test=(X[te_idx], y[te_idx]),
            )
        )
    return folds


def aligned_folds(
    tar: PatientArrays,
    cross,
    n_align_classes: int,
    n_folds: int = 20,
    n_comp: float = 0.95,
    max_k: int = 32,
    val_frac: float = 0.1,
    seed: int = 0,
    align_before_split: bool = False,
):
    """Cross-patient aligned fold prep (process_aligner analog).

    Per fold: fit target PCA on the fold's train rows (or on all rows when
    ``align_before_split``, the AlignedMicroValDataModule variant), fit a
    per-source CCA alignment into the target space, pool train rows.
    Returns a list of FoldData with flattened (N, T*K) features.
    """
    rng = np.random.default_rng(seed)
    y_host = np.asarray(tar.y)
    tr_m, te_m = stratified_kfold_masks(y_host, n_folds, rng)
    folds = []

    # fold-invariant work hoisted out of the fold loop: source PCA latents
    # never depend on the target's fold split (every cross row is training
    # data), and with align_before_split the target PCA + CCA fits are
    # fold-invariant too — refitting them n_folds x was pure waste
    src_lats = []
    for src in cross:
        src_pca = _fit_pca_latents(src.X, n_comp, max_k)
        src_lats.append(_transform_latents(src_pca, src.X, max_k))

    def _align(fit_mask):
        tar_pca = _fit_pca_latents(tar.X, n_comp, max_k, fit_mask)
        tar_lat = _transform_latents(tar_pca, tar.X, max_k)
        pooled_X, pooled_y = [], []
        for src, src_lat in zip(cross, src_lats):
            al = fit_cca_aligner(
                tar_lat, src_lat, tar.y_align, src.y_align,
                n_align_classes, mask_a=fit_mask,
            )
            aligned = transform_b_to_a(al, src_lat)
            pooled_X.append(np.asarray(aligned).reshape(len(src.y), -1))
            pooled_y.append(np.asarray(src.y))
        return (
            np.asarray(tar_lat).reshape(len(y_host), -1), pooled_X, pooled_y
        )

    shared = _align(None) if align_before_split else None
    for k in range(n_folds):
        tar_flat, pooled_X, pooled_y = (
            shared if shared is not None
            else _align(jnp.asarray(tr_m[k], jnp.float32))
        )
        tr_idx = np.where(tr_m[k] > 0)[0]
        te_idx = np.where(te_m[k] > 0)[0]
        tr_idx, va_idx = _split_val(tr_idx, val_frac, rng)
        X_tr = np.concatenate([tar_flat[tr_idx]] + pooled_X)
        y_tr = np.concatenate([y_host[tr_idx]] + pooled_y)
        folds.append(
            FoldData(
                train=(X_tr, y_tr),
                val=(tar_flat[va_idx], y_host[va_idx]),
                test=(tar_flat[te_idx], y_host[te_idx]),
            )
        )
    return folds


def ctc_holdout(
    datasets,
    val_frac: float = 0.1,
    test_frac: float = 0.2,
    seed: int = 0,
):
    """CTC held-out split with pooled cross data appended to train.

    ``datasets``: list of (X, labels, input_lens, label_lens); element 0 is
    the target (split into train/val/test), the rest join train whole —
    the CTCHeldOutTargetVal* contract (realtime_datamodule.py:176-254).
    """
    rng = np.random.default_rng(seed)
    X, y, il, ll = datasets[0]
    tr, va, te = train_val_test_masks(len(X), rng, val_frac, test_frac)
    tr_i, va_i, te_i = (np.where(m > 0)[0] for m in (tr, va, te))

    def sel(idx):
        return (X[idx], y[idx], il[idx], ll[idx])

    train = sel(tr_i)
    if len(datasets) > 1:
        parts = list(zip(*([train] + list(datasets[1:]))))
        train = tuple(np.concatenate(p) for p in parts)
    return FoldData(train=train, val=sel(va_i), test=sel(te_i))
