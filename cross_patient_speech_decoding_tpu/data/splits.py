"""Cross-validation split generation as mask batches.

The reference runs sklearn ``StratifiedKFold(n_splits, shuffle=True)`` (with
a ``KFold`` fallback when some class has fewer members than folds —
`nn_models/data_utils/datamodules.py:177-198`) inside Python loops of 50
iterations x 20 folds. Here splits are generated host-side as boolean mask
arrays of shape (n_iters * n_folds, N) so the whole CV product becomes a
single vmap axis of the jitted fold program.
"""

from __future__ import annotations

import numpy as np


def stratified_kfold_masks(y: np.ndarray, n_folds: int, rng: np.random.Generator):
    """One shuffled stratified k-fold split -> (train_masks, test_masks).

    Falls back to plain KFold when any class has fewer members than
    ``n_folds`` (the reference's ``select_cv`` behavior).
    """
    y = np.asarray(y)
    N = len(y)
    test_fold = np.empty(N, dtype=np.int64)

    _, counts = np.unique(y, return_counts=True)
    if counts.min() < n_folds:
        perm = rng.permutation(N)
        for f, chunk in enumerate(np.array_split(perm, n_folds)):
            test_fold[chunk] = f
    else:
        for c in np.unique(y):
            idx = rng.permutation(np.where(y == c)[0])
            for f, chunk in enumerate(np.array_split(idx, n_folds)):
                test_fold[chunk] = f

    folds = np.arange(n_folds)[:, None]
    test_masks = (test_fold[None, :] == folds).astype(np.float64)
    train_masks = 1.0 - test_masks
    return train_masks, test_masks


def repeated_stratified_kfold_masks(
    y: np.ndarray, n_folds: int, n_iters: int, seed: int = 0
):
    """(n_iters * n_folds, N) masks for the reference's repeated-CV design."""
    rng = np.random.default_rng(seed)
    trs, tes = [], []
    for _ in range(n_iters):
        tr, te = stratified_kfold_masks(y, n_folds, rng)
        trs.append(tr)
        tes.append(te)
    return np.concatenate(trs), np.concatenate(tes)


def train_val_test_masks(
    N: int, rng: np.random.Generator, val_frac: float = 0.1, test_frac: float = 0.2
):
    """Single shuffled train/val/test split as three masks."""
    perm = rng.permutation(N)
    n_test = int(round(N * test_frac))
    n_val = int(round(N * val_frac))
    test = np.zeros(N)
    val = np.zeros(N)
    train = np.zeros(N)
    test[perm[:n_test]] = 1
    val[perm[n_test : n_test + n_val]] = 1
    train[perm[n_test + n_val :]] = 1
    return train, val, test
