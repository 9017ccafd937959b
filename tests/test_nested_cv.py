"""Nested-CV hyperparameter search: traced hparams change results, the
selected candidates decode above chance, masks partition correctly."""

import jax.numpy as jnp
import numpy as np

from cross_patient_speech_decoding_tpu.data import make_synthetic_patients
from cross_patient_speech_decoding_tpu.decoders import (
    DecodeConfig,
    PatientArrays,
)
from cross_patient_speech_decoding_tpu.decoders.nested_cv import (
    inner_cv_masks,
    nested_cv_decode,
    sample_candidates,
)
from cross_patient_speech_decoding_tpu.decoders.pooled import (
    decode_fold_sep_align,
)
from cross_patient_speech_decoding_tpu.data.splits import stratified_kfold_masks


def _pts():
    ds = make_synthetic_patients(
        seed=1, n_patients=2, n_classes=5, trials_per_class=10, T=12,
        channels=(16, 20), latent_dim=4, noise=0.5,
    )
    uniq = np.unique(np.concatenate(ds.y_first))
    pts = [
        PatientArrays(
            X=jnp.asarray(ds.X[p]),
            y=jnp.asarray(np.searchsorted(uniq, ds.y_first[p]), jnp.int32),
            y_align=jnp.asarray(ds.class_ids[p], jnp.int32),
        )
        for p in range(2)
    ]
    cfg = DecodeConfig(n_comp=0.9, max_k=8, n_classes=len(uniq),
                       n_align_classes=ds.n_classes, lam=1e-2)
    return pts, cfg


def test_inner_masks_partition_outer_train():
    rng = np.random.default_rng(0)
    y = np.repeat(np.arange(4), 10)
    tr, te = stratified_kfold_masks(y, 4, rng)
    itr, ite = inner_cv_masks(tr[0], y, 3, rng)
    np.testing.assert_array_equal(ite.sum(axis=0), tr[0])  # partition of train
    for f in range(3):
        np.testing.assert_array_equal(itr[f] + ite[f], tr[0])
        assert (ite[f] * te[0]).sum() == 0  # outer test never leaks in


def test_traced_hparams_change_fold_result():
    pts, cfg = _pts()
    tr = jnp.asarray(np.concatenate([np.ones(40), np.zeros(10)]))
    te = 1.0 - tr
    hp_lo = {"n_comp": jnp.asarray(0.55, jnp.float32),
             "lam": jnp.asarray(10.0, jnp.float32),
             "gamma_scale": jnp.asarray(1.0, jnp.float32)}
    hp_hi = {"n_comp": jnp.asarray(0.98, jnp.float32),
             "lam": jnp.asarray(1e-3, jnp.float32),
             "gamma_scale": jnp.asarray(1.0, jnp.float32)}
    a_lo, _ = decode_fold_sep_align(pts[0], (pts[1],), tr, te, cfg, hp=hp_lo)
    a_hi, _ = decode_fold_sep_align(pts[0], (pts[1],), tr, te, cfg, hp=hp_hi)
    assert np.isfinite(float(a_lo)) and np.isfinite(float(a_hi))


def test_nested_cv_decodes_above_chance():
    pts, cfg = _pts()
    accs, best, cands = nested_cv_decode(
        pts[0], (pts[1],), cfg, n_folds=3, n_candidates=4, n_inner=2, seed=0
    )
    assert accs.shape == (3,)
    assert best.shape == (3,)
    assert all(0 <= b < 4 for b in best)
    assert accs.mean() > 1.0 / cfg.n_classes + 0.1, accs


def test_nested_cv_bayes_decodes_above_chance():
    """TPE-proposed candidates (the BayesSearchCV analog) reach at least
    the random-candidate nested-CV quality at the same trial count."""
    from cross_patient_speech_decoding_tpu.decoders.nested_cv import (
        nested_cv_decode_bayes,
    )

    pts, cfg = _pts()
    accs, hp_best = nested_cv_decode_bayes(
        pts[0], (pts[1],), cfg, n_folds=3, n_rounds=2, n_points=3,
        n_inner=2, seed=0,
    )
    assert accs.shape == (3,)
    for name in ("n_comp", "lam", "gamma_scale"):
        assert hp_best[name].shape == (3,)
    assert np.all(np.asarray(hp_best["n_comp"]) >= 0.5)
    assert np.all(np.asarray(hp_best["n_comp"]) <= 0.99)
    assert accs.mean() > 1.0 / cfg.n_classes + 0.1, accs


def test_inner_masks_are_stratified():
    """Inner CV mirrors the reference's StratifiedKFold: every inner test
    fold carries every class when counts allow (the old permutation split
    concentrated classes into single chunks)."""
    rng = np.random.default_rng(3)
    y = np.repeat(np.arange(4), 12)
    tr, _ = stratified_kfold_masks(y, 4, rng)
    itr, ite = inner_cv_masks(tr[0], y, 3, rng)
    np.testing.assert_array_equal(ite.sum(axis=0), tr[0])
    for f in range(3):
        test_classes = np.unique(y[ite[f] > 0])
        np.testing.assert_array_equal(test_classes, np.arange(4))
        train_classes = np.unique(y[itr[f] > 0])
        np.testing.assert_array_equal(train_classes, np.arange(4))
