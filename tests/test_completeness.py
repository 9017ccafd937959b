"""Tests for the completeness additions: trial-mode CCA, bagged ensemble,
scaling analysis, datamodule-equivalent fold prep."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats as sp_stats

from cross_patient_speech_decoding_tpu.data import make_synthetic_patients
from cross_patient_speech_decoding_tpu.data.datamodules import (
    aligned_folds,
    ctc_holdout,
    simple_folds,
)
from cross_patient_speech_decoding_tpu.decoders import PatientArrays
from cross_patient_speech_decoding_tpu.ops.cca import (
    fit_cca_aligner_trial,
    shared_trial_subselect_indices,
    transform_a_to_b,
    transform_b_to_a,
    transform_shared,
    fit_cca_aligner,
)
from cross_patient_speech_decoding_tpu.ops.classifiers import (
    bagged_classifier_fit,
    bagged_classifier_predict,
)
from cross_patient_speech_decoding_tpu.utils.scaling import (
    log_linear_fit,
    trials_to_target_per,
)


def _two_pts(seed=0):
    ds = make_synthetic_patients(seed=seed, n_patients=2, n_classes=5,
                                 trials_per_class=10, T=12,
                                 channels=(8, 8), latent_dim=4, noise=0.2)
    return ds


def test_shared_trial_subselect_indices():
    rng = np.random.default_rng(0)
    ya = np.array([0, 0, 0, 1, 1, 2])
    yb = np.array([0, 1, 1, 1, 3])
    ia, ib = shared_trial_subselect_indices(ya, yb, rng)
    assert len(ia) == len(ib)
    # class 0: min(3,1)=1; class 1: min(2,3)=2; classes 2,3 not shared
    assert len(ia) == 3
    np.testing.assert_array_equal(np.sort(ya[ia]), [0, 1, 1])
    np.testing.assert_array_equal(np.sort(yb[ib]), [0, 1, 1])


def test_trial_mode_cca_aligns_shared_latents():
    ds = _two_pts()
    rng = np.random.default_rng(1)
    ia, ib = shared_trial_subselect_indices(ds.class_ids[0], ds.class_ids[1], rng)
    Xa, Xb = jnp.asarray(ds.X[0]), jnp.asarray(ds.X[1])
    al = fit_cca_aligner_trial(Xa, Xb, ia, ib)
    assert float(al.alignment.canon_corrs[0]) > 0.7
    mapped = transform_b_to_a(al, Xb)
    assert mapped.shape == (Xb.shape[0], Xb.shape[1], Xa.shape[-1])


def test_transform_directions_consistent():
    ds = _two_pts(seed=2)
    Xa, Xb = jnp.asarray(ds.X[0]), jnp.asarray(ds.X[1])
    ia = jnp.asarray(ds.class_ids[0], jnp.int32)
    ib = jnp.asarray(ds.class_ids[1], jnp.int32)
    al = fit_cca_aligner(Xa, Xb, ia, ib, ds.n_classes)
    b2a = transform_b_to_a(al, Xb)
    a2b = transform_a_to_b(al, Xa)
    sa, sb = transform_shared(al, Xa, Xb)
    assert b2a.shape[-1] == Xa.shape[-1]
    assert a2b.shape[-1] == Xb.shape[-1]
    # shared-space projections correlate on the top canonical dim
    from cross_patient_speech_decoding_tpu.ops.cca import cnd_avg

    ca, _ = cnd_avg(sa, ia, ds.n_classes)
    cb, _ = cnd_avg(sb, ib, ds.n_classes)
    r = np.corrcoef(
        np.asarray(ca)[..., 0].ravel(), np.asarray(cb)[..., 0].ravel()
    )[0, 1]
    assert abs(r) > 0.8, r


def test_bagged_classifier_above_chance_and_batched():
    rng = np.random.default_rng(3)
    n, f, c = 90, 6, 3
    y = rng.integers(0, c, n)
    X = 0.3 * rng.normal(size=(n, f)).astype(np.float32) + np.pad(
        np.eye(c)[y], ((0, 0), (0, f - c))
    )
    clf = bagged_classifier_fit(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(y), c,
        n_estimators=10, lam=1e-2,
    )
    assert clf.dual_coef.shape == (10, n, c)
    preds = bagged_classifier_predict(clf, jnp.asarray(X), kernel="linear")
    assert (np.asarray(preds) == y).mean() > 0.9


def test_log_linear_scaling_extrapolation():
    trials = np.array([5, 30, 55, 80, 105])
    per = 120.0 * trials ** -0.35  # exact power law
    fit = log_linear_fit(trials, per)
    np.testing.assert_allclose(fit["slope"], -0.35, atol=1e-6)
    assert fit["r"] < -0.999
    t25 = trials_to_target_per(trials, per, 25.0)
    np.testing.assert_allclose(120.0 * t25 ** -0.35, 25.0, rtol=1e-6)
    # non-improving curve -> inf
    assert trials_to_target_per(trials, np.full(5, 50.0)) == float("inf")
    # slope p-value matches scipy.stats.linregress (supp_fig_18/19 report it)
    rng = np.random.default_rng(3)
    noisy = per * np.exp(0.05 * rng.normal(size=per.shape))
    fit_n = log_linear_fit(trials, noisy)
    ref = sp_stats.linregress(np.log(trials), np.log(noisy))
    np.testing.assert_allclose(fit_n["p_value"], ref.pvalue, rtol=1e-9)
    np.testing.assert_allclose(fit_n["r"], ref.rvalue, rtol=1e-9)


def test_simple_folds_structure():
    ds = _two_pts(seed=4)
    X, y = np.asarray(ds.X[0]), np.asarray(ds.class_ids[0])
    folds = simple_folds(X, y, n_folds=5, val_frac=0.1, seed=0)
    assert len(folds) == 5
    # test folds PARTITION the trials: every row appears in exactly one
    # test fold (size-sum alone would not catch duplicate/omitted rows)
    all_test = np.concatenate([f.test[0].reshape(len(f.test[1]), -1)
                               for f in folds])
    assert all_test.shape[0] == len(y)
    flat = X.reshape(len(y), -1)
    order_a = np.lexsort(all_test.T)
    order_b = np.lexsort(flat.T)
    np.testing.assert_array_equal(all_test[order_a], flat[order_b])
    f0 = folds[0]
    assert len(f0.train[1]) + len(f0.val[1]) + len(f0.test[1]) == len(y)


def test_aligned_folds_pool_cross_patients():
    ds = _two_pts(seed=5)
    pts = [
        PatientArrays(
            X=jnp.asarray(ds.X[p]),
            y=jnp.asarray(ds.class_ids[p], jnp.int32),
            y_align=jnp.asarray(ds.class_ids[p], jnp.int32),
        )
        for p in range(2)
    ]
    folds = aligned_folds(pts[0], [pts[1]], ds.n_classes, n_folds=3,
                          max_k=6, seed=0)
    n0 = len(ds.X[0])
    n1 = len(ds.X[1])
    f0 = folds[0]
    assert len(f0.train[1]) == (n0 - len(f0.val[1]) - len(f0.test[1])) + n1
    assert f0.train[0].shape[1] == ds.X[0].shape[1] * 6  # T * max_k flattened


def test_ctc_holdout_pools_cross():
    def mk(n, seed):
        rng = np.random.default_rng(seed)
        return (rng.normal(size=(n, 20, 4)).astype(np.float32),
                rng.integers(1, 5, (n, 2)), np.full(n, 20), np.full(n, 2))

    fold = ctc_holdout([mk(30, 0), mk(12, 1)], val_frac=0.1, test_frac=0.2)
    assert len(fold.test[0]) == 6
    assert len(fold.val[0]) == 3
    assert len(fold.train[0]) == 30 - 9 + 12


def test_bagged_decode_fold_at_least_single_model():
    """DecodeConfig.bagging wires the bootstrap ensemble into the fold
    program; on noisy data the ensemble matches or beats the single
    classifier (the reference's BaggingClassifier(SVC linear, 10) family,
    aligned_decode_svm.py:262-263)."""
    import jax.numpy as jnp

    from cross_patient_speech_decoding_tpu.data import make_synthetic_patients
    from cross_patient_speech_decoding_tpu.decoders import (
        DecodeConfig,
        PatientArrays,
    )
    from cross_patient_speech_decoding_tpu.decoders.pooled import (
        decode_fold_sep_align,
    )

    ds = make_synthetic_patients(seed=4, n_patients=2, n_classes=5,
                                 trials_per_class=12, T=16,
                                 channels=(24, 28), latent_dim=4, noise=2.5)
    uniq = np.unique(np.concatenate(ds.y_first))
    pts = [
        PatientArrays(
            X=jnp.asarray(ds.X[p]),
            y=jnp.asarray(np.searchsorted(uniq, ds.y_first[p]), jnp.int32),
            y_align=jnp.asarray(ds.class_ids[p], jnp.int32),
        )
        for p in range(2)
    ]
    n = len(ds.y_first[0])
    tr = jnp.asarray((np.arange(n) % 5 != 0).astype(np.float32))
    te = 1.0 - tr

    base = dict(n_comp=0.9, max_k=8, n_classes=len(uniq),
                n_align_classes=ds.n_classes, lam=1e-1, kernel="linear")
    acc_single, _ = decode_fold_sep_align(
        pts[0], (pts[1],), tr, te, DecodeConfig(**base)
    )
    acc_bag, _ = decode_fold_sep_align(
        pts[0], (pts[1],), tr, te, DecodeConfig(bagging=10, seed=3, **base)
    )
    assert float(acc_bag) >= float(acc_single) - 1e-6, (
        float(acc_bag), float(acc_single),
    )
    assert float(acc_bag) > 1.0 / len(uniq)  # above chance


def test_kernel_classifier_cholesky_solve_matches_lu_oracle():
    """The SPD-form solve equals the literal (W K + lam I) D = W Y system
    (float64 numpy LU), including exact-zero dual rows for masked samples.
    The symmetric rewrite exists because the TPU runtime's batched LU
    crashes the worker at production scale (round-3 log)."""
    from cross_patient_speech_decoding_tpu.ops.classifiers import (
        balanced_sample_weights,
        kernel_classifier_fit,
        rbf_kernel,
        scale_gamma,
    )

    rng = np.random.default_rng(5)
    N, F, C = 40, 7, 4
    X = rng.normal(size=(N, F)).astype(np.float32)
    y = rng.integers(0, C, N).astype(np.int32)
    mask = (rng.uniform(size=N) > 0.25).astype(np.float32)
    lam = 0.7

    clf = kernel_classifier_fit(
        jnp.asarray(X), jnp.asarray(y), C, lam=lam,
        sample_mask=jnp.asarray(mask),
    )

    gamma = float(scale_gamma(jnp.asarray(X), jnp.asarray(mask)))
    K = np.asarray(
        rbf_kernel(jnp.asarray(X), jnp.asarray(X), gamma), np.float64
    )
    w = np.asarray(
        balanced_sample_weights(jnp.asarray(y), C, jnp.asarray(mask)),
        np.float64,
    )
    Y = 2.0 * np.eye(C)[y] - 1.0
    want = np.linalg.solve(w[:, None] * K + lam * np.eye(N), w[:, None] * Y)

    got = np.asarray(clf.dual_coef, np.float64)
    np.testing.assert_allclose(got, want, atol=5e-5)
    # masked samples contribute exactly zero dual rows
    np.testing.assert_array_equal(got[mask == 0], 0.0)
