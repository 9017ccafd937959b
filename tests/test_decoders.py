"""End-to-end cross-patient decode: above chance, fold-masking correctness,
and statistical comparability with the reference's sklearn SVC pipeline."""

import jax.numpy as jnp
import numpy as np
import pytest

from cross_patient_speech_decoding_tpu.data import make_synthetic_patients
from cross_patient_speech_decoding_tpu.data.splits import (
    repeated_stratified_kfold_masks,
    stratified_kfold_masks,
)
from cross_patient_speech_decoding_tpu.decoders import (
    DecodeConfig,
    PatientArrays,
    make_cv_decoder,
)


def _dataset(seed=0, n_patients=3):
    ds = make_synthetic_patients(
        seed=seed,
        n_patients=n_patients,
        n_classes=6,
        trials_per_class=10,
        T=16,
        channels=(24, 30, 20)[:n_patients],
        latent_dim=5,
        noise=0.4,
    )
    pts = []
    for p in range(n_patients):
        # decode target: first phoneme (mapped to compact 0..n ids)
        y_first = ds.y_first[p]
        uniq = np.unique(np.concatenate(ds.y_first))
        y = np.searchsorted(uniq, y_first)
        pts.append(
            PatientArrays(
                X=jnp.asarray(ds.X[p]),
                y=jnp.asarray(y, jnp.int32),
                y_align=jnp.asarray(ds.class_ids[p], jnp.int32),
            )
        )
        if p == 0:
            n_y = len(uniq)
    return ds, pts, n_y


@pytest.fixture(scope="module")
def setup():
    ds, pts, n_y = _dataset()
    cfg = DecodeConfig(
        n_comp=0.9,
        max_k=10,
        n_classes=n_y,
        n_align_classes=ds.n_classes,
        lam=1e-2,
    )
    rng = np.random.default_rng(0)
    y_host = np.asarray(pts[0].y)
    tr, te = stratified_kfold_masks(y_host, 5, rng)
    return ds, pts, cfg, jnp.asarray(tr), jnp.asarray(te)


@pytest.mark.parametrize("strategy", ["sep_align", "sep_dimred", "joint_pca"])
def test_cross_patient_decode_above_chance(setup, strategy):
    ds, pts, cfg, tr, te = setup
    decoder = make_cv_decoder(strategy, cfg)
    accs = np.asarray(decoder(pts[0], tuple(pts[1:]), tr, te))
    chance = 1.0 / cfg.n_classes
    assert accs.shape == (5,)
    assert accs.mean() > chance + 0.15, (strategy, accs)


def test_aligned_beats_pooling_without_target(setup):
    """CCA alignment should transfer structure: cross-only pooled training
    (tar_in_train=False) must still decode above chance."""
    ds, pts, cfg, tr, te = setup
    import dataclasses

    cfg2 = dataclasses.replace(cfg, tar_in_train=False)
    decoder = make_cv_decoder("sep_align", cfg2)
    accs = np.asarray(decoder(pts[0], tuple(pts[1:]), tr, te))
    assert accs.mean() > 1.0 / cfg.n_classes + 0.1, accs


def test_fold_masking_equals_subset_pipeline(setup):
    """A fold computed via masks == recomputing on physically split data."""
    ds, pts, cfg, tr, te = setup
    from cross_patient_speech_decoding_tpu.decoders.pooled import (
        decode_fold_sep_align,
    )

    acc_masked, _ = decode_fold_sep_align(pts[0], tuple(pts[1:]), tr[0], te[0], cfg)

    # physically split target: train rows only for fitting; evaluate on test
    # rows via the same masked program with permuted-but-identical content
    tr_idx = np.where(np.asarray(tr[0]) > 0)[0]
    te_idx = np.where(np.asarray(te[0]) > 0)[0]
    order = np.concatenate([tr_idx, te_idx])
    tar2 = PatientArrays(
        X=pts[0].X[order], y=pts[0].y[order], y_align=pts[0].y_align[order]
    )
    m_tr = np.zeros(len(order))
    m_tr[: len(tr_idx)] = 1
    m_te = 1 - m_tr
    acc_perm, _ = decode_fold_sep_align(
        tar2, tuple(pts[1:]), jnp.asarray(m_tr), jnp.asarray(m_te), cfg
    )
    # f32 row-order permutation can flip a borderline prediction; the exact
    # masked==subset equivalences are covered at op level (test_pca/test_cca)
    np.testing.assert_allclose(float(acc_masked), float(acc_perm), atol=0.1)


def test_repeated_cv_vmap_batches():
    ds, pts, n_y = _dataset(seed=3, n_patients=2)
    cfg = DecodeConfig(
        n_comp=4, max_k=6, n_classes=n_y, n_align_classes=ds.n_classes, lam=1e-2
    )
    tr, te = repeated_stratified_kfold_masks(np.asarray(pts[0].y), 4, 2, seed=1)
    decoder = make_cv_decoder("sep_align", cfg, fold_batch=4)
    accs = np.asarray(decoder(pts[0], tuple(pts[1:]), jnp.asarray(tr), jnp.asarray(te)))
    assert accs.shape == (8,)
    assert np.all(accs >= 0) and np.all(accs <= 1)


def test_comparable_to_sklearn_svc(setup):
    """Kernel-ridge speed path decodes within noise of the reference's
    SVC(rbf, balanced) on the same aligned features (statistical check)."""
    from sklearn.svm import SVC
    from sklearn.metrics import balanced_accuracy_score

    ds, pts, cfg, tr, te = setup
    from cross_patient_speech_decoding_tpu.decoders.pooled import (
        decode_fold_sep_align,
        _fit_pca_latents,
        _transform_latents,
    )
    from cross_patient_speech_decoding_tpu.ops.cca import (
        fit_cca_aligner,
        transform_b_to_a,
    )

    ours, theirs = [], []
    for k in range(3):
        acc, _ = decode_fold_sep_align(pts[0], tuple(pts[1:]), tr[k], te[k], cfg)
        ours.append(float(acc))

        # same preprocessing, sklearn SVC decoder
        tar_pca = _fit_pca_latents(pts[0].X, cfg.n_comp, cfg.max_k, tr[k])
        tar_lat = _transform_latents(tar_pca, pts[0].X, cfg.max_k)
        feats, ys = [np.asarray(tar_lat.reshape(tar_lat.shape[0], -1))], [
            np.asarray(pts[0].y)
        ]
        for src in pts[1:]:
            src_pca = _fit_pca_latents(src.X, cfg.n_comp, cfg.max_k)
            src_lat = _transform_latents(src_pca, src.X, cfg.max_k)
            al = fit_cca_aligner(
                tar_lat, src_lat, pts[0].y_align, src.y_align,
                cfg.n_align_classes, mask_a=tr[k],
            )
            a = transform_b_to_a(al, src_lat)
            feats.append(np.asarray(a.reshape(a.shape[0], -1)))
            ys.append(np.asarray(src.y))

        tr_idx = np.asarray(tr[k]) > 0
        te_idx = np.asarray(te[k]) > 0
        X_pool = np.vstack([feats[0][tr_idx]] + feats[1:])
        y_pool = np.concatenate([ys[0][tr_idx]] + ys[1:])
        svc = SVC(kernel="rbf", class_weight="balanced").fit(X_pool, y_pool)
        theirs.append(
            balanced_accuracy_score(ys[0][te_idx], svc.predict(feats[0][te_idx]))
        )

    assert abs(np.mean(ours) - np.mean(theirs)) < 0.15, (ours, theirs)
    assert np.mean(ours) > 1.0 / cfg.n_classes + 0.15
