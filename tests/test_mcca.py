"""MCCA properties: 2-view/r=0 reduces to classical CCA; multi-view shared
latents align; regularization and rank masks behave; joint-PCA parity."""

import jax.numpy as jnp
import numpy as np

from cross_patient_speech_decoding_tpu.data import make_synthetic_patients
from cross_patient_speech_decoding_tpu.ops import (
    joint_pca_fit,
    joint_pca_transform,
    mcca_fit,
    mcca_transform,
    fit_mcca_aligner,
)
from cross_patient_speech_decoding_tpu.ops.metrics import pearson_r

from oracles import oracle_joint_pca_transforms


def _two_views(seed=0, R=200, p1=6, p2=8, rank=3):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(R, rank))
    X1 = z @ rng.normal(size=(rank, p1)) + 0.2 * rng.normal(size=(R, p1))
    X2 = z @ rng.normal(size=(rank, p2)) + 0.2 * rng.normal(size=(R, p2))
    return X1, X2


def _numpy_cca_corrs(X1, X2, k):
    """Classical CCA canonical correlations via whitened SVD."""
    X1 = X1 - X1.mean(0)
    X2 = X2 - X2.mean(0)
    q1, _ = np.linalg.qr(X1)
    q2, _ = np.linalg.qr(X2)
    s = np.linalg.svd(q1.T @ q2, compute_uv=False)
    return s[:k]


def test_two_view_unregularized_matches_classical_cca():
    X1, X2 = _two_views()
    k = 3
    st = mcca_fit([jnp.asarray(X1), jnp.asarray(X2)], k, regs=0.0)
    t1 = np.asarray(mcca_transform(st, jnp.asarray(X1), 0))
    t2 = np.asarray(mcca_transform(st, jnp.asarray(X2), 1))
    want = _numpy_cca_corrs(X1, X2, k)
    got = np.array(
        [abs(np.corrcoef(t1[:, i], t2[:, i])[0, 1]) for i in range(k)]
    )
    np.testing.assert_allclose(np.sort(got)[::-1], want, atol=2e-3)


def test_multiview_shared_latent_alignment():
    rng = np.random.default_rng(1)
    z = rng.normal(size=(150, 3))
    views = [
        jnp.asarray(z @ rng.normal(size=(3, p)) + 0.15 * rng.normal(size=(150, p)))
        for p in (5, 7, 6)
    ]
    st = mcca_fit(views, 3, regs=0.3)
    ts = [np.asarray(mcca_transform(st, v, i)) for i, v in enumerate(views)]
    # leading shared component must correlate strongly across all pairs
    for i in range(3):
        for j in range(i + 1, 3):
            r = abs(np.corrcoef(ts[i][:, 0], ts[j][:, 0])[0, 1])
            assert r > 0.9, (i, j, r)


def test_row_mask_equals_subset():
    X1, X2 = _two_views(seed=2)
    mask = np.zeros(200)
    mask[:140] = 1
    st_m = mcca_fit(
        [jnp.asarray(X1), jnp.asarray(X2)], 3, regs=0.2,
        row_mask=jnp.asarray(mask),
    )
    st_s = mcca_fit([jnp.asarray(X1[:140]), jnp.asarray(X2[:140])], 3, regs=0.2)
    for a, b in zip(st_m.loadings, st_s.loadings):
        a, b = np.asarray(a), np.asarray(b)
        signs = np.sign(np.sum(a * b, axis=0))
        np.testing.assert_allclose(a, b * signs[None, :], atol=5e-3)


def test_fit_mcca_aligner_class_mode_decodes_structure():
    ds = make_synthetic_patients(seed=3, n_patients=3, n_classes=5,
                                 trials_per_class=10, T=12,
                                 channels=(10, 12, 9), latent_dim=4,
                                 noise=0.2)
    Xs = [jnp.asarray(x) for x in ds.X]
    ids = [jnp.asarray(i, jnp.int32) for i in ds.class_ids]
    st = fit_mcca_aligner(Xs, ids, ds.n_classes, n_components=4, regs=0.5)
    assert np.asarray(st.shared_mask).sum() == ds.n_classes
    # condition-averaged trajectories in shared space should correlate
    from cross_patient_speech_decoding_tpu.ops.cca import cnd_avg

    t0 = mcca_transform(st, Xs[0], 0)
    t1 = mcca_transform(st, Xs[1], 1)
    a0, _ = cnd_avg(t0, ids[0], ds.n_classes)
    a1, _ = cnd_avg(t1, ids[1], ds.n_classes)
    r = float(pearson_r(np.asarray(a0)[..., 0].ravel(), np.asarray(a1)[..., 0].ravel()))
    assert abs(r) > 0.8, r


def test_joint_pca_matches_oracle():
    ds = make_synthetic_patients(seed=4, n_patients=3, n_classes=5,
                                 trials_per_class=8, T=10,
                                 channels=(8, 9, 7), latent_dim=4,
                                 noise=0.1)
    Xs = [jnp.asarray(x) for x in ds.X]
    ids = [jnp.asarray(i, jnp.int32) for i in ds.class_ids]
    st = joint_pca_fit(Xs, ids, ds.n_classes, 4, max_components=6)

    want = oracle_joint_pca_transforms(ds.X, ds.class_ids, 4)
    for i, w in enumerate(want):
        got = np.asarray(st.read_ins[i])[:, :4]
        signs = np.sign(np.sum(got * w, axis=0))
        np.testing.assert_allclose(got, w * signs[None, :], atol=5e-3)
        # transform shapes
        t = joint_pca_transform(st, Xs[i], i)
        assert t.shape == ds.X[i].shape[:2] + (6,)


def test_mcca_regs_matches_mvlearn_transcription():
    """Gram-scale regularization parity: loadings/evals vs the float64
    numpy transcription of mvlearn's GEVP (oracles.oracle_mcca_gevp).
    mvlearn itself is not installable here; the transcription pins its
    documented conventions (raw X^T X, unscaled r*I, RHS-orthonormal
    eigenvectors)."""
    from oracles import oracle_mcca_gevp

    rng = np.random.default_rng(3)
    z = rng.normal(size=(60, 4))
    Xs = [
        (z @ rng.normal(size=(4, p)) + 0.3 * rng.normal(size=(60, p)))
        for p in (6, 9, 7)
    ]
    k = 4
    for regs in (0.1, 0.5, 0.9):
        W_o, ev_o, means_o = oracle_mcca_gevp(Xs, k, regs=regs)
        st = mcca_fit([jnp.asarray(X, jnp.float32) for X in Xs], k, regs)
        np.testing.assert_allclose(np.asarray(st.evals), ev_o, rtol=2e-3)
        for b in range(3):
            scores_o = (Xs[b] - means_o[b]) @ W_o[b]
            scores_m = np.asarray(
                mcca_transform(st, jnp.asarray(Xs[b], jnp.float32), b)
            )
            # columns defined up to sign
            sign = np.sign(
                np.sum(scores_o * scores_m, axis=0, keepdims=True)
            )
            np.testing.assert_allclose(
                scores_m * sign, scores_o, atol=5e-3 * np.abs(scores_o).max()
            )


def test_mcca_signal_ranks_matches_imcca_transcription():
    """signal_ranks path == mvlearn i_mcca (SVD-reduce, solve reduced GEVP,
    map back through the per-view bases)."""
    from oracles import oracle_mcca_gevp

    rng = np.random.default_rng(7)
    z = rng.normal(size=(80, 3))
    Xs = [
        (z @ rng.normal(size=(3, p)) + 0.2 * rng.normal(size=(80, p)))
        for p in (8, 10)
    ]
    k, ranks = 3, [5, 6]
    W_o, ev_o, means_o = oracle_mcca_gevp(Xs, k, regs=0.5, signal_ranks=ranks)
    st = mcca_fit(
        [jnp.asarray(X, jnp.float32) for X in Xs], k, 0.5,
        signal_ranks=[jnp.asarray(r) for r in ranks],
    )
    np.testing.assert_allclose(np.asarray(st.evals), ev_o, rtol=2e-3)
    for b in range(2):
        scores_o = (Xs[b] - means_o[b]) @ W_o[b]
        scores_m = np.asarray(
            mcca_transform(st, jnp.asarray(Xs[b], jnp.float32), b)
        )
        sign = np.sign(np.sum(scores_o * scores_m, axis=0, keepdims=True))
        np.testing.assert_allclose(
            scores_m * sign, scores_o, atol=5e-3 * np.abs(scores_o).max()
        )


def test_mcca_rank_deficient_view_matches_transcription():
    """Degenerate-view envelope: a rank-deficient view (duplicated
    columns) with regs > 0 still matches the float64 mvlearn
    transcription — the r*I term keeps the GEVP well-posed exactly as
    mvlearn's regularization does."""
    from oracles import oracle_mcca_gevp

    rng = np.random.default_rng(11)
    z = rng.normal(size=(70, 3))
    X1 = z @ rng.normal(size=(3, 6)) + 0.2 * rng.normal(size=(70, 6))
    base = z @ rng.normal(size=(3, 4)) + 0.2 * rng.normal(size=(70, 4))
    X2 = np.concatenate([base, base[:, :3]], axis=1)  # rank 4, p=7
    k = 3
    W_o, ev_o, means_o = oracle_mcca_gevp([X1, X2], k, regs=0.5)
    st = mcca_fit([jnp.asarray(X1, jnp.float32),
                   jnp.asarray(X2, jnp.float32)], k, regs=0.5)
    np.testing.assert_allclose(np.asarray(st.evals), ev_o, rtol=5e-3)
    for b, X in enumerate((X1, X2)):
        scores_o = (X - means_o[b]) @ W_o[b]
        scores_m = np.asarray(
            mcca_transform(st, jnp.asarray(X, jnp.float32), b)
        )
        sign = np.sign(np.sum(scores_o * scores_m, axis=0, keepdims=True))
        np.testing.assert_allclose(
            scores_m * sign, scores_o, atol=1e-2 * np.abs(scores_o).max()
        )


def test_mcca_duplicate_views_matches_transcription():
    """Two identical views: perfectly correlated canonical directions
    (top eigenvalues -> n_views) and transcription parity at regs > 0."""
    from oracles import oracle_mcca_gevp

    rng = np.random.default_rng(12)
    X = rng.normal(size=(60, 5))
    k = 3
    W_o, ev_o, means_o = oracle_mcca_gevp([X, X.copy()], k, regs=0.5)
    st = mcca_fit([jnp.asarray(X, jnp.float32)] * 2, k, regs=0.5)
    np.testing.assert_allclose(np.asarray(st.evals), ev_o, rtol=5e-3)
    t0 = np.asarray(mcca_transform(st, jnp.asarray(X, jnp.float32), 0))
    t1 = np.asarray(mcca_transform(st, jnp.asarray(X, jnp.float32), 1))
    for i in range(k):
        r = abs(np.corrcoef(t0[:, i], t1[:, i])[0, 1])
        assert r > 0.999, (i, r)


def test_mcca_unregularized_rank_deficient_is_finite():
    """regs=0 on a singular Gram: OUTSIDE the mvlearn-parity envelope
    (scipy eigh on a singular RHS is undefined); the masked pseudo-inverse
    whitening documented in the module keeps every output finite and the
    shared structure aligned."""
    rng = np.random.default_rng(13)
    z = rng.normal(size=(50, 2))
    X1 = z @ rng.normal(size=(2, 5)) + 0.1 * rng.normal(size=(50, 5))
    base = z @ rng.normal(size=(2, 3))
    X2 = np.concatenate([base, base], axis=1)  # exactly rank 2, p=6
    st = mcca_fit([jnp.asarray(X1, jnp.float32),
                   jnp.asarray(X2, jnp.float32)], 2, regs=0.0)
    assert np.isfinite(np.asarray(st.evals)).all()
    t1 = np.asarray(mcca_transform(st, jnp.asarray(X1, jnp.float32), 0))
    t2 = np.asarray(mcca_transform(st, jnp.asarray(X2, jnp.float32), 1))
    assert np.isfinite(t1).all() and np.isfinite(t2).all()
    r = abs(np.corrcoef(t1[:, 0], t2[:, 0])[0, 1])
    assert r > 0.9, r


def test_pca_var_ranks_honor_sample_masks():
    """The whitening ranks must come from the TRAIN rows only: a held-out
    trial with huge variance in an extra direction must not change the
    fitted loadings (pre-fix it flipped the rank estimate)."""
    import jax.numpy as jnp

    from cross_patient_speech_decoding_tpu.ops.mcca import fit_mcca_aligner

    rng = np.random.default_rng(11)
    N, T, K, C = 24, 6, 5, 3
    Xs, ids = [], []
    for p in range(2):
        X = rng.normal(size=(N, T, K)).astype(np.float32) * 0.1
        X[..., 0] += 3.0  # one dominant direction on the train rows
        Xs.append(X)
        ids.append(np.repeat(np.arange(C), N // C).astype(np.int32))
    # corrupt the final row (held out) with massive variance everywhere
    X_bad = [x.copy() for x in Xs]
    for x in X_bad:
        x[-1] = rng.normal(size=(T, K)).astype(np.float32) * 100.0
    mask = np.ones(N, np.float32)
    mask[-1] = 0.0

    kw = dict(n_classes=C, n_components=3, regs=0.5, pca_var=0.9)
    st_clean = fit_mcca_aligner(
        [jnp.asarray(x) for x in Xs], [jnp.asarray(i) for i in ids],
        sample_masks=[jnp.asarray(mask)] * 2, **kw,
    )
    st_corrupt = fit_mcca_aligner(
        [jnp.asarray(x) for x in X_bad], [jnp.asarray(i) for i in ids],
        sample_masks=[jnp.asarray(mask)] * 2, **kw,
    )
    for a, b in zip(st_clean.loadings, st_corrupt.loadings):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
