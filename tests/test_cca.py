"""Parity tests: ops.cca vs a float64 numpy QR oracle of the reference math."""

import jax
import jax.numpy as jnp
import numpy as np

from cross_patient_speech_decoding_tpu.data import make_synthetic_patients
from cross_patient_speech_decoding_tpu.ops import (
    cca_align,
    cnd_avg,
    fit_cca_aligner,
    transform_b_to_a,
)

from oracles import (
    oracle_cca_align,
    oracle_class_latents,
    oracle_cnd_avg,
    oracle_aligned_transform,
)


def _latents(seed, R=120, ka=7, kb=9, rank=5):
    """Latent pairs with distinct, well-separated canonical correlations.

    f32 vs f64 parity is only meaningful where the CCA solution is
    well-conditioned: shared directions get per-direction noise of distinct
    magnitude (distinct canon corrs), unshared dims are pure noise, and the
    mixings are orthogonal with mild (<=3x) column scaling.
    """
    rng = np.random.default_rng(seed)
    shared = rng.normal(size=(R, rank))

    def make(k, key_noise):
        cols = []
        for i in range(rank):
            sigma = 0.15 * (i + 1)
            cols.append(shared[:, i] + sigma * key_noise.normal(size=R))
        for j in range(k - rank):
            cols.append(2.0 * key_noise.normal(size=R))
        M = np.stack(cols, axis=1)
        q, _ = np.linalg.qr(key_noise.normal(size=(k, k)))
        scale = np.linspace(1.0, 3.0, k)
        return M @ (q * scale[None, :])

    return make(ka, rng), make(kb, rng)


def test_cnd_avg_matches_oracle():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(40, 10, 6))
    y = rng.integers(0, 5, 40)
    ours, counts = cnd_avg(jnp.asarray(X), jnp.asarray(y, jnp.int32), 5)
    np.testing.assert_allclose(np.asarray(ours), oracle_cnd_avg(X, y), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(counts), np.bincount(y, minlength=5))


def test_cca_canon_corrs_match_oracle_full_rank():
    La, Lb = _latents(1)
    # oracle takes (dims, samples)
    _, _, s_oracle = oracle_cca_align(La.T.copy(), Lb.T.copy())
    res = cca_align(jnp.asarray(La), jnp.asarray(Lb))
    d = int(res.d)
    assert d == len(s_oracle)
    np.testing.assert_allclose(np.asarray(res.canon_corrs[:d]), s_oracle, atol=2e-4)


def test_cca_aligned_transform_matches_oracle():
    """The composite X @ M_b @ pinv(M_a) is factorization-invariant."""
    La, Lb = _latents(2)
    m_a, m_b, _ = oracle_cca_align(La.T.copy(), Lb.T.copy())
    rng = np.random.default_rng(3)
    X_b = rng.normal(size=(30, Lb.shape[1]))
    want = oracle_aligned_transform(X_b, m_a, m_b)

    res = cca_align(jnp.asarray(La), jnp.asarray(Lb))
    # verify with a float64 numpy matmul: a bare `jnp @` here would run at
    # JAX's default reduced matmul precision and swamp the comparison
    got = X_b @ np.asarray(res.proj_b_to_a).astype(np.float64)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_cca_rank_deficient_masking_matches_oracle():
    """Zero-masked trailing latent dims == oracle on truncated matrices."""
    La, Lb = _latents(4, ka=6, kb=8, rank=4)
    # mask last 2 dims of a, last 3 of b (simulating PCA variance masking)
    La_m = np.concatenate([La[:, :4], np.zeros((La.shape[0], 2))], axis=1)
    Lb_m = np.concatenate([Lb[:, :5], np.zeros((Lb.shape[0], 3))], axis=1)

    m_a, m_b, s_oracle = oracle_cca_align(La[:, :4].T.copy(), Lb[:, :5].T.copy())
    rng = np.random.default_rng(5)
    X_b = rng.normal(size=(20, 5))
    want = oracle_aligned_transform(X_b, m_a, m_b)  # (20, 4)

    res = cca_align(jnp.asarray(La_m), jnp.asarray(Lb_m))
    d = int(res.d)
    assert d == len(s_oracle)
    np.testing.assert_allclose(np.asarray(res.canon_corrs[:d]), s_oracle, atol=2e-4)

    X_b_m = np.concatenate([X_b, np.zeros((20, 3))], axis=1)
    got = X_b_m @ np.asarray(res.proj_b_to_a).astype(np.float64)
    np.testing.assert_allclose(got[:, :4], want, atol=2e-4)
    np.testing.assert_allclose(got[:, 4:], 0.0, atol=1e-6)


def test_cca_row_mask_equals_row_selection():
    La, Lb = _latents(6, R=90)
    mask = np.zeros(90)
    mask[: 60] = 1.0
    res_masked = cca_align(jnp.asarray(La), jnp.asarray(Lb), jnp.asarray(mask))
    res_subset = cca_align(jnp.asarray(La[:60]), jnp.asarray(Lb[:60]))
    d = int(res_subset.d)
    assert int(res_masked.d) == d
    np.testing.assert_allclose(
        np.asarray(res_masked.canon_corrs), np.asarray(res_subset.canon_corrs),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(res_masked.proj_b_to_a), np.asarray(res_subset.proj_b_to_a),
        atol=5e-3,
    )


def test_fit_cca_aligner_end_to_end_vs_oracle():
    """Full AlignCCA path: cnd-avg over shared classes -> CCA -> b->a map."""
    ds = make_synthetic_patients(seed=7, n_patients=2, latent_dim=5,
                                 channels=(6, 8), noise=0.05,
                                 trials_per_class=8, T=20)
    X_a, X_b = ds.X
    y_a, y_b = ds.class_ids
    # drop one class from b so the shared-class intersection is exercised
    keep_b = y_b != 2
    X_b, y_b = X_b[keep_b], y_b[keep_b]

    La, Lb = oracle_class_latents(X_a, X_b, y_a, y_b)
    m_a, m_b, s_oracle = oracle_cca_align(La.T.copy(), Lb.T.copy())
    want = oracle_aligned_transform(X_b, m_a, m_b)

    aligner = fit_cca_aligner(
        jnp.asarray(X_a), jnp.asarray(X_b),
        jnp.asarray(y_a, jnp.int32), jnp.asarray(y_b, jnp.int32),
        ds.n_classes,
    )
    got = np.asarray(transform_b_to_a(aligner, jnp.asarray(X_b)))
    d = int(aligner.alignment.d)
    assert d == len(s_oracle)
    np.testing.assert_allclose(
        np.asarray(aligner.alignment.canon_corrs[:d]), s_oracle, atol=5e-4
    )
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_fit_cca_aligner_flat_layout_matches_unflat():
    """t_len flat path: (N, T*K) trials give bit-equal math to (N, T, K).

    The flat layout exists for TPU lane density (K << 128 pads reads
    ~128/K); the averaged matrices and everything downstream are
    identical, so results must agree to f32 tolerance.
    """
    ds = make_synthetic_patients(seed=11, n_patients=2, latent_dim=5,
                                 channels=(6, 8), noise=0.05,
                                 trials_per_class=8, T=20)
    X_a, X_b = ds.X
    y_a, y_b = ds.class_ids
    T = X_a.shape[1]

    ref = fit_cca_aligner(
        jnp.asarray(X_a), jnp.asarray(X_b),
        jnp.asarray(y_a, jnp.int32), jnp.asarray(y_b, jnp.int32),
        ds.n_classes,
    )
    flat = fit_cca_aligner(
        jnp.asarray(X_a.reshape(X_a.shape[0], -1)),
        jnp.asarray(X_b.reshape(X_b.shape[0], -1)),
        jnp.asarray(y_a, jnp.int32), jnp.asarray(y_b, jnp.int32),
        ds.n_classes, t_len=T,
    )
    assert int(flat.alignment.d) == int(ref.alignment.d)
    np.testing.assert_allclose(
        np.asarray(flat.alignment.canon_corrs),
        np.asarray(ref.alignment.canon_corrs), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(flat.alignment.proj_b_to_a),
        np.asarray(ref.alignment.proj_b_to_a), atol=1e-4)


def test_cca_chol_matches_oracle_full_rank():
    """method='chol' (Cholesky whitening): factorization-invariant outputs
    must match the float64 QR oracle on full-rank data."""
    La, Lb = _latents(21)
    m_a, m_b, s_oracle = oracle_cca_align(La.T.copy(), Lb.T.copy())
    rng = np.random.default_rng(22)
    X_b = rng.normal(size=(30, Lb.shape[1]))
    want = oracle_aligned_transform(X_b, m_a, m_b)

    res = cca_align(jnp.asarray(La), jnp.asarray(Lb), method="chol")
    d = int(res.d)
    assert d == len(s_oracle)
    np.testing.assert_allclose(np.asarray(res.canon_corrs[:d]), s_oracle,
                               atol=2e-4)
    got = X_b @ np.asarray(res.proj_b_to_a).astype(np.float64)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_cca_chol_masked_trailing_dims():
    """chol envelope: exact-zero masked trailing columns (the PCA
    variance-mask production case) are identity-padded exactly — results
    equal the oracle on the truncated matrices, masked dims exact zero."""
    La, Lb = _latents(23, ka=6, kb=8, rank=4)
    La_m = np.concatenate([La[:, :4], np.zeros((La.shape[0], 2))], axis=1)
    Lb_m = np.concatenate([Lb[:, :5], np.zeros((Lb.shape[0], 3))], axis=1)

    m_a, m_b, s_oracle = oracle_cca_align(La[:, :4].T.copy(), Lb[:, :5].T.copy())
    rng = np.random.default_rng(24)
    X_b = rng.normal(size=(20, 5))
    want = oracle_aligned_transform(X_b, m_a, m_b)

    res = cca_align(jnp.asarray(La_m), jnp.asarray(Lb_m), method="chol")
    d = int(res.d)
    assert d == len(s_oracle)
    np.testing.assert_allclose(np.asarray(res.canon_corrs[:d]), s_oracle,
                               atol=2e-4)
    X_b_m = np.concatenate([X_b, np.zeros((20, 3))], axis=1)
    got = X_b_m @ np.asarray(res.proj_b_to_a).astype(np.float64)
    np.testing.assert_allclose(got[:, :4], want, atol=2e-4)
    np.testing.assert_allclose(got[:, 4:], 0.0, atol=1e-6)


def test_cca_chol_agrees_with_gram_batched():
    """chol vs gram whitening on a batched equal-width pair (the bench /
    fold-program shape class, exercising the stacked-factorization path)."""
    pairs = [_latents(30 + i, ka=8, kb=8, rank=6) for i in range(4)]
    La = jnp.asarray(np.stack([p[0] for p in pairs]))
    Lb = jnp.asarray(np.stack([p[1] for p in pairs]))
    res_g = cca_align(La, Lb, method="gram")
    res_c = cca_align(La, Lb, method="chol")
    np.testing.assert_array_equal(np.asarray(res_c.d), np.asarray(res_g.d))
    np.testing.assert_allclose(np.asarray(res_c.canon_corrs),
                               np.asarray(res_g.canon_corrs), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_c.proj_b_to_a),
                               np.asarray(res_g.proj_b_to_a), atol=2e-3)


def test_cca_chol_ill_conditioned_envelope():
    """chol's accuracy gradient: f32 Cholesky whitening loses ~eps*cond
    accuracy, so at Gram cond ~1e6 (1e3 column-scale spread) the corrs
    drift ~1e-2 from the float64 oracle while gram-eigh stays ~1e-5
    (per-eigenvalue inversion). Pins the documented envelope: rank and
    coarse corrs survive; use 'gram' when cond is high and tight parity
    matters."""
    La, Lb = _latents(50)
    scale = np.logspace(0, -3, La.shape[1])
    La_s = (La * scale).astype(np.float64)
    m_a, m_b, s_oracle = oracle_cca_align(La_s.T.copy(), Lb.T.copy())

    res_c = cca_align(jnp.asarray(La_s, dtype=jnp.float32),
                      jnp.asarray(Lb), method="chol")
    res_g = cca_align(jnp.asarray(La_s, dtype=jnp.float32),
                      jnp.asarray(Lb), method="gram")
    assert int(res_c.d) == len(s_oracle)
    np.testing.assert_allclose(np.asarray(res_c.canon_corrs[:3]),
                               s_oracle[:3], atol=2e-2)
    np.testing.assert_allclose(np.asarray(res_g.canon_corrs[:3]),
                               s_oracle[:3], atol=1e-4)


def test_cca_gram_handles_duplicated_columns():
    """Non-axis-aligned rank deficiency (duplicated channel -> a latent
    column repeated) is OUTSIDE the chol envelope but inside gram's:
    gram's eigenvalue masking must detect the true rank and match the
    float64 oracle on the independent columns. Pins the policy that
    user data of unknown rank (sklearn AlignCCA shim) uses gram."""
    La, Lb = _latents(40, ka=6, kb=7, rank=4)
    # duplicate a column of b: rank(Lb_dup) == kb, deficiency is in a
    # rotated direction, not a zero column
    Lb_dup = np.concatenate([Lb, Lb[:, 2:3]], axis=1)

    m_a, m_b, s_oracle = oracle_cca_align(La.T.copy(), Lb.T.copy())
    res = cca_align(jnp.asarray(La), jnp.asarray(Lb_dup), method="gram")
    d = int(res.d)
    # gram must NOT report a spurious extra canonical direction
    assert d == len(s_oracle)
    np.testing.assert_allclose(np.asarray(res.canon_corrs[:d]), s_oracle,
                               atol=5e-4)


def test_cca_vmap_over_pairs():
    """Many patient-pair alignments in one launch (the bench surface)."""
    pairs = [_latents(10 + i) for i in range(5)]
    La = jnp.asarray(np.stack([p[0] for p in pairs]))
    Lb = jnp.asarray(np.stack([p[1] for p in pairs]))
    batched = jax.vmap(cca_align)(La, Lb)
    for i in range(5):
        single = cca_align(La[i], Lb[i])
        np.testing.assert_allclose(
            np.asarray(batched.canon_corrs[i]), np.asarray(single.canon_corrs),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(batched.proj_b_to_a[i]), np.asarray(single.proj_b_to_a),
            atol=1e-3,
        )


def test_shared_trial_subselect_disjoint_classes_raises():
    import pytest

    from cross_patient_speech_decoding_tpu.ops.cca import (
        shared_trial_subselect_indices,
    )

    rng = np.random.default_rng(12)
    with pytest.raises(ValueError, match="no shared classes"):
        shared_trial_subselect_indices(
            np.array([0, 0, 1]), np.array([2, 3, 3]), rng
        )


def test_fast_masked_pinv_degenerate_column_inside_mask():
    """A zero column NOT reflected in col_mask must not NaN the pinv.

    Regression: the TPU gram-SVD zeroes near-zero canonical-correlation
    directions, leaving an exact-zero column in m_a while col_mask still
    marks it valid — the normal-equation Gram is then exactly singular
    and the Cholesky NaN'd the whole alignment (round-3 refscale CTC
    bug). The pinv must self-detect degenerate columns and return the
    exact pinv (zero ROW for a zero column)."""
    from cross_patient_speech_decoding_tpu.ops.cca import _fast_masked_pinv

    rng = np.random.default_rng(7)
    M = rng.normal(size=(9, 4)).astype(np.float32)
    M[:, 2] = 0.0  # degenerate despite mask==1
    mask = jnp.ones((4,), jnp.float32)
    p = np.asarray(_fast_masked_pinv(jnp.asarray(M), mask))
    assert np.isfinite(p).all()
    np.testing.assert_allclose(p, np.linalg.pinv(M), atol=2e-5)
    np.testing.assert_array_equal(p[2], np.zeros(9, np.float32))


def test_cca_gram_svd_zero_correlation_direction_finite():
    """The TPU gram-SVD path (forced on CPU) with an exactly-orthogonal
    direction pair: the zeroed singular direction must leave the
    alignment manifold (col_mask), not poison the pinv with NaN.

    Regression for the round-3 refscale CTC NaN: before the fix,
    col_mask came from whitening ranks alone, so the s-zeroed column of
    m_a hit _fast_masked_pinv as 'valid' -> singular Gram -> NaN."""
    from cross_patient_speech_decoding_tpu.ops.cca import _cca_align_gram

    # exact-arithmetic construction (f32 products/sums all exact): each
    # column is a +1/-1 spike pair (zero-mean by construction), shared
    # columns are identical (corr exactly 1), the private pair has
    # disjoint support (corr exactly 0 -> the gram-SVD's keep mask
    # zeroes it deterministically)
    def spike(r, a):
        c = np.zeros(r, np.float32)
        c[a], c[a + 1] = 1.0, -1.0
        return c

    R = 64
    shared = [spike(R, 4 * j) for j in range(3)]
    La = np.stack(shared + [spike(R, 20)], axis=1)
    Lb = np.stack(shared + [spike(R, 30)], axis=1)
    La_c, Lb_c = jnp.asarray(La), jnp.asarray(Lb)

    for chol in (False, True):
        res = _cca_align_gram(La_c, Lb_c, chol=chol, force_gram=True)
        for name in ("m_a", "m_b", "canon_corrs", "proj_b_to_a",
                     "proj_a_to_b"):
            arr = np.asarray(getattr(res, name))
            assert np.isfinite(arr).all(), f"{name} not finite (chol={chol})"
        corrs = np.asarray(res.canon_corrs)
        # 3 strong directions survive; the orthogonal pair is dropped
        np.testing.assert_allclose(corrs[:3], 1.0, atol=1e-3)
        assert corrs[3] == 0.0
        # dropped direction leaves exact-zero manifold columns and is
        # excluded from the effective manifold dim
        np.testing.assert_array_equal(np.asarray(res.m_a)[:, 3], 0.0)
        assert int(res.d) == 3


def test_fast_masked_pinv_weak_valid_column_survives():
    """A VALID weak column (norm ratio 1e-3 of the largest — inside the
    chol whitening envelope, cond(W) ~1.6e3) must NOT be silently
    zeroed: the old D*eps squared-domain tolerance dropped it, making
    the projectors inconsistent with canon_corrs/m_a/d. The ridge-
    regularized guard shrinks instead of dropping — the row stays
    within the method's documented accuracy, and exact-zero columns
    still produce exact-zero rows."""
    from cross_patient_speech_decoding_tpu.ops.cca import _fast_masked_pinv

    rng = np.random.default_rng(3)
    D = 32
    M = rng.normal(size=(200, D)).astype(np.float32)
    M /= np.linalg.norm(M, axis=0, keepdims=True)
    M[:, 5] *= 1e-3  # weak but valid
    M[:, 11] = 0.0  # genuinely degenerate inside the mask
    mask = jnp.ones((D,), jnp.float32)
    p = np.asarray(_fast_masked_pinv(jnp.asarray(M), mask))
    assert np.isfinite(p).all()
    ref = np.linalg.pinv(M.astype(np.float64))
    # the weak direction's row carries its signal (ridge shrinkage keeps
    # it within ~35% of the true row at this conditioning, vs the old
    # guard's all-zero row)
    rel = np.linalg.norm(p[5] - ref[5]) / np.linalg.norm(ref[5])
    assert rel < 0.35, rel
    assert np.linalg.norm(p[5]) > 0.5 * np.linalg.norm(ref[5])
    # exact-zero column -> exact-zero row, as before
    np.testing.assert_array_equal(p[11], np.zeros(200, np.float32))
    # well-conditioned directions reconstruct exactly: p @ M restricted
    # to the strong block is the identity (their row-level deviation vs
    # the float64 pinv is weak-direction coupling, bounded below)
    others = [i for i in range(D) if i not in (5, 11)]
    PM = p @ M.astype(np.float64)
    np.testing.assert_allclose(
        PM[others][:, others], np.eye(D)[others][:, others], atol=1e-4
    )
    row_rel = (
        np.linalg.norm(p[others] - ref[others], axis=1)
        / np.linalg.norm(ref[others], axis=1)
    )
    assert row_rel.max() < 0.05, row_rel.max()
