"""Parity tests: ops.pca vs sklearn PCA / reference NoCenterPCA semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.decomposition import PCA

from cross_patient_speech_decoding_tpu.ops import pca_fit, pca_transform, nocenter_pca_fit


def _rand(seed, n, f):
    rng = np.random.default_rng(seed)
    # low-rank + noise so variance-fraction selection is nontrivial
    return (
        rng.normal(size=(n, 5)) @ rng.normal(size=(5, f))
        + 0.1 * rng.normal(size=(n, f))
    )


def test_pca_int_components_matches_sklearn():
    X = _rand(0, 60, 12)
    sk = PCA(n_components=4).fit(X)
    st = pca_fit(jnp.asarray(X), 4, max_components=6)
    assert int(st.n_active) == 4
    # components unique up to sign
    ours = np.asarray(st.components[:, :4]).T
    signs = np.sign(np.sum(ours * sk.components_, axis=1))
    np.testing.assert_allclose(ours * signs[:, None], sk.components_, atol=2e-4)
    # masked columns are exactly zero
    np.testing.assert_array_equal(np.asarray(st.components[:, 4:]), 0.0)
    # transforms agree
    sk_t = sk.transform(X)
    our_t = np.asarray(pca_transform(st, jnp.asarray(X)))[:, :4]
    np.testing.assert_allclose(our_t * signs[None, :], sk_t, atol=2e-3)


def test_pca_variance_fraction_matches_sklearn():
    X = _rand(1, 80, 15)
    for frac in (0.5, 0.8, 0.95):
        sk = PCA(n_components=frac).fit(X)
        st = pca_fit(jnp.asarray(X), frac)
        assert int(st.n_active) == sk.n_components_, frac


def test_pca_sample_mask_equals_subset_fit():
    X = _rand(2, 50, 10)
    mask = np.zeros(50)
    mask[:33] = 1.0
    st_masked = pca_fit(jnp.asarray(X), 4, sample_mask=jnp.asarray(mask))
    st_subset = pca_fit(jnp.asarray(X[:33]), 4, max_components=10)
    k = 4
    a = np.asarray(st_masked.components[:, :k])
    b = np.asarray(st_subset.components[:, :k])
    signs = np.sign(np.sum(a * b, axis=0))
    np.testing.assert_allclose(a, b * signs[None, :], atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(st_masked.mean), X[:33].mean(axis=0), atol=1e-5
    )


def test_nocenter_pca_zero_mean_and_svd_components():
    X = _rand(3, 40, 8)
    st = nocenter_pca_fit(jnp.asarray(X), 3)
    np.testing.assert_array_equal(np.asarray(st.mean), 0.0)
    _, _, vt = np.linalg.svd(X, full_matrices=False)
    ours = np.asarray(st.components[:, :3]).T
    signs = np.sign(np.sum(ours * vt[:3], axis=1))
    np.testing.assert_allclose(ours * signs[:, None], vt[:3], atol=2e-4)


def test_pca_vmappable_over_folds():
    X = np.stack([_rand(i, 30, 6) for i in range(4)])
    fit = jax.vmap(lambda x: pca_fit(x, 3, max_components=6))
    states = fit(jnp.asarray(X))
    assert states.components.shape == (4, 6, 6)
    for i in range(4):
        single = pca_fit(jnp.asarray(X[i]), 3, max_components=6)
        np.testing.assert_allclose(
            np.abs(np.asarray(states.components[i])),
            np.abs(np.asarray(single.components)),
            atol=2e-4,
        )


def test_pca_inverse_transform_matches_sklearn():
    """fig_3 reconstruction flow: inverse_transform of (possibly masked)
    latents reproduces sklearn's truncated reconstruction."""
    from cross_patient_speech_decoding_tpu.ops.pca import (
        pca_inverse_transform,
    )

    X = _rand(11, 50, 8)
    st = pca_fit(jnp.asarray(X), 3, max_components=6)
    Z = pca_transform(st, jnp.asarray(X))
    rec = np.asarray(pca_inverse_transform(st, Z))

    sk = PCA(n_components=3).fit(X)
    rec_sk = sk.inverse_transform(sk.transform(X))
    np.testing.assert_allclose(rec, rec_sk, atol=2e-4)

    # round trip on the active subspace: transform(inverse(Z)) == Z
    Z2 = pca_transform(st, pca_inverse_transform(st, Z))
    np.testing.assert_allclose(np.asarray(Z2), np.asarray(Z), atol=2e-4)


def test_float_integer_count_n_components():
    """Float-typed config fields deliver PCA(30)-style counts as 30.0;
    whole floats >= 1 select a fixed component count."""
    import numpy as np

    from cross_patient_speech_decoding_tpu.ops.pca import pca_fit

    X = np.random.default_rng(0).normal(size=(40, 12)).astype(np.float32)
    a = pca_fit(X, 5.0, max_components=8)
    b = pca_fit(X, 5, max_components=8)
    assert int(a.n_active) == int(b.n_active) == 5
    import pytest

    with pytest.raises(ValueError, match="n_components"):
        pca_fit(X, 5.5, max_components=8)


def test_float_n_components_one_rejected():
    """n_components=1.0 must raise (sklearn semantics), not silently fit
    one component."""
    import numpy as np
    import jax.numpy as jnp
    import pytest

    from cross_patient_speech_decoding_tpu.ops.pca import pca_fit

    X = jnp.asarray(np.random.default_rng(0).normal(size=(20, 6)),
                    jnp.float32)
    with pytest.raises(ValueError):
        pca_fit(X, n_components=1.0, max_components=4)


def test_pca_low_component_artifact_refit():
    """The CTC datamodules' low-component guard (reference
    reduce_to_latent_space, realtime_datamodule.py:813-869): a
    variance-fraction fit that resolves to <= low_thresh components —
    one artifact direction swallowing the variance budget — switches to
    a fixed low_refit_k component count. Off by default (classical
    decoders keep plain PCA)."""
    rng = np.random.default_rng(3)
    # one direction carries ~99.9% of the variance
    u = rng.normal(size=(300, 1)) * 100.0
    X = (u @ rng.normal(size=(1, 12)) + rng.normal(size=(300, 12))).astype(
        np.float32
    )
    Xj = jnp.asarray(X)

    plain = pca_fit(Xj, 0.9)
    assert int(plain.n_active) <= 5

    guarded = pca_fit(Xj, 0.9, low_refit_k=30)
    assert int(guarded.n_active) == min(30, 12)
    # same fitted basis, only the active mask differs
    np.testing.assert_allclose(
        np.asarray(guarded.singular_values), np.asarray(plain.singular_values),
        rtol=1e-6,
    )

    # counts above the threshold are untouched
    X_iso = jnp.asarray(rng.normal(size=(300, 12)).astype(np.float32))
    assert int(pca_fit(X_iso, 0.9, low_refit_k=30).n_active) == int(
        pca_fit(X_iso, 0.9).n_active
    )
