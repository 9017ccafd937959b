"""PCA / no-center PCA as pure, vmappable JAX functions with static shapes.

Reference behavior being reproduced (TPU-first, not translated):
- ``sklearn.decomposition.PCA`` as used throughout the reference decoders
  (`/root/reference/aligned_decoding/decoders/cross_pt_decoders.py:136-142`),
  including float ``n_components`` in (0, 1) meaning "smallest k whose
  cumulative explained variance ratio >= n_components".
- ``NoCenterPCA`` (`decomposition/NoCenterPCA.py:13-114`): truncated SVD
  without mean centering, same variance-fraction selection.

XLA requires static shapes, but the reference's component counts are
data-dependent. Design: every fit returns components at a static maximum
width ``max_components`` with inactive columns *zeroed* and an explicit
``n_active`` count + column mask. Zero columns are exactly equivalent to
truncation for every downstream consumer in this framework (matmuls,
linear/RBF kernels, CCA alignment with masked ranks), which is verified by
parity tests against sklearn oracles.

Row masking (``sample_mask``) supports fitting on fold subsets of a fixed
full array, which is what makes k-fold CV a vmappable batch axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cross_patient_speech_decoding_tpu.ops.precision import hdot


class PCAState(NamedTuple):
    """Fitted PCA with static-width masked components.

    Attributes:
        mean: (F,) feature means (zeros for no-center PCA).
        components: (F, K) projection matrix; columns >= n_active are zero.
        explained_variance_ratio: (K,) per-component variance fractions
            (computed over ALL singular values, matching sklearn, even when
            K < min(N, F) truncates the returned components).
        singular_values: (K,) singular values of the (centered) data.
        n_active: scalar int32, number of active components.
        mask: (K,) float mask, 1.0 for active columns.
    """

    mean: jax.Array
    components: jax.Array
    explained_variance_ratio: jax.Array
    singular_values: jax.Array
    n_active: jax.Array
    mask: jax.Array


def _resolve_n_active(evr: jax.Array, s: jax.Array, n_components, max_k: int):
    """Number of active components from an int / variance-fraction spec.

    ``evr`` and ``s`` are full-length (min(N,F),) arrays. ``n_components``
    may also be a *traced* scalar (float dtype = variance fraction, int
    dtype = count), which lets hyperparameter search vmap over candidate
    component counts (the BayesSearchCV `dimredreshape__n_components` axis).
    """

    def _fraction(frac):
        csum = jnp.cumsum(evr)
        # sklearn: searchsorted(cumsum, frac, side='right') + 1
        n = jnp.searchsorted(csum, jnp.asarray(frac, csum.dtype), side="right") + 1
        return jnp.minimum(n, max_k).astype(jnp.int32)

    if isinstance(n_components, float):
        if 0.0 < n_components < 1.0:
            return _fraction(n_components)
        if n_components > 1.0 and n_components.is_integer():
            # float-typed config fields deliver PCA(30)-style fixed counts
            # as 30.0 (the aligned_decode_svm.py fixed-component pipeline).
            # 1.0 stays an error (sklearn rejects it too): reading it as
            # "one component" would silently collapse the feature space
            # when the author meant "all the variance".
            n_components = int(n_components)
        else:
            raise ValueError(
                "float n_components must be in (0, 1) or a whole count > 1"
            )
    if n_components is None:
        n = jnp.sum(s > 0).astype(jnp.int32)  # rank
        return jnp.minimum(n, max_k)
    if isinstance(n_components, jax.Array) and jnp.issubdtype(
        n_components.dtype, jnp.floating
    ):
        return _fraction(n_components)
    return jnp.minimum(jnp.asarray(n_components, jnp.int32), max_k)


def pca_fit(
    X: jax.Array,
    n_components=None,
    *,
    max_components: int | None = None,
    center: bool = True,
    sample_mask: jax.Array | None = None,
    method: str = "svd",
    low_refit_k: int = 0,
    low_thresh: int = 5,
) -> PCAState:
    """Fit (masked) PCA on X of shape (N, F).

    Args:
        X: (N, F) data. Rows where ``sample_mask == 0`` are ignored exactly
            (masked mean + zeroed residual rows contribute nothing to the
            covariance).
        n_components: int, float in (0,1) (variance fraction), or None (rank).
        max_components: static output width K; defaults to min(N, F).
        center: subtract the (masked) mean. False reproduces NoCenterPCA.
        sample_mask: optional (N,) {0,1} validity mask.
        method: 'svd' (default, most accurate) or 'gram' — PCA never needs
            the left singular vectors, so the (F, F) covariance eigensolve
            replaces the tall (N, F) SVD: far cheaper when N >> F (the fold
            programs' regime) at the cost of squaring the condition number.
        low_refit_k: if > 0, the reference CTC datamodules' low-component
            artifact guard (``reduce_to_latent_space``,
            realtime_sim/realtime_datamodule.py:813-869): when the
            variance-fraction selection yields <= ``low_thresh`` components
            — an artifact component swallowing the variance budget — use a
            fixed ``low_refit_k`` components instead. (The reference's
            in-code comment about dropping the first component is stale:
            no call path removes it, so neither does this.) Same fitted
            basis either way — only the active-component mask changes.
        low_thresh: component-count threshold for ``low_refit_k``.
    """
    N, F = X.shape
    full_k = min(N, F)
    K = full_k if max_components is None else min(max_components, full_k)

    zero_mean = jnp.zeros((F,), X.dtype)
    if sample_mask is None:
        mean = jnp.mean(X, axis=0) if center else zero_mean
        Xc = X - mean
    else:
        w = sample_mask.astype(X.dtype)
        n_valid = jnp.maximum(jnp.sum(w), 1.0)
        mean = jnp.sum(X * w[:, None], axis=0) / n_valid if center else zero_mean
        # invalid rows become exactly zero -> contribute nothing to X^T X
        Xc = (X - mean) * w[:, None]

    if method == "gram":
        g = hdot(Xc.T, Xc)
        wv, v = jnp.linalg.eigh(g)
        s = jnp.sqrt(jnp.maximum(wv[::-1], 0.0))[:full_k]
        vt = v[:, ::-1].T[:full_k]
    else:
        _, s, vt = jnp.linalg.svd(Xc, full_matrices=False)

    var = s**2
    total = jnp.maximum(jnp.sum(var), jnp.finfo(X.dtype).tiny)
    evr_full = var / total

    n_active = _resolve_n_active(evr_full, s, n_components, K)
    if low_refit_k > 0:
        n_active = jnp.where(
            n_active <= low_thresh,
            jnp.minimum(jnp.int32(low_refit_k), jnp.int32(K)),
            n_active,
        )
    mask = (jnp.arange(K) < n_active).astype(X.dtype)

    components = (vt[:K].T) * mask[None, :]
    return PCAState(
        mean=mean,
        components=components,
        explained_variance_ratio=evr_full[:K],
        singular_values=s[:K],
        n_active=n_active,
        mask=mask,
    )


def pca_transform(state: PCAState, X: jax.Array) -> jax.Array:
    """Project X (..., F) onto the fitted components -> (..., K)."""
    return hdot(X - state.mean, state.components)


def pca_inverse_transform(state: PCAState, Z: jax.Array) -> jax.Array:
    """Map latents (..., K) back to feature space (..., F) — sklearn
    ``PCA.inverse_transform`` as used by the fig_3 reconstruction-transfer
    flow (`figure_analyses/fig_3.ipynb` ``reconDict_allPts`` cell:
    ``pcas[recon_pt].inverse_transform(aligned_data[pt])``). Masked
    (inactive) latent columns are zero on both sides, so the static-width
    layout reconstructs identically to sklearn's truncated components."""
    return hdot(Z * state.mask, state.components.swapaxes(-1, -2)) + state.mean


def pca_fit_transform(X, n_components=None, **kwargs):
    state = pca_fit(X, n_components, **kwargs)
    return state, pca_transform(state, X)


def nocenter_pca_fit(X, n_components=None, **kwargs) -> PCAState:
    """NoCenterPCA (reference decomposition/NoCenterPCA.py): SVD w/o centering."""
    return pca_fit(X, n_components, center=False, **kwargs)


def n_components_for_variance(X: jax.Array, var: float) -> jax.Array:
    """Reference ``AlignMCCA.n_components_var`` (AlignMCCA.py:156-174).

    NOTE: reproduces the reference's exact (quirky) ``argmax(cumsum > var)``
    semantics, which returns the *index* of the first component exceeding
    the variance fraction, not the count.
    """
    s = jnp.linalg.svd(X, compute_uv=False)
    s = s**2
    s = s / jnp.sum(s)
    return jnp.argmax(jnp.cumsum(s) > var).astype(jnp.int32)
