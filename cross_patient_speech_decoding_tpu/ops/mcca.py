"""Regularized multiview CCA (MCCA) — pure JAX generalized eigensolve.

Replaces the reference's dependency on ``mvlearn.embed.MCCA``
(`/root/reference/aligned_decoding/alignment/AlignMCCA.py:140-154`, called
with ``MCCA(n_components, regs, signal_ranks)`` on condition-averaged
views) with the standard MAXVAR formulation solved natively:

    C w = lambda * D_r w,   D_r = (1 - r) * D + r * I

where C is the covariance of the concatenated (centered) views and D its
block-diagonal within-view part; ``regs=r`` interpolates CCA (r=0) toward
PCA (r=1), matching mvlearn's regularization semantics. ``signal_ranks``
pre-reduces each view by SVD — here realized as rank *masks* so shapes stay
static. Solved by block-wise inverse-sqrt whitening + one symmetric eigh,
all MXU-friendly matmuls, batchable via vmap.

Parity contract: for two views and r=0 the top generalized eigenvectors
reproduce classical CCA's canonical correlations (tested in
tests/test_mcca.py against sklearn/numpy CCA); for multi-view synthetic
data with a shared latent, transformed views correlate strongly.

Tested envelope (mvlearn is not installable in this environment, so parity
is pinned against a float64 transcription of its documented GEVP —
``tests/oracles.oracle_mcca_gevp``; test_mcca):

- full-rank views, regs in {0.1, 0.5, 0.9}: loadings/evals match the
  transcription (raw X^T X, unscaled r*I, RHS-orthonormal eigenvectors);
- ``signal_ranks`` (i_mcca route): SVD-reduce -> reduced GEVP -> map back;
- **rank-deficient views** (duplicated columns) with regs > 0: matches the
  transcription — the r*I term keeps the RHS positive-definite exactly as
  mvlearn's regularization does;
- **duplicate views** with regs > 0: matches the transcription; canonical
  directions correlate ~1 across the copies;
- regs = 0 with a singular within-view Gram is OUTSIDE the parity
  envelope (scipy.linalg.eigh on a singular RHS is undefined; mvlearn
  would fail): here ``_inv_sqrt_psd`` masks null eigendirections
  (pseudo-inverse whitening), keeping outputs finite and shared structure
  aligned — a documented, tested divergence, not a parity claim.

Residual risk: behavior of mvlearn ITSELF on degenerate inputs may differ
from its documented formula; any future environment with mvlearn installed
should re-run test_mcca against the real library.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from cross_patient_speech_decoding_tpu.ops.cca import cnd_avg
from cross_patient_speech_decoding_tpu.ops.precision import hdot


class MCCAState(NamedTuple):
    """Fitted MCCA.

    Attributes:
        loadings: tuple of (p_i, n_components) per-view projection matrices.
        means: tuple of (p_i,) per-view feature means.
        evals: (n_components,) generalized eigenvalues (alignment strength).
        shared_mask: (n_classes,) classes present in all views (class mode).
    """

    loadings: tuple
    means: tuple
    evals: jax.Array
    shared_mask: jax.Array | None


def _inv_sqrt_psd(A: jax.Array, rank_mask: jax.Array | None, reg_floor: float):
    """Inverse square root of a PSD matrix with optional rank masking."""
    w, v = jnp.linalg.eigh(A)
    tol = jnp.maximum(jnp.max(w), 0.0) * A.shape[0] * jnp.finfo(A.dtype).eps
    keep = w > jnp.maximum(tol, reg_floor)
    if rank_mask is not None:
        # keep only the top-k eigendirections (eigh ascending -> last k)
        k_idx = jnp.arange(A.shape[0])[::-1]  # rank position of each col
        keep = keep & (k_idx < rank_mask)
    w_is = jnp.where(keep, 1.0 / jnp.sqrt(jnp.where(keep, w, 1.0)), 0.0)
    # hdot, not '@': the whitener feeds every Gram block of the GEVP and
    # the loadings; the default bf16-class matmul would cost ~3 digits on
    # ill-conditioned views (ops/precision.py policy)
    return hdot(v * w_is[None, :], v.T)


def mcca_fit(
    Xs: Sequence[jax.Array],
    n_components: int,
    regs: float = 0.5,
    signal_ranks: Sequence | None = None,
    row_mask: jax.Array | None = None,
) -> MCCAState:
    """Fit regularized MCCA on 2-D views (rows = samples).

    Args:
        Xs: per-view (R, p_i) matrices sharing the row layout/mask.
        n_components: static number of canonical components.
        regs: regularization in [0, 1].
        signal_ranks: optional per-view rank limits (ints or traced ints).
        row_mask: optional (R,) validity mask.
    """
    P = len(Xs)
    dtype = Xs[0].dtype
    R = Xs[0].shape[0]
    if row_mask is None:
        w = jnp.ones((R,), dtype)
    else:
        w = row_mask.astype(dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)

    centered, means = [], []
    for X in Xs:
        mean = jnp.sum(X * w[:, None], axis=0) / n
        centered.append((X - mean) * w[:, None])
        means.append(mean)

    # block-wise inverse-sqrt of the regularized within-view GRAM matrix.
    # mvlearn convention (_construct_mcca_gevp): raw X^T X (no 1/n) with
    # RHS_b = (1 - r) * X_b^T X_b + r * I — the identity is NOT scaled by
    # the sample count, so Gram-vs-covariance normalization changes the
    # effective regularization by a factor n. We match mvlearn exactly
    # (parity-tested against a float64 transcription in test_mcca).
    whiteners = []
    for i, Xc in enumerate(centered):
        gram = hdot(Xc.T, Xc)
        p = gram.shape[0]
        gram_r = (1.0 - regs) * gram + regs * jnp.eye(p, dtype=dtype)
        rmask = None if signal_ranks is None else signal_ranks[i]
        whiteners.append(_inv_sqrt_psd(gram_r, rmask, reg_floor=0.0))

    # whitened concatenated Gram: E_ij = W_i^T (X_i^T X_j) W_j — congruent
    # to mvlearn's LHS v = lambda RHS v (diagonal blocks included, so
    # eigenvalues live in [0, n_views]); eigh solutions are RHS-orthonormal
    # exactly like scipy.linalg.eigh(LHS, RHS).
    blocks = []
    for i in range(P):
        row = []
        for j in range(P):
            G_ij = hdot(centered[i].T, centered[j])
            row.append(hdot(whiteners[i], hdot(G_ij, whiteners[j])))
        blocks.append(row)
    E = jnp.block(blocks)
    E = 0.5 * (E + E.T)

    evals, evecs = jnp.linalg.eigh(E)
    # top n_components (eigh ascending)
    top = evecs[:, ::-1][:, :n_components]
    evals_top = evals[::-1][:n_components]

    loadings, off = [], 0
    for i, X in enumerate(Xs):
        p = X.shape[1]
        loadings.append(hdot(whiteners[i], top[off : off + p, :]))
        off += p
    return MCCAState(
        loadings=tuple(loadings),
        means=tuple(means),
        evals=evals_top,
        shared_mask=None,
    )


def mcca_transform(state: MCCAState, X: jax.Array, idx: int) -> jax.Array:
    """Project view ``idx`` data (..., p_i) into the shared space."""
    return hdot(X - state.means[idx], state.loadings[idx])


def fit_mcca_aligner(
    Xs: Sequence[jax.Array],
    ids: Sequence[jax.Array],
    n_classes: int,
    n_components: int,
    regs: float = 0.5,
    pca_var: float = 1.0,
    sample_masks: Sequence | None = None,
) -> MCCAState:
    """AlignMCCA-equivalent: condition-average views, fit MCCA.

    Mirrors ``get_MCCA_transforms`` (AlignMCCA.py:140-154): per-view
    condition averages restricted to classes shared by ALL views; when
    ``0 < pca_var < 1``, per-view signal ranks are estimated with the
    reference's quirky ``argmax(cumsum > var)`` rule on the *trial* data,
    capped at n_components (AlignMCCA.py:148-150).
    """
    from cross_patient_speech_decoding_tpu.ops.pca import (
        n_components_for_variance,
    )

    P = len(Xs)
    masks = sample_masks if sample_masks is not None else [None] * P

    avgs, shared = [], None
    for X, y, m in zip(Xs, ids, masks):
        avg, cnt = cnd_avg(X, y, n_classes, m)
        avgs.append(avg)
        pres = cnt > 0
        shared = pres if shared is None else (shared & pres)
    shared_f = shared.astype(Xs[0].dtype)
    T = Xs[0].shape[1]
    row_mask = jnp.repeat(shared_f, T)
    flats = [a.reshape(n_classes * T, a.shape[-1]) for a in avgs]

    ranks = None
    if 0.0 < pca_var < 1.0:
        # variance ranks honor the sample masks: zeroed (held-out) trials
        # contribute nothing to the singular spectrum, so the masked SVD
        # equals the train-subset SVD — an all-rows fit would let the
        # test fold pick the whitening ranks (the reference's
        # n_components_var only ever sees X_train)
        ranks = [
            jnp.minimum(
                n_components,
                n_components_for_variance(
                    (X if m is None else X * m[:, None, None]).reshape(
                        -1, X.shape[-1]
                    ),
                    pca_var,
                ),
            )
            for X, m in zip(Xs, masks)
        ]

    state = mcca_fit(flats, n_components, regs, ranks, row_mask)
    return MCCAState(
        loadings=state.loadings,
        means=state.means,
        evals=state.evals,
        shared_mask=shared_f,
    )
