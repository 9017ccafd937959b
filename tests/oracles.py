"""Float64 numpy oracles implementing the reference's published math.

These are independent re-implementations of the algorithms the reference
uses (CCA alignment per Gallego et al. 2020 Methods; condition averaging;
LFADS-style joint-PCA stitching per Pandarinath et al. 2018), written to the
reference's *behavioral contract* (see SURVEY.md §2.1) so JAX results can be
checked against a trusted CPU path. Reference anchors:
  - CCA: /root/reference/aligned_decoding/alignment/AlignCCA.py:235-285
  - cnd_avg / shared classes: alignment/alignment_utils.py:12-61
  - joint PCA: alignment/JointPCA.py:165-211
"""

from __future__ import annotations

import numpy as np
from sklearn.decomposition import PCA


def oracle_cnd_avg(data: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Per-class trial mean, classes in sorted-unique order."""
    classes = np.unique(labels)
    return np.stack([data[labels == c].mean(axis=0) for c in classes])


def oracle_cca_align(L_a: np.ndarray, L_b: np.ndarray):
    """CCA manifold alignment via QR, the reference's factorization.

    Inputs are (latent_dims, samples) like the reference. Returns
    (M_a, M_b, canon_corrs) with the reference's rank truncation and
    [0, 1] clipping.
    """
    L_a = L_a - L_a.mean(axis=1, keepdims=True)
    L_b = L_b - L_b.mean(axis=1, keepdims=True)

    d = min(np.linalg.matrix_rank(L_a), np.linalg.matrix_rank(L_b))

    q_a, r_a = np.linalg.qr(L_a.T)
    q_b, r_b = np.linalg.qr(L_b.T)
    u, s, vt = np.linalg.svd(q_a.T @ q_b)

    m_a = np.linalg.pinv(r_a) @ u[:, :d]
    m_b = np.linalg.pinv(r_b) @ vt.T[:, :d]
    s = np.clip(s[:d], 0.0, 1.0)
    return m_a, m_b, s


def oracle_aligned_transform(X_b, m_a, m_b):
    """b->a mapped data: X @ M_b @ pinv(M_a)."""
    return X_b @ m_b @ np.linalg.pinv(m_a)


def oracle_class_latents(X_a, X_b, y_a, y_b):
    """Class-averaged latent dynamics restricted to shared classes.

    Returns (L_a, L_b) with shape (n_shared * T, K) each, classes in
    sorted order, matching extract_latent_dynamics_by_class + reshape.
    """
    ca, cb = np.unique(y_a), np.unique(y_b)
    shared = np.intersect1d(ca, cb)
    La = np.stack([X_a[y_a == c].mean(axis=0) for c in shared])
    Lb = np.stack([X_b[y_b == c].mean(axis=0) for c in shared])
    return La.reshape(-1, La.shape[-1]), Lb.reshape(-1, Lb.shape[-1])


def oracle_pca_reduce(X3d: np.ndarray, n_components):
    """sklearn PCA over flattened (N*T, C), reshaped back to 3-D."""
    N, T, C = X3d.shape
    pca = PCA(n_components=n_components)
    flat = pca.fit_transform(X3d.reshape(-1, C))
    return pca, flat.reshape(N, T, -1)


def oracle_joint_pca_transforms(features, labels, n_components):
    """LFADS-stitching read-in matrices (JointPCA.py:165-211 contract)."""
    all_y = [np.unique(y) for y in labels]
    shared = all_y[0]
    for y in all_y[1:]:
        shared = np.intersect1d(shared, y)
    cnd = [
        np.stack([X[y == c].mean(axis=0) for c in shared])
        for X, y in zip(features, labels)
    ]
    mat = np.concatenate(cnd, axis=-1).reshape(-1, sum(c.shape[-1] for c in cnd))
    latent = PCA(n_components=n_components).fit_transform(mat)
    return [
        np.linalg.pinv(c.reshape(-1, c.shape[-1])) @ latent for c in cnd
    ]


def oracle_mcca_gevp(Xs, n_components, regs=None, signal_ranks=None):
    """Float64 transcription of mvlearn.embed.MCCA's fit path.

    mvlearn semantics (mvlearn/embed/mcca.py, the implementation the
    reference wraps at alignment/AlignMCCA.py:152):

    - center each view;
    - with ``signal_ranks`` (i_mcca): per-view SVD reduction first —
      scores U_b @ diag(S_b) with basis V_b — then solve in reduced space
      and map loadings back through V_b;
    - GEVP  LHS v = lambda RHS v  with LHS the full block Gram matrix
      [X_b^T X_c] (diagonal included, so eigenvalues lie in [0, n_views])
      and RHS = blockdiag((1 - r) X_b^T X_b + r I) — RAW Gram matrices,
      identity NOT scaled by the sample count;
    - scipy.linalg.eigh(LHS, RHS) conventions: eigenvectors are
      RHS-orthonormal, sorted by descending eigenvalue, top n_components;
    - transform_view(X, b) = (X - mean_b) @ loadings_b.

    Returns (loadings, evals, means).
    """
    from scipy.linalg import eigh as generalized_eigh

    Xs = [np.asarray(X, np.float64) for X in Xs]
    means = [X.mean(0) for X in Xs]
    Xs = [X - m for X, m in zip(Xs, means)]

    bases = None
    if signal_ranks is not None:
        bases, reduced = [], []
        for X, k in zip(Xs, signal_ranks):
            U, S, Vt = np.linalg.svd(X, full_matrices=False)
            bases.append(Vt[:k].T)
            reduced.append(U[:, :k] * S[:k])
        Xs = reduced

    dims = [X.shape[1] for X in Xs]
    n_views = len(Xs)
    LHS = np.block(
        [[Xs[b].T @ Xs[c] for c in range(n_views)] for b in range(n_views)]
    )
    rhs_blocks = []
    for b, X in enumerate(Xs):
        G = X.T @ X
        if regs is not None:
            G = (1.0 - regs) * G + regs * np.eye(G.shape[0])
        rhs_blocks.append(G)
    RHS = np.zeros_like(LHS)
    off = 0
    for G in rhs_blocks:
        d = G.shape[0]
        RHS[off : off + d, off : off + d] = G
        off += d

    evals, evecs = generalized_eigh(LHS, RHS)
    order = np.argsort(evals)[::-1][:n_components]
    evals = evals[order]
    evecs = evecs[:, order]

    loadings, off = [], 0
    for b, d in enumerate(dims):
        W = evecs[off : off + d, :]
        if bases is not None:
            W = bases[b] @ W
        loadings.append(W)
        off += d
    return loadings, evals, means
