"""CCA alignment of neural latent spaces — pure JAX, vmappable, static shapes.

Reproduces the math of the reference's ``CCA_align`` / ``AlignCCA``
(`/root/reference/aligned_decoding/alignment/AlignCCA.py:235-285, 43-106`,
after Gallego et al., Nat. Neurosci. 2020): per-dimension centering, rank
determination, orthonormalization, SVD of the orthonormal-basis inner
product, manifold directions M = pinv(R) @ U[:, :d], and the b->a transform
``X @ M_b @ pinv(M_a)``.

TPU-first redesign decisions (vs. the reference's numpy QR path):

1. **Static shapes + masking instead of data-dependent truncation.** The
   reference truncates to ``d = min(rank_a, rank_b)`` with ``matrix_rank``,
   a data-dependent width. Here M_a/M_b keep a static width with columns
   ``>= d`` zeroed. Because ``pinv([A, 0]) == [pinv(A); 0]``, the composite
   transform ``M_b_masked @ pinv(M_a_masked)`` equals the reference's
   truncated product exactly.

2. **SVD orthonormalization instead of QR.** Householder QR of a
   rank-deficient (or zero-column-masked) matrix produces *arbitrary*
   orthonormal completions in the null directions, which would leak garbage
   correlations into ``Q_a^T Q_b`` under masking. A thin SVD gives the same
   column-space basis but lets us zero null-direction columns exactly, so
   masked latent dims contribute exact zeros. The final aligned transform is
   factorization-invariant (canonical vectors are unique up to a sign that
   cancels in ``M_b @ pinv(M_a)``), verified against a numpy QR oracle in
   tests/test_cca.py.

3. **Row masking.** Condition-averaged latents live in a fixed
   ``(n_classes * T, K)`` layout; classes absent from either dataset are
   masked rows (masked centering + zeroed residuals), exactly equivalent to
   the reference's row selection of shared classes.

Batched use: ``jax.vmap(cca_align)`` solves many patient-pair / fold /
bootstrap alignments in one XLA launch — this is the "alignment fits/sec"
benchmark surface.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cross_patient_speech_decoding_tpu.ops.precision import HIGHEST, hdot, hpinv


class CCAAlignment(NamedTuple):
    """Fitted CCA alignment between datasets A and B.

    Attributes:
        m_a: (Ka, D) manifold directions for A, columns >= d zeroed.
        m_b: (Kb, D) manifold directions for B, columns >= d zeroed.
        canon_corrs: (D,) canonical correlations clipped to [0, 1], zero
            beyond d.
        d: scalar int32 effective manifold dim: min(rank_a, rank_b),
            further reduced by singular directions the gram-SVD dropped
            (near-zero canonical correlation; TPU gram path only).
        proj_b_to_a: (Kb, Ka) composite transform M_b @ pinv(M_a).
        proj_a_to_b: (Ka, Kb) composite transform M_a @ pinv(M_b).
    """

    m_a: jax.Array
    m_b: jax.Array
    canon_corrs: jax.Array
    d: jax.Array
    proj_b_to_a: jax.Array
    proj_a_to_b: jax.Array


def _masked_center_cols(L: jax.Array, row_mask: jax.Array | None):
    """Center each column over (valid) rows; zero invalid rows exactly.

    Batched: L (..., R, K), row_mask (..., R).
    """
    if row_mask is None:
        return L - jnp.mean(L, axis=-2, keepdims=True)
    w = row_mask.astype(L.dtype)[..., None]
    n = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1.0)
    mean = jnp.sum(L * w, axis=-2, keepdims=True) / n
    return (L - mean) * w


def _rank_tol(s: jax.Array, n_rows, n_cols) -> jax.Array:
    """numpy matrix_rank default tolerance: smax * max(M, N) * eps.

    Batched: s (..., K) -> tol (..., 1) per matrix.
    """
    eps = jnp.finfo(s.dtype).eps
    return jnp.max(s, axis=-1, keepdims=True) * max(n_rows, n_cols) * eps


def _orthonormalize(L: jax.Array, method: str = "svd"):
    """Orthonormal column-space basis with null directions zeroed (SVD path).

    Returns (Q, pinv_R, rank): L = Q @ R with Q (R_rows, K) having exact
    zero columns for null directions, and pinv_R = pinv(R) (K, K) where
    R = diag(s) @ V^T. Thin SVD — most accurate. The fast Gram-eigh
    formulation lives in :func:`_cca_align_gram`, which never materializes
    Q at all.
    """
    del method
    R, K = L.shape[-2], L.shape[-1]
    u, s, vt = jnp.linalg.svd(L, full_matrices=False)
    tol = _rank_tol(s, R, K)
    keep = (s > tol).astype(L.dtype)
    rank = jnp.sum(keep, axis=-1).astype(jnp.int32)
    q = u * keep[..., None, :]
    s_inv = jnp.where(s > tol, 1.0 / jnp.where(s > tol, s, 1.0), 0.0)
    # pinv(R) = V diag(1/s), with null directions exactly zeroed
    pinv_r = vt.swapaxes(-1, -2) * (s_inv * keep)[..., None, :]
    return q, pinv_r, rank


def masked_pinv(M: jax.Array) -> jax.Array:
    """pinv that is exact for zero-masked trailing columns (uses SVD)."""
    return hpinv(M)


def _fast_masked_pinv(M: jax.Array, col_mask: jax.Array) -> jax.Array:
    """pinv via normal equations for a column-masked full-column-rank M.

    pinv(M) = (M^T M)^-1 M^T with identity padding on masked columns (so
    masked columns map to exact zero rows, preserving the
    ``pinv([A, 0]) == [pinv(A); 0]`` contract). One batched SPD solve
    instead of an SVD — ~2x faster on TPU for the small (K, D) manifold
    matrices; accuracy ~ eps * cond(M)^2, fine for the well-conditioned
    alignment path (used by method='gram'). Cholesky rather than LU per
    the repo solver policy: the TPU runtime's batched LU crashes the
    worker at production sizes (ops/classifiers.py, round-3 log), and g
    is SPD by construction (Gram + identity padding).
    """
    g = hdot(M.swapaxes(-1, -2), M)
    D = g.shape[-1]
    # degenerate-column guard: a column that is (near-)zero DESPITE
    # col_mask==1 — e.g. an alignment direction zeroed upstream by the
    # TPU gram-SVD's near-zero-singular-value mask — would make g exactly
    # singular and the Cholesky NaN, poisoning the whole output (round-3
    # refscale CTC NaN). Detect on the Gram diagonal (squared column
    # norms) and treat such columns as masked: identity-pad the
    # factorization, zero the pinv row (the exact pinv of a zero column).
    dg = jnp.diagonal(g, axis1=-2, axis2=-1)
    eps = jnp.finfo(g.dtype).eps
    dmax = jnp.max(dg, axis=-1, keepdims=True)
    # matrix_rank-level tolerance in the SQUARED domain ((D*eps)^2, same
    # as _whiten_chol): catches the exact/effective zeros without hard-
    # dropping VALID weak directions — a norm-ratio-1e-3 column (squared
    # 1e-6) is inside the chol envelope and must survive; the earlier
    # D*eps squared-domain cut silently zeroed it, leaving canon_corrs /
    # m_a / d reporting a direction the projectors no longer carried.
    tol = dmax * (D * eps) ** 2
    eff_mask = col_mask * (dg > tol).astype(g.dtype)
    mm = eff_mask[..., :, None] * eff_mask[..., None, :]
    # identity-pad masked columns (their off-diagonals zeroed via mm, so
    # the padded block never couples to the live one) and ridge the live
    # diagonal (4e-7 relative, the _whiten_chol cap: cond(g) <= ~2.5e6,
    # below the f32 Cholesky breakdown at ~1/eps). The ridge shrinks
    # directions weaker than the cap instead of NaN-ing — at that
    # conditioning the unregularized normal-equation solution is already
    # at 100% relative error (accuracy ~ eps * cond(g)), so the shrinkage
    # costs nothing the method could have delivered.
    g = g * mm + jnp.eye(D, dtype=g.dtype) * (
        (1.0 - eff_mask) + 4e-7 * dmax * eff_mask
    )[..., None, :]
    L = jnp.linalg.cholesky(g)
    z = jax.scipy.linalg.solve_triangular(
        L, M.swapaxes(-1, -2), lower=True
    )
    sol = jax.scipy.linalg.solve_triangular(
        L.swapaxes(-1, -2), z, lower=False
    )
    return sol * eff_mask[..., :, None]


def _whiten_chol(g: jax.Array, R: int):
    """Cholesky whitening of a PSD Gram matrix: W = inv(L)^T, masked.

    For latents that are FULL RANK WITHIN THEIR COLUMN MASK — the
    production regime: class-averaged PCA latents, where variance-masked
    components are exact-zero columns and the kept components are
    linearly independent — Cholesky whitening spans the same space as the
    eigh whitening in :func:`_cca_align_gram`, and the CCA outputs
    (canonical correlations, manifold projections) are factorization-
    invariant, so results match to f32 roundoff. It replaces the
    dominant eigensolver launch of the fit (the stacked whitening eigh
    was ~46% of the 128-batch fit cost, round-3 log) with one batched
    Cholesky + triangular solve.

    Masked/near-zero columns are detected on the Gram diagonal
    (tol = (max(R, K) * eps)^2 relative, the squared matrix_rank
    tolerance), zeroed exactly, and identity-padded so the factorization
    never sees them; a tiny ridge (4e-7 relative, capping cond at
    ~2.5e6 — f32 Cholesky breaks down near 1/eps ~ 8e6) guards valid
    but weak directions. NOT safe for data that is rank-deficient in a
    non-axis-aligned way (e.g. duplicated channels before PCA): such
    directions are neither masked nor truncated here — use the eigh
    path (method='gram') or the SVD path for data of unknown rank.

    Accuracy gradient: f32 triangular inversion loses ~eps*cond(G), so
    canonical correlations drift ~1e-2 at cond ~1e6 where gram-eigh
    (per-eigenvalue inversion) stays ~1e-5 (pinned in
    test_cca_chol_ill_conditioned_envelope). Production PCA latents sit
    at cond ~1e1-1e3 (the PCA eigenvalue ratio of kept components),
    where all paths agree to f32 roundoff.
    """
    K = g.shape[-1]
    dg = jnp.diagonal(g, axis1=-2, axis2=-1)
    dmax = jnp.max(dg, axis=-1, keepdims=True)
    eps = jnp.finfo(g.dtype).eps
    tol = dmax * (max(R, K) * eps) ** 2
    m = (dg > tol).astype(g.dtype)
    rank = jnp.sum(m, axis=-1).astype(jnp.int32)
    eye = jnp.eye(K, dtype=g.dtype)
    mm = m[..., :, None] * m[..., None, :]
    gp = g * mm + eye * ((1.0 - m) + 4e-7 * dmax * m)[..., None, :]
    L = jnp.linalg.cholesky(gp)
    l_inv = jax.scipy.linalg.solve_triangular(
        L, jnp.broadcast_to(eye, L.shape), lower=True
    )
    W = l_inv.swapaxes(-1, -2) * m[..., None, :]
    return W, rank


def _svd_small(g: jax.Array, method: str, force_gram: bool | None = None):
    """SVD of the small between-view matrix -> (u, s, vt, keep).

    method='gram' on TPU: via the Pallas Jacobi eigensolver on g^T g
    (U = g V / s, consistent pairing by construction; near-zero singular
    directions are zeroed — they carry no alignment signal). Otherwise
    jnp.linalg.svd, where every direction is kept.

    ``keep`` is the (..., D) {0,1} mask of singular directions that
    survived: the gram route zeroes u-columns whose singular value sits
    below ~K*eps*10 of s_max (squaring g loses them entirely in f32), and
    the CALLER must drop those columns from its alignment manifold — a
    zeroed column inside an otherwise-valid column mask makes the
    downstream pinv Gram exactly singular (NaN Cholesky; round-3 refscale
    CTC bug). ``force_gram`` exists so CPU tests can pin the TPU branch.
    """
    use_gram = (
        method == "gram" and jax.default_backend() == "tpu"
        if force_gram is None else force_gram
    )
    if use_gram:
        from cross_patient_speech_decoding_tpu.ops.jacobi import batched_eigh

        gtg = hdot(g.swapaxes(-1, -2), g)
        w, v = batched_eigh(gtg)
        s = jnp.sqrt(jnp.maximum(w[..., ::-1], 0.0))
        v = v[..., ::-1]
        tol = jnp.max(s, axis=-1, keepdims=True) * g.shape[-1] * jnp.finfo(g.dtype).eps * 10
        keep = (s > tol).astype(g.dtype)
        s_inv = jnp.where(s > tol, 1.0 / jnp.where(s > tol, s, 1.0), 0.0)
        u = hdot(g, v) * s_inv[..., None, :]
        return u, s, v.swapaxes(-1, -2), keep
    u, s, vt = jnp.linalg.svd(g, full_matrices=False)
    return u, s, vt, jnp.ones_like(s)


def cca_align(
    L_a: jax.Array,
    L_b: jax.Array,
    row_mask: jax.Array | None = None,
    method: str = "svd",
) -> CCAAlignment:
    """CCA alignment between two latent-dynamics matrices.

    Args:
        L_a: (..., R, Ka) latent dynamics for A; rows are samples (class x
            time flattened), columns are latent dims. NOTE: this is the
            transpose of the reference's ``CCA_align(L_a)`` orientation —
            row-major sample layout is the idiomatic XLA layout. Leading
            batch dims are supported NATIVELY (prefer them over vmap: the
            Pallas Jacobi eigensolver in the gram path only reaches full
            throughput with an explicit batch axis).
        L_b: (..., R, Kb) latent dynamics for B (same row layout/mask).
        row_mask: optional (..., R) {0,1} validity mask shared by both
            sides (classes present in both datasets).
        method: 'svd' (thin-SVD orthonormalization, maximal robustness),
            'gram' (Gram-eigh whitening, rank-robust, ~1.5x faster),
            or 'chol' (Gram-Cholesky whitening, fastest; exact only for
            inputs full-rank within their column mask — see
            :func:`_whiten_chol` for the envelope).
    """
    La = _masked_center_cols(L_a, row_mask)
    Lb = _masked_center_cols(L_b, row_mask)

    if method in ("gram", "chol"):
        return _cca_align_gram(La, Lb, chol=(method == "chol"))

    # NOTE: stacking La/Lb into one eigensolver launch (jnp.stack ->
    # single batched_eigh) was tried and reverted: ~5% projected gain,
    # but the resulting fit program reproducibly crashed/hung the remote
    # TPU compile helper (round-3 log). Two launches are robust.
    q_a, pinv_ra, rank_a = _orthonormalize(La, method)
    q_b, pinv_rb, rank_b = _orthonormalize(Lb, method)
    d = jnp.minimum(rank_a, rank_b)

    # (..., Ka, Kb); masked dims are exact zero rows/cols
    g = hdot(q_a.swapaxes(-1, -2), q_b)
    # only method='svd' reaches here (gram/chol early-returned above), so
    # every singular direction is kept — jnp.linalg.svd never zeroes
    # u-columns the way the TPU gram route does
    u, s, vt, _ = _svd_small(g, "svd")
    D = s.shape[-1]  # = min(Ka, Kb)

    # prefix mask over the s-descending order: the min-rank leading block
    col_mask = (jnp.arange(D) < d[..., None]).astype(L_a.dtype)
    m_a = hdot(pinv_ra, u[..., :, :D]) * col_mask[..., None, :]
    m_b = hdot(pinv_rb, vt.swapaxes(-1, -2)[..., :, :D]) * col_mask[..., None, :]
    corrs = jnp.clip(s[..., :D], 0.0, 1.0) * col_mask

    pinv_ma = masked_pinv(m_a)
    pinv_mb = masked_pinv(m_b)
    proj_b_to_a = hdot(m_b, pinv_ma)
    proj_a_to_b = hdot(m_a, pinv_mb)
    return CCAAlignment(m_a, m_b, corrs, d, proj_b_to_a, proj_a_to_b)


def _cca_align_gram(
    La: jax.Array, Lb: jax.Array, chol: bool = False,
    force_gram: bool | None = None,
) -> CCAAlignment:
    """Gram-path CCA on pre-centered latents: one tall read, all-small algebra.

    Equivalent math to the q-materializing path (q = L v diag(1/s), then
    g = q_a^T q_b) but q — a (..., R, K) tensor as big as L itself — is
    never formed: with W = v diag(1/s)|_keep,

        q_a^T q_b = W_a^T (La^T Lb) W_b,

    so ONE Gram of the concatenation [La | Lb] yields La^T La, Lb^T Lb
    and the cross-gram in a single pass over the tall data, and every
    subsequent product is (K, K)-sized. TPU rationale: K ~ 40 << 128
    lanes, so each pass over a (..., R, K) tensor costs ~128/K of its
    dense bytes in read bandwidth — the old path paid ~5 such passes
    (two grams, two q writes + reads, one cross product), this one pays 1
    (round-3 log). Accuracy matches the previous gram path to f32
    roundoff (same conditioning: the Gram squaring is already accepted).
    """
    ka, kb = La.shape[-1], Lb.shape[-1]
    R = La.shape[-2]
    Lab = jnp.concatenate([La, Lb], axis=-1)  # (..., R, ka+kb)
    G = hdot(Lab.swapaxes(-1, -2), Lab)
    ga = G[..., :ka, :ka]
    gb = G[..., ka:, ka:]
    gx = G[..., :ka, ka:]

    from cross_patient_speech_decoding_tpu.ops.jacobi import batched_eigh

    def whiten(g, K):
        if chol:
            return _whiten_chol(g, R)
        w, v = batched_eigh(g)
        s = jnp.sqrt(jnp.maximum(w[..., ::-1], 0.0))
        v = v[..., ::-1]
        tol = _rank_tol(s, R, K)
        keep = (s > tol).astype(g.dtype)
        rank = jnp.sum(keep, axis=-1).astype(jnp.int32)
        s_inv = jnp.where(s > tol, 1.0 / jnp.where(s > tol, s, 1.0), 0.0)
        return v * (s_inv * keep)[..., None, :], rank  # W = pinv(R)

    if ka == kb:
        # both whitening eighs in ONE eigensolver launch: the Pallas
        # Jacobi kernel's per-launch cost amortizes ~1.25x better at
        # doubled batch (13.8 ms vs 2 x 8.66 ms at bench shapes,
        # round-3 log); results are bit-identical to two launches
        w_ab, rank_ab = whiten(jnp.stack([ga, gb], axis=0), ka)
        w_a, w_b = w_ab[0], w_ab[1]
        rank_a, rank_b = rank_ab[0], rank_ab[1]
    else:
        w_a, rank_a = whiten(ga, ka)
        w_b, rank_b = whiten(gb, kb)
    d = jnp.minimum(rank_a, rank_b)

    g = hdot(w_a.swapaxes(-1, -2), hdot(gx, w_b))  # == q_a^T q_b
    u, s, vt, s_keep = _svd_small(g, "gram", force_gram=force_gram)
    D = s.shape[-1]  # = min(ka, kb)

    # s_keep drops directions the gram-SVD zeroed (near-zero canonical
    # correlation): leaving them inside col_mask hands _fast_masked_pinv
    # an exactly-singular Gram (NaN Cholesky — round-3 refscale CTC bug).
    # Both masks are prefix masks over s-descending order.
    col_mask = (jnp.arange(D) < d[..., None]).astype(La.dtype) * s_keep
    m_a = hdot(w_a, u[..., :, :D]) * col_mask[..., None, :]
    m_b = hdot(w_b, vt.swapaxes(-1, -2)[..., :, :D]) * col_mask[..., None, :]
    corrs = jnp.clip(s[..., :D], 0.0, 1.0) * col_mask

    pinv_ma = _fast_masked_pinv(m_a, col_mask)
    pinv_mb = _fast_masked_pinv(m_b, col_mask)
    proj_b_to_a = hdot(m_b, pinv_ma)
    proj_a_to_b = hdot(m_a, pinv_mb)
    d_eff = jnp.sum(col_mask, axis=-1).astype(jnp.int32)
    return CCAAlignment(m_a, m_b, corrs, d_eff, proj_b_to_a, proj_a_to_b)


def cnd_avg(
    data: jax.Array,
    class_ids: jax.Array,
    n_classes: int,
    sample_mask: jax.Array | None = None,
):
    """Per-class trial means — reference ``cnd_avg`` (alignment_utils.py:42-61).

    Implemented as one segment-sum instead of a Python loop over classes.

    Args:
        data: (N, ...) trials-first array.
        class_ids: (N,) int32 compact class ids in [0, n_classes).
        n_classes: static class-universe size.
        sample_mask: optional (N,) validity mask (masked trials excluded).

    Returns:
        (avg, counts): avg is (n_classes, ...) with zero rows for absent
        classes; counts is (n_classes,) valid-trial counts per class.
    """
    lead = class_ids.shape[:-1]
    nlead = len(lead)
    rest = data.shape[nlead + 1 :]
    w = (
        jnp.ones(class_ids.shape, data.dtype)
        if sample_mask is None
        else sample_mask.astype(data.dtype)
    )
    # one-hot matmul instead of scatter-add: the segment reduction becomes
    # an MXU matmul (~2x faster than segment_sum on TPU at these shapes);
    # batched natively over leading dims. The trial axis is contracted
    # DIRECTLY on the (..., N, *rest) layout — flattening rest into one
    # minor axis first forces a tiled-layout relayout copy of the whole
    # data array when rest isn't lane-aligned (measured 16% of cnd_avg
    # time at bench shapes, round-3 log).
    oh = jax.nn.one_hot(class_ids, n_classes, dtype=data.dtype) * w[..., None]
    batch_dims = tuple(range(nlead))
    sums = jax.lax.dot_general(
        oh,
        data,
        (((nlead,), (nlead,)), (batch_dims, batch_dims)),
        precision=HIGHEST,
    )  # (lead..., n_classes, *rest)
    counts = jnp.sum(oh, axis=-2)
    avg = sums / jnp.maximum(counts, 1.0).reshape(
        lead + (n_classes,) + (1,) * len(rest)
    )
    return avg, counts


class FittedAligner(NamedTuple):
    """AlignCCA-equivalent fitted on class-averaged latent trajectories."""

    alignment: CCAAlignment
    shared_mask: jax.Array  # (n_classes,) classes present in both datasets


def fit_cca_aligner(
    X_a: jax.Array,
    X_b: jax.Array,
    ids_a: jax.Array,
    ids_b: jax.Array,
    n_classes: int,
    mask_a: jax.Array | None = None,
    mask_b: jax.Array | None = None,
    method: str = "chol",
    t_len: int | None = None,
) -> FittedAligner:
    """Fit class-averaged CCA alignment (reference AlignCCA type='class').

    Mirrors ``AlignCCA.fit`` -> ``extract_latent_dynamics_by_class`` ->
    ``CCA_align`` (AlignCCA.py:43-61, 156-183): condition-average each
    dataset, keep classes present in both, fold time into rows, CCA.

    Default method='chol' (Gram + Cholesky whitening): replaces the
    fit's dominant eigensolver launch (the stacked whitening eigh,
    ~46% of the 128-batch fit cost, round-3 log) with one batched
    Cholesky + triangular solve; exact for latents that are full-rank
    within their column mask — the production regime here, where inputs
    are variance-masked PCA latents
    (see :func:`_whiten_chol` for the envelope). Pass 'gram' (Gram-eigh,
    rank-deficiency-robust via eigenvalue masking) for data of unknown
    rank, or 'svd' for maximal numerical robustness on ill-conditioned
    inputs; all three agree to f32 roundoff on the production path
    (verified against the float64 QR oracle in tests/test_cca.py).

    Args:
        X_a: (..., Na, T, Ka) target-latent trials (leading batch dims are
            batched natively — preferred over vmap for the Pallas path).
            With ``t_len`` set, the FLAT layout (..., Na, T*Ka) instead.
        X_b: (..., Nb, T, Kb) source-latent trials (or (..., Nb, T*Kb)).
        ids_a, ids_b: (..., N) per-trial compact class ids.
        n_classes: static class-universe size.
        mask_a, mask_b: optional per-trial validity masks (for fold subsets).
        t_len: pass T to accept trials in the FLAT (..., N, T*K) layout.
            TPU lane tiles are 128 wide, so a trailing latent dim K << 128
            (e.g. 40) wastes ~128/K of read bandwidth on every pass over
            the trial tensor; the flat layout keeps the big class-average
            reduction dense and defers the lane-padded (C*T, K) layout to
            the small averaged matrix (measured ~1.5x whole-fit speedup at
            bench shapes, round-3 log). Use it when trials already live
            flat (the production decoders flatten latents for the
            classifier anyway).
    """
    if t_len is None:
        T = X_a.shape[-2]
        ka, kb = X_a.shape[-1], X_b.shape[-1]
    else:
        T = t_len
        ka, kb = X_a.shape[-1] // T, X_b.shape[-1] // T
    avg_a, cnt_a = cnd_avg(X_a, ids_a, n_classes, mask_a)
    avg_b, cnt_b = cnd_avg(X_b, ids_b, n_classes, mask_b)
    shared = ((cnt_a > 0) & (cnt_b > 0)).astype(X_a.dtype)

    lead = ids_a.shape[:-1]
    # identical row order for both layouts: (C, T, K) and (C, T*K) are the
    # same row-major data, so folding classes*time into rows is one reshape
    L_a = avg_a.reshape(lead + (n_classes * T, ka))
    L_b = avg_b.reshape(lead + (n_classes * T, kb))
    row_mask = jnp.repeat(shared, T, axis=-1)

    alignment = cca_align(L_a, L_b, row_mask, method)
    return FittedAligner(alignment=alignment, shared_mask=shared)


def transform_b_to_a(aligner: FittedAligner, X_b: jax.Array) -> jax.Array:
    """Map source-patient latents into the target patient's space.

    Reference ``AlignCCA._transform_single`` with return_space='b_to_a'
    (AlignCCA.py:92-94): ``X @ M_b @ pinv(M_a)``.
    """
    return hdot(X_b, aligner.alignment.proj_b_to_a)


def transform_a_to_b(aligner: FittedAligner, X_a: jax.Array) -> jax.Array:
    """return_space='a_to_b' (AlignCCA.py:94): ``X @ M_a @ pinv(M_b)``."""
    return hdot(X_a, aligner.alignment.proj_a_to_b)


def transform_shared(aligner: FittedAligner, X_a: jax.Array, X_b: jax.Array):
    """return_space='shared' (AlignCCA.py:96-106): both datasets projected
    into the common CCA space: (X_a @ M_a, X_b @ M_b)."""
    return (
        hdot(X_a, aligner.alignment.m_a),
        hdot(X_b, aligner.alignment.m_b),
    )


def shared_trial_subselect_indices(
    ids_a: np.ndarray,
    ids_b: np.ndarray,
    rng,
):
    """Per-class random matched-trial pairing (AlignCCA.py:205-232).

    Host-side index generation for AlignCCA type='trial': for each class
    present in both datasets, shuffle trials and keep the shared minimum
    count. Returns (idx_a, idx_b) with equal lengths, classes concatenated
    in sorted order (matching the reference's vstack-by-class layout).
    """
    ids_a = np.asarray(ids_a)
    ids_b = np.asarray(ids_b)
    shared = np.intersect1d(ids_a, ids_b)
    if shared.size == 0:
        raise ValueError(
            "no shared classes between the two datasets — trial-matched "
            "CCA needs at least one label present on both sides (check "
            "that both use the same label vocabulary, e.g. phoneme vs "
            "articulator ids)"
        )
    sel_a, sel_b = [], []
    for c in shared:
        cur_a = rng.permutation(np.where(ids_a == c)[0])
        cur_b = rng.permutation(np.where(ids_b == c)[0])
        m = min(len(cur_a), len(cur_b))
        sel_a.append(cur_a[:m])
        sel_b.append(cur_b[:m])
    return np.concatenate(sel_a), np.concatenate(sel_b)


def fit_cca_aligner_trial(
    X_a: jax.Array,
    X_b: jax.Array,
    idx_a,
    idx_b,
    method: str = "gram",
) -> FittedAligner:
    """AlignCCA type='trial': CCA on matched trials instead of class means.

    ``idx_a``/``idx_b`` come from :func:`shared_trial_subselect_indices`
    (the RNG lives host-side; the reference used global np.random,
    AlignCCA.py:225-226). Trial tensors are (N, T, K); time folds into
    rows like the class mode.
    """
    La = X_a[jnp.asarray(idx_a)].reshape(-1, X_a.shape[-1])
    Lb = X_b[jnp.asarray(idx_b)].reshape(-1, X_b.shape[-1])
    alignment = cca_align(La, Lb, method=method)
    return FittedAligner(
        alignment=alignment,
        shared_mask=jnp.ones((1,), X_a.dtype),
    )

