"""Explicit matmul precision for the numerically-critical alignment core.

JAX's default matmul precision is backend-reduced (bf16-class passes on both
TPU MXU and this CPU build), which is right for NN training but wrong for
the CCA/PCA/pinv algebra where the reference runs float64 LAPACK: a masked
pinv product at default precision showed ~2e-2 absolute error vs <1e-5 at
HIGHEST. All alignment-core matmuls go through :func:`hdot`; the NN stack
keeps default precision for MXU speed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def hdot(a: jax.Array, b: jax.Array) -> jax.Array:
    """Full-precision matmul (f32 accumulate, no bf16 passes)."""
    return jnp.matmul(a, b, precision=HIGHEST)


def hpinv(M: jax.Array, rtol: float | None = None) -> jax.Array:
    """Moore-Penrose pseudoinverse with full-precision reconstruction.

    ``jnp.linalg.pinv``'s internal V @ diag(1/s) @ U^T runs at the default
    (reduced) matmul precision, which costs ~5 digits at f32; this version
    matches numpy-f32 accuracy (~1e-7 on well-conditioned inputs). Exact for
    zero-masked trailing columns: pinv([A, 0]) == [pinv(A); 0].
    """
    u, s, vt = jnp.linalg.svd(M, full_matrices=False)
    eps = jnp.finfo(M.dtype).eps
    if rtol is None:
        rtol = max(M.shape[-2], M.shape[-1]) * eps
    cutoff = rtol * jnp.max(s, axis=-1, keepdims=True)
    s_inv = jnp.where(s > cutoff, 1.0 / jnp.where(s > cutoff, s, 1.0), 0.0)
    return hdot(vt.swapaxes(-1, -2) * s_inv[..., None, :], u.swapaxes(-1, -2))
