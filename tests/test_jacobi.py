"""Parallel-Jacobi batched eigensolver vs numpy eigh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cross_patient_speech_decoding_tpu.ops.jacobi import jacobi_eigh


def _sym(rng, b, k, cond=50.0):
    q, _ = np.linalg.qr(rng.normal(size=(b, k, k)))
    w = np.exp(rng.uniform(0, np.log(cond), (b, k)))
    return (q * w[:, None, :]) @ np.swapaxes(q, 1, 2)


@pytest.mark.parametrize("k", [8, 40, 41])
def test_jacobi_matches_numpy(k):
    rng = np.random.default_rng(0)
    A = _sym(rng, 6, k).astype(np.float32)
    w, V = jacobi_eigh(jnp.asarray(A), sweeps=12)
    w, V = np.asarray(w), np.asarray(V)
    w_np = np.linalg.eigvalsh(A.astype(np.float64))
    scale = np.abs(w_np).max()
    np.testing.assert_allclose(w, w_np, atol=2e-4 * scale)
    # reconstruction + orthonormality
    rec = V @ (w[..., None] * np.swapaxes(V, 1, 2))
    np.testing.assert_allclose(rec, A, atol=2e-4 * scale)
    eye = np.swapaxes(V, 1, 2) @ V
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(k), eye.shape), atol=5e-5)


def test_jacobi_vmap_and_jit():
    rng = np.random.default_rng(1)
    A = _sym(rng, 4, 16).astype(np.float32)
    f = jax.jit(lambda a: jacobi_eigh(a, sweeps=10))
    w, V = f(jnp.asarray(A))
    assert w.shape == (4, 16) and V.shape == (4, 16, 16)
    # ascending order (numpy contract)
    assert np.all(np.diff(np.asarray(w), axis=-1) >= -1e-5)


def test_jacobi_psd_rank_deficient():
    rng = np.random.default_rng(2)
    u = rng.normal(size=(3, 20, 5)).astype(np.float32)
    A = u @ np.swapaxes(u, 1, 2) / 20  # rank 5 PSD of size 20
    w, V = jacobi_eigh(jnp.asarray(A), sweeps=12)
    w = np.asarray(w)
    w_np = np.linalg.eigvalsh(A.astype(np.float64))
    np.testing.assert_allclose(w, w_np, atol=1e-5 * np.abs(w_np).max())
    assert (w[:, :15] < 1e-4).all()  # null space found


def test_pallas_heterogeneous_scale_batch_converges():
    """Per-matrix convergence: a small-norm matrix batched with a 1e4x
    larger near-diagonal batchmate must NOT exit the sweep loop on the
    batchmate's converged (batch-dominant) off-diagonal mass. A
    batch-global tolerance showed 300x recon-error loss on this exact
    construction (round-3 review finding)."""
    from cross_patient_speech_decoding_tpu.ops.jacobi import (
        jacobi_eigh_pallas,
    )

    rng = np.random.default_rng(7)
    K = 8
    small = _sym(rng, 1, K)[0].astype(np.float32)
    big = (1e4 * (np.diag(rng.uniform(1, 2, K))
                  + 1e-6 * _sym(rng, 1, K)[0])).astype(np.float32)
    A = np.stack([small, (big + big.T) / 2])
    w, V = jacobi_eigh_pallas(jnp.asarray(A), block=2, interpret=True)
    w, V = np.asarray(w), np.asarray(V)
    for i in range(2):
        rec = V[i] @ (w[i][:, None] * V[i].T)
        scale = np.abs(np.linalg.eigvalsh(A[i].astype(np.float64))).max()
        # old global-tol code: 2.3e-5 rel error on the small matrix;
        # per-matrix tol: 1.1e-6 — 5e-6 splits them with 5x margin
        np.testing.assert_allclose(rec, A[i], atol=5e-6 * scale)


def test_pallas_kernel_matches_numpy_interpret():
    """The Pallas kernel body (v2 flat-matmul formulation) vs numpy eigh,
    in interpreter mode on the CPU backend — the TPU fallback would
    otherwise leave the kernel untested off-device."""
    from cross_patient_speech_decoding_tpu.ops.jacobi import (
        jacobi_eigh_pallas,
    )

    rng = np.random.default_rng(0)
    for B, K in ((6, 8), (5, 13)):  # even + odd K, non-divisible batch
        M = rng.normal(size=(B, K, K)).astype(np.float32)
        A = M @ M.transpose(0, 2, 1) + np.eye(K, dtype=np.float32)
        w, V = jacobi_eigh_pallas(jnp.asarray(A), block=4, interpret=True)
        w, V = np.asarray(w), np.asarray(V)
        w_np = np.stack([np.linalg.eigh(a)[0] for a in A])
        np.testing.assert_allclose(w, w_np, rtol=2e-4, atol=2e-4)
        recon = V @ (w[..., None] * V.transpose(0, 2, 1))
        np.testing.assert_allclose(recon, A, atol=5e-4)
