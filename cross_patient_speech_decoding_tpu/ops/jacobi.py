"""Batched symmetric eigensolver via parallel (round-robin) Jacobi rotations.

XLA's TPU ``eigh`` on many small matrices is the remaining bottleneck of
the alignment fit (40x40 x batch dominates the Gram-path CCA). This solver
reformulates cyclic Jacobi so each step applies K/2 *disjoint* Givens
rotations at once as one orthogonal matrix:

    A <- R^T A R,   V <- V R

A round-robin tournament schedule covers all K(K-1)/2 pairs in K-1 steps
per sweep; off-diagonal mass vanishes quadratically so a fixed sweep count
gives f32-accurate spectra with fully static shapes. The rotation
parameters are computed WITHOUT gathers: with P the (static, per-step)
pair-permutation matrix and sign the (+1/-1) member labels,

    a_partner = P @ diag(A),  a_pq = rowsum(A * P)
    tau_i = sign_i (a_partner_i - diag_i) / (2 a_pq_i)   (equal for both
    members of a pair), c, s elementwise, R = I*c + P*(sign*t*c)

so one step = a few elementwise ops + 3 small matmuls — MXU work only.

Two backends:
- :func:`jacobi_eigh` — pure JAX lax.scan (any backend);
- :func:`jacobi_eigh_pallas` — Pallas TPU kernel keeping A and V resident
  in VMEM across ALL rotation steps (no per-step HBM round trips or
  dispatch overhead), gridded over the batch.

Parity tested against numpy eigh in tests/test_jacobi.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cross_patient_speech_decoding_tpu.ops.precision import hdot


@functools.lru_cache(maxsize=16)
def _round_robin_schedule(k: int):
    """Static tables: P (k-1, k, k) pair permutations, sign (k-1, k)."""
    assert k % 2 == 0
    players = list(range(k))
    perms = np.zeros((k - 1, k, k), np.float32)
    signs = np.zeros((k - 1, k), np.float32)
    for t in range(k - 1):
        for i in range(k // 2):
            p, q = players[i], players[k - 1 - i]
            perms[t, p, q] = perms[t, q, p] = 1.0
            signs[t, p], signs[t, q] = 1.0, -1.0
        players = [players[0]] + [players[-1]] + players[1:-1]
    return perms, signs


def _pad_odd(A):
    K = A.shape[-1]
    if K % 2 == 0:
        return A, K, False
    pad = [(0, 0)] * (A.ndim - 2) + [(0, 1), (0, 1)]
    A = jnp.pad(A, pad)
    A = A.at[..., K, K].set(1.0)
    return A, K, True


def _strip_pad(w, V, K):
    """Drop the synthetic padded eigenpair (its eigenvector is exactly e_K:
    the padded coordinate never mixes — all its off-diagonals stay 0)."""
    is_pad = jnp.abs(V[..., K, :]) > 0.5
    idx = jnp.argsort(is_pad, axis=-1, stable=True)[..., :K]
    w = jnp.take_along_axis(w, idx, axis=-1)
    V = jnp.take_along_axis(V[..., :K, :], idx[..., None, :], axis=-1)
    return w, V


def _rotation(A_cur, P, sign, eye, dtype):
    diag = jnp.diagonal(A_cur, axis1=-2, axis2=-1)
    a_partner = jnp.einsum(
        "ij,...j->...i", P, diag, precision=jax.lax.Precision.HIGHEST
    )
    a_pq = jnp.sum(A_cur * P, axis=-1)
    small = jnp.abs(a_pq) < 1e-30
    tau = sign * (a_partner - diag) / (2.0 * jnp.where(small, 1.0, a_pq))
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(small, 0.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s_full = sign * t * c
    return eye * c[..., None, :] + P * s_full[..., :, None]


def jacobi_eigh(A: jax.Array, sweeps: int = 8):
    """Eigendecomposition of symmetric A (..., K, K).

    Returns (w, V), eigenvalues ASCENDING (numpy contract),
    A ≈ V @ diag(w) @ V^T.
    """
    A, K, odd = _pad_odd(A)
    Kp = A.shape[-1]
    perms, signs = _round_robin_schedule(Kp)
    eye = jnp.eye(Kp, dtype=A.dtype)

    def step(carry, inputs):
        A_cur, V = carry
        P, sign = inputs
        R = _rotation(A_cur, P, sign, eye, A.dtype)
        A_new = hdot(R.swapaxes(-1, -2), hdot(A_cur, R))
        A_new = 0.5 * (A_new + A_new.swapaxes(-1, -2))
        return (A_new, hdot(V, R)), None

    V0 = jnp.broadcast_to(eye, A.shape)
    P_all = jnp.tile(jnp.asarray(perms, A.dtype), (sweeps, 1, 1))
    s_all = jnp.tile(jnp.asarray(signs, A.dtype), (sweeps, 1))
    (A_f, V_f), _ = jax.lax.scan(step, (A, V0), (P_all, s_all))

    w = jnp.diagonal(A_f, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V_f, order[..., None, :], axis=-1)
    if odd:
        w, V = _strip_pad(w, V, K)
    return w, V


def batched_eigh(A: jax.Array, sweeps: int = 8):
    """eigh dispatch: Pallas Jacobi on TPU (faster for many small
    matrices; measured crossover vs XLA eigh is ~K=64-120 on v5e),
    LAPACK-backed ``jnp.linalg.eigh`` elsewhere (exact).

    The Pallas path requires a real NATIVE batch (>= 16 flattened): the
    kernel pads its batch tile to 64, so a trace-time batch of 1-2 — which
    is what it sees under a fold/trial vmap — wastes ~32x the work AND
    serializes across the vmap dim (TPU grids run sequentially; vmap of a
    pallas_call just prepends a grid axis). Small batches go to XLA's
    eigh, whose batching rule composes with vmap natively (measured: the
    20-fold decode program's alignment stage runs 4.6x faster through XLA
    eigh than through the vmapped kernel — 44 vs 204 ms warm — and the
    whole fold program 3.2x, round-3 log).
    """
    lead = int(np.prod(A.shape[:-2])) if A.ndim > 2 else 1
    if jax.default_backend() == "tpu" and A.shape[-1] <= 64 and lead >= 16:
        return jacobi_eigh_pallas(A, sweeps=sweeps)
    return jnp.linalg.eigh(A)


def jacobi_eigh_pallas(A: jax.Array, sweeps: int = 8, block: int = 64,
                       interpret: bool | None = None):
    """Pallas TPU backend: A, V live in VMEM across one full sweep.

    A is (..., K, K); leading dims are flattened and tiled into the
    kernel grid in ``block``-sized batch tiles. Falls back to
    :func:`jacobi_eigh` on non-TPU backends unless ``interpret`` forces
    the interpreter (CPU parity tests).

    Kernel formulation (v3). v1 used per-iteration BATCHED (block, K, K)
    dot_generals — `block` tiny MXU ops each, overhead-dominated. v2
    exploited the batch-shared rotation pattern P so every product against
    R = diag(c) + P*s became one FLAT (B*K, K) @ (K, K) matmul plus
    elementwise scaling:

        A R   = A * c[col] + (flat(A) @ P) * s_perm[col]
        R^T B = ((flat(B^T) @ P) * s_perm[col] + B^T * c[col])^T,

    with the final transpose free (R^T A R is symmetric). Measured v2
    residual: ~15 us per rotation step REGARDLESS of matmul formulation —
    fori_loop bookkeeping + dynamic indexing of the P/sign tables, not
    MXU time (fusing V's matmul into A's changed nothing). v3 therefore:

    - bakes the whole round-robin schedule as CONSTANTS into a kernel
      that executes ONE fully-unrolled sweep (K-1 static steps, no
      dynamic table indexing, no inner loop state);
    - runs the sweep kernel under an XLA-level ``lax.while_loop`` with a
      convergence test (relative off-diagonal Frobenius mass at the f32
      floor) between sweeps — Mosaic's in-kernel while/cond miscompiles
      array carries on this toolchain (relayout bug), and the sweep-level
      A/V round trip through HBM is ~3 MB, negligible next to the
      per-step overhead it eliminates. Well-conditioned Gram batches
      finish in 4-5 of the 8 budgeted sweeps.
    """
    if interpret is None:
        interpret = False
        if jax.default_backend() not in ("tpu",):
            return jacobi_eigh(A, sweeps)

    lead = A.shape[:-2]
    if A.ndim == 2:
        w, V = jacobi_eigh_pallas(A[None], sweeps, block=1,
                                  interpret=interpret)
        return w[0], V[0]
    if A.ndim > 3:
        K0 = A.shape[-1]
        w, V = jacobi_eigh_pallas(A.reshape(-1, K0, K0), sweeps, block,
                                  interpret=interpret)
        return w.reshape(lead + w.shape[-1:]), V.reshape(lead + V.shape[-2:])

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A, K, odd = _pad_odd(A)
    B, Kp, _ = A.shape
    if B % block:
        padB = (-B) % block
        A = jnp.pad(A, ((0, padB), (0, 0), (0, 0)))
        # keep padded matrices non-degenerate (identity) so rotations
        # there stay numerically tame
        A = A.at[B:].add(jnp.eye(Kp, dtype=A.dtype))
    Bp = A.shape[0]
    BB = min(block, Bp)
    perms_np, signs_np = _round_robin_schedule(Kp)
    n_steps = perms_np.shape[0]
    perms = jnp.asarray(perms_np, A.dtype)  # (n_steps, Kp, Kp)
    # (n_steps, 1, Kp): Mosaic block shapes need the sublane dim present
    signs = jnp.asarray(signs_np[:, None, :], A.dtype)

    def sweep_kernel(P_ref, S_ref, A_ref, V_ref, Ao_ref, Vo_ref,
                     A_scr, V_scr):
        # the rotation step is a GRID dimension: P/sign arrive as
        # DMA-prefetched (1, Kp, Kp)/(1, Kp) blocks — no in-body loop
        # state, no dynamic table indexing (both measured as the v2
        # bottleneck), and a small body that compiles in seconds
        step = pl.program_id(1)

        @pl.when(step == 0)
        def _():
            A_scr[:] = A_ref[:]
            V_scr[:] = V_ref[:]

        eye = jnp.eye(Kp, dtype=A_scr.dtype)
        A_cur = A_scr[:]
        V = V_scr[:]
        P = P_ref[0]
        sign = S_ref[0]  # (1, Kp) — broadcasts over the batch rows
        hp = jax.lax.Precision.HIGHEST

        def flat_mm(X, P):
            # (BB, M, Kp) @ (Kp, Kp) against a 0/1 PERMUTATION matrix:
            # P is exact in bf16, so a manual 3-term bf16 split of X
            # reproduces the f32 product at 3 MXU passes — Mosaic's
            # HIGHEST costs 6 passes and measured ~60% of the whole
            # sweep, while DEFAULT's single pass destroys convergence
            # (relerr 2e-1). No reshape: repacking the lane-padded
            # layout into (BB*M, Kp) cost a relayout per call.
            def one(Xp):
                return jax.lax.dot_general(
                    Xp, P.astype(jnp.bfloat16), (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            hi = X.astype(jnp.bfloat16)
            r1 = X - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            return (one(hi) + one(mid)) + one(lo)

        diag = jnp.sum(A_cur * eye[None], axis=-1)
        a_partner = jnp.dot(diag, P, precision=hp)  # P symmetric
        a_pq = jnp.sum(A_cur * P[None], axis=-1)
        small = jnp.abs(a_pq) < 1e-30
        tau = sign * (a_partner - diag) / (
            2.0 * jnp.where(small, 1.0, a_pq)
        )
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(small, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s_full = sign * t * c
        # s_perm[b, j] = s_full[b, sigma(j)]: P is a symmetric full
        # permutation (even Kp round-robin pairs EVERY row each step)
        s_perm = jnp.dot(s_full, P, precision=hp)
        ccol = c[:, None, :]
        scol = s_perm[:, None, :]
        B1 = A_cur * ccol + flat_mm(A_cur, P) * scol  # A R
        B1t = B1.swapaxes(-1, -2)
        M = B1t * ccol + flat_mm(B1t, P) * scol  # (R^T A R)^T == R^T A R
        M = 0.5 * (M + M.swapaxes(-1, -2))
        V_new = V * ccol + flat_mm(V, P) * scol  # V R
        A_scr[:] = M
        V_scr[:] = V_new

        @pl.when(step == n_steps - 1)
        def _():
            Ao_ref[:] = M
            Vo_ref[:] = V_new

    sweep_call = pl.pallas_call(
        sweep_kernel,
        grid=(Bp // BB, n_steps),
        in_specs=[
            pl.BlockSpec((1, Kp, Kp), lambda b, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Kp), lambda b, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Kp, Kp), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Kp, Kp), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BB, Kp, Kp), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Kp, Kp), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Kp, Kp), A.dtype),
            jax.ShapeDtypeStruct((Bp, Kp, Kp), A.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((BB, Kp, Kp), jnp.float32),
            pltpu.VMEM((BB, Kp, Kp), jnp.float32),
        ],
        input_output_aliases={2: 0, 3: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the default 16 MB scoped-vmem budget rejects this kernel at
            # larger total batches (observed: Bp=256/K=40 charged 17.08M
            # and 500'd the compile helper; BB=128 measured 19.95M) — the
            # compiler's stack accounting is super-linear in ways we can't
            # predict (double-buffered A/V in+out, scratch, rotation
            # intermediates + bf16 splits). Budget a flat 64 MB: v5e VMEM
            # is 128 MB and this kernel owns the core while it runs.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    # sweep-level convergence loop at the XLA level (in-kernel while/cond
    # trips a Mosaic relayout bug on array carries); tolerance = relative
    # off-diagonal Frobenius mass at the f32 floor
    eye_h = jnp.eye(Kp, dtype=A.dtype)
    # PER-MATRIX tolerance: a batch-global mass test lets a small-norm
    # matrix ride out of the loop on a large-norm batchmate's early
    # convergence (observed 300x recon-error loss on a 1e4 scale split);
    # heterogeneous-scale Gram batches are the norm across patients/folds
    total0 = jnp.sum(A * A, axis=(-2, -1))
    tol = jnp.maximum(total0, jnp.asarray(1e-30, A.dtype)) * 5e-14

    def off_mass(Ax):
        # masked square-sum, NOT sum(A^2) - sum(diag^2): the subtraction
        # cancels catastrophically in f32 near convergence and reports
        # "converged" ~1-2 sweeps early (observed 30x recon-error loss)
        offd = Ax * (1.0 - eye_h[None])
        return jnp.sum(offd * offd, axis=(-2, -1))

    def cond_fn(carry):
        s, Ax, _ = carry
        return (s < sweeps) & jnp.any(off_mass(Ax) > tol)

    def body_fn(carry):
        s, Ax, Vx = carry
        Ax, Vx = sweep_call(perms, signs, Ax, Vx)
        return s + 1, Ax, Vx

    V0 = jnp.broadcast_to(eye_h[None], A.shape).astype(A.dtype)
    _, A_f, V = jax.lax.while_loop(cond_fn, body_fn, (0, A, V0))
    w = jnp.sum(A_f * eye_h[None], axis=-1)

    w, V = w[:B], V[:B]
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    if odd:
        w, V = _strip_pad(w, V, K)
    return w, V
