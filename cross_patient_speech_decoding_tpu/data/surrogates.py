"""Tensor-Maximum-Entropy (TME) surrogate data — the structure-destroying
control of the reference (supp_fig_11; ``pt_decoding_data_S62_TME.pkl``
consumed at `scripts/aligned_decode_svm_ncv.py:261-263`).

Implements the TME method of Elsayed & Cunningham (2017, Nat. Neurosci.
"Structure in neural population recordings: an optimal control perspective"
methods): surrogate tensors are samples from the maximum-entropy Gaussian
whose mode-wise marginal covariances (trials / time / channels) match the
data. The max-ent covariance is diagonal in the Kronecker product of the
mode eigenbases with entries 1/(a_i + b_j + c_k); the vectors a, b, c are
fit so the implied marginal eigenvalues match the data's (solved here by
Adam on device — the reference pipeline consumed pre-computed surrogate
files; this framework generates them natively).

TME preserves all three marginal covariances (including trial-mode, where
linear class separability lives) and destroys beyond-marginal tensor
interactions. Also provides cheaper mode-shuffle surrogates and
the ``random_data`` uniform-noise control (``-r`` flag,
aligned_decode_svm_ncv.py:275-279) lives in cli/experiments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _mode_covs(X: np.ndarray):
    """Mode-wise SCATTER matrices of a mean-centered 3-way tensor.

    Unnormalized (sum over the other modes, not mean): TME feasibility
    requires equal traces across modes — trace(S1) = trace(S2) = trace(S3)
    = ||Xc||^2 — which normalized covariances would break.
    """
    Xc = X - X.mean(axis=0, keepdims=True)
    N, T, C = Xc.shape
    mats = [
        Xc.reshape(N, T * C),
        np.moveaxis(Xc, 1, 0).reshape(T, N * C),
        np.moveaxis(Xc, 2, 0).reshape(C, N * T),
    ]
    return [m @ m.T for m in mats], Xc


def fit_tme(X: np.ndarray, steps: int = 2000, lr: float = 5e-2, seed: int = 0):
    """Fit the TME max-ent eigen-parameters to a (N, T, C) tensor.

    Returns a dict with per-mode eigenbases Q and the fitted positive
    vectors (a, b, c) defining Kronecker-diagonal variances
    1/(a_i + b_j + c_k).
    """
    import optax

    covs, Xc = _mode_covs(X)
    eigs, Qs = [], []
    for cov in covs:
        w, q = np.linalg.eigh(cov)
        w = np.maximum(w[::-1], 0.0)
        q = q[:, ::-1]
        eigs.append(jnp.asarray(w, jnp.float32))
        Qs.append(q)

    N, T, C = X.shape
    d1, d2, d3 = eigs

    # parameterize a = exp(la) etc. for positivity
    def implied_marginals(la, lb, lc):
        a, b, c = jnp.exp(la), jnp.exp(lb), jnp.exp(lc)
        s = (
            a[:, None, None] + b[None, :, None] + c[None, None, :]
        )  # (N, T, C)
        v = 1.0 / s
        return v.sum((1, 2)), v.sum((0, 2)), v.sum((0, 1))

    def loss_fn(params):
        m1, m2, m3 = implied_marginals(*params)
        # log-space error: handles the orders-of-magnitude eigen spread
        def err(m, d):
            return jnp.sum((jnp.log(m + 1e-9) - jnp.log(d + 1e-9)) ** 2)

        return err(m1, d1) + err(m2, d2) + err(m3, d3)

    # init from the decoupled solution: marginal_i ~ (#other entries)/a_i
    def init_vec(d, n_other):
        return jnp.log(jnp.maximum(n_other / jnp.maximum(d, 1e-6) / 3.0, 1e-8))

    params = (
        init_vec(d1, T * C),
        init_vec(d2, N * C),
        init_vec(d3, N * T),
    )
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        loss, g = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, loss

    loss = None
    for _ in range(steps):
        params, opt, loss = step(params, opt)

    m1, m2, m3 = implied_marginals(*params)
    return {
        "Qs": Qs,
        "log_abc": tuple(np.asarray(p) for p in params),
        "mean": X.mean(axis=0, keepdims=True),
        "final_loss": float(loss),
        "data_eigs": tuple(np.asarray(d) for d in (d1, d2, d3)),
        "implied_eigs": tuple(np.asarray(m) for m in (m1, m2, m3)),
    }


def sample_tme(fit: dict, n_samples: int | None = None, seed: int = 0):
    """Draw surrogate tensors from a fitted TME model."""
    Q1, Q2, Q3 = fit["Qs"]
    la, lb, lc = (jnp.asarray(v) for v in fit["log_abc"])
    N, T, C = Q1.shape[0], Q2.shape[0], Q3.shape[0]

    s = jnp.exp(la)[:, None, None] + jnp.exp(lb)[None, :, None] + jnp.exp(lc)[None, None, :]
    std = 1.0 / jnp.sqrt(s)

    key = jax.random.key(seed)
    eps = jax.random.normal(key, (N, T, C)) * std
    # rotate out of the eigenbases: X = eps x1 Q1 x2 Q2 x3 Q3. HIGHEST
    # precision: the whole point of TME is surrogate marginal covariances
    # matching the fitted eigenvalues; bf16-class default passes would
    # blur exactly that property (ops/precision.py policy)
    hp = jax.lax.Precision.HIGHEST
    out = jnp.einsum(
        "ntc,in->itc", eps, jnp.asarray(Q1, jnp.float32), precision=hp
    )
    out = jnp.einsum(
        "itc,jt->ijc", out, jnp.asarray(Q2, jnp.float32), precision=hp
    )
    out = jnp.einsum(
        "ijc,kc->ijk", out, jnp.asarray(Q3, jnp.float32), precision=hp
    )
    return np.asarray(out) + fit["mean"]


def tme_surrogate(X: np.ndarray, steps: int = 2000, seed: int = 0):
    """One-call TME surrogate of a (N, T, C) trial tensor."""
    f = fit_tme(X, steps=steps, seed=seed)
    return sample_tme(f, seed=seed), f


def mode_shuffle_surrogate(X: np.ndarray, rng: np.random.Generator):
    """Cheap control: independently permute trials per (time, channel) —
    destroys trial structure, preserves per-(t,c) marginals."""
    X = np.asarray(X)
    out = np.empty_like(X)
    N = X.shape[0]
    for t in range(X.shape[1]):
        for c in range(X.shape[2]):
            out[:, t, c] = X[rng.permutation(N), t, c]
    return out
