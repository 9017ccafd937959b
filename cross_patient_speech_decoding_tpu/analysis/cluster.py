"""Latent-space clustering scores and embeddings (fig_2 machinery).

The reference's fig_2 notebook scores latent spaces with sklearn's
``silhouette_samples`` (averaged over positive samples only — its custom
``silhouette_scorer``), ``calinski_harabasz_score`` and
``davies_bouldin_score`` on t-SNE / PCA embeddings, 50 iterations against
shuffled-label chance distributions (`figure_analyses/fig_2.ipynb` cells
29-44). Here the O(N^2) geometry runs as device matmuls: pairwise
distances, one-hot cluster reductions, and a pure-JAX Barnes-Hut-free
t-SNE whose P/Q affinity products are MXU matmuls.

Parity: silhouette/CH/DB are tested against the sklearn oracles; t-SNE is
stochastic (tested by cluster-recovery invariants, like the reference's
usage, which never fixes seeds).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.precision import HIGHEST, hdot


def pairwise_sq_dists(x: jax.Array, y: jax.Array | None = None) -> jax.Array:
    """Squared euclidean distance matrix via one MXU matmul.

    One shared implementation with the classifier kernels: the
    |x|^2 + |y|^2 - 2xy expansion is catastrophically cancellative at
    bf16-class default precision, and that caveat must live in ONE place.
    """
    from ..ops.classifiers import _sq_dists

    return _sq_dists(x, x if y is None else y)


@partial(jax.jit, static_argnames=("n_clusters",))
def _silhouette_samples_jit(x, labels, n_clusters):
    d = jnp.sqrt(pairwise_sq_dists(x))
    onehot = jax.nn.one_hot(labels, n_clusters, dtype=x.dtype)  # (N, K)
    counts = onehot.sum(0)  # (K,)
    sums = hdot(d, onehot)  # (N, K) summed distance into each cluster
    own = counts[labels]  # cluster size of each sample
    intra_sum = jnp.take_along_axis(sums, labels[:, None], 1)[:, 0]
    a = intra_sum / jnp.maximum(own - 1.0, 1.0)
    mean_other = sums / jnp.maximum(counts, 1.0)[None, :]
    # exclude own cluster and empty clusters from the min
    blocked = (jax.nn.one_hot(labels, n_clusters, dtype=bool)
               | (counts == 0)[None, :])
    b = jnp.min(jnp.where(blocked, jnp.inf, mean_other), axis=1)
    s = (b - a) / jnp.maximum(jnp.maximum(a, b), 1e-30)
    return jnp.where(own <= 1.0, 0.0, s)  # sklearn: singleton clusters -> 0


def silhouette_samples(x, labels) -> np.ndarray:
    """Per-sample silhouette coefficients (sklearn semantics)."""
    x = jnp.asarray(x, jnp.float32)
    labels, n_clusters = _dense_labels(labels)
    return np.asarray(_silhouette_samples_jit(x, labels, n_clusters))


def silhouette_positive_mean(x, labels) -> float:
    """The reference's ``silhouette_scorer``: mean of the *positive*
    silhouette samples only (fig_2 cell 29)."""
    s = silhouette_samples(x, labels)
    pos = s[s > 0]
    return float(pos.mean()) if pos.size else float("nan")


def _dense_labels(labels):
    labels = np.asarray(labels)
    _, dense = np.unique(labels, return_inverse=True)
    return jnp.asarray(dense, jnp.int32), int(dense.max()) + 1


@partial(jax.jit, static_argnames=("n_clusters",))
def _ch_db_jit(x, labels, n_clusters):
    onehot = jax.nn.one_hot(labels, n_clusters, dtype=x.dtype)
    counts = onehot.sum(0)
    centroids = hdot(onehot.T, x) / jnp.maximum(counts, 1.0)[:, None]
    grand = x.mean(0)
    n = x.shape[0]
    # Calinski-Harabasz
    between = jnp.sum(counts * jnp.sum((centroids - grand) ** 2, -1))
    within_sq = jnp.sum((x - centroids[labels]) ** 2)
    ch = (between / jnp.maximum(n_clusters - 1, 1)) / (
        jnp.maximum(within_sq, 1e-30) / jnp.maximum(n - n_clusters, 1)
    )
    # Davies-Bouldin
    dist_to_centroid = jnp.sqrt(
        jnp.maximum(jnp.sum((x - centroids[labels]) ** 2, -1), 0.0)
    )
    s = hdot(dist_to_centroid[None, :], onehot)[0] / jnp.maximum(counts, 1.0)
    m = jnp.sqrt(pairwise_sq_dists(centroids))
    r = (s[:, None] + s[None, :]) / jnp.where(m > 0, m, jnp.inf)
    db = jnp.mean(jnp.max(jnp.where(jnp.eye(n_clusters, dtype=bool), -jnp.inf, r), 1))
    return ch, db


def calinski_harabasz(x, labels) -> float:
    """sklearn ``calinski_harabasz_score`` (fig_2 cluster scores)."""
    x = jnp.asarray(x, jnp.float32)
    labels, k = _dense_labels(labels)
    ch, _ = _ch_db_jit(x, labels, k)
    return float(ch)


def davies_bouldin(x, labels) -> float:
    """sklearn ``davies_bouldin_score`` (fig_2 cluster scores)."""
    x = jnp.asarray(x, jnp.float32)
    labels, k = _dense_labels(labels)
    _, db = _ch_db_jit(x, labels, k)
    return float(db)


def pca_embed(x, n_components: int = 2) -> np.ndarray:
    """Centered PCA embedding (the fig_2 `PCA(n_components=2)` path)."""
    from ..ops.pca import pca_fit_transform

    _, z = pca_fit_transform(jnp.asarray(x, jnp.float32), n_components)
    return np.asarray(z[:, :n_components])


# ---------------------------------------------------------------------------
# t-SNE (pure JAX)
# ---------------------------------------------------------------------------


def _conditional_probs(d2: jax.Array, perplexity: float, n_steps: int = 60):
    """Per-row binary search of the Gaussian bandwidth to hit perplexity."""
    n = d2.shape[0]
    target = jnp.log(perplexity)
    mask = ~jnp.eye(n, dtype=bool)

    def entropy_and_p(beta):
        logits = jnp.where(mask, -d2 * beta[:, None], -jnp.inf)
        p = jax.nn.softmax(logits, axis=1)
        h = -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0), axis=1)
        return h, p

    def body(_, carry):
        lo, hi, beta = carry
        h, _ = entropy_and_p(beta)
        too_high = h > target  # entropy too high -> increase beta
        lo = jnp.where(too_high, beta, lo)
        hi = jnp.where(too_high, hi, beta)
        beta = jnp.where(jnp.isinf(hi), beta * 2.0, 0.5 * (lo + hi))
        return lo, hi, beta

    beta0 = jnp.ones(n, d2.dtype)
    lo0 = jnp.zeros(n, d2.dtype)
    hi0 = jnp.full(n, jnp.inf, d2.dtype)
    _, _, beta = jax.lax.fori_loop(0, n_steps, body, (lo0, hi0, beta0))
    _, p = entropy_and_p(beta)
    return p


@partial(jax.jit, static_argnames=("n_iter", "exaggeration_iters"))
def _tsne_run(p_sym, y0, n_iter, exaggeration_iters, lr):
    n = p_sym.shape[0]
    eye = jnp.eye(n, dtype=bool)

    def kl_grad(y, p):
        d2 = pairwise_sq_dists(y)
        w = jnp.where(eye, 0.0, 1.0 / (1.0 + d2))  # student-t kernel
        q = w / jnp.maximum(w.sum(), 1e-12)
        pq = (p - q) * w
        # grad_i = 4 * sum_j pq_ij (y_i - y_j)
        return 4.0 * (y * pq.sum(1, keepdims=True) - hdot(pq, y))

    def body(i, carry):
        y, vel, gains = carry
        p = jnp.where(i < exaggeration_iters, p_sym * 12.0, p_sym)
        g = kl_grad(y, p)
        momentum = jnp.where(i < exaggeration_iters, 0.5, 0.8)
        same_sign = jnp.sign(g) == jnp.sign(vel)
        gains = jnp.clip(
            jnp.where(same_sign, gains * 0.8, gains + 0.2), 0.01, None
        )
        vel = momentum * vel - lr * gains * g
        y = y + vel
        return y - y.mean(0), vel, gains

    y, _, _ = jax.lax.fori_loop(
        0, n_iter, body, (y0, jnp.zeros_like(y0), jnp.ones_like(y0))
    )
    return y


def tsne_embed(x, n_components: int = 2, *, perplexity: float = 30.0,
               n_iter: int = 500, learning_rate: float | str = "auto",
               seed: int = 0) -> np.ndarray:
    """t-SNE embedding, all-device: affinities, KL gradient and the
    gradient-descent loop run under one jit (the fig_2
    ``TSNE(n_components=2, perplexity=30)`` replacement).

    Standard formulation (van der Maaten & Hinton 2008): symmetrized
    conditional Gaussians -> student-t low-dim kernel, early exaggeration
    x12 for the first quarter of iterations, adaptive per-dim gains.
    """
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    perplexity = min(perplexity, (n - 1) / 3.0)
    if learning_rate == "auto":  # sklearn heuristic: n / early_exag / 4
        learning_rate = max(n / 48.0, 50.0)
    d2 = pairwise_sq_dists(x)
    p_cond = _conditional_probs(d2, perplexity)
    p_sym = (p_cond + p_cond.T) / (2.0 * n)
    p_sym = jnp.maximum(p_sym, 1e-12)
    y0 = 1e-4 * jax.random.normal(
        jax.random.key(seed), (n, n_components), jnp.float32
    )
    y = _tsne_run(p_sym, y0, n_iter, max(50, n_iter // 4), learning_rate)
    return np.asarray(y)
