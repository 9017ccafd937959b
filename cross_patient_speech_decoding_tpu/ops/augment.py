"""Data augmentation ops (both reference generations, PRNG-explicit).

Covers the reference's two (duplicated) augmentation modules:
- tensor-level (`/root/reference/aligned_decoding/nn_models/data_utils/
  augmentations.py`, duplicated in realtime_sim/augmentations.py):
  time_warping (:13-29), time_masking (:32-48), time_shifting (:51-62),
  noise_jitter (:65-76), scaling (:79-90);
- classical (`processing_utils/data_augmentation.py`): within-class MixUp
  with Beta(alpha, alpha) pairing (:10-54) and time-jitter window
  re-centering (:57-93).

All functions are pure, take explicit PRNG keys, and keep static shapes
(warping uses a fixed resize back to T), so augmentation fuses into the
jitted preprocessing graph instead of running as host-side numpy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def time_warping(key: jax.Array, x: jax.Array, min_f: float = 0.8, max_f: float = 1.2):
    """Random temporal stretch/squeeze, resized back to the original T.

    x: (N, T, C). Each trial gets its own warp factor.
    """
    N, T, C = x.shape
    factors = jax.random.uniform(x_key(key, 0), (N,), minval=min_f, maxval=max_f)
    # sample positions: resample trial n at positions t * factor_n (clamped),
    # linear interpolation — equivalent to zoom+resize at static shape
    t = jnp.arange(T, dtype=x.dtype)
    pos = t[None, :] * factors[:, None]
    pos = jnp.clip(pos, 0, T - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, T - 1)
    frac = (pos - lo)[..., None]
    xl = jnp.take_along_axis(x, lo[..., None].repeat(C, -1), axis=1)
    xh = jnp.take_along_axis(x, hi[..., None].repeat(C, -1), axis=1)
    return xl * (1 - frac) + xh * frac


def time_masking(key: jax.Array, x: jax.Array, max_width: int = 10):
    """Zero a random time window per trial. x: (N, T, C)."""
    N, T, C = x.shape
    k1, k2 = jax.random.split(key)
    widths = jax.random.randint(k1, (N,), 0, max_width + 1)
    starts = jax.random.randint(k2, (N,), 0, jnp.maximum(T - max_width, 1))
    t = jnp.arange(T)[None, :]
    mask = (t < starts[:, None]) | (t >= (starts + widths)[:, None])
    return x * mask[..., None].astype(x.dtype)


def time_shifting(key: jax.Array, x: jax.Array, max_shift: int = 10):
    """Circular roll along time, random per trial. x: (N, T, C)."""
    N, T, C = x.shape
    shifts = jax.random.randint(key, (N,), -max_shift, max_shift + 1)
    t = jnp.arange(T)[None, :]
    src = (t - shifts[:, None]) % T
    return jnp.take_along_axis(x, src[..., None].repeat(C, -1), axis=1)


def noise_jitter(key: jax.Array, x: jax.Array, sigma: float = 0.1):
    """Additive Gaussian noise."""
    return x + sigma * jax.random.normal(key, x.shape, x.dtype)


def scaling(key: jax.Array, x: jax.Array, sigma: float = 0.1):
    """Random per-trial amplitude scaling around 1."""
    s = 1.0 + sigma * jax.random.normal(key, (x.shape[0], 1, 1), x.dtype)
    return x * s


def x_key(key, i):
    return jax.random.fold_in(key, i)


def mixup_pairs(key: jax.Array, class_ids: jax.Array, n_classes: int, n_aug: int):
    """Sample within-class MixUp pairs (idx_a, idx_b) fully on device.

    For each augmented sample: pick a valid trial a uniformly, then a
    uniformly-random trial b with the same class (possibly a itself when the
    class has a single trial, matching the duplicate-label pairing of the
    reference data_augmentation.py:223-239 in spirit).
    """
    N = class_ids.shape[0]
    k1, k2 = jax.random.split(key)
    idx_a = jax.random.randint(k1, (n_aug,), 0, N)
    cls_a = class_ids[idx_a]
    # gumbel-max over same-class membership = uniform same-class draw
    g = jax.random.gumbel(k2, (n_aug, N))
    same = class_ids[None, :] == cls_a[:, None]
    scores = jnp.where(same, g, -jnp.inf)
    idx_b = jnp.argmax(scores, axis=1).astype(jnp.int32)
    return idx_a.astype(jnp.int32), idx_b


def mixup(
    key: jax.Array,
    X: jax.Array,
    class_ids: jax.Array,
    n_classes: int,
    n_aug: int,
    alpha: float = 0.5,
):
    """Within-class MixUp (reference augment_mixup, data_augmentation.py:10-54).

    Returns (X_aug (n_aug, ...), ids_aug (n_aug,)). lam ~ Beta(alpha, alpha).
    """
    k_pairs, k_lam = jax.random.split(key)
    idx_a, idx_b = mixup_pairs(k_pairs, class_ids, n_classes, n_aug)
    lam = jax.random.beta(k_lam, alpha, alpha, (n_aug,))
    lam_b = lam.reshape((n_aug,) + (1,) * (X.ndim - 1)).astype(X.dtype)
    X_aug = lam_b * X[idx_a] + (1.0 - lam_b) * X[idx_b]
    return X_aug, class_ids[idx_a]


def time_jitter_windows(
    X_wide: jax.Array, center_start: int, win_len: int, offsets
):
    """Re-centered window crops (reference augment_time_jitter, :57-93).

    X_wide: (N, T_wide, C) un-cropped trials; returns
    (len(offsets), N, win_len, C) crops at center_start + offset each
    (offsets are static Python ints, so shapes stay static).
    """
    crops = []
    T_wide = X_wide.shape[1]
    for off in offsets:
        s = max(0, min(center_start + off, T_wide - win_len))
        crops.append(jax.lax.slice_in_dim(X_wide, s, s + win_len, axis=1))
    return jnp.stack(crops)
