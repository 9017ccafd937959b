"""Streaming DSP: CAR, stateful IIR/FIR band filtering, RMS bin power.

TPU-native rebuild of the reference's realtime processing chain
(`/root/reference/aligned_decoding/realtime_sim/realtime_processing.py`):
- ``CAR`` (:42-56): common-average reference excluding bad channels;
- ``IIR_filter_HG_bin`` (:103-143): per-band, per-channel
  ``scipy.signal.lfilter`` with carried initial conditions — the
  latency-critical streaming hot loop. Here it is ONE ``lax.scan`` over time
  whose per-step state is the full (bands, channels, order) filter memory in
  transposed direct-form II, bit-matching scipy's state convention
  (verified in tests/test_signal.py);
- ``FIR_filter_HG_bin`` (:84-100): stateless causal FIR as convolution;
- ``compute_bin_power`` (:146-164): RMS over (time, bands) per channel.

The whole chunk step (CAR -> IIR -> power) jits into a single program so a
streaming bin costs one device dispatch; `jax.vmap` over bands/channels
replaces the reference's Python band loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def car(data: jax.Array, good_mask: jax.Array | None = None) -> jax.Array:
    """Common-average reference. data (C, T); good_mask (C,) 1=use in avg."""
    if good_mask is None:
        avg = jnp.mean(data, axis=0, keepdims=True)
    else:
        w = good_mask.astype(data.dtype)[:, None]
        avg = jnp.sum(data * w, axis=0, keepdims=True) / jnp.maximum(
            jnp.sum(w), 1.0
        )
    return data - avg


def lfilter_zi(b: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Steady-state initial conditions for a step input (scipy contract).

    Host-side (init-time only). Solves (I - A) zi = B where A is the
    transposed direct-form II state-transition matrix.
    """
    b = np.asarray(b, np.float64)
    a = np.asarray(a, np.float64)
    a0 = a[0]
    a = a / a0
    b = b / a0
    n = max(len(a), len(b))
    a = np.pad(a, (0, n - len(a)))
    b = np.pad(b, (0, n - len(b)))
    # companion-form transition for transposed DF-II
    A = np.zeros((n - 1, n - 1))
    A[:, 0] = -a[1:]
    A[:-1, 1:] = np.eye(n - 2)
    B = b[1:] - a[1:] * b[0]
    return np.linalg.solve(np.eye(n - 1) - A, B)


def iir_filter_stateful(
    data: jax.Array, b: jax.Array, a: jax.Array, zi: jax.Array
):
    """Multi-band stateful IIR filter over a chunk (scipy lfilter parity).

    Transposed direct-form II, scanned over time, vectorized over
    (bands, channels):

        y[t]   = b0 x[t] + z0
        z_i    = b_{i+1} x[t] + z_{i+1} - a_{i+1} y[t]

    Args:
        data: (C, T) chunk.
        b, a: (n_bands, taps) numerator/denominator coefficient rows
            (a[:, 0] == 1 assumed, scipy-normalized).
        zi: (n_bands, C, order) carried filter state (order = taps - 1).

    Returns:
        (filtered (C, T, n_bands), zf (n_bands, C, order)).
    """
    taps = b.shape[1]
    order = taps - 1

    def step(z, x_t):
        # z: (bands, C, order); x_t: (C,)
        xb = x_t[None, :]  # broadcast over bands
        y = b[:, 0:1] * xb + z[..., 0]  # (bands, C)
        z_shift = jnp.concatenate(
            [z[..., 1:], jnp.zeros_like(z[..., :1])], axis=-1
        )
        z_new = (
            z_shift
            + b[:, 1:][:, None, :] * xb[..., None]
            - a[:, 1:][:, None, :] * y[..., None]
        )
        return z_new, y

    zf, ys = jax.lax.scan(step, zi, data.T)  # ys: (T, bands, C)
    return ys.transpose(2, 0, 1), zf  # (C, T, bands)


def fir_filter(data: jax.Array, coefs: jax.Array) -> jax.Array:
    """Stateless causal FIR per band. data (C, T), coefs (n_bands, taps)
    -> (C, T, n_bands)."""
    C, T = data.shape
    taps = coefs.shape[1]
    padded = jnp.pad(data, ((0, 0), (taps - 1, 0)))
    # causal convolution as conv_general_dilated: one conv, bands = output
    # features, channels handled as batch.
    lhs = padded[:, None, :]  # (C, 1, T+taps-1)
    rhs = coefs[:, None, ::-1]  # (bands, 1, taps) flipped for conv
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )  # (C, bands, T)
    return out.transpose(0, 2, 1)


def filter_hg_bin(
    data: jax.Array,
    coefs,
    band_ics: jax.Array | None = None,
):
    """Route a bin through IIR or FIR bandpass filtering by coefficient
    shape — the reference ``filter_HG_bin`` dispatcher
    (realtime_sim/realtime_processing.py:59-81).

    Args:
        data: (C, T) chunk.
        coefs: IIR as a ``(b, a)`` pair of (n_bands, taps) rows or a
            stacked (n_bands, taps, 2) array ([..., 0] = a, [..., 1] = b,
            the reference layout); FIR as a single (n_bands, taps) array.
        band_ics: carried IIR state (n_bands, C, order), or None to
            initialise from per-channel ``lfilter_zi`` steady state like
            the reference (realtime_processing.py:120-128) — requires
            concrete (non-traced) coefficients.

    Returns:
        (filtered (C, T, n_bands), new_state-or-None).
    """
    if isinstance(coefs, (tuple, list)):
        b, a = coefs
    else:
        coefs = jnp.asarray(coefs)
        if coefs.ndim == 2:  # FIR
            return fir_filter(data, coefs), None
        if coefs.ndim != 3:
            raise ValueError("coefs must be 2-D (FIR) or 3-D / (b, a) (IIR)")
        a, b = coefs[..., 0], coefs[..., 1]
    if band_ics is None:
        band_ics = init_stream_state(
            np.asarray(b), np.asarray(a), data.shape[0]
        ).zi
    return iir_filter_stateful(data, jnp.asarray(b), jnp.asarray(a), band_ics)


def compute_bin_power(filtered: jax.Array) -> jax.Array:
    """RMS power per channel over (time, bands). (C, T, bands) -> (C,)."""
    return jnp.sqrt(jnp.mean(jnp.square(filtered), axis=(1, 2)))


class StreamState(NamedTuple):
    """Carried streaming-DSP state: IIR memory per band/channel."""

    zi: jax.Array  # (n_bands, C, order)


def init_stream_state(
    bandpass_b: np.ndarray, bandpass_a: np.ndarray, n_channels: int
) -> StreamState:
    """Per-channel steady-state zi for every band (reference :121-128)."""
    zis = [
        np.tile(lfilter_zi(b, a), (n_channels, 1))
        for b, a in zip(bandpass_b, bandpass_a)
    ]
    return StreamState(zi=jnp.asarray(np.stack(zis)))


def process_hg_chunk(
    chunk: jax.Array,
    b: jax.Array,
    a: jax.Array,
    state: StreamState,
    good_mask: jax.Array | None = None,
):
    """One streaming step: CAR -> stateful IIR -> RMS power.

    Mirrors reference ``process_HG`` (realtime_processing.py:10-39).
    chunk (C, T_bin) -> (power (C,), new_state). Designed to be jitted once
    and called per incoming bin with carried state.
    """
    ref = car(chunk, good_mask)
    filtered, zf = iir_filter_stateful(ref, b, a, state.zi)
    power = compute_bin_power(filtered)
    return power, StreamState(zi=zf)
