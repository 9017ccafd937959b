"""Streaming DSP parity vs scipy: CAR, stateful IIR (incl. chunked state
carry-over), FIR, RMS power, full process_hg_chunk chain."""

import jax.numpy as jnp
import numpy as np
import scipy.signal as sps

from cross_patient_speech_decoding_tpu.ops.signal import (
    car,
    compute_bin_power,
    fir_filter,
    iir_filter_stateful,
    init_stream_state,
    lfilter_zi,
    process_hg_chunk,
    StreamState,
)


def _bands(n_bands=3, order=4):
    bs, as_ = [], []
    for i in range(n_bands):
        lo, hi = 0.1 + 0.15 * i, 0.25 + 0.15 * i
        b, a = sps.butter(order // 2, [lo, hi], btype="band")
        bs.append(b)
        as_.append(a)
    return np.stack(bs), np.stack(as_)


def test_lfilter_zi_matches_scipy():
    b, a = sps.butter(2, [0.2, 0.4], btype="band")
    np.testing.assert_allclose(lfilter_zi(b, a), sps.lfilter_zi(b, a), atol=1e-10)


def test_car_matches_reference_semantics():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(6, 40))
    good = np.ones(6)
    good[[1, 4]] = 0  # bad channels excluded from the average
    got = np.asarray(car(jnp.asarray(x), jnp.asarray(good)))
    want = x - x[[0, 2, 3, 5]].mean(axis=0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_iir_stateful_matches_scipy_with_chunking():
    rng = np.random.default_rng(1)
    C, T = 4, 120
    x = rng.normal(size=(C, T))
    b, a = _bands()
    nb = b.shape[0]

    # scipy reference: per band, per full signal with zi
    zi0 = np.stack([np.tile(sps.lfilter_zi(b[i], a[i]), (C, 1)) for i in range(nb)])
    want = np.zeros((C, T, nb))
    zf_want = np.zeros_like(zi0)
    for i in range(nb):
        y, zf = sps.lfilter(b[i], a[i], x, zi=zi0[i])
        want[:, :, i] = y
        zf_want[i] = zf

    # ours: two chunks with carried state
    state = init_stream_state(b, a, C)
    np.testing.assert_allclose(np.asarray(state.zi), zi0, atol=1e-6)
    y1, zf1 = iir_filter_stateful(jnp.asarray(x[:, :50]), jnp.asarray(b), jnp.asarray(a), state.zi)
    y2, zf2 = iir_filter_stateful(jnp.asarray(x[:, 50:]), jnp.asarray(b), jnp.asarray(a), zf1)
    got = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1)
    np.testing.assert_allclose(got, want, atol=1e-4)
    np.testing.assert_allclose(np.asarray(zf2), zf_want, atol=1e-4)


def test_fir_matches_scipy():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 60))
    coefs = sps.firwin(9, [0.2, 0.45], pass_zero=False)[None, :].repeat(2, 0)
    coefs[1] *= 0.5
    got = np.asarray(fir_filter(jnp.asarray(x), jnp.asarray(coefs)))
    for i in range(2):
        want = sps.lfilter(coefs[i], 1.0, x)
        np.testing.assert_allclose(got[:, :, i], want, atol=1e-5)


def test_bin_power():
    rng = np.random.default_rng(3)
    f = rng.normal(size=(5, 20, 3))
    got = np.asarray(compute_bin_power(jnp.asarray(f)))
    want = np.sqrt(np.mean(f**2, axis=(1, 2)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_process_hg_chunk_chain():
    """Full chain matches composing the scipy pieces, with state carried."""
    rng = np.random.default_rng(4)
    C, T = 4, 40
    b, a = _bands()
    state = init_stream_state(b, a, C)
    chunk1 = rng.normal(size=(C, T))
    chunk2 = rng.normal(size=(C, T))

    p1, s1 = process_hg_chunk(jnp.asarray(chunk1), jnp.asarray(b), jnp.asarray(a), state)
    p2, s2 = process_hg_chunk(jnp.asarray(chunk2), jnp.asarray(b), jnp.asarray(a), s1)

    zi = np.array(state.zi)  # writable copy
    for chunk, p_got in [(chunk1, p1), (chunk2, p2)]:
        ref = chunk - chunk.mean(axis=0, keepdims=True)
        filt = np.zeros((C, T, b.shape[0]))
        for i in range(b.shape[0]):
            filt[:, :, i], zi[i] = sps.lfilter(b[i], a[i], ref, zi=zi[i])
        want = np.sqrt(np.mean(filt**2, axis=(1, 2)))
        np.testing.assert_allclose(np.asarray(p_got), want, atol=1e-4)


def test_filter_hg_bin_routes_fir_and_iir():
    """filter_hg_bin dispatches on coefficient shape like the reference
    router (realtime_processing.py:59-81)."""
    from cross_patient_speech_decoding_tpu.ops.signal import filter_hg_bin

    rng = np.random.default_rng(3)
    C, T = 3, 40
    x = rng.normal(size=(C, T))

    # FIR: 2-D coefs -> (filtered, None)
    coefs = sps.firwin(9, [0.2, 0.45], pass_zero=False)[None, :].repeat(2, 0)
    got, state = filter_hg_bin(jnp.asarray(x), jnp.asarray(coefs))
    assert state is None
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(fir_filter(jnp.asarray(x), jnp.asarray(coefs))),
        atol=1e-6,
    )

    # IIR as a (b, a) pair with carried state across two chunks
    b, a = _bands()
    zi = init_stream_state(b, a, C).zi
    y1, z1 = filter_hg_bin(jnp.asarray(x[:, :20]), (b, a), zi)
    y2, z2 = filter_hg_bin(jnp.asarray(x[:, 20:]), (b, a), z1)
    want, wzf = iir_filter_stateful(jnp.asarray(x), jnp.asarray(b), jnp.asarray(a), zi)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1),
        np.asarray(want), atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(z2), np.asarray(wzf), atol=1e-5)

    # IIR as the reference's stacked (bands, taps, [a, b]) layout, zi=None:
    # initial state must be the per-channel lfilter_zi steady state, like
    # the reference's IIR_filter_HG_bin (realtime_processing.py:120-128)
    stacked = np.stack([a, b], axis=-1)
    y3, z3 = filter_hg_bin(jnp.asarray(x), stacked)
    zi_ref = np.stack(
        [np.tile(sps.lfilter_zi(b[i], a[i]), (C, 1)) for i in range(b.shape[0])]
    )
    want0 = np.zeros((C, T, b.shape[0]))
    for i in range(b.shape[0]):
        want0[:, :, i], _ = sps.lfilter(b[i], a[i], x, zi=zi_ref[i])
    np.testing.assert_allclose(np.asarray(y3), want0, atol=1e-5)
