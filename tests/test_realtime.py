"""Streaming simulator parity: online (per-bin scan) logits must equal the
offline windowed forward on the same binned features."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal as sps

from cross_patient_speech_decoding_tpu.models import RealtimeRNN
from cross_patient_speech_decoding_tpu.realtime import (
    RealtimeConfig,
    init_realtime_state,
    simulate_stream,
)
from cross_patient_speech_decoding_tpu.ops.signal import process_hg_chunk


def _bands(n_bands=2, order=4):
    bs, as_ = [], []
    for i in range(n_bands):
        b, a = sps.butter(order // 2, [0.15 + 0.2 * i, 0.3 + 0.2 * i], "band")
        bs.append(b)
        as_.append(a)
    return np.stack(bs), np.stack(as_)


def test_streaming_matches_offline_forward():
    C, bin_len, n_chunks = 6, 10, 30
    model = RealtimeRNN(hidden=12, n_layers=2, n_classes=5, win_size=8, stride=3)
    rng = np.random.default_rng(0)
    chunks = rng.normal(size=(n_chunks, C, bin_len)).astype(np.float32)
    b, a = _bands()
    bj, aj = jnp.asarray(b, jnp.float32), jnp.asarray(a, jnp.float32)

    x_probe = jnp.zeros((1, 40, C), jnp.float32)
    params = model.init(jax.random.key(0), x_probe)

    state = init_realtime_state(model, params, b, a, C)
    final, (emitted, logits, did_run) = simulate_stream(
        model, params, state, jnp.asarray(chunks), bj, aj
    )
    did_run = np.asarray(did_run)
    online_logits = np.asarray(logits)[did_run]

    # offline: same DSP powers -> offline windowed forward
    st = init_realtime_state(model, params, b, a, C).dsp
    powers = []
    for ch in chunks:
        p, st = process_hg_chunk(jnp.asarray(ch), bj, aj, st)
        powers.append(np.asarray(p))
    x = jnp.asarray(np.stack(powers))[None]  # (1, n_bins, C)
    offline_logits = np.asarray(model.apply(params, x, True))[0]

    assert online_logits.shape == offline_logits.shape
    # default (reduced) matmul precision accumulates slightly differently
    # between the batched offline projection and per-step online matmuls
    np.testing.assert_allclose(online_logits, offline_logits, atol=5e-3)

    # greedy emission stream: collapse of offline argmax == online emissions
    off_path = offline_logits.argmax(-1)
    collapsed = [
        s for i, s in enumerate(off_path)
        if s != 0 and (i == 0 or s != off_path[i - 1])
    ]
    online_syms = [int(s) for s in np.asarray(emitted) if s >= 0]
    assert online_syms == collapsed


def test_streaming_window_cadence():
    """First GRU run after win_size bins, then every stride bins."""
    C, bin_len = 4, 5
    model = RealtimeRNN(hidden=8, n_layers=1, n_classes=4, win_size=6, stride=2)
    b, a = _bands()
    params = model.init(jax.random.key(1), jnp.zeros((1, 24, C)))
    state = init_realtime_state(model, params, b, a, C)
    chunks = jnp.asarray(np.random.default_rng(2).normal(size=(12, C, bin_len)), jnp.float32)
    _, (_, _, did_run) = simulate_stream(
        model, params, state, chunks, jnp.asarray(b, jnp.float32), jnp.asarray(a, jnp.float32)
    )
    want = [(n >= 6) and ((n - 6) % 2 == 0) for n in range(1, 13)]
    np.testing.assert_array_equal(np.asarray(did_run), want)


def test_make_realtime_step_defaults_to_model_geometry():
    """make_realtime_step with no cfg clocks the GRU at the MODEL's
    win/stride (an imported checkpoint's geometry), not the defaults."""
    from cross_patient_speech_decoding_tpu.realtime.simulator import (
        make_realtime_step,
    )

    C, bin_len = 4, 5
    model = RealtimeRNN(hidden=8, n_layers=1, n_classes=4, win_size=6,
                        stride=2)
    b, a = _bands()
    bj, aj = jnp.asarray(b, jnp.float32), jnp.asarray(a, jnp.float32)
    params = model.init(jax.random.key(1), jnp.zeros((1, 24, C)))
    state = init_realtime_state(model, params, b, a, C)
    step = jax.jit(make_realtime_step(model))
    chunks = np.random.default_rng(4).normal(
        size=(12, C, bin_len)).astype(np.float32)
    ran = []
    for ch in chunks:
        state, (_, _, did) = step(params, state, jnp.asarray(ch), bj, aj)
        ran.append(bool(did))
    want = [(n >= 6) and ((n - 6) % 2 == 0) for n in range(1, 13)]
    assert ran == want
