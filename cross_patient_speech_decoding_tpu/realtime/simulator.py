"""Closed-loop streaming decode simulator — one jitted step per data bin.

TPU-native rebuild of the reference's realtime inference path (SURVEY.md
§3.5): each incoming raw chunk flows through CAR -> stateful IIR -> RMS
power (`realtime_sim/realtime_processing.py:10-39`), accumulates into the
sliding feature window (win=14 bins, stride=4 —
`realtime_nn_model.py:172-199`), and every ``stride`` bins triggers one GRU
step + dense head + greedy CTC emission.

The whole step is ONE pure function ``(state, chunk) -> (state, emission)``
holding all carried state (IIR zi, feature ring buffer, GRU hidden, bin
counter, previous emitted symbol) in a NamedTuple, so it jits once and runs
per bin with no host round-trips — the p50-latency surface of BASELINE.md.
``simulate_stream`` lax.scans the step over a whole recording for offline
parity checks and amortized latency measurement.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cross_patient_speech_decoding_tpu.models.realtime_rnn import RealtimeRNN
from cross_patient_speech_decoding_tpu.ops.signal import (
    StreamState,
    init_stream_state,
    process_hg_chunk,
)


@dataclass(frozen=True)
class RealtimeConfig:
    """Static configuration of the streaming loop."""

    win_size: int = 14
    stride: int = 4
    blank: int = 0


class RealtimeState(NamedTuple):
    """Everything carried between streaming steps."""

    dsp: StreamState  # IIR filter memories
    ring: jax.Array  # (win, C) last win feature bins
    n_bins: jax.Array  # total bins seen
    hidden: jax.Array  # (n_layers, 1, H) GRU state
    prev_sym: jax.Array  # last argmax symbol (for greedy collapse)


def init_realtime_state(
    model: RealtimeRNN,
    params,
    bandpass_b: np.ndarray,
    bandpass_a: np.ndarray,
    n_channels: int,
) -> RealtimeState:
    dsp = init_stream_state(bandpass_b, bandpass_a, n_channels)
    hidden = model.apply(params, 1, method=RealtimeRNN.initial_hidden)
    return RealtimeState(
        dsp=StreamState(zi=dsp.zi.astype(jnp.float32)),
        ring=jnp.zeros((model.win_size, n_channels), jnp.float32),
        n_bins=jnp.zeros((), jnp.int32),
        hidden=hidden,
        prev_sym=jnp.full((), -1, jnp.int32),
    )


def make_realtime_step(model: RealtimeRNN,
                       cfg: RealtimeConfig | None = None):
    """Build the pure streaming step (jit it once, call per bin).

    step(params, state, chunk (C, T_bin), b, a) ->
        (state, (emitted_symbol, logits, did_run))
    ``emitted_symbol`` is -1 when no new symbol (blank/repeat collapse or no
    GRU step this bin), else the decoded class id — greedy CTC, online.

    ``cfg`` defaults to the MODEL's geometry (win_size/stride/blank); pass
    an explicit cfg only to deliberately run off-geometry. A mismatched
    cfg would clock the GRU at the wrong cadence against the model's ring
    size and collapse with the wrong blank id.
    """
    if cfg is None:
        cfg = RealtimeConfig(model.win_size, model.stride, model.blank)

    def step(params, state: RealtimeState, chunk, b, a):
        power, dsp = process_hg_chunk(chunk, b, a, state.dsp)
        ring = jnp.concatenate([state.ring[1:], power[None, :]], axis=0)
        n_bins = state.n_bins + 1

        # run the GRU once the window is full, every `stride` bins
        window_full = n_bins >= cfg.win_size
        aligned = ((n_bins - cfg.win_size) % cfg.stride) == 0
        do_run = window_full & aligned

        def run(hidden):
            window = ring.reshape(1, -1)  # (1, win*C), time-major layout
            logits, new_h = model.apply(
                params, window, hidden, method=RealtimeRNN.single_step
            )
            return logits[0], new_h

        def skip(hidden):
            return jnp.zeros((model.n_classes,), jnp.float32), hidden

        logits, hidden = jax.lax.cond(do_run, run, skip, state.hidden)

        sym = jnp.argmax(logits).astype(jnp.int32)
        emit = do_run & (sym != cfg.blank) & (sym != state.prev_sym)
        emitted = jnp.where(emit, sym, -1)
        prev = jnp.where(do_run, sym, state.prev_sym)

        new_state = RealtimeState(dsp, ring, n_bins, hidden, prev)
        return new_state, (emitted, logits, do_run)

    return step


def simulate_stream(model: RealtimeRNN, params, state, chunks, b, a,
                    cfg: RealtimeConfig | None = None):
    """lax.scan the streaming step over (n_chunks, C, T_bin) chunks.

    Returns (final_state, (emitted (n_chunks,), logits (n_chunks, V),
    did_run (n_chunks,))). Used for offline parity tests and amortized
    latency measurement (total time / n_chunks on device).
    """
    cfg = cfg or RealtimeConfig(model.win_size, model.stride, model.blank)
    step = make_realtime_step(model, cfg)

    def body(carry, chunk):
        new_state, out = step(params, carry, chunk, b, a)
        return new_state, out

    return jax.lax.scan(body, state, chunks)
