"""CTC loss and decoding — device-side greedy, host-side prefix beam search.

Reference surface being reproduced:
- ``nn.CTCLoss(blank=0, zero_infinity=True)`` training loss
  (`/root/reference/aligned_decoding/realtime_sim/realtime_nn_model.py:147`)
  -> :func:`ctc_loss_mean` (optax alpha-beta recursion under jit; torch's
  'mean' reduction divides each sequence loss by its target length);
- ``greedy_decode_batch`` (`realtime_sim/ctc_decoder.py:172-189`): argmax ->
  collapse repeats -> drop blanks -> :func:`greedy_decode` (fully on-device,
  returns padded sequences + lengths instead of ragged lists);
- CTC prefix beam search (`ctc_decoder.py:45-118`, Hannun's algorithm) ->
  :func:`prefix_beam_search` host-side rescoring implementation (a C++
  native version lives in ``native/``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax


def ctc_loss_mean(
    logits: jax.Array,
    input_lengths: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
    blank_id: int = 0,
    weights: jax.Array | None = None,
) -> jax.Array:
    """CTC loss with torch's default 'mean' reduction semantics.

    Args:
        logits: (B, T, V) unnormalized scores (log_softmax applied inside).
        input_lengths: (B,) valid logit frames.
        labels: (B, L) padded target sequences.
        label_lengths: (B,) valid target lengths.
        weights: optional (B,) sample weights (fold masks): the reduction
            becomes a weighted mean over rows with w>0. ``None`` is the
            plain batch mean. Keeping the weighted variant HERE (not
            reimplemented by callers) pins the zero_infinity clamp and
            label-length normalization to one definition.

    torch ``CTCLoss(reduction='mean')`` divides each sequence's loss by its
    target length then averages over the batch; ``zero_infinity=True`` zeroes
    infeasible (too-short-input) losses. optax's ``log_epsilon=-1e5`` already
    keeps infeasible paths finite; we clamp to that scale for parity.
    """
    B, T, _ = logits.shape
    t_idx = jnp.arange(T)[None, :]
    logit_pad = (t_idx >= input_lengths[:, None]).astype(logits.dtype)
    l_idx = jnp.arange(labels.shape[1])[None, :]
    label_pad = (l_idx >= label_lengths[:, None]).astype(logits.dtype)

    per_seq = optax.ctc_loss(logits, logit_pad, labels, label_pad, blank_id=blank_id)
    per_seq = jnp.where(per_seq > 1e4, 0.0, per_seq)  # zero_infinity analog
    per_seq = per_seq / jnp.maximum(label_lengths, 1)
    if weights is None:
        return jnp.mean(per_seq)
    return jnp.sum(per_seq * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def greedy_decode(
    log_probs: jax.Array, blank_id: int = 0, frame_mask: jax.Array | None = None
):
    """Batched greedy CTC decode, fully on device.

    Args:
        log_probs: (B, T, V).
        frame_mask: optional (B, T) validity of frames.

    Returns:
        (decoded, lengths): decoded (B, T) padded with ``blank_id`` beyond
        each sequence's length; lengths (B,).
    """
    B, T, _ = log_probs.shape
    best = jnp.argmax(log_probs, axis=2)  # (B, T)
    if frame_mask is None:
        prev = jnp.concatenate([jnp.full((B, 1), -1), best[:, :-1]], axis=1)
        keep = (best != blank_id) & (best != prev)
    else:
        # repeat collapse must compare against the last VALID frame, not
        # the immediately preceding (possibly masked) one: with an
        # interleaved mask, [a, b(masked), a] is ONE 'a', and
        # [a, a(masked), a] is also one — decoding the valid subsequence
        valid = frame_mask > 0
        vpos = jnp.where(valid, jnp.arange(T)[None, :], -1)
        lb = jax.lax.cummax(vpos, axis=1)  # last valid index <= t
        lb = jnp.concatenate([jnp.full((B, 1), -1), lb[:, :-1]], axis=1)
        prev = jnp.where(
            lb >= 0,
            jnp.take_along_axis(best, jnp.maximum(lb, 0), axis=1),
            -1,
        )
        keep = valid & (best != blank_id) & (best != prev)

    pos = jnp.cumsum(keep, axis=1) - 1  # target position for kept symbols
    lengths = jnp.maximum(pos[:, -1] + 1, 0)
    # scatter kept symbols left-aligned; dropped symbols go to a spill column
    tgt = jnp.where(keep, pos, T)
    out = jnp.full((B, T + 1), blank_id, best.dtype)
    out = out.at[jnp.arange(B)[:, None], tgt].set(best)
    return out[:, :T], lengths


NEG_INF = -float("inf")


def _logsumexp2(a: float, b: float) -> float:
    if a == NEG_INF and b == NEG_INF:
        return NEG_INF
    m = max(a, b)
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def prefix_beam_search(
    log_probs: np.ndarray, beam_size: int = 100, blank_id: int = 0
):
    """CTC prefix beam search (host-side; Hannun 2014 algorithm).

    Args:
        log_probs: (T, V) log-probabilities for one sequence.

    Returns:
        (best_prefix_tuple, neg_log_likelihood).

    Prefers the C++ implementation in ``native/`` when built (see
    ``cross_patient_speech_decoding_tpu.realtime.beam``); this pure-Python
    version is the fallback and test oracle.
    """
    T, V = log_probs.shape
    # beam entries: prefix -> (log p ending in blank, log p ending non-blank)
    beam = {(): (0.0, NEG_INF)}

    for t in range(T):
        row = log_probs[t]
        nxt: dict = {}

        def upd(prefix, pb, pnb):
            old = nxt.get(prefix, (NEG_INF, NEG_INF))
            nxt[prefix] = (_logsumexp2(old[0], pb), _logsumexp2(old[1], pnb))

        for prefix, (p_b, p_nb) in beam.items():
            total = _logsumexp2(p_b, p_nb)
            # extend with blank: prefix unchanged
            upd(prefix, total + row[blank_id], NEG_INF)
            last = prefix[-1] if prefix else None
            for s in range(V):
                if s == blank_id:
                    continue
                p = row[s]
                if s == last:
                    # repeat: merges unless separated by blank
                    upd(prefix, NEG_INF, p_nb + p)
                    upd(prefix + (s,), NEG_INF, p_b + p)
                else:
                    upd(prefix + (s,), NEG_INF, total + p)

        beam = dict(
            sorted(
                nxt.items(),
                key=lambda kv: _logsumexp2(*kv[1]),
                reverse=True,
            )[:beam_size]
        )

    best, (p_b, p_nb) = max(
        beam.items(), key=lambda kv: _logsumexp2(*kv[1])
    )
    return best, -_logsumexp2(p_b, p_nb)
