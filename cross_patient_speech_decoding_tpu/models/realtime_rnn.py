"""Realtime CTC RNN — the streaming phoneme decoder (flagship model).

TPU-native rebuild of the reference ``RealtimeRNNModel``
(`/root/reference/aligned_decoding/realtime_sim/realtime_nn_model.py:93-304`):
sliding-window input reformatting (win=14, stride=4; right-aligned windows
trading sequence length for feature width, credited there to
nejm-brain-to-text), stacked GRU with trainable h0, per-window dense CTC
head with bias init -2 everywhere / +2 on blank, CTC training loss, and
greedy-decoded PER validation.

The torch ``unfold`` becomes a gather + reshape; the window-count formula
``n_win = (T - win) // stride + 1`` and the input-length adjustment
(:214) are preserved exactly.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from cross_patient_speech_decoding_tpu.models.layers import (
    StackedRNN,
    reformat_time_windows,  # noqa: F401  (public here historically)
)


def adjusted_input_lengths(input_lengths: jax.Array, win: int, stride: int):
    """Window-adjusted valid frame counts (realtime_nn_model.py:214)."""
    return (input_lengths - win) // stride + 1


def _bias_blank_init(blank: int, n_classes: int):
    def init(key, shape, dtype=jnp.float32):
        b = jnp.full(shape, -2.0, dtype)  # suppress phonemes early
        return b.at[blank].set(2.0)  # encourage blank early

    return init


class RealtimeRNN(nn.Module):
    """Windowed stacked-GRU CTC model.

    Attributes mirror the reference hparams: hidden_size, n_layers,
    n_classes (incl. blank), dropout, win_size, stride, bidirectional.

    ``single_step`` shares parameters with ``__call__`` so the streaming
    simulator (realtime/) can run one GRU step per new feature window with
    carried hidden state — exactly the offline forward, unrolled online.
    """

    hidden: int
    n_layers: int
    n_classes: int
    dropout: float = 0.3
    win_size: int = 14
    stride: int = 4
    bidirectional: bool = False
    blank: int = 0
    # the stack input is windowed DATA in every shipped driver, so the
    # Pallas backward skips its dx stream and streams it bf16 (exact
    # under DEFAULT MXU precision). Set True if composing a trainable
    # frontend (or differentiating w.r.t. x, e.g. saliency maps): with
    # False, input cotangents are exact ZEROS on the TPU Pallas path.
    input_grad: bool = False

    def setup(self):
        n_dir = 2 if self.bidirectional else 1
        self.h0 = self.param(
            "h0",
            nn.initializers.xavier_uniform(),
            (self.n_layers * n_dir, 1, self.hidden),
        )
        self.rnn = StackedRNN(
            self.hidden,
            self.n_layers,
            dropout=self.dropout,
            bidirectional=self.bidirectional,
            # layer 0's Pallas backward skips the ~(T, B, win*C) dx
            # stream + matmul when input_grad=False — measured ~1 GB of
            # pure-waste HBM writes at the fig_5 production scale
            input_grad=self.input_grad,
        )
        self.head = nn.Dense(
            self.n_classes,
            bias_init=_bias_blank_init(self.blank, self.n_classes),
        )

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        """x (B, T, C) -> logits (B, n_win, n_classes).

        The sliding-window reformat is delegated to the RNN stack's
        ``window=`` path: on the TPU Pallas train path (input_grad=False)
        layer 0 windows IN-KERNEL via overlapping block index maps — the
        3.5x-duplicated (B, n_win, win*C) stream is never materialized;
        everywhere else the stack materializes it, identically to the
        reference's unfold (realtime_nn_model.py:172-199).
        """
        B = x.shape[0]
        n_dir = 2 if self.bidirectional else 1
        h0 = jnp.broadcast_to(self.h0, (self.n_layers * n_dir, B, self.hidden))
        out, _ = self.rnn(x, h0, deterministic=deterministic,
                          window=(self.win_size, self.stride))
        return self.head(out)

    def initial_hidden(self, batch: int = 1) -> jax.Array:
        """Trainable initial hidden state broadcast to a batch."""
        n_dir = 2 if self.bidirectional else 1
        return jnp.broadcast_to(
            self.h0, (self.n_layers * n_dir, batch, self.hidden)
        )

    def single_step(self, window: jax.Array, h: jax.Array):
        """One streaming step. window (B, win*C), h (n_layers, B, H).

        Returns (logits (B, n_classes), new_h). Requires unidirectional.
        """
        out, new_h = self.rnn(window[:, None, :], h, deterministic=True)
        return self.head(out[:, 0, :]), new_h
