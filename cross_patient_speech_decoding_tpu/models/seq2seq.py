"""Seq2seq phoneme-sequence models (offline NN family).

TPU-native equivalents of the reference Lightning modules in
`/root/reference/aligned_decoding/nn_models/models.py`:
- ``Seq2SeqRNN`` (:208-390) — TemporalConv -> bidirectional encoder RNN
  (fwd+bwd last hidden summed, :694-699) -> autoregressive decoder RNN with
  start token ``num_classes`` and per-step teacher forcing w.p. 0.5;
- ``TemporalConvRNN`` (:111-205) — conv -> GRU -> FC on last timestep;
- ``SimpleGRU`` (:764-796).

The decoder's Python ``for i in range(seq_length)`` loop with a
``torch.rand`` coin per step (:291-299) becomes a statically-unrolled loop
(seq_length=3) with explicit PRNG draws from the 'tf' RNG collection, so a
whole training step jits into a single XLA program.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cross_patient_speech_decoding_tpu.models.layers import (
    StackedRNN,
    TemporalConv,
)


class EncoderRNN(nn.Module):
    """Bidirectional encoder; returns fwd+bwd last-layer hidden sum (B, H)."""

    hidden: int
    n_layers: int = 1
    dropout: float = 0.3
    cell: str = "gru"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out, lasts = StackedRNN(
            self.hidden,
            self.n_layers,
            dropout=self.dropout,
            bidirectional=True,
            cell=self.cell,
        )(x, deterministic=deterministic)
        # lasts: (n_layers*2, B, H); last layer fwd + bwd summed. For LSTM
        # both h AND c are summed and carried (the reference's intent at
        # models.py:701-714 — its own LSTM path then crashes on
        # `enc_hidden.repeat` over the tuple, fixed here)
        if self.cell == "lstm":
            h, c = lasts
            return out, (h[-2] + h[-1], c[-2] + c[-1])
        enc_hidden = lasts[-2] + lasts[-1]
        return out, enc_hidden


class DecoderRNN(nn.Module):
    """Embedding + RNN + linear head; one token step at a time."""

    hidden: int
    num_classes: int
    n_layers: int = 1
    dropout: float = 0.3
    cell: str = "gru"

    def setup(self):
        # +1 embedding row for the start token (= num_classes)
        self.embed = nn.Embed(self.num_classes + 1, self.hidden)
        self.rnn = StackedRNN(
            self.hidden, self.n_layers, dropout=self.dropout, cell=self.cell
        )
        self.head = nn.Dense(self.num_classes)

    def __call__(self, token, hidden, deterministic: bool = True):
        """token (B,) int32; hidden (n_layers, B, H) -> (logits, hidden)."""
        e = self.embed(token)[:, None, :]  # (B, 1, H)
        out, new_hidden = self.rnn(e, hidden, deterministic=deterministic)
        logits = self.head(out[:, 0, :])
        return logits, new_hidden


class Seq2SeqRNN(nn.Module):
    """The seq2seq workhorse (reference models.py:208-390)."""

    n_filters: int
    hidden: int
    num_classes: int
    n_enc_layers: int = 1
    n_dec_layers: int = 1
    kernel_size: int = 10
    stride: int = 1
    cnn_dropout: float = 0.3
    rnn_dropout: float = 0.3
    cell: str = "gru"
    seq_length: int = 3
    activation: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        y: Optional[jax.Array] = None,
        teacher_forcing_ratio: float = 0.5,
        deterministic: bool = True,
    ) -> jax.Array:
        """x (B, T, C); y (B, seq_length) optional -> logits
        (B, seq_length, num_classes)."""
        B = x.shape[0]
        x = TemporalConv(
            self.n_filters,
            self.kernel_size,
            self.stride,
            dropout=self.cnn_dropout,
            activation=self.activation,
        )(x, deterministic=deterministic)

        _, enc_hidden = EncoderRNN(
            self.hidden, self.n_enc_layers, self.rnn_dropout, self.cell
        )(x, deterministic=deterministic)

        dec = DecoderRNN(
            self.hidden,
            self.num_classes,
            self.n_dec_layers,
            self.rnn_dropout,
            self.cell,
        )
        if self.cell == "lstm":
            hidden = tuple(
                jnp.tile(s[None], (self.n_dec_layers, 1, 1))
                for s in enc_hidden
            )
        else:
            hidden = jnp.tile(enc_hidden[None], (self.n_dec_layers, 1, 1))
        token = jnp.full((B,), self.num_classes, jnp.int32)  # start token

        use_tf = y is not None and teacher_forcing_ratio > 0
        if use_tf:
            # one coin per step, shared across the batch (reference :295)
            coins = jax.random.uniform(self.make_rng("tf"), (self.seq_length,))

        outputs = []
        for i in range(self.seq_length):
            logits, hidden = dec(token, hidden, deterministic=deterministic)
            outputs.append(logits)
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            if use_tf:
                token = jnp.where(
                    coins[i] < teacher_forcing_ratio, y[:, i].astype(jnp.int32), pred
                )
            else:
                token = pred
        return jnp.stack(outputs, axis=1)


class SimpleGRU(nn.Module):
    """GRU -> FC on last timestep (reference models.py:764-796)."""

    hidden: int
    num_classes: int
    n_layers: int = 1
    dropout: float = 0.3
    # GRU directly on the data tensor: layer 0 skips its dx stream on
    # the Pallas path. Set True when differentiating w.r.t. x (input
    # cotangents are exact zeros on TPU otherwise).
    input_grad: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out, _ = StackedRNN(
            self.hidden, self.n_layers, dropout=self.dropout,
            input_grad=self.input_grad,
        )(x, deterministic=deterministic)
        return nn.Dense(self.num_classes)(out[:, -1, :])


class TemporalConvRNN(nn.Module):
    """Conv -> GRU -> optional FC stack (reference models.py:111-205)."""

    n_filters: int
    hidden: int
    num_classes: int
    kernel_size: int = 10
    stride: int = 1
    n_layers: int = 1
    cnn_dropout: float = 0.3
    rnn_dropout: float = 0.3
    fc_dims: tuple = ()

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = TemporalConv(
            self.n_filters, self.kernel_size, self.stride, dropout=self.cnn_dropout
        )(x, deterministic=deterministic)
        out, _ = StackedRNN(self.hidden, self.n_layers, dropout=self.rnn_dropout)(
            x, deterministic=deterministic
        )
        h = out[:, -1, :]
        for d in self.fc_dims:
            h = nn.relu(nn.Dense(d)(h))
        return nn.Dense(self.num_classes)(h)
