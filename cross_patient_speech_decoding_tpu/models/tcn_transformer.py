"""TCN and Transformer classifier families.

TPU-native equivalents of the reference models in
`/root/reference/aligned_decoding/nn_models/models.py`:
- ``TCN_classifier`` (:393-448): TemporalConv -> temporal max-pool -> FC;
- ``Transformer`` (:451-503): sinusoidal pos-enc -> TransformerEncoder ->
  mean-pool -> FC;
- ``CNNTransformer`` (:506-596): TemporalConv -> pos-enc -> encoder ->
  mean-pool -> FC (trained with cosine-warmup LR in the reference).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from cross_patient_speech_decoding_tpu.models.layers import (
    PositionalEncoding,
    TemporalConv,
)


class TCNClassifier(nn.Module):
    """TemporalConv -> max-pool over time -> FC stack."""

    n_filters: int
    num_classes: int
    kernel_size: int = 10
    stride: int = 1
    dropout: float = 0.3
    fc_dims: tuple = ()

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = TemporalConv(
            self.n_filters, self.kernel_size, self.stride, dropout=self.dropout
        )(x, deterministic=deterministic)
        h = jnp.max(x, axis=1)
        for d in self.fc_dims:
            h = nn.relu(nn.Dense(d)(h))
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.num_classes)(h)


class EncoderBlock(nn.Module):
    """Pre-LN transformer encoder block (nn.TransformerEncoderLayer analog)."""

    d_model: int
    n_heads: int
    dim_ff: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            dropout_rate=self.dropout,
            deterministic=deterministic,
        )(h, h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim_ff)(h)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model)(h)
        return x + nn.Dropout(self.dropout)(h, deterministic=deterministic)


class TransformerClassifier(nn.Module):
    """Pos-enc -> N encoder blocks -> mean-pool -> FC."""

    d_model: int
    num_classes: int
    n_heads: int = 4
    n_layers: int = 2
    dim_ff: int = 256
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.d_model)(x)  # input projection to d_model
        x = PositionalEncoding(self.d_model)(x)
        for _ in range(self.n_layers):
            x = EncoderBlock(self.d_model, self.n_heads, self.dim_ff, self.dropout)(
                x, deterministic=deterministic
            )
        h = jnp.mean(x, axis=1)
        return nn.Dense(self.num_classes)(h)


class CNNTransformer(nn.Module):
    """TemporalConv front-end + transformer encoder classifier."""

    n_filters: int
    num_classes: int
    kernel_size: int = 10
    stride: int = 1
    n_heads: int = 4
    n_layers: int = 2
    dim_ff: int = 256
    cnn_dropout: float = 0.3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = TemporalConv(
            self.n_filters, self.kernel_size, self.stride, dropout=self.cnn_dropout
        )(x, deterministic=deterministic)
        x = PositionalEncoding(self.n_filters)(x)
        for _ in range(self.n_layers):
            x = EncoderBlock(self.n_filters, self.n_heads, self.dim_ff, self.dropout)(
                x, deterministic=deterministic
            )
        h = jnp.mean(x, axis=1)
        return nn.Dense(self.num_classes)(h)
