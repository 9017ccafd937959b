"""Building-block layers: fused GRU/LSTM scans, temporal conv, pos-encoding.

TPU-first equivalents of the reference blocks in
`/root/reference/aligned_decoding/nn_models/models.py` (``TemporalConv``
:599-636, ``EncoderRNN``/``DecoderRNN`` :639-761, ``SimpleGRU`` :764-796,
``PositionalEncoding`` :799-831) and ``StackedRNN``
(`realtime_sim/realtime_nn_model.py:22-63`).

Design notes:
- **Fused recurrences.** cuDNN GRU is replaced by a `lax.scan` whose input
  projections for ALL timesteps are computed as one large (B*T, 3H) matmul
  up front (MXU-saturating); only the (H, 3H) recurrent matmul runs per
  step. Gate math follows the torch convention (reset/update/new with
  ``n = tanh(x_n + r * (h @ W_hn))``) so hyperparameters transfer.
- **Weight init parity**: input kernels Xavier-uniform, recurrent kernels
  orthogonal (reference realtime_nn_model.py:128-132).
- Dropout keys are threaded explicitly (flax 'dropout' RNG collection).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def reformat_time_windows(x: jax.Array, win: int, stride: int) -> jax.Array:
    """(B, T, C) -> (B, n_win, win*C) sliding windows.

    Flattening order matches the reference permute/reshape
    (realtime_nn_model.py:172-199): within a window, time-major then
    channel, i.e. [t0 c0..cC, t1 c0..cC, ...]. This is the materialized
    form; on the TPU Pallas path FusedGRU's ``window=`` option performs
    the same windowing inside the GRU kernel's index maps instead
    (ops/pallas_gru.gru_layer_windowed) and this function is the
    off-TPU/fallback implementation.
    """
    B, T, C = x.shape
    n_win = (T - win) // stride + 1
    idx = jnp.arange(n_win)[:, None] * stride + jnp.arange(win)[None, :]
    xw = x[:, idx, :]  # (B, n_win, win, C)
    return xw.reshape(B, n_win, win * C)


class FusedGRU(nn.Module):
    """Single GRU layer as a scan with batched input projection.

    Call: (B, T, F) -> (outputs (B, T, H), h_last (B, H)).

    With ``window=(win, stride)`` the input is RAW frames (B, T, C) and
    the layer consumes overlapping sliding windows of width win*C: on the
    TPU Pallas path the windowing happens inside the kernel's block index
    maps (no materialized 3.5x-duplicated stream); elsewhere the windows
    are materialized with :func:`reformat_time_windows`. Parameter shapes
    are identical either way ((win*C, 3H) input weights), so checkpoints
    and the streaming single-step path are unaffected. Requires
    ``input_grad=False`` on the in-kernel path (windows are data; an
    overlapping-window dx would need in-kernel scatter-add).
    """

    hidden: int
    reverse: bool = False
    precision: Optional[jax.lax.Precision] = None  # None = MXU-fast default
    # set False when x is raw data with no trainable upstream (the CTC
    # first layer): the Pallas backward then skips the dx matmul and the
    # (T, B, F) dx stream entirely. The scan path is unaffected (XLA
    # DCEs the unused dx there on its own).
    input_grad: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, h0: Optional[jax.Array] = None,
                 return_params: bool = False,
                 window: Optional[tuple] = None):
        from cross_patient_speech_decoding_tpu.ops import pallas_gru

        if window is not None:
            win, stride = window
            B, T, C = x.shape
            n_win = (T - win) // stride + 1
            F = win * C
            # in-kernel windowing: unidirectional data-input layers on
            # the TPU Pallas path only
            if (pallas_gru.enabled() and self.precision is None
                    and not self.reverse and not self.input_grad
                    and pallas_gru.worthwhile(B, n_win)):
                H = self.hidden
                wi = self.param("wi", nn.initializers.xavier_uniform(),
                                (F, 3 * H))
                wh = self.param("wh", nn.initializers.orthogonal(),
                                (H, 3 * H))
                bi = self.param("bi", nn.initializers.zeros, (3 * H,))
                bh = self.param("bh", nn.initializers.zeros, (3 * H,))
                if h0 is None:
                    h0 = jnp.zeros((B, H), jnp.float32)
                hs = pallas_gru.gru_layer_windowed(
                    x.astype(jnp.bfloat16).swapaxes(0, 1), h0,
                    wi, bi, wh, bh, win, stride,
                )
                return hs.swapaxes(0, 1), hs[-1]
            x = reformat_time_windows(x, win, stride)

        B, T, F = x.shape
        H = self.hidden
        wi = self.param("wi", nn.initializers.xavier_uniform(), (F, 3 * H))
        wh = self.param("wh", nn.initializers.orthogonal(), (H, 3 * H))
        bi = self.param("bi", nn.initializers.zeros, (3 * H,))
        bh = self.param("bh", nn.initializers.zeros, (3 * H,))
        if return_params:
            # StackedRNN's fused-bidirectional path drives both
            # directions through one kernel; params are created here so
            # the tree is identical either way
            return wi, bi, wh, bh

        if h0 is None:
            h0 = jnp.zeros((B, H), x.dtype)

        from cross_patient_speech_decoding_tpu.ops import pallas_gru

        # Pallas only where it pays: long sequences (the 1-step decoder
        # stays scan) and production-scale batch*time (measured 3.7x at
        # B*T ~ 191k; at small sizes scan matches it and the multi-kernel
        # train program's cold compile — minutes through the remote
        # helper — is not worth amortizing)
        # precision gate: the kernel's dots run at the TPU default
        # (bf16-class) precision — a caller pinning Precision.HIGHEST
        # must get the scan path's precision-threaded matmuls
        if (pallas_gru.enabled() and self.precision is None
                and pallas_gru.worthwhile(B, T)):
            # fully-fused layer (ops/pallas_gru.py): the input projection
            # happens inside the time sweep — no (B, T, 3H) stream — and
            # weights + h stay VMEM-resident; custom VJP
            #
            # data inputs (input_grad=False) stream in bf16: DEFAULT
            # matmul precision truncates operands to bf16 inside the MXU
            # anyway, so the kernel's gi/dW dots are bit-identical while
            # the (T, B, F) HBM stream (written by the window reformat,
            # read by fwd AND the recomputing bwd) halves. XLA fuses the
            # cast into the producer, so x materializes bf16 directly.
            xk = x if self.input_grad else x.astype(jnp.bfloat16)
            hs = pallas_gru.gru_layer(
                xk.swapaxes(0, 1), h0, wi, bi, wh, bh, self.reverse,
                input_grad=self.input_grad,
            )
            h_last = hs[0] if self.reverse else hs[-1]
            return hs.swapaxes(0, 1), h_last

        mm = lambda a, b: jnp.matmul(a, b, precision=self.precision)
        xi = (mm(x.reshape(B * T, F), wi) + bi).reshape(B, T, 3 * H)

        def step(h, xt):
            hz = mm(h, wh) + bh
            r = jax.nn.sigmoid(xt[:, :H] + hz[:, :H])
            z = jax.nn.sigmoid(xt[:, H : 2 * H] + hz[:, H : 2 * H])
            n = jnp.tanh(xt[:, 2 * H :] + r * hz[:, 2 * H :])
            h_new = (1.0 - z) * n + z * h
            return h_new, h_new

        h_last, hs = jax.lax.scan(
            step, h0, xi.swapaxes(0, 1), reverse=self.reverse
        )
        return hs.swapaxes(0, 1), h_last


class FusedLSTM(nn.Module):
    """Single LSTM layer as a scan with batched input projection."""

    hidden: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, carry0=None):
        B, T, F = x.shape
        H = self.hidden
        wi = self.param("wi", nn.initializers.xavier_uniform(), (F, 4 * H))
        wh = self.param("wh", nn.initializers.orthogonal(), (H, 4 * H))
        b = self.param("b", nn.initializers.zeros, (4 * H,))

        xi = (x.reshape(B * T, F) @ wi + b).reshape(B, T, 4 * H)
        if carry0 is None:
            carry0 = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))

        def step(carry, xt):
            h, c = carry
            g = xt + h @ wh
            i = jax.nn.sigmoid(g[:, :H])
            f = jax.nn.sigmoid(g[:, H : 2 * H])
            gg = jnp.tanh(g[:, 2 * H : 3 * H])
            o = jax.nn.sigmoid(g[:, 3 * H :])
            c_new = f * c + i * gg
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        (h_last, c_last), hs = jax.lax.scan(
            step, carry0, xi.swapaxes(0, 1), reverse=self.reverse
        )
        return hs.swapaxes(0, 1), (h_last, c_last)


class StackedRNN(nn.Module):
    """Multi-layer (optionally bidirectional) GRU/LSTM stack.

    Equivalent of ``nn.GRU(num_layers, bidirectional)`` /
    reference StackedRNN (realtime_nn_model.py:22-63): inter-layer dropout,
    per-direction last hidden states returned as (n_layers*n_dir, B, H).

    LSTM carry: ``h0`` may be a (h, c) tuple of (n_layers*n_dir, B, H)
    stacks, and the returned last-state is then the same tuple shape, so
    an autoregressive caller (DecoderRNN) round-trips the CELL state too —
    a bare-array ``h0`` for an LSTM means h with zero initial c.
    """

    hidden: int
    n_layers: int = 1
    dropout: float = 0.0
    bidirectional: bool = False
    cell: str = "gru"  # 'gru' | 'lstm'
    # False when the stack's input is raw data (RealtimeRNN's windowed
    # features, SimpleGRU): layer 0's backward skips its dx stream
    input_grad: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        h0=None,
        deterministic: bool = True,
        window: Optional[tuple] = None,
    ):
        Cell = FusedGRU if self.cell == "gru" else FusedLSTM
        n_dir = 2 if self.bidirectional else 1
        lasts = []
        out = x
        if window is not None and (self.cell != "gru" or self.bidirectional):
            # in-kernel windowing is a unidirectional-GRU layer-0 path;
            # otherwise materialize once here (both directions share it)
            out = reformat_time_windows(x, *window)
            window = None
        h0_is_tuple = isinstance(h0, tuple)
        for layer in range(self.n_layers):
            # only layer 0 consumes the stack input; deeper layers' inputs
            # are lower-layer activations and always need cotangents
            ig = self.input_grad if layer == 0 else True
            cell_kw = {"input_grad": ig} if self.cell == "gru" else {}
            if h0 is None:
                h0_f = None
            elif h0_is_tuple:
                h0_f = (h0[0][layer * n_dir], h0[1][layer * n_dir])
            else:
                h0_f = h0[layer * n_dir]
            if self.cell == "lstm" and h0_f is not None and not h0_is_tuple:
                h0_f = (h0_f, jnp.zeros_like(h0_f))
            from cross_patient_speech_decoding_tpu.ops import pallas_gru

            B_, T_, _ = out.shape
            if (self.bidirectional and self.cell == "gru"
                    and pallas_gru.enabled() and pallas_gru.BIDIR_FUSED
                    and pallas_gru.worthwhile(B_, T_)):
                # fused bidirectional kernel: both directions advance in
                # one grid step (halves the serial chain; the lone-
                # direction forward leaves the MXU ~half idle)
                h0_b = None if h0 is None else h0[layer * n_dir + 1]
                pf = Cell(self.hidden, name=f"fwd{layer}")(
                    out, return_params=True
                )
                pb = Cell(self.hidden, reverse=True, name=f"bwd{layer}")(
                    out, return_params=True
                )
                z = jnp.zeros((B_, self.hidden), out.dtype)
                # data inputs stream bf16, mirroring FusedGRU's path
                out_k = out if ig else out.astype(jnp.bfloat16)
                hs_f, hs_b = pallas_gru.gru_layer_bidir(
                    out_k.swapaxes(0, 1),
                    z if h0_f is None else h0_f,
                    z if h0_b is None else h0_b,
                    *pf, *pb,
                    input_grad=ig,
                )
                fwd, bwd = hs_f.swapaxes(0, 1), hs_b.swapaxes(0, 1)
                out = jnp.concatenate([fwd, bwd], axis=-1)
                lasts.extend([fwd[:, -1, :], bwd[:, 0, :]])
                if self.dropout > 0 and layer < self.n_layers - 1:
                    out = nn.Dropout(self.dropout)(
                        out, deterministic=deterministic
                    )
                continue
            if layer == 0 and window is not None:
                fwd, last_f = Cell(
                    self.hidden, name=f"fwd{layer}", **cell_kw
                )(out, h0_f, window=window)
            else:
                fwd, last_f = Cell(
                    self.hidden, name=f"fwd{layer}", **cell_kw
                )(out, h0_f)
            if self.bidirectional:
                if h0 is None:
                    h0_b = None
                elif h0_is_tuple:
                    h0_b = (
                        h0[0][layer * n_dir + 1], h0[1][layer * n_dir + 1]
                    )
                else:
                    h0_b = h0[layer * n_dir + 1]
                if (self.cell == "lstm" and h0_b is not None
                        and not h0_is_tuple):
                    h0_b = (h0_b, jnp.zeros_like(h0_b))
                bwd, last_b = Cell(
                    self.hidden, reverse=True, name=f"bwd{layer}", **cell_kw
                )(out, h0_b)
                out = jnp.concatenate([fwd, bwd], axis=-1)
                lasts.extend([last_f, last_b])
            else:
                out = fwd
                lasts.append(last_f)
            if self.dropout > 0 and layer < self.n_layers - 1:
                out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        if self.cell == "lstm":
            # (h, c) stacks so autoregressive callers carry the cell state
            return out, (
                jnp.stack([l[0] for l in lasts]),
                jnp.stack([l[1] for l in lasts]),
            )
        return out, jnp.stack(lasts)  # (B,T,H*n_dir), (n_layers*n_dir, B, H)


class TemporalConv(nn.Module):
    """Conv1d + BatchNorm + ReLU + Dropout over the time axis.

    Reference TemporalConv (models.py:599-636). Input (B, T, C_in) ->
    (B, T', n_filters); VALID padding shrinks T like torch's default.
    """

    n_filters: int
    kernel_size: int
    stride: int = 1
    padding: str = "VALID"
    dropout: float = 0.3
    activation: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        x = nn.Conv(
            self.n_filters,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=self.padding,
        )(x)
        x = nn.BatchNorm(use_running_average=deterministic)(x)
        if self.activation:
            x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class PositionalEncoding(nn.Module):
    """Sinusoidal positional encoding (models.py:799-831)."""

    d_model: int
    max_len: int = 5000

    @nn.compact
    def __call__(self, x: jax.Array):
        T = x.shape[1]
        pos = jnp.arange(self.max_len)[:, None].astype(jnp.float32)
        div = jnp.exp(
            jnp.arange(0, self.d_model, 2).astype(jnp.float32)
            * (-math.log(10000.0) / self.d_model)
        )
        pe = jnp.zeros((self.max_len, self.d_model))
        pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
        # odd d_model: the cos lane has one fewer column than div
        # (reference models.py:808-820 pads to even then slices back)
        pe = pe.at[:, 1::2].set(jnp.cos(pos * div[: self.d_model // 2]))
        return x + pe[None, :T, :].astype(x.dtype)


def linear_decay_schedule(lr: float, decay_steps: int, end_factor: float = 0.0):
    """torch LinearLR(start=1.0, end=end_factor, total_iters=decay_steps)."""

    def sched(step):
        frac = jnp.minimum(step / decay_steps, 1.0)
        return lr * (1.0 + (end_factor - 1.0) * frac)

    return sched


def cosine_warmup_schedule(lr: float, warmup: int, max_iters: int):
    """Reference CosineWarmupScheduler (models.py:834-872):
    factor = 0.5*(1+cos(pi*step/max_iters)) * min(1, step/warmup)."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * step / max_iters))
        warm = jnp.minimum(1.0, step / jnp.maximum(warmup, 1))
        return lr * cos * warm

    return sched
