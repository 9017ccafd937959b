"""Fully-fused GRU layer as Pallas TPU kernels with a custom VJP.

Measured motivation (round 2, v5e over the axon tunnel, B=1000 / H=500 /
T=191): a bare chain of 191 sequential (1000,500)x(500,1500) matmuls
runs at 87 TF/s (3.3 ms) — the recurrence itself is NOT latency-bound in
XLA — but the full scan-GRU layer costs ~25 ms fwd+bwd and the naive
"precompute x@W_in then scan" formulation pays for materializing the
(B, T, 3H) projection stream: 1.1 GB written, re-read forward, re-read
backward, plus a same-sized gradient stream and lane-misaligned gate
slices (H=500 is not a multiple of 128) on every step.

This kernel therefore fuses the ENTIRE layer:

- the input projection x_t @ W_in happens inside the time sweep, so the
  (B, T, 3H) stream never exists — only the small (T, B, F) inputs and
  (T, B, H) hidden states touch HBM;
- the hidden dimension is padded to the 128-lane width once, outside, so
  every gate slice is lane-aligned (zero-padded weights keep the math
  exact: padded lanes stay identically 0 through sigmoid/tanh algebra);
- dW_in, dW_h, db are accumulated in VMEM across the whole (batch-tile,
  time) grid and emitted once — no gradient streams;
- the backward recomputes the gates from (x_t, h_{t-1}) instead of
  storing them (FLOPs the MXU has to spare vs a (B, T, 3H) residual).

Gate math follows the torch convention used by ``models.layers.FusedGRU``
(reference ``nn_models/models.py:639-761`` cuDNN GRU semantics):

    r = sigmoid(x W_r + b_ir + h W_hr + b_hr)
    z = sigmoid(x W_z + b_iz + h W_hz + b_hz)
    n = tanh(x W_n + b_in + r * (h W_hn + b_hn))
    h' = (1 - z) * n + z * h

The grid is (B/BB, T) with time innermost: the hidden-state scratch
carries across t and resets at t == 0; time-reversal for the
bidirectional encoder is free via the block index maps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


LANE = 128


def _interpret() -> bool:
    """Interpreter mode off-TPU so the kernels are testable on the CPU
    backend (tests/conftest.py) — the TPU path compiles with Mosaic."""
    return jax.default_backend() != "tpu"


def _pick_bb(B: int, cap: int) -> int:
    """Largest batch-tile size <= cap that divides B.

    Mosaic requires the sublane (second-to-last) block dim to be a
    multiple of 8 or equal to the full array dim, so prefer 8-multiples
    and otherwise fall back to the whole batch in one tile.
    """
    for bb in range(min(cap, B), 0, -1):
        if B % bb == 0 and (bb % 8 == 0 or bb == B):
            return bb
    return B


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, h0_ref, wi_ref, wh_ref, b_ref, hs_ref, h_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h = h_scr[:]
    Hp = h.shape[1]
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    # bf16 data inputs (FusedGRU input_grad=False) upcast in VMEM; the
    # MXU's DEFAULT-precision pass truncates back to bf16, so the dot is
    # bit-identical to an f32 stream at half the HBM traffic
    xt = x_ref[0].astype(jnp.float32)
    gi = dot(xt, wi_ref[:]) + b_ref[0]  # (BB, 3Hp): x W_in + b_in
    gh = dot(h, wh_ref[:]) + b_ref[1]  # (BB, 3Hp): h W_h + b_h
    r = jax.nn.sigmoid(gi[:, :Hp] + gh[:, :Hp])
    z = jax.nn.sigmoid(gi[:, Hp : 2 * Hp] + gh[:, Hp : 2 * Hp])
    n = jnp.tanh(gi[:, 2 * Hp :] + r * gh[:, 2 * Hp :])
    h_new = (1.0 - z) * n + z * h
    h_scr[:] = h_new
    hs_ref[0] = h_new


def _tidx(reverse: bool, T: int):
    if reverse:
        return lambda b, t: (T - 1 - t, b, 0)
    return lambda b, t: (t, b, 0)


def _gru_forward(x, h0, wi, wh, b, *, reverse: bool, bb_cap: int):
    T, B, F = x.shape
    Hp = wh.shape[0]
    BB = _pick_bb(B, bb_cap)
    const = lambda nd: (lambda bi, ti: (0,) * nd)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(B // BB, T),
        in_specs=[
            pl.BlockSpec((1, BB, F), _tidx(reverse, T),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Hp), lambda bi, ti: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, 3 * Hp), const(2), memory_space=pltpu.VMEM),
            pl.BlockSpec((Hp, 3 * Hp), const(2), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3 * Hp), const(2), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BB, Hp), _tidx(reverse, T),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, Hp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BB, Hp), jnp.float32)],
        # measured: without explicit sequential semantics Mosaic's default
        # scheduling degrades this grid ~6x (23 ms -> 4.1 ms at BB=256)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=_interpret(),
    )(x, h0, wi, wh, b)


def _bifwd_kernel(xf_ref, xb_ref, h0_ref, wi_ref, wh_ref, b_ref,
                  hsf_ref, hsb_ref, h_scr):
    """Both encoder directions advance in ONE grid step.

    The unidirectional forward runs at ~half the backward's FLOP rate —
    its single serial gh matmul leaves the MXU idle around the
    per-step elementwise/DMA work. Here direction 0 consumes x[t] and
    direction 1 consumes x[T-1-t] (two DMA streams over the same HBM
    buffer via the two index maps), so each step issues two INDEPENDENT
    recurrence matmuls back-to-back and the serial chain count halves
    (382 -> 191 grid steps for the bidirectional encoder).
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    Hp = h_scr.shape[-1]
    for d, x_ref, out_ref in ((0, xf_ref, hsf_ref), (1, xb_ref, hsb_ref)):
        h = h_scr[d]
        gi = dot(x_ref[0].astype(jnp.float32), wi_ref[d]) + b_ref[d, 0]
        gh = dot(h, wh_ref[d]) + b_ref[d, 1]
        r = jax.nn.sigmoid(gi[:, :Hp] + gh[:, :Hp])
        z = jax.nn.sigmoid(gi[:, Hp : 2 * Hp] + gh[:, Hp : 2 * Hp])
        n = jnp.tanh(gi[:, 2 * Hp :] + r * gh[:, 2 * Hp :])
        h_new = (1.0 - z) * n + z * h
        h_scr[d] = h_new
        out_ref[0] = h_new


def _gru_bidir_forward(x, h0, wi, wh, b, *, bb_cap: int):
    """x (T, B, F); h0 (2, B, Hp); wi (2, F, 3Hp); wh (2, Hp, 3Hp);
    b (2, 2, 3Hp) -> (hs_f, hs_b) each (T, B, Hp) in original time order."""
    T, B, F = x.shape
    Hp = wh.shape[-2]
    # VMEM: both directions' weights resident at once — cap the tile
    BB = _pick_bb(B, min(bb_cap, 256))
    const = lambda nd: (lambda bi, ti: (0,) * nd)
    return pl.pallas_call(
        _bifwd_kernel,
        grid=(B // BB, T),
        in_specs=[
            pl.BlockSpec((1, BB, F), _tidx(False, T),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, F), _tidx(True, T),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BB, Hp), lambda bi, ti: (0, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, F, 3 * Hp), const(3), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Hp, 3 * Hp), const(3), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, 3 * Hp), const(3), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BB, Hp), _tidx(False, T),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, Hp), _tidx(True, T),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, Hp), jnp.float32),
            jax.ShapeDtypeStruct((T, B, Hp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, BB, Hp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=_interpret(),
    )(x, x, h0, wi, wh, b)


# ---------------------------------------------------------------------------
# windowed forward/backward (CTC layer 0: in-kernel sliding windows)
# ---------------------------------------------------------------------------
#
# The RealtimeRNN reformats (B, T, C) raw frames into overlapping
# (B, n_win, win*C) windows (win 14 / stride 4 -> 3.5x duplication;
# reference realtime_nn_model.py:172-199). Materializing that stream
# costs ~7 ms at the fig_5 production scale (measured round 4: gather
# and strided-slice formulations tie, vs a 4.2 ms pure-bandwidth floor)
# on a ~125 ms train step. These kernels consume the RAW frame stream
# instead: the input is reshaped (no data movement) to stride-row slabs
# (S, stride, B, C) and each grid step w reads slabs w..w+n_slabs-1 via
# n_slabs block-index-mapped views of the SAME array — arbitrary-stride
# overlapping windows expressed with plain BlockSpecs. The (BB, win*C)
# window row is assembled in VMEM with a lane-axis concatenation of the
# win (BB, C) pieces (bf16: half the VPU movement), which reproduces the
# reference's time-major-then-channel flattening exactly.
#
# Only the no-dx (input_grad=False) regime is supported: windows are
# DATA in every shipped driver, and an overlapping-window dx would need
# in-kernel scatter-add. Callers needing input cotangents materialize
# windows (FusedGRU falls back automatically).


def _n_slabs(win: int, stride: int) -> int:
    return (win - 1) // stride + 1


def _slab_view(x, win: int, stride: int, n_win: int):
    """(T, B, C) -> (S, stride, B, C) with S = n_win - 1 + n_slabs;
    zero-pads or trims trailing frames (beyond the last window they are
    never read)."""
    T, B, C = x.shape
    S = n_win - 1 + _n_slabs(win, stride)
    T_need = S * stride
    if T_need > T:
        x = jnp.pad(x, ((0, T_need - T), (0, 0), (0, 0)))
    elif T_need < T:
        x = x[:T_need]
    return x.reshape(S, stride, B, C)


def _window_row(slab_refs, win: int, stride: int):
    """Assemble the (BB, win*C) window row from the slab blocks in the
    reference's time-major-then-channel order."""
    pieces = [
        slab_refs[k // stride][0, k % stride] for k in range(win)
    ]
    return jnp.concatenate(pieces, axis=1)


def _wfwd_kernel(*refs, win: int, stride: int):
    ns = _n_slabs(win, stride)
    slab_refs = refs[:ns]
    h0_ref, wi_ref, wh_ref, b_ref, hs_ref, h_scr = refs[ns:]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h = h_scr[:]
    Hp = h.shape[1]
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    xt = _window_row(slab_refs, win, stride).astype(jnp.float32)
    gi = dot(xt, wi_ref[:]) + b_ref[0]
    gh = dot(h, wh_ref[:]) + b_ref[1]
    r = jax.nn.sigmoid(gi[:, :Hp] + gh[:, :Hp])
    z = jax.nn.sigmoid(gi[:, Hp : 2 * Hp] + gh[:, Hp : 2 * Hp])
    n = jnp.tanh(gi[:, 2 * Hp :] + r * gh[:, 2 * Hp :])
    h_new = (1.0 - z) * n + z * h
    h_scr[:] = h_new
    hs_ref[0] = h_new


def _wbwd_kernel(*refs, win: int, stride: int, skip_dw: bool = False,
                 k2: bool = False):
    ns = _n_slabs(win, stride)
    slab_refs = refs[:ns]
    (hprev_ref, dhs_ref, wi_ref, wh_ref, b_ref,
     dh0_ref, dwi_ref, dwh_ref, db_ref, dh_scr, *stash) = refs[ns:]
    bidx = pl.program_id(0)
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    @pl.when((bidx == 0) & (t == 0))
    def _():
        dwi_ref[:] = jnp.zeros_like(dwi_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    dotT = lambda a, w: jax.lax.dot_general(  # a @ w.T
        a, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dotTa = lambda a, g: jax.lax.dot_general(  # a.T @ g
        a, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    xt = _window_row(slab_refs, win, stride).astype(jnp.float32)
    hp = hprev_ref[0]
    Hp = hp.shape[1]
    gi = dot(xt, wi_ref[:]) + b_ref[0]
    gh = dot(hp, wh_ref[:]) + b_ref[1]
    ghn = gh[:, 2 * Hp :]
    r = jax.nn.sigmoid(gi[:, :Hp] + gh[:, :Hp])
    z = jax.nn.sigmoid(gi[:, Hp : 2 * Hp] + gh[:, Hp : 2 * Hp])
    n = jnp.tanh(gi[:, 2 * Hp :] + r * ghn)

    dh = dh_scr[:] + dhs_ref[0]
    dz = dh * (hp - n) * z * (1.0 - z)
    dn = dh * (1.0 - z) * (1.0 - n * n)
    dr = dn * ghn * r * (1.0 - r)
    dgn = dn * r

    dgi = jnp.concatenate([dr, dz, dn], axis=1)
    dgh = jnp.concatenate([dr, dz, dgn], axis=1)

    dh_new = dh * z + dotT(dgh, wh_ref[:])
    dh_scr[:] = dh_new

    @pl.when(t == T - 1)
    def _():
        dh0_ref[:] = dh_new

    if not skip_dw:  # timing-only arm: see timing_skip_dw_accum
        _accum_dw(t, T, k2, xt, hp, dgi, dgh, dwi_ref, dwh_ref, db_ref,
                  stash, dotTa)


def _slab_specs(n_slabs: int, stride: int, BB: int, C: int, n_win: int,
                reverse: bool):
    """n_slabs block-index-mapped views of the slab array: grid step t
    (window w = t, or n_win-1-t when sweeping backward) reads slab
    w + j."""
    def idx(j):
        if reverse:
            return lambda b, t, j=j: (n_win - 1 - t + j, 0, b, 0)
        return lambda b, t, j=j: (t + j, 0, b, 0)

    return [
        pl.BlockSpec((1, stride, BB, C), idx(j), memory_space=pltpu.VMEM)
        for j in range(n_slabs)
    ]


def _gru_win_forward(slabs, h0, wi, wh, b, *, win, stride, n_win, bb_cap):
    S, s, B, C = slabs.shape
    Hp = wh.shape[0]
    BB = _pick_bb(B, bb_cap)
    ns = _n_slabs(win, stride)
    const = lambda nd: (lambda bi, ti: (0,) * nd)
    return pl.pallas_call(
        partial(_wfwd_kernel, win=win, stride=stride),
        grid=(B // BB, n_win),
        in_specs=_slab_specs(ns, stride, BB, C, n_win, False) + [
            pl.BlockSpec((BB, Hp), lambda bi, ti: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win * C, 3 * Hp), const(2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hp, 3 * Hp), const(2), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3 * Hp), const(2), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BB, Hp), _tidx(False, n_win),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_win, B, Hp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BB, Hp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=_interpret(),
    )(*([slabs] * ns), h0, wi, wh, b)


def _gru_win_backward(slabs, hprev, dhs, wi, wh, b, *, win, stride, n_win,
                      bb_cap):
    S, s, B, C = slabs.shape
    Hp = wh.shape[0]
    BB = _pick_bb(B, min(bb_cap, 128))
    ns = _n_slabs(win, stride)
    const = lambda nd: (lambda bi, ti: (0,) * nd)
    idx = _tidx(True, n_win)  # time sweeps backward through the windows
    k2 = _BWD_ACCUM_K2 and n_win > 1
    return pl.pallas_call(
        partial(_wbwd_kernel, win=win, stride=stride,
                skip_dw=_TIMING_SKIP_DW, k2=k2),
        grid=(B // BB, n_win),
        in_specs=_slab_specs(ns, stride, BB, C, n_win, True) + [
            pl.BlockSpec((1, BB, Hp), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, Hp), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((win * C, 3 * Hp), const(2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hp, 3 * Hp), const(2), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3 * Hp), const(2), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BB, Hp), lambda bi, ti: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win * C, 3 * Hp), const(2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hp, 3 * Hp), const(2), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3 * Hp), const(2), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hp), jnp.float32),
            jax.ShapeDtypeStruct((win * C, 3 * Hp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, 3 * Hp), jnp.float32),
            jax.ShapeDtypeStruct((2, 3 * Hp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((BB, Hp), jnp.float32)]
        + _k2_stash_shapes(k2, BB, win * C, Hp),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the k2 stash (~2.3 MB) pushes the 512-wide windowed
            # backward past Mosaic's default 16 MB scoped-vmem limit
            # (observed: 19.5 MB needed; chip VMEM is 128 MB). Raised
            # ONLY for k2: the default-limit k1 binaries are the
            # production-proven ones.
            **({"vmem_limit_bytes": 32 * 1024 * 1024} if k2 else {}),
        ),
        interpret=_interpret(),
    )(*([slabs] * ns), hprev, dhs, wi, wh, b)


def gru_layer_windowed(x, h0, wi, bi, wh, bh, win: int, stride: int,
                       bb_cap: int = 256):
    """Fused GRU layer consuming RAW frames with in-kernel windowing.

    Args:
        x: (T, B, C) raw time-major frames (the CTC feature stream —
            typically bf16; see FusedGRU's data-input cast).
        h0: (B, H).
        wi: (win*C, 3H) — the SAME layer-0 weight layout as the
            materialized-window path (time-major-then-channel flatten,
            reference realtime_nn_model.py:172-199), so checkpoints and
            the streaming ``single_step`` path are unaffected.
        win/stride: window geometry; n_win = (T - win)//stride + 1.

    Returns:
        hs: (n_win, B, H). Input cotangents are NOT produced (the
        windowed path exists for data inputs only); parameters get exact
        grads via the custom VJP.
    """
    T, B, C = x.shape
    if win < 1 or stride < 1:
        raise ValueError(f"win={win} and stride={stride} must be >= 1")
    n_win = (T - win) // stride + 1
    if n_win < 1:
        # fail here with the numbers, not as an opaque slab-reshape /
        # pallas-grid compile error downstream
        raise ValueError(
            f"sequence too short for windowing: T={T} < win={win} "
            f"(stride={stride}) yields n_win={n_win}"
        )
    H = wh.shape[0]
    Hp = _round_up(H, LANE)
    if B <= 8:
        padB = 0
    elif B < 256:
        padB = (-B) % 8
    else:
        padB = (-B) % 256
    if padB:
        x = jnp.pad(x, ((0, 0), (0, padB), (0, 0)))
        h0 = jnp.pad(h0, ((0, padB), (0, 0)))
    if Hp != H:
        wi = _pad_gates(wi, H, Hp)
        wh = jnp.pad(_pad_gates(wh, H, Hp), ((0, Hp - H), (0, 0)))
        bi = _pad_gates(bi, H, Hp)
        bh = _pad_gates(bh, H, Hp)
        h0 = jnp.pad(h0, ((0, 0), (0, Hp - H)))
    b = jnp.stack([bi, bh])
    slabs = _slab_view(x, win, stride, n_win)
    hs = _gru_win_core(slabs, h0, wi, wh, b, win, stride, bb_cap)
    return hs[:, :B, :H]


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _gru_win_core(slabs, h0, wi, wh, b, win, stride, bb_cap):
    hs, _ = _gru_win_fwd_rule(slabs, h0, wi, wh, b, win, stride, bb_cap)
    return hs


def _gru_win_fwd_rule(slabs, h0, wi, wh, b, win, stride, bb_cap):
    n_win = slabs.shape[0] - _n_slabs(win, stride) + 1
    hs = _gru_win_forward(slabs, h0, wi, wh, b, win=win, stride=stride,
                          n_win=n_win, bb_cap=bb_cap)
    return hs, (slabs, h0, wi, wh, b, hs)


def _gru_win_bwd_rule(win, stride, bb_cap, res, dhs):
    slabs, h0, wi, wh, b, hs = res
    n_win = hs.shape[0]
    hprev = jnp.concatenate([h0[None], hs[:-1]], axis=0)
    dh0, dwi, dwh, db = _gru_win_backward(
        slabs, hprev, dhs, wi, wh, b, win=win, stride=stride, n_win=n_win,
        bb_cap=bb_cap,
    )
    # data-input contract: no dx; zeros cotangent is DCE'd by XLA
    return jnp.zeros_like(slabs), dh0, dwi, dwh, db


_gru_win_core.defvjp(_gru_win_fwd_rule, _gru_win_bwd_rule)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _accum_dw(t, T, k2, xt, hp, dgi, dgh, dwi_ref, dwh_ref, db_ref,
              stash, dotTa):
    """dW/dWh/db accumulation, optionally at HALF the read-modify-write
    rate: with ``k2`` (and a stash scratch), even grid steps park
    (xt, hp, dgi, dgh) in VMEM and odd steps fold BOTH steps into ONE
    accumulator RMW — measured 17.6 ms of the 109 ms production fwd+bwd
    is this RMW (docs/ROUND5.md §8), so halving its rate is the last
    backward lever. f32 sums reassociate (two matmul products added in
    registers before the += ), so grads match the per-step path to
    roundoff, not bitwise."""
    if not k2:
        dwi_ref[:] += dotTa(xt, dgi)
        dwh_ref[:] += dotTa(hp, dgh)
        db_ref[0] += jnp.sum(dgi, axis=0)
        db_ref[1] += jnp.sum(dgh, axis=0)
        return
    x_st, hp_st, dgi_st, dgh_st = stash
    even = t % 2 == 0
    last = t == T - 1

    @pl.when(even & jnp.logical_not(last))
    def _():
        x_st[:] = xt
        hp_st[:] = hp
        dgi_st[:] = dgi
        dgh_st[:] = dgh

    @pl.when(jnp.logical_not(even))
    def _():
        dwi_ref[:] += dotTa(x_st[:], dgi_st[:]) + dotTa(xt, dgi)
        dwh_ref[:] += dotTa(hp_st[:], dgh_st[:]) + dotTa(hp, dgh)
        db_ref[0] += jnp.sum(dgi_st[:], axis=0) + jnp.sum(dgi, axis=0)
        db_ref[1] += jnp.sum(dgh_st[:], axis=0) + jnp.sum(dgh, axis=0)

    if (T - 1) % 2 == 0:  # odd T: the last step has no partner — flush solo
        @pl.when(even & last)
        def _():
            dwi_ref[:] += dotTa(xt, dgi)
            dwh_ref[:] += dotTa(hp, dgh)
            db_ref[0] += jnp.sum(dgi, axis=0)
            db_ref[1] += jnp.sum(dgh, axis=0)


def _bwd_kernel(x_ref, hprev_ref, dhs_ref, wi_ref, wh_ref, b_ref,
                *out_refs, need_dx: bool, skip_dw: bool = False,
                k2: bool = False):
    if need_dx:
        dx_ref, dh0_ref, dwi_ref, dwh_ref, db_ref, dh_scr, *stash = out_refs
    else:
        # input is data (no cotangent consumer): skip the dx matmul and
        # the whole (T, B, F) dx stream — at CTC production scale that is
        # ~1 GB of HBM writes + 2*B*T*3Hp*F FLOPs of pure waste, since a
        # pallas_call's outputs cannot be dead-code-eliminated by XLA
        dh0_ref, dwi_ref, dwh_ref, db_ref, dh_scr, *stash = out_refs
    bidx = pl.program_id(0)
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    @pl.when((bidx == 0) & (t == 0))
    def _():
        dwi_ref[:] = jnp.zeros_like(dwi_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    dotT = lambda a, w: jax.lax.dot_general(  # a @ w.T
        a, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dotTa = lambda a, g: jax.lax.dot_general(  # a.T @ g
        a, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    xt = x_ref[0].astype(jnp.float32)
    hp = hprev_ref[0]
    Hp = hp.shape[1]
    # recompute the gates (cheaper than a (B, T, 3H) residual stream)
    gi = dot(xt, wi_ref[:]) + b_ref[0]
    gh = dot(hp, wh_ref[:]) + b_ref[1]
    ghn = gh[:, 2 * Hp :]
    r = jax.nn.sigmoid(gi[:, :Hp] + gh[:, :Hp])
    z = jax.nn.sigmoid(gi[:, Hp : 2 * Hp] + gh[:, Hp : 2 * Hp])
    n = jnp.tanh(gi[:, 2 * Hp :] + r * ghn)

    dh = dh_scr[:] + dhs_ref[0]
    dz = dh * (hp - n) * z * (1.0 - z)
    dn = dh * (1.0 - z) * (1.0 - n * n)
    dr = dn * ghn * r * (1.0 - r)
    dgn = dn * r

    dgi = jnp.concatenate([dr, dz, dn], axis=1)  # d(x W_in + b_in)
    dgh = jnp.concatenate([dr, dz, dgn], axis=1)  # d(h W_h + b_h)

    if need_dx:
        dx_ref[0] = dotT(dgi, wi_ref[:])
    dh_new = dh * z + dotT(dgh, wh_ref[:])
    dh_scr[:] = dh_new

    @pl.when(t == T - 1)
    def _():
        dh0_ref[:] = dh_new

    if not skip_dw:  # timing-only arm: see timing_skip_dw_accum
        _accum_dw(t, T, k2, xt, hp, dgi, dgh, dwi_ref, dwh_ref, db_ref,
                  stash, dotTa)


def _k2_stash_shapes(k2: bool, BB: int, F: int, Hp: int):
    """VMEM stash for the half-rate dW accumulate (``_accum_dw``):
    one grid step's (xt, hp, dgi, dgh). ~2 MB at BB=128/F=448/Hp=512."""
    if not k2:
        return []
    return [
        pltpu.VMEM((BB, F), jnp.float32),
        pltpu.VMEM((BB, Hp), jnp.float32),
        pltpu.VMEM((BB, 3 * Hp), jnp.float32),
        pltpu.VMEM((BB, 3 * Hp), jnp.float32),
    ]


def _gru_backward(x, hprev, dhs, wi, wh, b, *, reverse: bool, bb_cap: int,
                  need_dx: bool = True):
    """Returns (dx | None, dh0, dwi, dwh, db); dx is None iff not need_dx."""
    T, B, F = x.shape
    Hp = wh.shape[0]
    # smaller tiles than forward: the backward holds the dW accumulators,
    # both weight matrices and ~8 gate temporaries in VMEM at once
    BB = _pick_bb(B, min(bb_cap, 128))
    const = lambda nd: (lambda bi, ti: (0,) * nd)
    # time runs backward through the data: flip the effective direction
    idx = _tidx(not reverse, T)
    dx_specs = (
        [pl.BlockSpec((1, BB, F), idx, memory_space=pltpu.VMEM)]
        if need_dx else []
    )
    dx_shapes = (
        [jax.ShapeDtypeStruct((T, B, F), jnp.float32)] if need_dx else []
    )
    k2 = _BWD_ACCUM_K2 and T > 1
    out = pl.pallas_call(
        partial(_bwd_kernel, need_dx=need_dx, skip_dw=_TIMING_SKIP_DW,
                k2=k2),
        grid=(B // BB, T),
        in_specs=[
            pl.BlockSpec((1, BB, F), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, Hp), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, Hp), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((F, 3 * Hp), const(2), memory_space=pltpu.VMEM),
            pl.BlockSpec((Hp, 3 * Hp), const(2), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3 * Hp), const(2), memory_space=pltpu.VMEM),
        ],
        out_specs=dx_specs + [
            pl.BlockSpec((BB, Hp), lambda bi, ti: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, 3 * Hp), const(2), memory_space=pltpu.VMEM),
            pl.BlockSpec((Hp, 3 * Hp), const(2), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3 * Hp), const(2), memory_space=pltpu.VMEM),
        ],
        out_shape=dx_shapes + [
            jax.ShapeDtypeStruct((B, Hp), jnp.float32),
            jax.ShapeDtypeStruct((F, 3 * Hp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, 3 * Hp), jnp.float32),
            jax.ShapeDtypeStruct((2, 3 * Hp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((BB, Hp), jnp.float32)]
        + _k2_stash_shapes(k2, BB, F, Hp),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # headroom for the k2 stash (see the windowed backward note)
            **({"vmem_limit_bytes": 32 * 1024 * 1024} if k2 else {}),
        ),
        interpret=_interpret(),
    )(x, hprev, dhs, wi, wh, b)
    if not need_dx:
        return (None, *out)
    return tuple(out)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


def _pad_gates(w, H: int, Hp: int):
    """(..., 3H) -> (..., 3Hp): zero-pad each gate's H columns to Hp."""
    parts = [w[..., i * H : (i + 1) * H] for i in range(3)]
    pad = [(0, 0)] * (w.ndim - 1) + [(0, Hp - H)]
    return jnp.concatenate([jnp.pad(p, pad) for p in parts], axis=-1)


def gru_layer(x, h0, wi, bi, wh, bh, reverse: bool = False,
              bb_cap: int = 256, input_grad: bool = True):
    """Fused GRU layer over time-major inputs.

    Args:
        x: (T, B, F) inputs.
        h0: (B, H) initial hidden state.
        wi: (F, 3H) input weights, torch gate order (r, z, n).
        bi: (3H,) input bias.
        wh: (H, 3H) recurrent weights.
        bh: (3H,) recurrent bias.
        reverse: process time back-to-front (bidirectional encoder);
            outputs stay in the original time order.
        input_grad: set False when ``x`` is raw data with no upstream
            parameters (the CTC first layer): the backward kernel then
            skips the dx matmul and never writes the (T, B, F) dx stream
            (XLA cannot DCE an output of a pallas_call). The returned x
            cotangent is a symbolic-zero array.

    Returns:
        hs: (T, B, H) hidden states (h_T at index T-1, or index 0 when
        ``reverse``).
    """
    T, B, F = x.shape
    H = wh.shape[0]
    Hp = _round_up(H, LANE)
    # batch padding: Mosaic wants 8-multiple (or full-array) batch tiles
    if B <= 8:
        padB = 0
    elif B < 256:
        padB = (-B) % 8
    else:
        padB = (-B) % 256
    if padB:
        x = jnp.pad(x, ((0, 0), (0, padB), (0, 0)))
        h0 = jnp.pad(h0, ((0, padB), (0, 0)))
    if Hp != H:
        wi = _pad_gates(wi, H, Hp)
        wh = jnp.pad(_pad_gates(wh, H, Hp), ((0, Hp - H), (0, 0)))
        bi = _pad_gates(bi, H, Hp)
        bh = _pad_gates(bh, H, Hp)
        h0 = jnp.pad(h0, ((0, 0), (0, Hp - H)))
    b = jnp.stack([bi, bh])
    hs = _gru_core(x, h0, wi, wh, b, reverse, bb_cap, input_grad)
    return hs[:, :B, :H]


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _gru_core(x, h0, wi, wh, b, reverse: bool, bb_cap: int,
              input_grad: bool = True):
    hs, _ = _gru_fwd_rule(x, h0, wi, wh, b, reverse, bb_cap, input_grad)
    return hs


def _gru_fwd_rule(x, h0, wi, wh, b, reverse, bb_cap, input_grad):
    hs = _gru_forward(x, h0, wi, wh, b, reverse=reverse, bb_cap=bb_cap)
    return hs, (x, h0, wi, wh, b, hs)


def _gru_bwd_rule(reverse, bb_cap, input_grad, res, dhs):
    x, h0, wi, wh, b, hs = res
    # h_{t-1} stream in computation order: shift hs one step toward the
    # start of the sweep and inject h0 at the first processed step
    if reverse:
        hprev = jnp.concatenate([hs[1:], h0[None]], axis=0)
    else:
        hprev = jnp.concatenate([h0[None], hs[:-1]], axis=0)
    dx, dh0, dwi, dwh, db = _gru_backward(
        x, hprev, dhs, wi, wh, b, reverse=reverse, bb_cap=bb_cap,
        need_dx=input_grad,
    )
    if dx is None:
        # custom_vjp must return a full cotangent structure; this zeros
        # array has no consumer (input_grad=False promises x is data) and
        # is DCE'd by XLA
        dx = jnp.zeros_like(x)
    else:
        dx = dx.astype(x.dtype)  # kernel emits f32; match a bf16 primal
    return dx, dh0, dwi, dwh, db


_gru_core.defvjp(_gru_fwd_rule, _gru_bwd_rule)


def gru_layer_bidir(x, h0_f, h0_b, wi_f, bi_f, wh_f, bh_f,
                    wi_b, bi_b, wh_b, bh_b, bb_cap: int = 256,
                    input_grad: bool = True):
    """Fused bidirectional GRU layer over time-major inputs.

    One kernel advances BOTH directions per time step (see
    ``_bifwd_kernel``); the backward reuses the per-direction backward
    kernel, which already runs at ~2x the forward's FLOP rate and gains
    nothing from fusion.

    Args mirror :func:`gru_layer` with per-direction parameter sets.
    Returns (hs_f, hs_b), each (T, B, H) in original time order
    (h_last of the reverse direction is ``hs_b[0]``).
    """
    T, B, F = x.shape
    H = wh_f.shape[0]
    Hp = _round_up(H, LANE)
    if B <= 8:
        padB = 0
    elif B < 256:
        padB = (-B) % 8
    else:
        padB = (-B) % 256
    if padB:
        x = jnp.pad(x, ((0, 0), (0, padB), (0, 0)))
        h0_f = jnp.pad(h0_f, ((0, padB), (0, 0)))
        h0_b = jnp.pad(h0_b, ((0, padB), (0, 0)))
    if Hp != H:
        wi_f, wi_b = _pad_gates(wi_f, H, Hp), _pad_gates(wi_b, H, Hp)
        wh_f = jnp.pad(_pad_gates(wh_f, H, Hp), ((0, Hp - H), (0, 0)))
        wh_b = jnp.pad(_pad_gates(wh_b, H, Hp), ((0, Hp - H), (0, 0)))
        bi_f, bi_b = _pad_gates(bi_f, H, Hp), _pad_gates(bi_b, H, Hp)
        bh_f, bh_b = _pad_gates(bh_f, H, Hp), _pad_gates(bh_b, H, Hp)
        h0_f = jnp.pad(h0_f, ((0, 0), (0, Hp - H)))
        h0_b = jnp.pad(h0_b, ((0, 0), (0, Hp - H)))
    h0 = jnp.stack([h0_f, h0_b])
    wi = jnp.stack([wi_f, wi_b])
    wh = jnp.stack([wh_f, wh_b])
    b = jnp.stack([jnp.stack([bi_f, bh_f]), jnp.stack([bi_b, bh_b])])
    hs_f, hs_b = _gru_bidir_core(x, h0, wi, wh, b, bb_cap, input_grad)
    return hs_f[:, :B, :H], hs_b[:, :B, :H]


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _gru_bidir_core(x, h0, wi, wh, b, bb_cap: int, input_grad: bool = True):
    out, _ = _gru_bidir_fwd_rule(x, h0, wi, wh, b, bb_cap, input_grad)
    return out


def _gru_bidir_fwd_rule(x, h0, wi, wh, b, bb_cap, input_grad):
    hs_f, hs_b = _gru_bidir_forward(x, h0, wi, wh, b, bb_cap=bb_cap)
    return (hs_f, hs_b), (x, h0, wi, wh, b, hs_f, hs_b)


def _gru_bidir_bwd_rule(bb_cap, input_grad, res, dout):
    x, h0, wi, wh, b, hs_f, hs_b = res
    dhs_f, dhs_b = dout
    hprev_f = jnp.concatenate([h0[0][None], hs_f[:-1]], axis=0)
    dx_f, dh0_f, dwi_f, dwh_f, db_f = _gru_backward(
        x, hprev_f, dhs_f, wi[0], wh[0], b[0], reverse=False, bb_cap=bb_cap,
        need_dx=input_grad,
    )
    hprev_b = jnp.concatenate([hs_b[1:], h0[1][None]], axis=0)
    dx_b, dh0_b, dwi_b, dwh_b, db_b = _gru_backward(
        x, hprev_b, dhs_b, wi[1], wh[1], b[1], reverse=True, bb_cap=bb_cap,
        need_dx=input_grad,
    )
    dx = (jnp.zeros_like(x) if dx_f is None
          else (dx_f + dx_b).astype(x.dtype))
    return (
        dx,
        jnp.stack([dh0_f, dh0_b]),
        jnp.stack([dwi_f, dwi_b]),
        jnp.stack([dwh_f, dwh_b]),
        jnp.stack([db_f, db_b]),
    )


_gru_bidir_core.defvjp(_gru_bidir_fwd_rule, _gru_bidir_bwd_rule)


def gru_layer_reference(x, h0, wi, bi, wh, bh, reverse: bool = False):
    """lax.scan oracle with identical math/layout (any backend)."""
    H = wh.shape[0]

    def step(h, xt):
        gi = xt @ wi + bi
        gh = h @ wh + bh
        r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi[:, H : 2 * H] + gh[:, H : 2 * H])
        n = jnp.tanh(gi[:, 2 * H :] + r * gh[:, 2 * H :])
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    _, hs = jax.lax.scan(step, h0, x, reverse=reverse)
    return hs


# ---------------------------------------------------------------------------
# dispatch gate
# ---------------------------------------------------------------------------

_ENABLED = True

# dispatch thresholds (see FusedGRU notes): the 1-step decoder and small
# problems stay on scan; production-scale batch*time amortizes the
# kernel's compile cost
MIN_SEQ_T = 8
MIN_BT = 65536
# fused bidirectional encoder kernel (gru_layer_bidir). Default OFF:
# the same-session A/B at bench shape measured 28.6k samples/s fused vs
# 33.0k with two per-direction kernels — the halved serial chain does
# NOT recover the forward's MXU idle (the doubled VMEM residency and
# smaller forced batch tile cost more than the fusion saves). Kept as a
# correct, tested variant for future hardware where the balance differs.
BIDIR_FUSED = False


def worthwhile(B: int, T: int) -> bool:
    """True when the Pallas kernels pay for themselves at this size."""
    return T >= MIN_SEQ_T and B * T >= MIN_BT


def enabled() -> bool:
    """True when the Pallas path should be used: TPU backend and not
    explicitly disabled (e.g. under the fold-vmapped trainers, where
    batching the recurrence across folds in XLA beats serializing
    per-fold kernel instances)."""
    return _ENABLED and jax.default_backend() == "tpu"


class disable_pallas_gru:
    """Context manager forcing the lax.scan path (vmapped fold trainers,
    A/B benchmarking)."""

    def __enter__(self):
        global _ENABLED
        self._prev = _ENABLED
        _ENABLED = False
        return self

    def __exit__(self, *exc):
        global _ENABLED
        _ENABLED = self._prev
        return False


# Half-rate dW accumulation (see _accum_dw): OFF by default — measured
# round 5 at production scale and REJECTED: folding two steps into one
# accumulator read-modify-write changed nothing (fwd+bwd 109.8 ms k2 vs
# 108.7 ms k1, same session), because the 17.6-18.8 ms "accumulate
# cost" (vs the skip-accum timing clone) is almost entirely the dW/dWh
# matmuls' OWN MXU FLOPs — analytically ~3.1 TFLOP ≈ 19 ms at the
# session's 162 TF/s ceiling — i.e. mandatory gradient math already
# running at ceiling, not RMW overhead. docs/ROUND5.md §8. The k2 path
# stays correct + tested for future hardware where the balance differs.
_BWD_ACCUM_K2 = False


class set_bwd_accum_k2:
    """Select the dW accumulate schedule for A/B probes (programs must
    be TRACED inside the context): True = two-step fold, False = the
    per-step default."""

    def __init__(self, enabled: bool):
        self._want = enabled

    def __enter__(self):
        global _BWD_ACCUM_K2
        self._prev = _BWD_ACCUM_K2
        _BWD_ACCUM_K2 = self._want
        return self

    def __exit__(self, *exc):
        global _BWD_ACCUM_K2
        _BWD_ACCUM_K2 = self._prev
        return False


# TIMING-ONLY debug knob (docs/ROUND4.md §11 -> ROUND5 measurement): when
# set, the backward kernels SKIP the per-grid-step dW/dWh/db VMEM
# read-modify-write. Parameter gradients from programs traced under it
# are WRONG (all-zero dW/dWh/db) — it exists solely so the accumulate's
# cost can be measured through the full-model jit (the bare-kernel probes
# hang the remote compiler, CLAUDE.md). Never use outside A/B probes.
_TIMING_SKIP_DW = False


class timing_skip_dw_accum:
    """Context manager for the accumulate-free TIMING arm (wrong grads —
    see _TIMING_SKIP_DW). Programs must be TRACED inside the context (the
    flag is read at pallas_call construction); jit caches traced under it
    must not be reused for real training."""

    def __enter__(self):
        global _TIMING_SKIP_DW
        self._prev = _TIMING_SKIP_DW
        _TIMING_SKIP_DW = True
        return self

    def __exit__(self, *exc):
        global _TIMING_SKIP_DW
        _TIMING_SKIP_DW = self._prev
        return False
