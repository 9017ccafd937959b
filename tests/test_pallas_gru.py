"""Pallas fused-GRU layer parity (interpret mode on the CPU backend).

The same kernels compile with Mosaic on TPU (exercised by bench.py);
here the fused forward and the custom-VJP backward are checked against
the lax.scan oracle with identical gate math, in both time directions,
including non-128-multiple hidden sizes (internal lane padding), odd
feature widths, and batch tiling/padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cross_patient_speech_decoding_tpu.ops.pallas_gru import (
    disable_pallas_gru,
    enabled,
    gru_layer,
    gru_layer_reference,
)


def _case(seed=0, T=6, B=16, F=10, H=32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(T, B, F)) * 0.5, jnp.float32)
    h0 = jnp.asarray(rng.normal(size=(B, H)) * 0.3, jnp.float32)
    wi = jnp.asarray(rng.normal(size=(F, 3 * H)) / np.sqrt(F), jnp.float32)
    bi = jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, jnp.float32)
    wh = jnp.asarray(rng.normal(size=(H, 3 * H)) / np.sqrt(H), jnp.float32)
    bh = jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, jnp.float32)
    return x, h0, wi, bi, wh, bh


@pytest.mark.parametrize("reverse", [False, True])
def test_forward_matches_scan(reverse):
    args = _case()
    hs_p = gru_layer(*args, reverse)
    hs_r = gru_layer_reference(*args, reverse)
    np.testing.assert_allclose(np.asarray(hs_p), np.asarray(hs_r), atol=2e-6)


@pytest.mark.parametrize("reverse", [False, True])
def test_custom_vjp_matches_autodiff(reverse):
    args = _case(seed=3)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a, reverse)))

    gp = jax.grad(loss(gru_layer), argnums=tuple(range(6)))(*args)
    gr = jax.grad(loss(gru_layer_reference), argnums=tuple(range(6)))(*args)
    for a, b in zip(gp, gr):
        scale = max(float(jnp.abs(b).max()), 1e-9)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-6
        )


def test_lane_padded_hidden_size():
    # H=50 pads internally to 128 lanes; padded lanes must stay exactly 0
    # through the gate algebra so outputs equal the unpadded oracle
    args = _case(seed=7, H=50, F=9)
    for reverse in (False, True):
        hs_p = gru_layer(*args, reverse)
        hs_r = gru_layer_reference(*args, reverse)
        np.testing.assert_allclose(
            np.asarray(hs_p), np.asarray(hs_r), atol=2e-6
        )
    # gradients through the padded weights stay correct too
    gp = jax.grad(lambda *a: jnp.sum(jnp.sin(gru_layer(*a))), argnums=(2, 4))(
        *args
    )
    gr = jax.grad(
        lambda *a: jnp.sum(jnp.sin(gru_layer_reference(*a))), argnums=(2, 4)
    )(*args)
    for a, b in zip(gp, gr):
        scale = max(float(jnp.abs(b).max()), 1e-9)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-6
        )


def test_batch_tiling_and_padding():
    # bb_cap smaller than B (several tiles) and B=12 (padded to 16)
    args = _case(seed=5, B=32)
    hs_small = gru_layer(*args, False, 8)
    hs_big = gru_layer(*args, False, 256)
    np.testing.assert_allclose(
        np.asarray(hs_small), np.asarray(hs_big), atol=2e-6
    )
    args12 = _case(seed=6, B=12)
    np.testing.assert_allclose(
        np.asarray(gru_layer(*args12, False)),
        np.asarray(gru_layer_reference(*args12, False)),
        atol=2e-6,
    )


def test_gate_off_tpu_and_context_manager():
    assert enabled() == (jax.default_backend() == "tpu")
    with disable_pallas_gru():
        assert not enabled()


def test_fused_gru_layer_consistent_across_paths():
    # FusedGRU output must not depend on the dispatch gate: compare the
    # layer (scan path on CPU) against a direct gru_layer call on the
    # layer's own parameters (pins the transpose/param-layout glue)
    from cross_patient_speech_decoding_tpu.models.layers import FusedGRU

    rng = np.random.default_rng(0)
    B, T, F, H = 4, 9, 7, 16
    x = jnp.asarray(rng.normal(size=(B, T, F)), jnp.float32)
    layer = FusedGRU(hidden=H)
    params = layer.init(jax.random.key(0), x)
    out, h_last = layer.apply(params, x)

    p = params["params"]
    hs = gru_layer(
        x.swapaxes(0, 1),
        jnp.zeros((B, H), jnp.float32),
        p["wi"], p["bi"], p["wh"], p["bh"],
        False,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(hs.swapaxes(0, 1)), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(h_last), np.asarray(hs[-1]), atol=1e-5)


def test_bidir_forward_matches_two_references():
    from cross_patient_speech_decoding_tpu.ops.pallas_gru import (
        gru_layer_bidir,
    )

    xf = _case(seed=5)
    xb = _case(seed=6)
    x = xf[0]
    h0f, wif, bif, whf, bhf = xf[1:]
    h0b, wib, bib, whb, bhb = xb[1:]
    hs_f, hs_b = gru_layer_bidir(x, h0f, h0b, wif, bif, whf, bhf,
                                 wib, bib, whb, bhb)
    ref_f = gru_layer_reference(x, h0f, wif, bif, whf, bhf, False)
    ref_b = gru_layer_reference(x, h0b, wib, bib, whb, bhb, True)
    np.testing.assert_allclose(np.asarray(hs_f), np.asarray(ref_f), atol=2e-6)
    np.testing.assert_allclose(np.asarray(hs_b), np.asarray(ref_b), atol=2e-6)


def test_bidir_padded_shapes_and_grads():
    from cross_patient_speech_decoding_tpu.ops.pallas_gru import (
        gru_layer_bidir,
    )

    # H=50 exercises lane padding, B=21 batch padding
    xf = _case(seed=7, T=5, B=21, F=9, H=50)
    xb = _case(seed=8, T=5, B=21, F=9, H=50)
    x = xf[0]
    args = (x, xf[1], xb[1], xf[2], xf[3], xf[4], xf[5],
            xb[2], xb[3], xb[4], xb[5])

    def loss_bidir(*a):
        f, b = gru_layer_bidir(*a)
        return jnp.sum(jnp.sin(f)) + jnp.sum(jnp.cos(b))

    def loss_ref(x, h0f, h0b, wif, bif, whf, bhf, wib, bib, whb, bhb):
        f = gru_layer_reference(x, h0f, wif, bif, whf, bhf, False)
        b = gru_layer_reference(x, h0b, wib, bib, whb, bhb, True)
        return jnp.sum(jnp.sin(f)) + jnp.sum(jnp.cos(b))

    n = len(args)
    gp = jax.grad(loss_bidir, argnums=tuple(range(n)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(n)))(*args)
    for a, b in zip(gp, gr):
        scale = max(float(jnp.abs(b).max()), 1e-9)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-6
        )


def test_vmap_over_per_instance_weights_matches_reference():
    """vmap(gru_layer) over per-instance weight blocks (the fold-parallel
    trainer's rnn_impl='pallas' regime: jax's batching rule prepends the
    vmap axis to the kernel grid — ONE launch) matches the vmapped scan
    oracle, forward and VJP."""
    rng = np.random.default_rng(11)
    E, T, B, F, H = 3, 5, 16, 10, 24
    x = jnp.asarray(rng.normal(size=(E, T, B, F)) * 0.5, jnp.float32)
    h0 = jnp.asarray(rng.normal(size=(E, B, H)) * 0.3, jnp.float32)
    wi = jnp.asarray(rng.normal(size=(E, F, 3 * H)) * 0.3, jnp.float32)
    bi = jnp.asarray(rng.normal(size=(E, 3 * H)) * 0.1, jnp.float32)
    wh = jnp.asarray(rng.normal(size=(E, H, 3 * H)) * 0.3, jnp.float32)
    bh = jnp.asarray(rng.normal(size=(E, 3 * H)) * 0.1, jnp.float32)
    args = (x, h0, wi, bi, wh, bh)

    for reverse in (False, True):
        f = jax.vmap(lambda *a: gru_layer(*a, reverse=reverse))
        g = jax.vmap(lambda *a: gru_layer_reference(*a, reverse=reverse))
        np.testing.assert_allclose(
            np.asarray(f(*args)), np.asarray(g(*args)), atol=2e-6
        )
        gk = jax.grad(lambda *a: jnp.sum(jnp.sin(f(*a))),
                      argnums=tuple(range(6)))(*args)
        gr = jax.grad(lambda *a: jnp.sum(jnp.sin(g(*a))),
                      argnums=tuple(range(6)))(*args)
        for a, b in zip(gk, gr):
            scale = max(float(jnp.abs(b).max()), 1e-9)
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-6
            )


@pytest.mark.parametrize("reverse", [False, True])
def test_input_grad_false_param_grads_match(reverse):
    """input_grad=False (the CTC first layer: x is data) must leave every
    parameter cotangent bit-identical to the full backward — only the dx
    output is skipped — and must return exactly-zero x cotangents."""
    args = _case(seed=11)

    def loss(ig):
        return lambda *a: jnp.sum(
            jnp.sin(gru_layer(*a, reverse, input_grad=ig))
        )

    g_full = jax.grad(loss(True), argnums=tuple(range(6)))(*args)
    g_nodx = jax.grad(loss(False), argnums=tuple(range(6)))(*args)
    # dx is declared unusable: the rule returns symbolic zeros
    assert float(jnp.abs(g_nodx[0]).max()) == 0.0
    assert float(jnp.abs(g_full[0]).max()) > 0.0  # discriminates the knob
    for a, b in zip(g_nodx[1:], g_full[1:]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_input_grad_false_bidir():
    from cross_patient_speech_decoding_tpu.ops.pallas_gru import (
        gru_layer_bidir,
    )

    rng = np.random.default_rng(7)
    T, B, F, H = 5, 16, 9, 24
    x = jnp.asarray(rng.normal(size=(T, B, F)), jnp.float32)
    h0f = jnp.asarray(rng.normal(size=(B, H)) * 0.2, jnp.float32)
    h0b = jnp.asarray(rng.normal(size=(B, H)) * 0.2, jnp.float32)
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.3, jnp.float32)
    params = (mk(F, 3 * H), mk(3 * H), mk(H, 3 * H), mk(3 * H),
              mk(F, 3 * H), mk(3 * H), mk(H, 3 * H), mk(3 * H))
    args = (x, h0f, h0b, *params)
    n = len(args)

    def loss(ig):
        def f(*a):
            hf, hb = gru_layer_bidir(*a, input_grad=ig)
            return jnp.sum(jnp.sin(hf)) + jnp.sum(jnp.cos(hb))

        return f

    g_full = jax.grad(loss(True), argnums=tuple(range(n)))(*args)
    g_nodx = jax.grad(loss(False), argnums=tuple(range(n)))(*args)
    assert float(jnp.abs(g_nodx[0]).max()) == 0.0
    assert float(jnp.abs(g_full[0]).max()) > 0.0
    for a, b in zip(g_nodx[1:], g_full[1:]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_data_input_stream():
    """bf16 x (the input_grad=False data stream): forward matches the
    scan oracle on the same bf16-rounded input, and param grads stay
    finite/consistent with the f32-stream kernel at bf16 tolerance."""
    x, h0, wi, bi, wh, bh = _case(seed=21)
    xb = x.astype(jnp.bfloat16)
    hs_p = gru_layer(xb, h0, wi, bi, wh, bh, False, input_grad=False)
    assert hs_p.dtype == jnp.float32
    hs_r = gru_layer_reference(
        xb.astype(jnp.float32), h0, wi, bi, wh, bh, False
    )
    np.testing.assert_allclose(np.asarray(hs_p), np.asarray(hs_r), atol=2e-6)

    g_b = jax.grad(lambda w: jnp.sum(jnp.sin(
        gru_layer(xb, h0, w, bi, wh, bh, False, input_grad=False))))(wi)
    g_f = jax.grad(lambda w: jnp.sum(jnp.sin(
        gru_layer(x, h0, w, bi, wh, bh, False, input_grad=False))))(wi)
    # same data rounded once to bf16: grads agree to bf16 input tolerance
    scale = max(float(jnp.abs(g_f).max()), 1e-9)
    np.testing.assert_allclose(
        np.asarray(g_b) / scale, np.asarray(g_f) / scale, atol=5e-3
    )


# ---------------------------------------------------------------- windowed ----


def _win_case(seed=0, T=26, B=16, C=5, H=32, win=6, stride=2):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(T, B, C)) * 0.5, jnp.float32)
    h0 = jnp.asarray(rng.normal(size=(B, H)) * 0.3, jnp.float32)
    F = win * C
    wi = jnp.asarray(rng.normal(size=(F, 3 * H)) / np.sqrt(F), jnp.float32)
    bi = jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, jnp.float32)
    wh = jnp.asarray(rng.normal(size=(H, 3 * H)) / np.sqrt(H), jnp.float32)
    bh = jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, jnp.float32)
    return x, h0, wi, bi, wh, bh


def _materialize_windows_tmajor(x_t, win, stride):
    """(T, B, C) -> (n_win, B, win*C), reference flatten order."""
    from cross_patient_speech_decoding_tpu.models.layers import (
        reformat_time_windows,
    )

    xw = reformat_time_windows(x_t.swapaxes(0, 1), win, stride)
    return xw.swapaxes(0, 1)


@pytest.mark.parametrize("win,stride,T", [(6, 2, 26), (5, 2, 25), (4, 4, 16),
                                          (7, 3, 23)])
def test_windowed_forward_matches_materialized(win, stride, T):
    from cross_patient_speech_decoding_tpu.ops.pallas_gru import (
        gru_layer_windowed,
    )

    x, h0, wi, bi, wh, bh = _win_case(T=T, win=win, stride=stride)
    hs_w = gru_layer_windowed(x, h0, wi, bi, wh, bh, win, stride)
    xw = _materialize_windows_tmajor(x, win, stride)
    hs_r = gru_layer_reference(xw, h0, wi, bi, wh, bh)
    assert hs_w.shape == hs_r.shape
    np.testing.assert_allclose(np.asarray(hs_w), np.asarray(hs_r), atol=2e-6)


def test_windowed_param_grads_match_materialized():
    from cross_patient_speech_decoding_tpu.ops.pallas_gru import (
        gru_layer_windowed,
    )

    x, h0, wi, bi, wh, bh = _win_case(seed=5)
    win, stride = 6, 2

    def loss_w(h0, wi, bi, wh, bh):
        return jnp.sum(jnp.sin(
            gru_layer_windowed(x, h0, wi, bi, wh, bh, win, stride)))

    xw = _materialize_windows_tmajor(x, win, stride)

    def loss_r(h0, wi, bi, wh, bh):
        return jnp.sum(jnp.sin(gru_layer_reference(xw, h0, wi, bi, wh, bh)))

    gw = jax.grad(loss_w, argnums=(0, 1, 2, 3, 4))(h0, wi, bi, wh, bh)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(h0, wi, bi, wh, bh)
    for a, b in zip(gw, gr):
        scale = max(float(jnp.abs(b).max()), 1e-9)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-6
        )


def test_windowed_no_input_cotangent():
    """The windowed path promises an exact-zero x cotangent (data-input
    contract)."""
    from cross_patient_speech_decoding_tpu.ops.pallas_gru import (
        gru_layer_windowed,
    )

    x, h0, wi, bi, wh, bh = _win_case()
    g = jax.grad(lambda xx: jnp.sum(
        gru_layer_windowed(xx, h0, wi, bi, wh, bh, 6, 2)))(x)
    assert float(jnp.abs(g).max()) == 0.0


@pytest.mark.parametrize("T", [5, 6, 1])
def test_k2_accum_matches_per_step(T):
    """The half-rate dW accumulate (k=2 stash fold — measured and
    REJECTED as a perf lever, docs/ROUND5.md §8, kept correct for
    future hardware) produces the same parameter grads as the per-step
    default for odd, even, and length-1 sweeps (f32 reassociation
    only)."""
    from cross_patient_speech_decoding_tpu.ops.pallas_gru import (
        gru_layer,
        set_bwd_accum_k2,
    )

    x, h0, wi, bi, wh, bh = _case(seed=11, T=T)

    def loss(wi, bi, wh, bh):
        return jnp.sum(jnp.sin(gru_layer(x, h0, wi, bi, wh, bh)))

    with set_bwd_accum_k2(True):
        g_k2 = jax.grad(loss, argnums=(0, 1, 2, 3))(wi, bi, wh, bh)
    with set_bwd_accum_k2(False):
        g_k1 = jax.grad(loss, argnums=(0, 1, 2, 3))(wi, bi, wh, bh)
    for a, b in zip(g_k2, g_k1):
        scale = max(float(jnp.abs(b).max()), 1e-9)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=1e-6)


def test_timing_skip_dw_accum_knob():
    """The timing-only A/B knob (docs/ROUND4.md §11 measurement): traced
    under the context, backward kernels skip the dW/dWh/db accumulate
    (those grads become exactly zero) while dh0 and the forward stay
    correct; outside the context behavior is unchanged."""
    from cross_patient_speech_decoding_tpu.ops.pallas_gru import (
        gru_layer,
        timing_skip_dw_accum,
    )

    x, h0, wi, bi, wh, bh = _case()

    def loss(h0, wi, wh):
        return jnp.sum(jnp.sin(gru_layer(x, h0, wi, bi, wh, bh)))

    g_real = jax.grad(loss, argnums=(0, 1, 2))(h0, wi, wh)
    with timing_skip_dw_accum():
        fwd_skip = gru_layer(x, h0, wi, bi, wh, bh)  # forward untouched
        g_skip = jax.grad(loss, argnums=(0, 1, 2))(h0, wi, wh)
    np.testing.assert_allclose(
        np.asarray(fwd_skip),
        np.asarray(gru_layer(x, h0, wi, bi, wh, bh)), atol=1e-6)
    # dh0 path still live, dW paths dead
    np.testing.assert_allclose(np.asarray(g_skip[0]), np.asarray(g_real[0]),
                               atol=1e-5)
    assert float(jnp.abs(g_skip[1]).max()) == 0.0
    assert float(jnp.abs(g_skip[2]).max()) == 0.0
    # flag restored: real grads flow again
    g_after = jax.grad(loss, argnums=(1,))(h0, wi, wh)
    assert float(jnp.abs(g_after[0]).max()) > 0.0


def test_windowed_rejects_short_sequence_and_bad_stride():
    """T < win (or stride < 1) must fail with a clear ValueError, not an
    opaque slab-reshape/pallas-grid error (round-4 advisor finding)."""
    from cross_patient_speech_decoding_tpu.ops.pallas_gru import (
        gru_layer_windowed,
    )

    x, h0, wi, bi, wh, bh = _win_case(T=4)  # T=4 < win=6
    with pytest.raises(ValueError, match="n_win"):
        gru_layer_windowed(x, h0, wi, bi, wh, bh, 6, 2)
    with pytest.raises(ValueError, match="stride"):
        gru_layer_windowed(x, h0, wi, bi, wh, bh, 4, 0)


def test_windowed_trailing_frames_and_batch_padding():
    # T=27 with win 6 / stride 2 leaves one unused trailing frame; B=10
    # forces batch padding. Both must not perturb results.
    from cross_patient_speech_decoding_tpu.ops.pallas_gru import (
        gru_layer_windowed,
    )

    x, h0, wi, bi, wh, bh = _win_case(T=27, B=10, H=50)  # H pads to 128 too
    hs_w = gru_layer_windowed(x, h0, wi, bi, wh, bh, 6, 2)
    xw = _materialize_windows_tmajor(x, 6, 2)
    hs_r = gru_layer_reference(xw, h0, wi, bi, wh, bh)
    np.testing.assert_allclose(np.asarray(hs_w), np.asarray(hs_r), atol=2e-6)


def test_realtime_rnn_windowed_path_matches_materialized(monkeypatch):
    """Force the model-level windowed dispatch (normally TPU-only) in
    interpret mode and check logits against the default materialized
    path."""
    import cross_patient_speech_decoding_tpu.ops.pallas_gru as pg
    from cross_patient_speech_decoding_tpu.models import RealtimeRNN

    rng = np.random.default_rng(0)
    B, T, C = 12, 40, 5
    x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    kw = dict(hidden=32, n_layers=2, n_classes=7, dropout=0.0,
              win_size=6, stride=2)
    model = RealtimeRNN(input_grad=False, **kw)
    variables = model.init({"params": jax.random.key(0)}, x, True)
    logits_mat = model.apply(variables, x, True)

    monkeypatch.setattr(pg, "enabled", lambda: True)
    monkeypatch.setattr(pg, "worthwhile", lambda B, T: True)
    logits_win = model.apply(variables, x, True)
    # bf16 data stream on the kernel path: tolerance covers the cast
    np.testing.assert_allclose(np.asarray(logits_win),
                               np.asarray(logits_mat), atol=5e-2, rtol=1e-2)
    # param tree unchanged between paths
    reinit = model.init({"params": jax.random.key(0)}, x, True)
    assert jax.tree_util.tree_structure(reinit) == \
        jax.tree_util.tree_structure(variables)


def test_windowed_vmap_over_per_instance_weights():
    """Pallas' batching rule prepends the vmapped axis to the windowed
    kernel's grid (one launch); parity vs per-instance references.
    Shipped drivers never hit this (the sweep trainers run
    disable_pallas_gru), but a user vmapping RealtimeRNN must not get
    silent garbage."""
    from cross_patient_speech_decoding_tpu.models.layers import (
        reformat_time_windows,
    )
    from cross_patient_speech_decoding_tpu.ops.pallas_gru import (
        gru_layer_windowed,
    )

    rng = np.random.default_rng(0)
    E, T, B, C, H, win, stride = 3, 18, 16, 4, 24, 6, 2
    F = win * C
    x = jnp.asarray(rng.normal(size=(E, T, B, C)) * .5, jnp.float32)
    h0 = jnp.asarray(rng.normal(size=(E, B, H)) * .3, jnp.float32)
    wi = jnp.asarray(rng.normal(size=(E, F, 3 * H)) / np.sqrt(F), jnp.float32)
    bi = jnp.asarray(rng.normal(size=(E, 3 * H)) * .1, jnp.float32)
    wh = jnp.asarray(rng.normal(size=(E, H, 3 * H)) / np.sqrt(H), jnp.float32)
    bh = jnp.asarray(rng.normal(size=(E, 3 * H)) * .1, jnp.float32)
    out = jax.vmap(lambda *a: gru_layer_windowed(*a, win, stride))(
        x, h0, wi, bi, wh, bh)
    ref = jnp.stack([
        gru_layer_reference(
            reformat_time_windows(x[e].swapaxes(0, 1), win,
                                  stride).swapaxes(0, 1),
            h0[e], wi[e], bi[e], wh[e], bh[e])
        for e in range(E)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)
