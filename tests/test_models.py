"""Model-layer parity tests against torch CPU oracles (GRU math, window
reformat, CTC loss) plus shape/jit smoke tests for each model family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cross_patient_speech_decoding_tpu.models import (
    FusedGRU,
    RealtimeRNN,
    Seq2SeqRNN,
    SimpleGRU,
    TCNClassifier,
    TransformerClassifier,
    CNNTransformer,
    TemporalConvRNN,
    reformat_time_windows,
    adjusted_input_lengths,
)
from cross_patient_speech_decoding_tpu.ops.ctc import (
    ctc_loss_mean,
    greedy_decode,
    prefix_beam_search,
)


def test_fused_gru_matches_torch():
    B, T, F, H = 3, 7, 5, 4
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, F)).astype(np.float32)

    tg = torch.nn.GRU(F, H, batch_first=True)
    mod = FusedGRU(hidden=H, precision=jax.lax.Precision.HIGHEST)
    params = mod.init(jax.random.key(0), jnp.asarray(x))
    # copy torch weights into our layout: torch weight_ih_l0 (3H, F) rows
    # ordered [r, z, n]; ours wi (F, 3H)
    p = dict(params["params"])
    p["wi"] = jnp.asarray(tg.weight_ih_l0.detach().numpy().T)
    p["wh"] = jnp.asarray(tg.weight_hh_l0.detach().numpy().T)
    p["bi"] = jnp.asarray(tg.bias_ih_l0.detach().numpy())
    p["bh"] = jnp.asarray(tg.bias_hh_l0.detach().numpy())

    ours, h_last = mod.apply({"params": p}, jnp.asarray(x))
    theirs, h_t = tg(torch.from_numpy(x))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.detach().numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(h_last), h_t.detach().numpy()[0], atol=1e-4
    )


def test_reformat_time_windows_matches_torch_unfold():
    B, T, C, win, stride = 2, 30, 3, 14, 4
    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, T, C)).astype(np.float32)

    got = np.asarray(reformat_time_windows(jnp.asarray(x), win, stride))

    xt = torch.from_numpy(x).permute(0, 2, 1).unsqueeze(2)
    xu = xt.unfold(3, win, stride).squeeze(2).permute(0, 2, 3, 1)
    want = xu.reshape(B, xu.shape[1], win * C).numpy()
    np.testing.assert_allclose(got, want, atol=0)
    assert got.shape[1] == (T - win) // stride + 1
    np.testing.assert_array_equal(
        np.asarray(adjusted_input_lengths(jnp.asarray([T]), win, stride)),
        [(T - win) // stride + 1],
    )


def test_ctc_loss_matches_torch():
    B, T, V, L = 4, 20, 6, 3
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    labels = rng.integers(1, V, size=(B, L))
    input_lens = np.array([20, 18, 15, 20])
    label_lens = np.array([3, 2, 3, 1])
    labels_masked = labels * (np.arange(L)[None, :] < label_lens[:, None])

    got = float(
        ctc_loss_mean(
            jnp.asarray(logits),
            jnp.asarray(input_lens),
            jnp.asarray(labels_masked),
            jnp.asarray(label_lens),
        )
    )

    lp = torch.from_numpy(logits).log_softmax(2).permute(1, 0, 2)
    crit = torch.nn.CTCLoss(blank=0, zero_infinity=True)
    want = crit(
        lp,
        torch.from_numpy(labels_masked),
        torch.from_numpy(input_lens),
        torch.from_numpy(label_lens),
    ).item()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_greedy_decode_collapses():
    # path: [0 1 1 0 2 2 2 0 1] -> [1 2 1]
    V = 4
    path = np.array([0, 1, 1, 0, 2, 2, 2, 0, 1])
    lp = np.full((1, len(path), V), -10.0, np.float32)
    lp[0, np.arange(len(path)), path] = 0.0
    dec, lens = greedy_decode(jnp.asarray(lp))
    assert int(lens[0]) == 3
    np.testing.assert_array_equal(np.asarray(dec[0, :3]), [1, 2, 1])


def test_prefix_beam_search_agrees_with_greedy_on_peaked():
    rng = np.random.default_rng(3)
    T, V = 12, 5
    logp = np.log(
        np.full((T, V), 0.01) + np.eye(V)[rng.integers(0, V, T)] * 0.9
    )
    logp -= np.log(np.exp(logp).sum(1, keepdims=True))
    best, nll = prefix_beam_search(logp, beam_size=25)
    dec, lens = greedy_decode(jnp.asarray(logp[None]))
    np.testing.assert_array_equal(
        np.asarray(dec[0, : int(lens[0])]), list(best)
    )
    assert np.isfinite(nll)


@pytest.mark.parametrize(
    "model,kwargs",
    [
        (SimpleGRU, dict(hidden=8, num_classes=5)),
        (TemporalConvRNN, dict(n_filters=6, hidden=8, num_classes=5)),
        (TCNClassifier, dict(n_filters=6, num_classes=5)),
        (TransformerClassifier, dict(d_model=8, num_classes=5, n_heads=2)),
        (CNNTransformer, dict(n_filters=8, num_classes=5, n_heads=2)),
    ],
)
def test_classifier_models_smoke(model, kwargs):
    m = model(**kwargs)
    x = jnp.ones((2, 24, 7))
    params = m.init(jax.random.key(0), x)
    out = jax.jit(lambda p, x: m.apply(p, x))(params, x)
    assert out.shape == (2, 5)
    assert np.all(np.isfinite(np.asarray(out)))


def test_seq2seq_shapes_and_teacher_forcing():
    m = Seq2SeqRNN(n_filters=6, hidden=8, num_classes=5, kernel_size=4)
    x = jnp.ones((3, 20, 7))
    y = jnp.zeros((3, 3), jnp.int32)
    params = m.init(
        {"params": jax.random.key(0), "tf": jax.random.key(1)}, x, y, 0.5
    )
    # train mode w/ teacher forcing (BatchNorm stats are mutable in train)
    out, _ = m.apply(
        params, x, y, 0.5, False,
        rngs={"tf": jax.random.key(2), "dropout": jax.random.key(3)},
        mutable=["batch_stats"],
    )
    assert out.shape == (3, 3, 5)
    # eval mode, no teacher forcing, no rngs needed
    out2 = m.apply(params, x, None, 0.0, True)
    assert out2.shape == (3, 3, 5)


def test_realtime_rnn_forward_and_windows():
    m = RealtimeRNN(hidden=16, n_layers=2, n_classes=11)
    x = jnp.ones((2, 60, 9))
    params = m.init(jax.random.key(0), x)
    logits = jax.jit(lambda p, x: m.apply(p, x))(params, x)
    n_win = (60 - 14) // 4 + 1
    assert logits.shape == (2, n_win, 11)
    # blank-bias init: blank logit should dominate at start of training
    mean_logits = np.asarray(logits).mean(axis=(0, 1))
    assert mean_logits[0] > mean_logits[1:].max()


def test_stacked_rnn_fused_bidir_wiring(monkeypatch):
    """The fused-bidirectional StackedRNN path (forced on via the
    dispatch hooks, interpret-mode kernels) matches the two-cell path
    exactly — same param tree, same outputs/lasts."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cross_patient_speech_decoding_tpu.models.layers import StackedRNN
    from cross_patient_speech_decoding_tpu.ops import pallas_gru

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(6, 12, 10)) * 0.5, jnp.float32)
    mod = StackedRNN(hidden=16, n_layers=2, bidirectional=True)
    variables = mod.init(jax.random.key(0), x)
    out_ref, lasts_ref = mod.apply(variables, x)

    monkeypatch.setattr(pallas_gru, "enabled", lambda: True)
    monkeypatch.setattr(pallas_gru, "MIN_BT", 1)
    monkeypatch.setattr(pallas_gru, "MIN_SEQ_T", 1)
    # the branch under test is additionally gated on BIDIR_FUSED
    # (defaulted off after the round-3 measurement); without this the
    # test would compare the per-direction path against itself
    monkeypatch.setattr(pallas_gru, "BIDIR_FUSED", True)
    # identical param tree: init under the fused path must match
    v2 = mod.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(
        variables
    )
    out_fused, lasts_fused = mod.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(lasts_fused),
                               np.asarray(lasts_ref), atol=2e-6)


def test_greedy_decode_interleaved_frame_mask():
    """Repeat collapse with a non-contiguous frame mask compares against
    the last VALID frame: decoding must equal greedy decode of the valid
    subsequence."""
    from cross_patient_speech_decoding_tpu.ops.ctc import greedy_decode

    def lp(path, V=4):
        out = np.full((1, len(path), V), -5.0, np.float32)
        for t, s in enumerate(path):
            out[0, t, s] = 0.0
        return jnp.asarray(out)

    # [a, b(masked), a] -> valid frames a,a -> ONE 'a'
    dec, n = greedy_decode(lp([1, 2, 1]), frame_mask=jnp.asarray([[1., 0., 1.]]))
    assert int(n[0]) == 1 and int(dec[0, 0]) == 1
    # [a, a(masked), a] -> also one 'a'
    dec, n = greedy_decode(lp([1, 1, 1]), frame_mask=jnp.asarray([[1., 0., 1.]]))
    assert int(n[0]) == 1 and int(dec[0, 0]) == 1
    # [a, blank(valid), a] -> 'a a' (blank splits the repeat)
    dec, n = greedy_decode(lp([1, 0, 1]), frame_mask=jnp.asarray([[1., 1., 1.]]))
    assert int(n[0]) == 2 and list(np.asarray(dec[0, :2])) == [1, 1]
    # suffix padding unchanged: [a, b, pad] -> 'a b'
    dec, n = greedy_decode(lp([1, 2, 3]), frame_mask=jnp.asarray([[1., 1., 0.]]))
    assert int(n[0]) == 2 and list(np.asarray(dec[0, :2])) == [1, 2]
