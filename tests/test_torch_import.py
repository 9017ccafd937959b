"""Reference-checkpoint migration tests (models/torch_import.py).

Builds torch modules with the reference's state-dict key layout
(`realtime_sim/realtime_nn_model.py:122-147`, `nn_models/models.py:235-251`),
saves fake Lightning checkpoints, imports them into flax variables, and pins
forward parity against the torch modules themselves.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
from torch import nn as tnn

from cross_patient_speech_decoding_tpu.models.layers import FusedLSTM
from cross_patient_speech_decoding_tpu.models.realtime_rnn import (
    reformat_time_windows,
)
from cross_patient_speech_decoding_tpu.models.torch_import import (
    load_lightning_ckpt,
    lstm_params_from_torch,
    realtime_rnn_from_ckpt,
    realtime_rnn_to_state_dict,
    seq2seq_from_ckpt,
)


def _save_ckpt(tmp_path, name, sd, hparams):
    path = tmp_path / name
    torch.save(
        {"state_dict": sd, "hyper_parameters": hparams, "epoch": 3}, path
    )
    return path


@pytest.mark.parametrize("bidir", [False, True])
def test_realtime_rnn_import_forward_parity(tmp_path, bidir):
    torch.manual_seed(0)
    C, win, stride, H, L, K, B, T = 3, 6, 2, 8, 2, 5, 4, 20
    n_dir = 2 if bidir else 1
    gru = tnn.GRU(win * C, H, num_layers=L, batch_first=True,
                  bidirectional=bidir)
    head = tnn.Linear(H * n_dir, K)
    h0 = torch.randn(L * n_dir, 1, H)
    sd = {f"rnn.rnn.{k}": v for k, v in gru.state_dict().items()}
    sd["h0"] = h0
    sd.update({f"classifier.fc.{k}": v for k, v in head.state_dict().items()})
    hp = dict(input_size=win * C, hidden_size=H, n_layers=L, n_classes=K,
              dropout=0.3, win_size=win, stride=stride, bidirectional=bidir,
              learning_rate=1e-3, decay_steps=100, weight_decay=1e-5, blank=0)
    path = _save_ckpt(tmp_path, "rt.ckpt", sd, hp)

    model, variables = realtime_rnn_from_ckpt(path)
    assert model.win_size == win and model.stride == stride
    assert model.bidirectional == bidir

    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))

    # torch oracle on the same windows (reformat==unfold is pinned in
    # test_models); h0 expanded across the batch like the reference forward
    xw = np.asarray(reformat_time_windows(jnp.asarray(x), win, stride))
    with torch.no_grad():
        out, _ = gru(torch.from_numpy(xw), h0.expand(-1, B, -1).contiguous())
        theirs = head(out).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_realtime_rnn_state_dict_round_trip(tmp_path):
    torch.manual_seed(1)
    C, win, H, L, K = 2, 4, 6, 3, 5
    gru = tnn.GRU(win * C, H, num_layers=L, batch_first=True)
    head = tnn.Linear(H, K)
    sd = {f"rnn.rnn.{k}": v for k, v in gru.state_dict().items()}
    sd["h0"] = torch.randn(L, 1, H)
    sd.update({f"classifier.fc.{k}": v for k, v in head.state_dict().items()})
    path = _save_ckpt(tmp_path, "rt.ckpt", sd, dict(win_size=win, stride=2))

    _, variables = realtime_rnn_from_ckpt(path)
    back = realtime_rnn_to_state_dict(variables)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k].numpy())


def test_seq2seq_import_forward_parity(tmp_path):
    torch.manual_seed(2)
    C, F, ker, H, K = 3, 6, 4, 8, 5
    n_enc, n_dec, T, B, seq_len = 2, 2, 30, 4, 3
    conv = tnn.Conv1d(C, F, ker)
    bn = tnn.BatchNorm1d(F)
    with torch.no_grad():
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.normal_()
        bn.bias.normal_()
    enc = tnn.GRU(F, H, n_enc, batch_first=True, bidirectional=True)
    emb = tnn.Embedding(K + 1, H)
    dec = tnn.GRU(H, H, n_dec, batch_first=True)
    fc = tnn.Linear(H, K)
    sd = {}
    for prefix, mod in [("temporal_conv.conv", conv), ("temporal_conv.bn", bn),
                        ("encoder.rnn", enc), ("decoder.embedding", emb),
                        ("decoder.rnn", dec), ("decoder.fc_out", fc)]:
        sd.update({f"{prefix}.{k}": v for k, v in mod.state_dict().items()})
    hp = dict(in_channels=C, n_filters=F, hidden_size=H, num_classes=K,
              n_enc_layers=n_enc, n_dec_layers=n_dec, kernel_size=ker,
              stride=1, padding=0, cnn_dropout=0.3, rnn_dropout=0.3,
              model_type="gru", learning_rate=1e-3, l2_reg=1e-5,
              seq_length=seq_len)
    path = _save_ckpt(tmp_path, "s2s.ckpt", sd, hp)

    model, variables = seq2seq_from_ckpt(path)
    assert set(variables) == {"params", "batch_stats"}

    rng = np.random.default_rng(3)
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x),
                                  deterministic=True))

    # torch oracle: eval-mode conv/BN/relu -> bidir encoder, last-layer
    # fwd+bwd hidden sum -> greedy autoregressive decode (no teacher
    # forcing), mirroring models.py:253-303
    with torch.no_grad():
        bn.eval()
        h = torch.relu(bn(conv(torch.from_numpy(x).permute(0, 2, 1))))
        h = h.permute(0, 2, 1)
        _, hid = enc(h)
        hid = hid.view(n_enc, 2, B, H)
        dh = (hid[-1, 0] + hid[-1, 1]).unsqueeze(0).repeat(n_dec, 1, 1)
        tok = torch.full((B,), K, dtype=torch.long)
        outs = []
        for _ in range(seq_len):
            o, dh = dec(emb(tok).unsqueeze(1), dh)
            logit = fc(o[:, 0])
            outs.append(logit)
            tok = logit.argmax(1)
        theirs = torch.stack(outs, 1).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_lstm_layer_params_from_torch():
    """FusedLSTM gate order matches torch (input/forget/cell/output) and the
    fused bias equals b_ih + b_hh."""
    torch.manual_seed(3)
    F, H, B, T = 4, 6, 3, 7
    lstm = tnn.LSTM(F, H, 1, batch_first=True)
    sd = {f"rnn.{k}": v.numpy() for k, v in lstm.state_dict().items()}
    params = lstm_params_from_torch(sd, "rnn", 0)

    x = np.random.default_rng(4).standard_normal((B, T, F)).astype(np.float32)
    ours, (h_last, c_last) = FusedLSTM(H).apply(
        {"params": params}, jnp.asarray(x)
    )
    with torch.no_grad():
        theirs, (ht, ct) = lstm(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_last), ht[0].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_last), ct[0].numpy(), atol=2e-5)


def test_bare_state_dict_load(tmp_path):
    torch.manual_seed(4)
    gru = tnn.GRU(8, 4, 1, batch_first=True)
    path = tmp_path / "bare.pt"
    torch.save({f"rnn.rnn.{k}": v for k, v in gru.state_dict().items()}, path)
    sd, hp = load_lightning_ckpt(path)
    assert hp == {}
    assert "rnn.rnn.weight_ih_l0" in sd
    assert sd["rnn.rnn.weight_ih_l0"].shape == (12, 8)


def test_realtime_sim_streams_imported_ckpt(tmp_path):
    """cpsd realtime-sim ckpt=... streams a reference-trained model: the
    driver derives the architecture from the checkpoint."""
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        run_realtime_sim,
    )
    from cross_patient_speech_decoding_tpu.utils.config import (
        RealtimeSimConfig,
    )

    torch.manual_seed(5)
    C, win, H, L, K = 8, 14, 16, 1, 11
    gru = tnn.GRU(win * C, H, num_layers=L, batch_first=True)
    head = tnn.Linear(H, K)
    sd = {f"rnn.rnn.{k}": v for k, v in gru.state_dict().items()}
    sd["h0"] = torch.randn(L, 1, H)
    sd.update({f"classifier.fc.{k}": v for k, v in head.state_dict().items()})
    hp = dict(input_size=win * C, hidden_size=H, n_layers=L, n_classes=K,
              win_size=win, stride=4, bidirectional=False, blank=0)
    path = _save_ckpt(tmp_path, "rt.ckpt", sd, hp)

    res = run_realtime_sim(
        RealtimeSimConfig(n_bins=40, ckpt=str(path)), verbose=False
    )
    assert np.isfinite(res["amortized_ms"])


def test_train_ctc_warm_start_from_ckpt(tmp_path):
    """train-ctc init_ckpt=...: fine-tunes a reference checkpoint (arch from
    the checkpoint, per-iteration warm start) and rejects width mismatches."""
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        run_train_ctc,
    )
    from cross_patient_speech_decoding_tpu.utils.config import TrainCTCConfig

    def make_ckpt(name, in_size, H=16, L=1, K=11, win=14, stride=4):
        torch.manual_seed(6)
        gru = tnn.GRU(in_size, H, num_layers=L, batch_first=True)
        head = tnn.Linear(H, K)
        sd = {f"rnn.rnn.{k}": v for k, v in gru.state_dict().items()}
        sd["h0"] = torch.randn(L, 1, H)
        sd.update(
            {f"classifier.fc.{k}": v for k, v in head.state_dict().items()}
        )
        hp = dict(input_size=in_size, hidden_size=H, n_layers=L, n_classes=K,
                  win_size=win, stride=stride, bidirectional=False, blank=0)
        return _save_ckpt(tmp_path, name, sd, hp)

    # synthetic target patient has 64 channels -> input width 14*64
    good = make_ckpt("good.ckpt", 14 * 64)
    cfg = TrainCTCConfig(context="patient", n_iter=1, epochs=2,
                         init_ckpt=str(good), out="", log_metrics=False)
    pers = run_train_ctc(cfg, verbose=False)
    assert len(pers) == 1 and np.isfinite(pers[0])
    assert cfg.hidden == 16 and cfg.n_layers == 1  # arch from ckpt

    bad = make_ckpt("bad.ckpt", 14 * 32)
    with pytest.raises(ValueError, match="input width"):
        run_train_ctc(
            TrainCTCConfig(context="patient", n_iter=1, epochs=2,
                           init_ckpt=str(bad), out="", log_metrics=False),
            verbose=False,
        )

    wrong_k = make_ckpt("wrongk.ckpt", 14 * 64, K=9)
    with pytest.raises(ValueError, match="classes"):
        run_train_ctc(
            TrainCTCConfig(context="patient", n_iter=1,
                           init_ckpt=str(wrong_k), out=""),
            verbose=False,
        )


def test_stacked_lstm_carries_cell_state():
    """StackedRNN LSTM round-trips (h, c): splitting a sequence and
    passing the carry equals one full pass (pre-fix, c was zero-reset at
    the split and this failed)."""
    from cross_patient_speech_decoding_tpu.models.layers import StackedRNN
    from cross_patient_speech_decoding_tpu.models.torch_import import (
        stacked_rnn_params_from_torch,
    )

    torch.manual_seed(7)
    F, H, L, B, T = 5, 6, 2, 3, 12
    lstm = tnn.LSTM(F, H, L, batch_first=True)
    sd = {f"r.{k}": v.numpy() for k, v in lstm.state_dict().items()}
    params = {"params": stacked_rnn_params_from_torch(sd, "r", L, cell="lstm")}
    model = StackedRNN(H, L, cell="lstm")

    x = np.random.default_rng(10).standard_normal((B, T, F)).astype(np.float32)
    full, (h_full, c_full) = model.apply(params, jnp.asarray(x))

    o1, carry = model.apply(params, jnp.asarray(x[:, :7]))
    o2, (h2, c2) = model.apply(params, jnp.asarray(x[:, 7:]), carry)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(o1), np.asarray(o2)], 1),
        np.asarray(full), atol=2e-5,
    )
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h_full), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c_full), atol=2e-5)

    with torch.no_grad():
        theirs, (ht, ct) = lstm(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(full), theirs.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_full), ht.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_full), ct.numpy(), atol=2e-5)


def test_seq2seq_lstm_import_forward_parity(tmp_path):
    """LSTM seq2seq checkpoints import and decode with the full (h, c)
    carry — the reference's intended LSTM path (its own crashes on
    `enc_hidden.repeat` over the state tuple, models.py:280)."""
    torch.manual_seed(8)
    C, F, ker, H, K = 3, 6, 4, 8, 5
    n_enc, n_dec, T, B, seq_len = 2, 2, 24, 4, 3
    conv = tnn.Conv1d(C, F, ker)
    bn = tnn.BatchNorm1d(F)
    with torch.no_grad():
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
    enc = tnn.LSTM(F, H, n_enc, batch_first=True, bidirectional=True)
    emb = tnn.Embedding(K + 1, H)
    dec = tnn.LSTM(H, H, n_dec, batch_first=True)
    fc = tnn.Linear(H, K)
    sd = {}
    for prefix, mod in [("temporal_conv.conv", conv), ("temporal_conv.bn", bn),
                        ("encoder.rnn", enc), ("decoder.embedding", emb),
                        ("decoder.rnn", dec), ("decoder.fc_out", fc)]:
        sd.update({f"{prefix}.{k}": v for k, v in mod.state_dict().items()})
    hp = dict(in_channels=C, n_filters=F, hidden_size=H, num_classes=K,
              n_enc_layers=n_enc, n_dec_layers=n_dec, kernel_size=ker,
              model_type="lstm", seq_length=seq_len)
    path = _save_ckpt(tmp_path, "s2s_lstm.ckpt", sd, hp)

    model, variables = seq2seq_from_ckpt(path)
    assert model.cell == "lstm"
    rng = np.random.default_rng(13)
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x),
                                  deterministic=True))

    with torch.no_grad():
        bn.eval()
        h = torch.relu(bn(conv(torch.from_numpy(x).permute(0, 2, 1))))
        _, (hn, cn) = enc(h.permute(0, 2, 1))
        hn = hn.view(n_enc, 2, B, H)
        cn = cn.view(n_enc, 2, B, H)
        dh = (hn[-1, 0] + hn[-1, 1]).unsqueeze(0).repeat(n_dec, 1, 1)
        dc = (cn[-1, 0] + cn[-1, 1]).unsqueeze(0).repeat(n_dec, 1, 1)
        tok = torch.full((B,), K, dtype=torch.long)
        outs = []
        for _ in range(seq_len):
            o, (dh, dc) = dec(emb(tok).unsqueeze(1), (dh, dc))
            logit = fc(o[:, 0])
            outs.append(logit)
            tok = logit.argmax(1)
        theirs = torch.stack(outs, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)
