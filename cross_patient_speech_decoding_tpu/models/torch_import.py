"""Reference (Lightning/torch) checkpoint migration.

The reference's training drivers revolve around Lightning checkpoints:
``RealtimeRNNModel.load_from_checkpoint(best)`` for CTC eval
(`/root/reference/aligned_decoding/scripts/train_ctc_rnn.py:204`) and
``trainer.test(ckpt_path='best')`` for seq2seq
(`/root/reference/aligned_decoding/scripts/train_seq2seq.py:187`). A user
switching to this framework brings those ``.ckpt`` files along; this module
maps their torch state dicts onto the flax parameter trees of the
equivalent models here, so trained reference models run (and stream) on
TPU without retraining.

Weight-layout contract (verified against torch's documented layouts and the
gate-order parity tests in tests/test_models.py):

- ``nn.GRU``: ``weight_ih_l{k}[_reverse]`` is (3H, F) with gate rows in
  reset/update/new order — identical gate order to ``FusedGRU``'s column
  blocks, so the map is a transpose; ``bias_ih``/``bias_hh`` stay separate
  (the n-gate needs ``r * (h @ W_hn + b_hn)``).
- ``nn.LSTM``: gate order input/forget/cell/output matches ``FusedLSTM``;
  torch's two biases fold into the single fused ``b = b_ih + b_hh``.
- ``nn.Conv1d`` weight (out, in, k) -> flax ``nn.Conv`` kernel (k, in, out);
  ``nn.Linear`` weight (out, in) -> flax ``nn.Dense`` kernel (in, out);
  ``nn.BatchNorm1d`` weight/bias/running_mean/running_var ->
  scale/bias + batch_stats.

Checkpoints are loaded with ``torch.load(weights_only=False)`` because
Lightning's ``save_hyperparameters`` pickles the hparam dict (the reference
even stores a ``criterion`` module in seq2seq hparams) — only load
checkpoints you trust.
"""

from __future__ import annotations

from typing import Any, Mapping, Tuple

import numpy as np

__all__ = [
    "load_lightning_ckpt",
    "gru_params_from_torch",
    "lstm_params_from_torch",
    "stacked_rnn_params_from_torch",
    "realtime_rnn_from_ckpt",
    "seq2seq_from_ckpt",
    "realtime_rnn_to_state_dict",
]


def _np(t) -> np.ndarray:
    """torch tensor (or array) -> float32/contiguous numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.ascontiguousarray(t)


def load_lightning_ckpt(path) -> Tuple[dict, dict]:
    """Read a Lightning ``.ckpt`` -> (state_dict as numpy, hyper_parameters).

    Handles both full Lightning checkpoints (dict with ``state_dict`` /
    ``hyper_parameters`` keys) and bare ``torch.save``d state dicts.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, Mapping) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
        hparams = dict(ckpt.get("hyper_parameters", {}))
    else:  # bare state dict
        sd, hparams = ckpt, {}
    return {k: _np(v) for k, v in sd.items()}, hparams


def gru_params_from_torch(sd: Mapping[str, np.ndarray], prefix: str,
                          layer: int, reverse: bool = False) -> dict:
    """One torch GRU layer -> FusedGRU params {wi, wh, bi, bh}."""
    sfx = f"l{layer}" + ("_reverse" if reverse else "")
    return {
        "wi": sd[f"{prefix}.weight_ih_{sfx}"].T.copy(),
        "wh": sd[f"{prefix}.weight_hh_{sfx}"].T.copy(),
        "bi": sd[f"{prefix}.bias_ih_{sfx}"].copy(),
        "bh": sd[f"{prefix}.bias_hh_{sfx}"].copy(),
    }


def lstm_params_from_torch(sd: Mapping[str, np.ndarray], prefix: str,
                           layer: int, reverse: bool = False) -> dict:
    """One torch LSTM layer -> FusedLSTM params {wi, wh, b}."""
    sfx = f"l{layer}" + ("_reverse" if reverse else "")
    return {
        "wi": sd[f"{prefix}.weight_ih_{sfx}"].T.copy(),
        "wh": sd[f"{prefix}.weight_hh_{sfx}"].T.copy(),
        "b": (sd[f"{prefix}.bias_ih_{sfx}"]
              + sd[f"{prefix}.bias_hh_{sfx}"]).copy(),
    }


def stacked_rnn_params_from_torch(sd: Mapping[str, np.ndarray], prefix: str,
                                  n_layers: int, bidirectional: bool = False,
                                  cell: str = "gru") -> dict:
    """Torch ``nn.GRU``/``nn.LSTM`` stack -> ``StackedRNN`` param subtree
    ({fwd0, bwd0, fwd1, ...})."""
    per_layer = (gru_params_from_torch if cell == "gru"
                 else lstm_params_from_torch)
    out = {}
    for k in range(n_layers):
        out[f"fwd{k}"] = per_layer(sd, prefix, k, reverse=False)
        if bidirectional:
            out[f"bwd{k}"] = per_layer(sd, prefix, k, reverse=True)
    return out


def _dense_from_torch(sd, weight_key: str, bias_key: str) -> dict:
    return {"kernel": sd[weight_key].T.copy(), "bias": sd[bias_key].copy()}


def _infer_gru_stack(sd: Mapping[str, np.ndarray], prefix: str):
    """(n_layers, bidirectional, cell) from a torch RNN state-dict prefix."""
    n_layers = 0
    while f"{prefix}.weight_ih_l{n_layers}" in sd:
        n_layers += 1
    if n_layers == 0:
        raise KeyError(f"no RNN weights under '{prefix}.' in checkpoint")
    bidirectional = f"{prefix}.weight_ih_l0_reverse" in sd
    gates = sd[f"{prefix}.weight_ih_l0"].shape[0]
    hidden = sd[f"{prefix}.weight_hh_l0"].shape[1]
    cell = "gru" if gates == 3 * hidden else "lstm"
    return n_layers, bidirectional, cell, hidden


def realtime_rnn_from_ckpt(path) -> Tuple[Any, dict]:
    """Reference ``RealtimeRNNModel`` checkpoint -> (RealtimeRNN, variables).

    Reads architecture from the checkpoint's ``save_hyperparameters`` dict
    (falling back to shapes in the state dict), and returns a model plus
    ``{'params': ...}`` ready for ``model.apply(variables, x)`` or the
    streaming simulator. State-dict contract:
    `realtime_sim/realtime_nn_model.py:122-147` (``rnn.rnn.*`` GRU stack,
    trainable ``h0``, ``classifier.fc`` head).
    """
    from cross_patient_speech_decoding_tpu.models.realtime_rnn import (
        RealtimeRNN,
    )

    sd, hp = load_lightning_ckpt(path)
    n_layers, bidir, cell, hidden = _infer_gru_stack(sd, "rnn.rnn")
    if cell != "gru":
        raise ValueError("reference RealtimeRNNModel is GRU-based")
    n_classes = sd["classifier.fc.bias"].shape[0]
    model = RealtimeRNN(
        hidden=int(hp.get("hidden_size", hidden)),
        n_layers=int(hp.get("n_layers", n_layers)),
        n_classes=int(hp.get("n_classes", n_classes)),
        dropout=float(hp.get("dropout", 0.3)),
        win_size=int(hp.get("win_size", 14)),
        stride=int(hp.get("stride", 4)),
        bidirectional=bool(hp.get("bidirectional", bidir)),
        blank=int(hp.get("blank", 0)),
    )
    params = {
        "h0": sd["h0"].copy(),
        "rnn": stacked_rnn_params_from_torch(
            sd, "rnn.rnn", n_layers, bidirectional=bidir, cell="gru"
        ),
        "head": _dense_from_torch(
            sd, "classifier.fc.weight", "classifier.fc.bias"
        ),
    }
    return model, {"params": params}


def seq2seq_from_ckpt(path) -> Tuple[Any, dict]:
    """Reference ``Seq2SeqRNN`` checkpoint -> (Seq2SeqRNN, variables).

    State-dict contract: `nn_models/models.py:235-251` —
    ``temporal_conv.{conv,bn}``, ``encoder.rnn`` (bidirectional stack,
    fwd+bwd last hidden summed), ``decoder.{embedding,rnn,fc_out}``.
    Returns ``{'params': ..., 'batch_stats': ...}`` (running BN statistics
    transfer, so eval-mode outputs match the torch model's).
    """
    from cross_patient_speech_decoding_tpu.models.seq2seq import Seq2SeqRNN

    sd, hp = load_lightning_ckpt(path)
    n_enc, enc_bidir, cell, hidden = _infer_gru_stack(sd, "encoder.rnn")
    if not enc_bidir:
        raise ValueError("reference Seq2SeqRNN encoder is bidirectional")
    n_dec, _, _, _ = _infer_gru_stack(sd, "decoder.rnn")
    conv_w = sd["temporal_conv.conv.weight"]  # (out, in, k)
    n_filters, _in_ch, kernel_size = conv_w.shape
    num_classes = sd["decoder.fc_out.bias"].shape[0]

    if int(hp.get("padding", 0)) != 0:
        raise ValueError(
            "nonzero conv padding is not used by the reference drivers and "
            "is not supported by the importer"
        )
    model = Seq2SeqRNN(
        n_filters=int(hp.get("n_filters", n_filters)),
        hidden=int(hp.get("hidden_size", hidden)),
        num_classes=int(hp.get("num_classes", num_classes)),
        n_enc_layers=int(hp.get("n_enc_layers", n_enc)),
        n_dec_layers=int(hp.get("n_dec_layers", n_dec)),
        kernel_size=int(hp.get("kernel_size", kernel_size)),
        stride=int(hp.get("stride", 1)),
        cnn_dropout=float(hp.get("cnn_dropout", 0.3)),
        rnn_dropout=float(hp.get("rnn_dropout", 0.3)),
        cell=str(hp.get("model_type", cell)),
        seq_length=int(hp.get("seq_length", 3)),
        activation=bool(hp.get("activation", True)),
    )
    params = {
        "TemporalConv_0": {
            "Conv_0": {
                "kernel": conv_w.transpose(2, 1, 0).copy(),
                "bias": sd["temporal_conv.conv.bias"].copy(),
            },
            "BatchNorm_0": {
                "scale": sd["temporal_conv.bn.weight"].copy(),
                "bias": sd["temporal_conv.bn.bias"].copy(),
            },
        },
        "EncoderRNN_0": {
            "StackedRNN_0": stacked_rnn_params_from_torch(
                sd, "encoder.rnn", n_enc, bidirectional=True, cell=cell
            ),
        },
        "DecoderRNN_0": {
            "embed": {"embedding": sd["decoder.embedding.weight"].copy()},
            "rnn": stacked_rnn_params_from_torch(
                sd, "decoder.rnn", n_dec, bidirectional=False, cell=cell
            ),
            "head": _dense_from_torch(
                sd, "decoder.fc_out.weight", "decoder.fc_out.bias"
            ),
        },
    }
    batch_stats = {
        "TemporalConv_0": {
            "BatchNorm_0": {
                "mean": sd["temporal_conv.bn.running_mean"].copy(),
                "var": sd["temporal_conv.bn.running_var"].copy(),
            },
        },
    }
    return model, {"params": params, "batch_stats": batch_stats}


def realtime_rnn_to_state_dict(variables: Mapping) -> dict:
    """Inverse map: flax RealtimeRNN variables -> torch-layout state dict
    (numpy values, ``rnn.rnn.*`` / ``classifier.fc.*`` keys), so TPU-trained
    streaming models can be handed back to reference tooling."""
    p = variables["params"]
    sd = {"h0": np.asarray(p["h0"])}
    for name, lp in p["rnn"].items():
        reverse = name.startswith("bwd")
        layer = int(name[3:])
        sfx = f"l{layer}" + ("_reverse" if reverse else "")
        sd[f"rnn.rnn.weight_ih_{sfx}"] = np.asarray(lp["wi"]).T.copy()
        sd[f"rnn.rnn.weight_hh_{sfx}"] = np.asarray(lp["wh"]).T.copy()
        sd[f"rnn.rnn.bias_ih_{sfx}"] = np.asarray(lp["bi"]).copy()
        sd[f"rnn.rnn.bias_hh_{sfx}"] = np.asarray(lp["bh"]).copy()
    sd["classifier.fc.weight"] = np.asarray(p["head"]["kernel"]).T.copy()
    sd["classifier.fc.bias"] = np.asarray(p["head"]["bias"]).copy()
    return sd
