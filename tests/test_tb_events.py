"""Tests for the live-log writers: the self-contained TensorBoard event
encoder (utils/tb_events.py) and the csv/jsonl/tb dispatch in
train.loops.append_metrics."""

import json
import struct

import numpy as np
import pytest

from cross_patient_speech_decoding_tpu.utils import tb_events
from cross_patient_speech_decoding_tpu.utils.tb_events import (
    TBEventWriter,
    _crc32c,
    _masked_crc,
    _varint,
)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC-32C (Castagnoli)
    assert _crc32c(b"") == 0x00000000
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_varint_roundtrip():
    def dec(b):
        n = shift = 0
        for i, byte in enumerate(b):
            n |= (byte & 0x7F) << shift
            shift += 7
            if not byte & 0x80:
                return n, i + 1

    for v in (0, 1, 127, 128, 300, 2**32, 2**60):
        n, used = dec(_varint(v))
        assert n == v and used == len(_varint(v))


def _read_records(path):
    """Parse the TFRecord framing back, verifying both CRCs."""
    out = []
    data = open(path, "rb").read()
    i = 0
    while i < len(data):
        (ln,) = struct.unpack("<Q", data[i : i + 8])
        (crc_len,) = struct.unpack("<I", data[i + 8 : i + 12])
        assert crc_len == _masked_crc(data[i : i + 8])
        payload = data[i + 12 : i + 12 + ln]
        (crc_pay,) = struct.unpack("<I", data[i + 12 + ln : i + 16 + ln])
        assert crc_pay == _masked_crc(payload)
        out.append(payload)
        i += 16 + ln
    return out


def test_event_file_structure_and_tensorboard_readback(tmp_path):
    w = TBEventWriter(str(tmp_path / "run"))
    w.add_scalars(0, {"loss": 1.5, "per": 88.0})
    w.add_scalars(5, {"loss": 0.5, "per": 42.0})
    recs = _read_records(w.path)
    assert len(recs) == 3  # file_version + 2 scalar events
    assert b"brain.Event:2" in recs[0]
    assert b"loss" in recs[1] and b"per" in recs[1]

    # gold-standard check: TensorBoard's own reader parses the file
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(tmp_path / "run"))
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert tags == {"loss", "per"}
    loss = acc.Scalars("loss")
    assert [e.step for e in loss] == [0, 5]
    np.testing.assert_allclose([e.value for e in loss], [1.5, 0.5])


def test_append_metrics_formats(tmp_path):
    from cross_patient_speech_decoding_tpu.train.loops import append_metrics

    rec = {"epoch": 3, "loss": 0.25, "acc": 0.9}
    append_metrics(str(tmp_path / "m.csv"), rec, "csv")
    append_metrics(str(tmp_path / "m.csv"), {**rec, "epoch": 4}, "csv")
    lines = (tmp_path / "m.csv").read_text().strip().splitlines()
    assert len(lines) == 3 and lines[0].startswith("epoch")

    append_metrics(str(tmp_path / "m.jsonl"), rec, "jsonl")
    append_metrics(str(tmp_path / "m.jsonl"), {**rec, "epoch": 4}, "jsonl")
    rows = [json.loads(l) for l in
            (tmp_path / "m.jsonl").read_text().splitlines()]
    assert rows[0]["loss"] == 0.25 and rows[1]["epoch"] == 4

    append_metrics(str(tmp_path / "tbrun"), rec, "tb")
    files = list((tmp_path / "tbrun").glob("events.out.tfevents.*"))
    assert len(files) == 1

    with pytest.raises(ValueError):
        append_metrics(str(tmp_path / "x"), rec, "nope")


def test_run_log_path_formats(tmp_path):
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        _run_log_path,
    )

    out = str(tmp_path / "r.pkl")
    assert _run_log_path(out, "S14_aligned_ctcRnn", 2, 3).endswith(
        "logs/S14_aligned_ctcRnn/iter002_fold03.csv")
    assert _run_log_path(out, "run", 0, fmt="jsonl").endswith(
        "logs/run/iter000.jsonl")
    p = _run_log_path(out, "run", 1, fmt="tb")
    assert p.endswith("logs/run/iter001") and "." not in p.rsplit("/", 1)[-1]


def test_fit_writes_configured_format(tmp_path):
    """End-to-end: a tiny fit() run emits a tailable jsonl stream and a
    TB run directory."""
    import jax
    import jax.numpy as jnp
    import optax

    from cross_patient_speech_decoding_tpu.train.loops import fit
    from flax.training import train_state as ts

    params = {"w": jnp.zeros((3,))}
    state = ts.TrainState.create(
        apply_fn=None, params=params, tx=optax.sgd(0.1))

    def train_step(state, batch, key):
        def loss_fn(p):
            return jnp.mean((batch[0] @ p["w"] - batch[1]) ** 2)

        g = jax.grad(loss_fn)(state.params)
        return state.apply_gradients(grads=g), {"loss": loss_fn(state.params)}

    def eval_step(state, batch):
        return {"loss": jnp.mean((batch[0] @ state.params["w"] - batch[1]) ** 2)}

    X = jnp.asarray(np.random.default_rng(0).normal(size=(16, 3)),
                    jnp.float32)
    y = X @ jnp.asarray([1.0, -1.0, 0.5])
    for fmt, check in (
        ("jsonl", lambda p: len(p.read_text().splitlines()) == 4),
        ("tb", lambda p: len(list(p.glob("events.out.tfevents.*"))) == 1),
    ):
        target = tmp_path / f"log_{fmt}"
        fit(state, train_step, eval_step, (X, y), (X, y), epochs=4,
            key=jax.random.key(0), log_path=str(target), log_format=fmt)
        assert check(target), fmt


def test_varint_negative_is_twos_complement_not_hang():
    # protobuf int64: -1 encodes as ten 0xFF-led bytes, not an infinite loop
    b = _varint(-1)
    assert len(b) == 10 and b[-1] == 0x01


def test_run_log_path_tb_clears_stale_event_files(tmp_path):
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        _run_log_path,
    )

    out = str(tmp_path / "r.pkl")
    d = _run_log_path(out, "run", 0, fmt="tb")
    stale = __import__("pathlib").Path(d)
    stale.mkdir(parents=True)
    (stale / "events.out.tfevents.123.host").write_bytes(b"old")
    d2 = _run_log_path(out, "run", 0, fmt="tb")
    assert d2 == d
    assert not list(stale.glob("events.out.tfevents.*"))
