"""Training loops: metric improves, best-state tracking works, Orbax
checkpoint round-trips, optimizer schedule matches torch LinearLR."""

import jax
import jax.numpy as jnp
import numpy as np

from cross_patient_speech_decoding_tpu.models import RealtimeRNN, SimpleGRU
from cross_patient_speech_decoding_tpu.train import (
    create_train_state,
    make_ctc_eval_step,
    make_ctc_train_step,
)
from cross_patient_speech_decoding_tpu.train.loops import (
    FitResult,
    fit,
    load_checkpoint,
    make_optimizer,
    save_checkpoint,
)


def _ctc_batch(seed, n=24, T=40, C=5, V=5, L=2):
    rng = np.random.default_rng(seed)
    y = rng.integers(1, V, (n, L))
    x = rng.normal(size=(n, T, C)).astype(np.float32) * 0.1
    for i in range(n):
        x[i, : T // 2] += y[i, 0] * 0.5
        x[i, T // 2 :] += y[i, 1] * 0.5
    return (
        jnp.asarray(x),
        jnp.asarray(y, jnp.int32),
        jnp.full((n,), T, jnp.int32),
        jnp.full((n,), L, jnp.int32),
    )


def test_fit_tracks_best_and_improves():
    model = RealtimeRNN(hidden=16, n_layers=1, n_classes=5, dropout=0.0,
                        win_size=8, stride=4)
    train = _ctc_batch(0)
    val = _ctc_batch(1, n=12)
    tx = make_optimizer(5e-3, 1e-5, decay_steps=300)
    variables = model.init(jax.random.key(0), train[0][:1])
    state = create_train_state(model, variables, tx)
    res = fit(
        state,
        make_ctc_train_step(model, tx),
        make_ctc_eval_step(model),
        train, val,
        epochs=250, key=jax.random.key(1),
        monitor="per", mode="min", eval_every=25,
    )
    assert isinstance(res, FitResult)
    assert res.best_metric < 95.0  # learned something vs all-blank 100
    assert res.best_epoch >= 0
    pers = [h["per"] for h in res.history]
    assert min(pers) == res.best_metric


def test_checkpoint_roundtrip(tmp_path):
    model = SimpleGRU(hidden=8, num_classes=3)
    x = jnp.ones((2, 10, 4))
    variables = model.init(jax.random.key(0), x)
    tx = make_optimizer(1e-3, 1e-5, 10)
    state = create_train_state(model, variables, tx)

    path = tmp_path / "ckpt"
    save_checkpoint(str(path), state, metadata={"fold": 3})
    restored = load_checkpoint(str(path), state)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    import json

    meta = json.loads((tmp_path / "ckpt.meta.json").read_text())
    assert meta == {"fold": 3}


def test_linear_decay_schedule_matches_torch_semantics():
    """optax.linear_schedule == torch LinearLR(start=1, end=f, iters=N)."""
    import optax

    lr, N, f = 1e-3, 10, 0.01
    sched = optax.linear_schedule(lr, lr * f, N)
    for step in range(N + 3):
        frac = min(step / N, 1.0)
        want = lr * (1 + (f - 1) * frac)
        np.testing.assert_allclose(float(sched(step)), want, rtol=1e-6)


def test_fit_csv_logging(tmp_path):
    model = RealtimeRNN(hidden=8, n_layers=1, n_classes=4, dropout=0.0,
                        win_size=8, stride=4)
    train = _ctc_batch(2, n=8, V=4)
    tx = make_optimizer(1e-3, 1e-5, 10)
    variables = model.init(jax.random.key(0), train[0][:1])
    state = create_train_state(model, variables, tx)
    log = tmp_path / "metrics.csv"
    fit(state, make_ctc_train_step(model, tx), make_ctc_eval_step(model),
        train, train, epochs=4, key=jax.random.key(1), monitor="per",
        eval_every=2, log_path=str(log))
    lines = log.read_text().strip().splitlines()
    assert lines[0].startswith("epoch")
    assert len(lines) >= 3  # header + >=2 eval rows
