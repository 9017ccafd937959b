"""Sweep engine: vmapped trial batches train+rank, manifest resume works."""

import numpy as np
import jax.numpy as jnp
import pytest

from cross_patient_speech_decoding_tpu.sweep import (
    Manifest,
    SweepSpace,
    run_sweep,
    sample_trials,
)
from cross_patient_speech_decoding_tpu.sweep.ctc import make_ctc_bucket_trainer


def _ctc_data(seed=0, n=24, T=40, C=5, V=5, L=2):
    rng = np.random.default_rng(seed)
    y = rng.integers(1, V, (n, L))
    # make inputs informative: class-dependent mean patterns
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


def test_sample_trials_in_space():
    space = SweepSpace()
    trials = sample_trials(space, 10, seed=1)
    assert len(trials) == 10
    for t in trials:
        assert space.lr[0] <= t["lr"] <= space.lr[1]
        assert t["hidden"] in space.hidden


def test_vmapped_bucket_trains_and_ranks():
    train = _ctc_data(0)
    val = _ctc_data(1, n=12)
    trainer = make_ctc_bucket_trainer(
        train, val, n_classes=5, win_size=8, stride=4, decay_steps=250
    )
    # same arch, very different lrs: the zero-lr trial cannot learn
    cfgs = [
        {"lr": 5e-3, "weight_decay": 1e-5, "hidden": 16, "n_layers": 1, "dropout": 0.0},
        {"lr": 1e-9, "weight_decay": 1e-5, "hidden": 16, "n_layers": 1, "dropout": 0.0},
    ]
    pers = trainer(cfgs, epochs=250)
    assert len(pers) == 2
    assert all(np.isfinite(p) for p in pers)
    # the learning trial must clearly beat the frozen one (whose
    # blank-biased init emits nothing -> PER 100)
    assert pers[0] < 90, pers
    assert pers[1] > 99, pers


def test_run_sweep_with_manifest_resume(tmp_path):
    calls = []

    def fake_trainer(cfgs, epochs):
        calls.extend(cfgs)
        return [c["lr"] for c in cfgs]  # metric = lr (lower better)

    trials = sample_trials(SweepSpace(hidden=(16,), n_layers=(1,), dropout=(0.0,)), 6, seed=2)
    mpath = tmp_path / "manifest.jsonl"
    res1 = run_sweep(trials, fake_trainer, manifest=Manifest(mpath), rungs=(2,))
    assert len(res1) == 6
    assert res1[0]["metric"] == min(t["lr"] for t in trials)
    n_calls_first = len(calls)

    # resume: nothing re-trains
    res2 = run_sweep(trials, fake_trainer, manifest=Manifest(mpath), rungs=(2,))
    assert len(calls) == n_calls_first
    assert [r["metric"] for r in res2] == [r["metric"] for r in res1]


def test_successive_halving_prunes():
    calls = []

    def fake_trainer(cfgs, epochs):
        calls.append((len(cfgs), epochs))
        return [c["lr"] for c in cfgs]

    trials = sample_trials(SweepSpace(hidden=(16,), n_layers=(1,), dropout=(0.0,)), 9, seed=3)
    res = run_sweep(trials, fake_trainer, rungs=(1, 3), eta=3)
    # rung 1: 9 trials at 1 epoch; rung 2: 3 survivors at 3 epochs
    assert calls[0] == (9, 1)
    assert calls[1] == (3, 3)
    # ALL trials come back: full-budget survivors first (best-first), then
    # rung-1 eliminations with the budget they were last evaluated at
    assert len(res) == 9
    assert [r["epochs"] for r in res] == [3] * 3 + [1] * 6
    lrs = sorted(t["lr"] for t in trials)
    assert res[0]["metric"] == lrs[0]  # winner is still results[0]
    assert {r["metric"] for r in res[3:]} == set(lrs[3:])


def test_successive_halving_resume_keeps_schedule(tmp_path):
    """A sweep killed after recording cheap-rung eliminations must, on
    resume, advance the SAME survivors to the final rung (fixed SHA
    schedule), not re-eliminate within the shrunken cohort — and must not
    retrain eliminated trials."""
    trials = sample_trials(
        SweepSpace(hidden=(16,), n_layers=(1,), dropout=(0.0,)), 9, seed=4
    )
    mpath = tmp_path / "m.jsonl"

    class Rung2Crash(Exception):
        pass

    def crashing_trainer(cfgs, epochs):
        if epochs == 3:
            raise Rung2Crash()
        return [c["lr"] for c in cfgs]

    import pytest as _pytest

    with _pytest.raises(Rung2Crash):
        run_sweep(trials, crashing_trainer,
                  manifest=Manifest(mpath), rungs=(1, 3), eta=3)

    calls = []

    def trainer(cfgs, epochs):
        calls.append((len(cfgs), epochs))
        return [c["lr"] for c in cfgs]

    res = run_sweep(trials, trainer, manifest=Manifest(mpath),
                    rungs=(1, 3), eta=3)
    # resumed run re-evaluates only the 3 recorded survivors at rung 1
    # (their rung-1 scores were not persisted), keeps ALL of them per the
    # n0=9 schedule, and finishes the final rung
    assert (3, 3) in calls
    assert all(n == 3 for n, _ in calls)
    full = [r for r in res if r["epochs"] == 3]
    assert len(full) == 3
    lrs = sorted(t["lr"] for t in trials)
    assert sorted(r["metric"] for r in full) == lrs[:3]
    assert len(res) == 9


def test_cv_bucket_trainer_averages_folds():
    from cross_patient_speech_decoding_tpu.sweep.ctc import (
        make_ctc_cv_bucket_trainer,
    )

    data = _ctc_data(0, n=24)
    n = 24
    rng = np.random.default_rng(0)
    F = 3
    fold_ids = rng.permutation(n) % F
    va = np.stack([(fold_ids == f).astype(np.float32) for f in range(F)])
    tr = 1.0 - va
    trainer = make_ctc_cv_bucket_trainer(
        data, tr, va, n_classes=5, win_size=8, stride=4, decay_steps=250
    )
    cfgs = [
        {"lr": 5e-3, "weight_decay": 1e-5, "hidden": 16, "n_layers": 1,
         "dropout": 0.0},
        {"lr": 1e-9, "weight_decay": 1e-5, "hidden": 16, "n_layers": 1,
         "dropout": 0.0},
    ]
    pers = trainer(cfgs, epochs=200)
    assert len(pers) == 2
    assert pers[0] < 95, pers  # learning trial improves fold-mean PER
    assert pers[1] > 99, pers  # frozen trial stays blank-collapsed


def test_ctc_loss_mean_weighted_reduction():
    """weights= is the single weighted variant used by the CV sweep: ones
    == plain mean; a fold mask == the mean over masked rows."""
    from cross_patient_speech_decoding_tpu.ops.ctc import ctc_loss_mean

    x, y, il, ll = _ctc_data(5, n=8)
    rng = np.random.default_rng(6)
    logits = jnp.asarray(rng.normal(size=(8, 40, 6)).astype(np.float32))
    full = float(ctc_loss_mean(logits, il, y, ll))
    ones = float(ctc_loss_mean(logits, il, y, ll, weights=jnp.ones(8)))
    np.testing.assert_allclose(full, ones, rtol=1e-6)
    w = jnp.asarray([1, 1, 1, 0, 0, 0, 0, 0], jnp.float32)
    sub = float(ctc_loss_mean(logits[:3], il[:3], y[:3], ll[:3]))
    masked = float(ctc_loss_mean(logits, il, y, ll, weights=w))
    np.testing.assert_allclose(masked, sub, rtol=1e-6)


def test_fit_minibatches_share_one_shape():
    """Ragged final batches would recompile the train step (minutes cold on
    the TPU); the last chunk wraps the epoch permutation instead."""
    from cross_patient_speech_decoding_tpu.train.loops import _batches

    rng = np.random.default_rng(7)
    chunks = list(_batches(23, 5, rng))
    assert [len(c) for c in chunks] == [5] * 5
    seen = np.unique(np.concatenate(chunks))
    np.testing.assert_array_equal(seen, np.arange(23))  # full epoch coverage


def test_cv_bucket_trainer_per_fold_stack_matches_shared():
    """A per-fold feature stack with IDENTICAL folds must reproduce the
    shared-array trainer exactly (the stacked path only changes which x
    each (trial, fold) model reads)."""
    from cross_patient_speech_decoding_tpu.sweep.ctc import (
        make_ctc_cv_bucket_trainer,
    )

    data = _ctc_data(3, n=18)
    x, y, il, ll = data
    rng = np.random.default_rng(1)
    F = 2
    fold_ids = rng.permutation(18) % F
    va = np.stack([(fold_ids == f).astype(np.float32) for f in range(F)])
    tr = 1.0 - va
    kw = dict(n_classes=5, win_size=8, stride=4, decay_steps=250)
    cfgs = [{"lr": 5e-3, "weight_decay": 1e-5, "hidden": 16, "n_layers": 1,
             "dropout": 0.0}]
    shared = make_ctc_cv_bucket_trainer(data, tr, va, **kw)(cfgs, epochs=200)
    stacked = make_ctc_cv_bucket_trainer(
        (jnp.stack([x] * F), y, il, ll), tr, va, **kw
    )(cfgs, epochs=200)
    np.testing.assert_allclose(shared, stacked, rtol=1e-6)
    assert shared[0] < 95  # the config learns: the discriminator below
    # has signal (an untrained model scores 100 on ANY features)

    # distinct per-fold features are actually consumed: replacing fold
    # 1's features with noise changes the fold-mean metric
    rng2 = np.random.default_rng(9)
    x2 = jnp.stack(
        [x, jnp.asarray(rng2.normal(size=x.shape), jnp.float32)]
    )
    noised = make_ctc_cv_bucket_trainer((x2, y, il, ll), tr, va, **kw)(
        cfgs, epochs=200
    )
    assert not np.allclose(shared, noised)


def test_cv_bucket_trainer_rejects_fold_mismatch():
    from cross_patient_speech_decoding_tpu.sweep.ctc import (
        make_ctc_cv_bucket_trainer,
    )

    data = _ctc_data(0, n=12)
    x, y, il, ll = data
    va = np.zeros((3, 12), np.float32)
    with pytest.raises(ValueError):
        make_ctc_cv_bucket_trainer(
            (jnp.stack([x] * 2), y, il, ll), 1.0 - va, va, n_classes=5
        )
