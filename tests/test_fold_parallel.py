"""Fold-parallel seq2seq training: all folds learn in one vmapped program,
masked-loss semantics hold, mesh sharding matches unsharded."""

import jax
import jax.numpy as jnp
import numpy as np

from cross_patient_speech_decoding_tpu.data import make_synthetic_patients
from cross_patient_speech_decoding_tpu.data.splits import stratified_kfold_masks
from cross_patient_speech_decoding_tpu.models import Seq2SeqRNN
from cross_patient_speech_decoding_tpu.parallel import make_mesh
from cross_patient_speech_decoding_tpu.train.fold_parallel import (
    make_seq2seq_fold_trainer,
    pooled_fold_arrays,
)


def _setup(seed=0, n_folds=4):
    ds = make_synthetic_patients(seed=seed, n_patients=2, n_classes=6,
                                 trials_per_class=8, T=24,
                                 channels=(12, 14), latent_dim=5, noise=0.3)
    y = [jnp.asarray(s - 1, jnp.int32) for s in ds.y_seq]  # digits 1..9 -> 0..8
    X = [jnp.asarray(x, jnp.float32) for x in ds.X]
    # pad cross channels to target width for pooling (simple truncate here)
    c = min(x.shape[-1] for x in X)
    X = [x[..., :c] for x in X]
    rng = np.random.default_rng(seed)
    tr, te = stratified_kfold_masks(np.asarray(ds.class_ids[0]), n_folds, rng)
    pool = pooled_fold_arrays(X[0], y[0], [X[1]], [y[1]], tr)
    model = Seq2SeqRNN(n_filters=8, hidden=16, num_classes=9, kernel_size=4)
    return model, pool


def test_fold_parallel_training_learns():
    model, (X, y, w, te) = _setup()
    trainer = make_seq2seq_fold_trainer(model, X, y, w, te, lr=3e-3,
                                        decay_iters=200, seed=0)
    accs, params = trainer(60)
    accs = np.asarray(accs)
    assert accs.shape == (4,)
    assert accs.mean() > 1.0 / 9 + 0.1, accs  # above chance on held-out rows
    # per-fold params actually differ (independent training)
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert not np.allclose(np.asarray(leaf[0]), np.asarray(leaf[1]))


def test_fold_parallel_sharded_matches():
    model, (X, y, w, te) = _setup(seed=1, n_folds=8)
    plain_accs, _ = make_seq2seq_fold_trainer(
        model, X, y, w, te, lr=3e-3, seed=0
    )(25)
    mesh = make_mesh(8)
    shard_accs, _ = make_seq2seq_fold_trainer(
        model, X, y, w, te, lr=3e-3, seed=0, mesh=mesh
    )(25)
    np.testing.assert_allclose(
        np.asarray(shard_accs), np.asarray(plain_accs), atol=0.05
    )


def test_fold_trainer_fn_no_retrace_and_chunks():
    """make_seq2seq_fold_trainer_fn traces ONCE for same-shape calls
    (seed is traced, not baked) — the 50-iteration driver reuses one
    compiled program — and fold chunks through the same fn produce valid
    per-fold accuracies."""
    from cross_patient_speech_decoding_tpu.train.fold_parallel import (
        make_seq2seq_fold_trainer_fn,
    )

    model, (X, y, w, te) = _setup(seed=2, n_folds=4)
    fn = make_seq2seq_fold_trainer_fn(model, lr=3e-3, decay_iters=200)
    a0, _ = fn(X, y, w, te, 0, 30)
    a1, _ = fn(X, y, w, te, 7, 30)  # different seed: same trace
    assert np.asarray(a0).shape == (4,) and np.isfinite(a0).all()
    # different seeds -> genuinely different training runs
    assert not np.allclose(np.asarray(a0), np.asarray(a1))
    if hasattr(fn, "_cache_size"):
        assert fn._cache_size() == 1

    # chunked: two 2-fold calls cover the same folds as one 4-fold call
    c0, _ = fn(X, y, w[:2], te[:2], 0, 30)
    c1, _ = fn(X, y, w[2:], te[2:], 31 * 2, 30)
    accs = np.concatenate([np.asarray(c0), np.asarray(c1)])
    assert accs.shape == (4,) and np.isfinite(accs).all()


def test_run_train_seq2seq_fold_chunk(tmp_path):
    """The driver's fold_chunk path: chunks of 2 folds through one
    compiled program yield all n_folds accuracies."""
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        run_train_seq2seq,
    )
    from cross_patient_speech_decoding_tpu.utils.config import (
        TrainSeq2SeqConfig,
    )

    accs = run_train_seq2seq(
        TrainSeq2SeqConfig(
            n_iter=1, n_folds=4, epochs=3, fold_chunk=2,
            log_metrics=False, out=str(tmp_path / "s2s.csv"),
        ),
        verbose=False,
    )
    assert accs.shape == (4,) and np.isfinite(accs).all()


def test_fold_trainer_rnn_impl_knob():
    """rnn_impl='pallas' lets FusedGRU's normal dispatch gate run inside
    the fold vmap (on CPU the gate is off, so results are bit-identical
    to the scan default — this pins the plumbing); bad values raise."""
    from cross_patient_speech_decoding_tpu.train.fold_parallel import (
        make_seq2seq_fold_trainer_fn,
    )

    model, (X, y, w, te) = _setup(seed=3, n_folds=2)
    a_scan, _ = make_seq2seq_fold_trainer_fn(
        model, lr=3e-3, decay_iters=200, rnn_impl="scan"
    )(X, y, w, te, 0, 10)
    a_pal, _ = make_seq2seq_fold_trainer_fn(
        model, lr=3e-3, decay_iters=200, rnn_impl="pallas"
    )(X, y, w, te, 0, 10)
    np.testing.assert_array_equal(np.asarray(a_scan), np.asarray(a_pal))

    import pytest

    with pytest.raises(ValueError, match="rnn_impl"):
        make_seq2seq_fold_trainer_fn(model, rnn_impl="cudnn")


def test_fold_trainer_pallas_with_mesh_rejected():
    """rnn_impl='pallas' + mesh must raise: the sharded fold axis is the
    Pallas kernel's vmap-prepended grid dimension, which GSPMD cannot
    partition."""
    import pytest

    from cross_patient_speech_decoding_tpu.train.fold_parallel import (
        make_seq2seq_fold_trainer_fn,
    )

    model, _ = _setup(seed=4, n_folds=2)
    with pytest.raises(ValueError, match="mesh"):
        make_seq2seq_fold_trainer_fn(
            model, rnn_impl="pallas", mesh=make_mesh(8)
        )
