"""Multi-device sharding: CV folds over an 8-device mesh equal 1-device
results; the full CTC train step shards and runs (driver dryrun analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cross_patient_speech_decoding_tpu.data import make_synthetic_patients
from cross_patient_speech_decoding_tpu.data.splits import stratified_kfold_masks
from cross_patient_speech_decoding_tpu.decoders import (
    DecodeConfig,
    PatientArrays,
    make_cv_decoder,
)
from cross_patient_speech_decoding_tpu.parallel import make_mesh, shard_batch


@pytest.fixture(scope="module")
def pts():
    ds = make_synthetic_patients(
        seed=0, n_patients=2, n_classes=5, trials_per_class=8, T=10,
        channels=(12, 14), latent_dim=4, noise=0.4,
    )
    uniq = np.unique(np.concatenate(ds.y_first))
    out = [
        PatientArrays(
            X=jnp.asarray(ds.X[p]),
            y=jnp.asarray(np.searchsorted(uniq, ds.y_first[p]), jnp.int32),
            y_align=jnp.asarray(ds.class_ids[p], jnp.int32),
        )
        for p in range(2)
    ]
    cfg = DecodeConfig(n_comp=3, max_k=4, n_classes=len(uniq),
                       n_align_classes=ds.n_classes, lam=1e-2)
    return out, cfg


def test_eight_devices_available():
    assert len(jax.devices()) == 8  # conftest forces the virtual mesh


def test_sharded_cv_matches_single_device(pts):
    (tar, src), cfg = pts
    tr, te = stratified_kfold_masks(
        np.asarray(tar.y), 8, np.random.default_rng(0)
    )
    tr, te = jnp.asarray(tr), jnp.asarray(te)

    single = make_cv_decoder("sep_align", cfg)(tar, (src,), tr, te)

    mesh = make_mesh(8)
    sharded = make_cv_decoder("sep_align", cfg, mesh=mesh)(tar, (src,), tr, te)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), atol=5e-3
    )


def test_sharded_cv_pads_non_divisible_folds(pts):
    (tar, src), cfg = pts
    tr, te = stratified_kfold_masks(
        np.asarray(tar.y), 5, np.random.default_rng(1)
    )
    mesh = make_mesh(8)
    accs = make_cv_decoder("sep_align", cfg, mesh=mesh)(
        tar, (src,), jnp.asarray(tr), jnp.asarray(te)
    )
    assert accs.shape == (5,)


def test_shard_batch_places_on_mesh(pts):
    mesh = make_mesh(8)
    x = jnp.zeros((16, 4))
    shards = shard_batch({"x": x}, mesh)
    assert len(shards["x"].sharding.device_set) == 8


def test_sharded_sweep_bucket_matches_single_device():
    """Trial-axis sharding over the mesh == unsharded results."""
    import sys

    sys.path.insert(0, "tests")
    from test_sweep import _ctc_data

    from cross_patient_speech_decoding_tpu.sweep.ctc import (
        make_ctc_bucket_trainer,
    )

    train = _ctc_data(0)
    val = _ctc_data(1, n=12)
    cfgs = [
        {"lr": 3e-3 * (i + 1), "weight_decay": 1e-5, "hidden": 16,
         "n_layers": 1, "dropout": 0.0}
        for i in range(8)
    ]
    plain = make_ctc_bucket_trainer(
        train, val, n_classes=5, win_size=8, stride=4, decay_steps=100
    )(cfgs, epochs=20)

    mesh = make_mesh(8)
    sharded = make_ctc_bucket_trainer(
        train, val, n_classes=5, win_size=8, stride=4, decay_steps=100,
        mesh=mesh,
    )(cfgs, epochs=20)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain), atol=0.5)
