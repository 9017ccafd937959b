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
    from test_sweep import _ctc_data  # pytest puts tests/ on sys.path

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


def test_shard_map_ctc_step_matches_replicated():
    """Explicit-SPMD (shard_map + pmean) CTC step == single-device step.

    This is the multi-chip integration path for the fused Pallas GRU
    (each device's kernel sees its local shard); on the CPU test mesh the
    scan path runs, but the sharding/collective structure is identical.
    """
    import optax

    from cross_patient_speech_decoding_tpu.models import RealtimeRNN
    from cross_patient_speech_decoding_tpu.parallel import (
        make_mesh,
        make_sharded_ctc_train_step,
        shard_batch,
    )
    from cross_patient_speech_decoding_tpu.train import (
        create_train_state,
        make_ctc_train_step,
    )

    model = RealtimeRNN(hidden=16, n_layers=1, n_classes=11, dropout=0.0)
    B, T, C, L = 16, 40, 6, 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, 11, (B, L)), jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), L, jnp.int32)
    batch = (x, labels, il, ll)

    variables = model.init(jax.random.key(0), x)
    tx = optax.adamw(1e-3)
    state = create_train_state(model, variables, tx)
    key = jax.random.key(1)

    ref_state, ref_m = jax.jit(make_ctc_train_step(model, tx))(
        state, batch, key
    )

    mesh = make_mesh(8)
    sharded_step = make_sharded_ctc_train_step(model, tx, mesh)
    sh_state, sh_m = sharded_step(state, shard_batch(batch, mesh), key)

    assert float(sh_m["loss"]) == pytest.approx(float(ref_m["loss"]), abs=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(sh_state.params),
        jax.tree_util.tree_leaves(ref_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_make_mesh_rejects_oversubscription():
    import pytest

    from cross_patient_speech_decoding_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="n_devices=99"):
        make_mesh(99)
