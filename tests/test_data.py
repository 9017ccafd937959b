"""Data layer: loader round-trips, split properties, subsampling geometry,
augmentation shapes/semantics (the reference's data_processing_test.ipynb
checks, as real tests)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cross_patient_speech_decoding_tpu.data.loaders import (
    append_results_pkl,
    decoding_data_from_dict,
    load_ctc_h5,
    load_pkl,
    mat_filename,
    save_ctc_h5,
)
from cross_patient_speech_decoding_tpu.data.splits import (
    repeated_stratified_kfold_masks,
    stratified_kfold_masks,
    train_val_test_masks,
)
from cross_patient_speech_decoding_tpu.data.subsample import (
    grid_subsample_sig_channels,
    knn_indices,
    pitch_subsample_sig_channels,
    poisson_disk_sample,
    spatial_avg_data,
    spatial_avg_groups,
    trial_subsample_indices,
)
from cross_patient_speech_decoding_tpu.ops.augment import (
    mixup,
    noise_jitter,
    scaling,
    time_jitter_windows,
    time_masking,
    time_shifting,
    time_warping,
)


def test_mat_filename_scheme():
    assert mat_filename("S14", 2) == "S14_HG_p2_sigChannel_goodTrials.mat"
    assert (
        mat_filename("S26", None, False, True)
        == "S26_HG_all_zscore_goodTrials.mat"
    )


def test_ctc_h5_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(20, 800, 16)).astype(np.float32)  # 4 s @ 200 Hz
    y = rng.integers(1, 10, (20, 3))
    Xte = rng.normal(size=(6, 800, 16)).astype(np.float32)
    yte = rng.integers(1, 10, (6, 3))
    path = tmp_path / "rt.h5"
    save_ctc_h5(path, "S14", X, y, Xte, yte)

    Xc, yc, Xtc, ytc = load_ctc_h5(path, "S14")
    # reference crop: inclusive linspace mask over [0,4] -> [0.5,3.5];
    # with T=800, t[i] = 4i/799, so indices 100..699 (t=0.5005..3.4988)
    t = np.linspace(0.0, 4.0, 800)
    m = (t >= 0.5) & (t <= 3.5)
    np.testing.assert_allclose(Xc, X[:, m, :])
    np.testing.assert_array_equal(yc, y)
    np.testing.assert_allclose(Xtc, Xte[:, m, :])
    np.testing.assert_array_equal(ytc, yte)

    # sil-token insertion: n_sil tokens prepended AND appended per row
    _, y2, _, y2t = load_ctc_h5(path, "S14", n_sil=2)
    assert y2.shape == (20, 7) and y2t.shape == (6, 7)
    assert (y2[:, :2] == 10).all() and (y2[:, -2:] == 10).all()
    np.testing.assert_array_equal(y2[:, 2:5], y)

    # only_train / load_all branches
    Xo, yo, none1, none2 = load_ctc_h5(path, "S14", only_train=True)
    assert none1 is None and none2 is None and len(Xo) == 20
    Xa, ya, _, _ = load_ctc_h5(path, "S14", load_all=True)
    assert len(Xa) == 26 and len(ya) == 26


def test_xform_h5_roundtrip_and_apply(tmp_path):
    from cross_patient_speech_decoding_tpu.data.loaders import (
        apply_latent_xform,
        load_cca_xform,
        load_pca_xform,
        save_xforms_h5,
    )

    rng = np.random.default_rng(3)
    comp = rng.normal(size=(5, 16))  # (n_components, n_channels)
    cca = rng.normal(size=(5, 5))
    path = tmp_path / "xf.h5"
    save_xforms_h5(path, pca={"S14": comp}, cca={("S22", "S14"): cca})
    W = load_pca_xform(path, "S14")
    np.testing.assert_allclose(W, comp.T)
    M = load_cca_xform(path, "S14", "S22")
    np.testing.assert_allclose(M, cca)

    X = rng.normal(size=(7, 9, 16)).astype(np.float32)
    lat = apply_latent_xform(X, W, M)
    assert lat.shape == (7, 9, 5)
    # oracle: demean flattened rows, project, align (float64 numpy)
    Xr = X.reshape(-1, 16).astype(np.float64)
    Xr = Xr - Xr.mean(0, keepdims=True)
    ref = (Xr @ comp.T @ cca).reshape(7, 9, 5)
    np.testing.assert_allclose(lat, ref, rtol=1e-5, atol=1e-6)


def test_load_tuned_hparams(tmp_path):
    import h5py

    from cross_patient_speech_decoding_tpu.data.loaders import (
        load_tuned_hparams,
    )

    defaults = {"learning_rate": 1e-3, "hidden_size": 128, "n_layers": 2}
    # missing file -> defaults unchanged
    out = load_tuned_hparams(tmp_path, "S14", "aligned", defaults)
    assert out == defaults

    d = tmp_path / "S14"
    d.mkdir()
    with h5py.File(d / "S14_ctcRNN_aligned_hp.h5", "w") as f:
        f.create_dataset("learning_rate", data=5e-4)
        f.create_dataset("hidden_size", data=256)
        f.create_dataset("not_a_key", data=1.0)  # ignored
    out = load_tuned_hparams(tmp_path, "S14", "aligned", defaults)
    assert out["learning_rate"] == 5e-4
    assert out["hidden_size"] == 256
    assert out["n_layers"] == 2
    assert "not_a_key" not in out


def test_decoding_data_from_dict_contract():
    rng = np.random.default_rng(1)

    def pt_dict():
        d = {f"X{i}": rng.normal(size=(10, 5, 4)) for i in (1, 2, 3)}
        d.update({f"y{i}": rng.integers(1, 10, 10) for i in (1, 2, 3)})
        d["X_collapsed"] = np.concatenate([d[f"X{i}"] for i in (1, 2, 3)])
        d["y_phon_collapsed"] = np.concatenate([d[f"y{i}"] for i in (1, 2, 3)])
        d["y_full_phon"] = rng.integers(1, 10, (10, 3))
        return d

    data = {"A": pt_dict(), "B": pt_dict()}
    data["A"]["pre_pts"] = ["B"]
    (X, y, ya), pre = decoding_data_from_dict(data, "A", -1)
    assert X.shape == (30, 5, 4)
    assert ya.shape == (30, 3)  # full labels tiled x3
    assert len(pre) == 1
    # artic collapse maps 1..9 -> 1..4
    (_, y_artic, _), _ = decoding_data_from_dict(data, "A", 1, lab_type="artic")
    assert set(np.unique(y_artic)) <= {1, 2, 3, 4}


def test_append_results_pkl(tmp_path):
    p = tmp_path / "res.pkl"
    append_results_pkl(p, np.ones(3), params={"a": 1})
    append_results_pkl(p, np.zeros(3))
    store = load_pkl(p)
    assert len(store["accs"]) == 2
    assert store["params"] == {"a": 1}


def test_stratified_kfold_masks_properties():
    rng = np.random.default_rng(2)
    y = np.repeat(np.arange(5), 20)
    tr, te = stratified_kfold_masks(y, 5, rng)
    assert tr.shape == (5, 100)
    np.testing.assert_array_equal(tr + te, 1.0)
    np.testing.assert_array_equal(te.sum(axis=0), 1.0)  # partition
    for k in range(5):  # stratification: each class 4x in each test fold
        counts = np.bincount(y[te[k] > 0], minlength=5)
        np.testing.assert_array_equal(counts, 4)


def test_kfold_fallback_for_rare_classes():
    rng = np.random.default_rng(3)
    y = np.array([0] * 50 + [1] * 2)  # class 1 rarer than folds
    tr, te = stratified_kfold_masks(y, 5, rng)
    np.testing.assert_array_equal(te.sum(axis=0), 1.0)


def test_train_val_test_masks():
    rng = np.random.default_rng(4)
    tr, va, te = train_val_test_masks(100, rng, 0.1, 0.2)
    np.testing.assert_array_equal(tr + va + te, 1.0)
    assert te.sum() == 20 and va.sum() == 10


def _channel_map(h=8, w=16):
    m = np.arange(h * w, dtype=float).reshape(h, w)
    m[0, 0] = m[-1, -1] = np.nan  # missing corners
    return m


def test_grid_subsample():
    cmap = _channel_map()
    sig = np.array([17, 18, 40, 90])
    grids = grid_subsample_sig_channels(cmap, sig, 4)
    assert len(grids) > 0
    for g in grids:
        chans = sig[g]
        # every grid's channels fit inside ONE 4x4 window of the map
        pos = np.array([
            np.argwhere(cmap == c)[0] for c in chans
        ])
        assert pos[:, 0].max() - pos[:, 0].min() < 4
        assert pos[:, 1].max() - pos[:, 1].min() < 4
    # a sub-grid containing channel 17 must exist (row 1, col 1)
    assert any(17 in sig[g] for g in grids)


def test_spatial_avg():
    cmap = _channel_map()
    groups = spatial_avg_groups(cmap, 2)
    assert all(len(g) <= 4 for g in groups)
    rng = np.random.default_rng(5)
    data = rng.normal(size=(6, 10, 128))
    avg = spatial_avg_data(data, groups)
    assert avg.shape == (6, 10, len(groups))
    g0 = groups[0]
    np.testing.assert_allclose(avg[..., 0], data[..., g0].mean(-1))


def test_poisson_disk_min_distance():
    rng = np.random.default_rng(6)
    xs, ys = np.meshgrid(np.arange(10), np.arange(10))
    pos = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(float)
    sel = poisson_disk_sample(pos, radius=2.5, rng=rng)
    assert len(sel) >= 4
    d = np.linalg.norm(pos[sel][None] - pos[sel][:, None], axis=-1)
    d[np.diag_indices_from(d)] = np.inf
    assert d.min() >= 2.5
    # retry wrapper finds significant channels
    sel2, idx = pitch_subsample_sig_channels(pos, np.arange(0, 100, 7), 2.0, rng)
    assert idx.size > 0


def test_trial_subsample_balanced():
    rng = np.random.default_rng(7)
    y = np.repeat(np.arange(4), 25)
    idx = trial_subsample_indices(y, 20, rng)
    counts = np.bincount(y[idx], minlength=4)
    assert counts.max() - counts.min() <= 1


def test_knn():
    pos = np.array([[0.0, 0], [1, 0], [0, 1], [5, 5]])
    idx = knn_indices(pos, np.array([[0.1, 0.1]]), 2)
    assert set(idx[0]) == {0, 1} or set(idx[0]) == {0, 2}


def test_augmentations_shapes_and_semantics():
    key = jax.random.key(0)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(12, 30, 5)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 3, 12), jnp.int32)

    for fn in (time_warping, time_masking, time_shifting, noise_jitter, scaling):
        out = fn(key, x)
        assert out.shape == x.shape, fn.__name__
        assert np.isfinite(np.asarray(out)).all()

    # time_masking actually zeros something somewhere
    masked = np.asarray(time_masking(key, x, max_width=10))
    assert (masked == 0).sum() > 0

    # mixup: pairs are within-class, labels preserved
    xa, ya = mixup(key, x, ids, 3, 20, alpha=0.5)
    assert xa.shape == (20, 30, 5)
    assert ya.shape == (20,)

    # jitter windows: static offsets crop correctly
    crops = time_jitter_windows(x, 5, 20, (-2, 0, 2))
    assert crops.shape == (3, 12, 20, 5)
    np.testing.assert_allclose(np.asarray(crops[1]), np.asarray(x[:, 5:25]))


def test_synthetic_device_generator_structure():
    """Device twin of make_synthetic_patients: same structure contract
    (shapes, labels, class ids, recoverable shared latent structure)."""
    import numpy as np
    from cross_patient_speech_decoding_tpu.data import (
        make_synthetic_patients,
        make_synthetic_patients_device,
    )

    kw = dict(seed=3, n_patients=3, n_classes=5, trials_per_class=6,
              T=12, channels=(10, 14, 8), latent_dim=4, noise=0.1)
    host = make_synthetic_patients(**kw)
    dev = make_synthetic_patients_device(**kw)

    assert dev.n_classes == host.n_classes
    np.testing.assert_array_equal(dev.class_universe, host.class_universe)
    for p in range(3):
        assert dev.X[p].shape == host.X[p].shape
        assert np.asarray(dev.X[p]).dtype == np.float32
        # every class appears exactly trials_per_class times
        np.testing.assert_array_equal(
            np.bincount(np.asarray(dev.class_ids[p]), minlength=5),
            np.full(5, 6),
        )
        # y_seq rows match the class-id -> sequence table
        seq_table = {tuple(host.y_seq[0][np.asarray(host.class_ids[0]) == c][0])
                     for c in range(5)}
        assert {tuple(r) for r in dev.y_seq[p]} <= seq_table
    # shared latent structure is recoverable: class-averaged trials of one
    # patient correlate with its ground-truth latent readout
    X0 = np.asarray(dev.X[0], np.float64)
    ids0 = np.asarray(dev.class_ids[0])
    lat = np.asarray(dev.latent, np.float64)
    mix = np.asarray(dev.mixings[0], np.float64)
    want = lat @ mix  # (C, T, ch) noiseless signal
    got = np.stack([X0[ids0 == c].mean(0) for c in range(dev.n_classes)])
    # correlation between vectorized signals should be near 1
    r = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert r > 0.95


def test_spatial_avg_matrix_matches_host_average():
    """X @ spatial_avg_matrix == spatial_avg_data (device-friendly form)."""
    import numpy as np

    from cross_patient_speech_decoding_tpu.data.subsample import (
        spatial_avg_data,
        spatial_avg_groups,
        spatial_avg_matrix,
    )

    rng = np.random.default_rng(0)
    cmap = np.arange(1.0, 25.0).reshape(4, 6)
    cmap[0, 0] = np.nan
    ids = np.arange(1, 25)[: 20]  # data carries the first 20 channel ids
    X = rng.normal(size=(7, 11, 20)).astype(np.float32)
    groups = spatial_avg_groups(cmap, 2)
    want = spatial_avg_data(X, groups, channel_ids=ids)
    A = spatial_avg_matrix(groups, channel_ids=ids, n_channels=20)
    got = X @ A
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_trial_subsample_exact_count():
    """The sweep's x-axis is the trial count: exactly k indices come back
    even when k is not a multiple of the class count (9 classes, the
    reference's k = 30, 55, 80 schedule)."""
    rng = np.random.default_rng(8)
    y = np.repeat(np.arange(9), 20)
    for k in (30, 55, 80):
        idx = trial_subsample_indices(y, k, rng)
        assert len(idx) == k
        assert len(np.unique(idx)) == k
        counts = np.bincount(y[idx], minlength=9)
        assert counts.max() - counts.min() <= 1
    # thin classes: still exactly k by topping up from other classes
    y2 = np.concatenate([np.zeros(2), np.ones(30), np.full(30, 2)]).astype(int)
    idx = trial_subsample_indices(y2, 30, rng)
    assert len(idx) == 30 and len(np.unique(idx)) == 30


def test_pitch_subsample_channel_id_mapping():
    """Position rows map to channel ids via channel_ids (1-based like
    load_sig_channels); without it, position indices are the ids."""
    ys, xs = np.mgrid[0:6, 0:6]
    pos = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(float)
    ids = np.arange(1, 37)  # 1-based channel ids at each position
    rng = np.random.default_rng(9)
    sel, idx = pitch_subsample_sig_channels(
        pos, sig_channels=np.array([1, 5, 36]), pitch=1.0, rng=rng,
        channel_ids=ids,
    )
    assert sel.min() >= 1 and sel.max() <= 36
    assert idx.size > 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_retries"):
        pitch_subsample_sig_channels(pos, ids, 1.0, rng, max_retries=0)
