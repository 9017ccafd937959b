"""TME surrogates preserve mode covariances while destroying cross-patient
structure; sequence utils; pt_corr metrics; visualization smoke."""

import numpy as np
import jax.numpy as jnp
import pytest

from cross_patient_speech_decoding_tpu.data import make_synthetic_patients
from cross_patient_speech_decoding_tpu.data.surrogates import (
    _mode_covs,
    mode_shuffle_surrogate,
    tme_surrogate,
)
from cross_patient_speech_decoding_tpu.ops.metrics import (
    pt_corr,
    pt_corr_dims,
    pt_corr_multi,
)
from cross_patient_speech_decoding_tpu.ops.sequences import (
    flatten_fold_preds,
    one_hot_seq,
    pad_sequence_teacher_forcing,
)


def test_pad_sequence_teacher_forcing():
    y = np.array([[1, 2, 3], [4, 5, 6]])
    dec_in, tgt = pad_sequence_teacher_forcing(y, n_classes=9)
    np.testing.assert_array_equal(dec_in, [[9, 1, 2], [9, 4, 5]])
    np.testing.assert_array_equal(tgt, y)
    oh = one_hot_seq(dec_in, 9)
    assert oh.shape == (2, 3, 10)
    assert oh[0, 0, 9] == 1.0


def test_flatten_fold_preds():
    out = flatten_fold_preds([np.ones((2, 3)), np.zeros(4)])
    assert out.shape == (10,)


def test_pt_corr_matches_scipy_pearsonr():
    """Reference contract (alignment/metrics.py:41-68): one r (and p) per
    condition over the flattened (T, K) trajectory."""
    from scipy.stats import pearsonr

    rng = np.random.default_rng(0)
    base = rng.normal(size=(5, 20, 4))
    a = (base + 0.3 * rng.normal(size=base.shape)).astype(np.float32)
    b = (base + 0.3 * rng.normal(size=base.shape)).astype(np.float32)
    r, p = pt_corr(jnp.asarray(a), jnp.asarray(b), p_vals=True)
    r, p = np.asarray(r), np.asarray(p)
    assert r.shape == (5,) and p.shape == (5,)
    for cnd in range(5):
        r_sp, p_sp = pearsonr(a[cnd].ravel(), b[cnd].ravel())
        assert abs(r[cnd] - r_sp) < 1e-5
        assert abs(p[cnd] - p_sp) < 1e-4


def test_pt_corr_multi_and_dims():
    rng = np.random.default_rng(0)
    base = rng.normal(size=(5, 20, 4))
    a = base + 0.05 * rng.normal(size=base.shape)
    b = base + 0.05 * rng.normal(size=base.shape)
    c = rng.normal(size=base.shape)
    r_ab = np.asarray(pt_corr(jnp.asarray(a), jnp.asarray(b)))
    assert (r_ab > 0.9).all()
    # reference pt_corr_multi: target vs a LIST of comparison views
    multi = np.asarray(
        pt_corr_multi(jnp.asarray(a), [jnp.asarray(b), jnp.asarray(c)])
    )
    assert multi.shape == (2, 5)  # (n_views, n_conditions)
    assert multi[0].mean() > 0.9  # (a,b) aligned
    assert abs(multi[1].mean()) < 0.5  # (a,c) unrelated
    rs, ps = pt_corr_multi(
        jnp.asarray(a), [jnp.asarray(b), jnp.asarray(c)], p_vals=True
    )
    assert np.asarray(ps).shape == (2, 5)
    assert (np.asarray(ps)[0] < 0.01).all()  # aligned views: tiny p
    # per-dim companion used by the alignment-quality figures
    dims = np.asarray(pt_corr_dims(jnp.asarray(a), jnp.asarray(b)))
    assert dims.shape == (4,)
    assert (dims > 0.9).all()


def test_tme_preserves_mode_covs_destroys_latents():
    ds = make_synthetic_patients(seed=0, n_patients=1, n_classes=4,
                                 trials_per_class=12, T=16, channels=(10,),
                                 latent_dim=3, noise=0.2)
    X = np.asarray(ds.X[0], np.float32)
    surr, fit = tme_surrogate(X, steps=1500, seed=0)
    assert surr.shape == X.shape
    assert np.isfinite(surr).all()

    # the max-ent solution's EXPECTED marginal eigenvalues match the data's
    # (single draws fluctuate heavily by design — TME is a distribution)
    for d, m in zip(fit["data_eigs"], fit["implied_eigs"]):
        rel = np.abs(m - d) / np.maximum(d.max(), 1e-6)
        assert rel.max() < 0.05, rel

    # NOTE: TME preserves all three MARGINAL covariances (including the
    # trial-mode covariance, where linear class separability lives) and
    # destroys only beyond-marginal tensor interactions — so the right
    # checks are distributional, not class-separation ones.

    # different seeds -> genuinely different draws
    from cross_patient_speech_decoding_tpu.data.surrogates import sample_tme

    surr2 = sample_tme(fit, seed=1)
    assert np.abs(surr - surr2).max() > 1e-3

    # averaged over draws, the sample mode-1 scatter spectrum approaches
    # the preserved marginal eigenvalues
    covs_acc = None
    n_draws = 20
    for s in range(n_draws):
        covs_d, _ = _mode_covs(sample_tme(fit, seed=100 + s))
        covs_acc = covs_d[0] if covs_acc is None else covs_acc + covs_d[0]
    # project onto the preserved eigenbasis (unbiased, unlike re-eiging)
    Q1 = fit["Qs"][0]
    proj = np.diag(Q1.T @ (covs_acc / n_draws) @ Q1)
    m1 = fit["implied_eigs"][0]
    # Gaussian sampling tolerance: var of a draw's marginal_i is
    # 2*sum_jk v_ijk^2; the top marginal is often carried by ~one Kronecker
    # coordinate, so its draw-to-draw std is ~sqrt(2)*m1
    la, lb, lc = (np.asarray(v) for v in fit["log_abc"])
    v = 1.0 / (
        np.exp(la)[:, None, None]
        + np.exp(lb)[None, :, None]
        + np.exp(lc)[None, None, :]
    )
    std_i = np.sqrt(2.0 * (v**2).sum((1, 2))) / np.sqrt(n_draws)
    k = 3
    err = np.abs(proj[:k] - m1[:k])
    tol = 4.0 * std_i[:k] + 0.02 * m1.max()
    assert (err < tol).all(), (err, tol)


def test_mode_shuffle_preserves_marginals():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(30, 8, 6))
    s = mode_shuffle_surrogate(X, rng)
    np.testing.assert_allclose(
        np.sort(s[:, 0, 0]), np.sort(X[:, 0, 0]), atol=1e-12
    )


def test_visualization_smoke(tmp_path):
    pytest.importorskip("matplotlib")
    from cross_patient_speech_decoding_tpu.utils.visualization import (
        plot_latent_trajectories_1d,
        plot_latent_trajectories_2d,
        plot_latent_trajectories_3d,
    )

    rng = np.random.default_rng(2)
    lats = [rng.normal(size=(3, 10, 4)) for _ in range(2)]
    plot_latent_trajectories_1d(lats, labels=["a", "b"], dims=2,
                                save_path=tmp_path / "1d.png")
    plot_latent_trajectories_2d(lats, save_path=tmp_path / "2d.png")
    plot_latent_trajectories_3d(lats, save_path=tmp_path / "3d.png")
    assert (tmp_path / "1d.png").exists()


def test_channel_map_grid_and_label_helpers(tmp_path):
    from cross_patient_speech_decoding_tpu.utils.labels import (
        artic_labels,
        cv_structure,
        phon_seq_to_artic_str,
    )
    from cross_patient_speech_decoding_tpu.utils.visualization import (
        map_to_channel_grid,
    )

    # NaN-edged 1-based channel map, notebook chan_disp indexing
    cmap = np.array([[np.nan, 1.0], [2.0, 3.0]])
    data = np.array([10.0, 20.0, 30.0])
    grid = map_to_channel_grid(data, cmap)
    assert np.isnan(grid[0, 0])
    np.testing.assert_allclose(grid[[0, 1, 1], [1, 0, 1]], [10, 20, 30])

    np.testing.assert_array_equal(
        artic_labels([1, 4]), ["low", "dorsal"]
    )
    # collapse map: phonemes {1,2}->low, {3,4}->high, {5,6,7}->labial,
    # {8,9}->dorsal (reference alignment_utils.py:197)
    assert phon_seq_to_artic_str(np.array([[2, 5, 9]]))[0] == (
        "low_labial_dorsal"
    )
    assert phon_seq_to_artic_str(np.array([[3, 1, 8]]))[0] == (
        "high_low_dorsal"
    )
    np.testing.assert_array_equal(
        cv_structure(np.array([[5, 2, 5], [2, 5, 2]])), ["CVC", "VCV"]
    )


def test_channel_map_plots_smoke(tmp_path):
    pytest.importorskip("matplotlib")
    from cross_patient_speech_decoding_tpu.utils.visualization import (
        plot_channel_map,
        plot_channel_map_seq,
    )

    rng = np.random.default_rng(3)
    cmap = np.full((4, 4), np.nan)
    cmap[1:3, :] = np.arange(1, 9, dtype=np.float64).reshape(2, 4)
    plot_channel_map(rng.normal(size=8), cmap, title="t", label="HG",
                     save_path=tmp_path / "cm.png")
    t = np.linspace(0, 1, 20)
    data = rng.normal(size=(2, 20, 8))
    plot_channel_map_seq(data, cmap, t, [(0.0, 0.5), (0.5, 1.0)],
                         ["low", "high"], title="seq", label="HG",
                         save_path=tmp_path / "cms.png")
    assert (tmp_path / "cm.png").exists()
    assert (tmp_path / "cms.png").exists()


def test_min_neighbor_distance():
    from cross_patient_speech_decoding_tpu.data.subsample import (
        min_neighbor_distance,
    )

    pts = np.array([[0.0, 0.0], [3.0, 4.0]])
    q = np.array([[0.0, 1.0], [3.0, 0.0]])
    d = min_neighbor_distance(pts, q)
    np.testing.assert_allclose(d, [1.0, 3.0])
    assert np.isinf(min_neighbor_distance(np.empty((0, 2)), q)).all()


def test_one_hot_decode_and_decode_seq2seq():
    import jax

    from cross_patient_speech_decoding_tpu.models import Seq2SeqRNN
    from cross_patient_speech_decoding_tpu.ops.sequences import (
        decode_seq2seq,
        one_hot_decode_batch,
    )

    probs = np.zeros((2, 3, 4))
    probs[0, :, 1] = 1.0
    probs[1, :, 2] = 1.0
    np.testing.assert_array_equal(
        one_hot_decode_batch(probs), [[1, 1, 1], [2, 2, 2]]
    )

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(5, 20, 6)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 4, (5, 3)), jnp.int32)
    model = Seq2SeqRNN(n_filters=8, hidden=12, num_classes=4, kernel_size=3)
    variables = model.init(
        {"params": jax.random.key(0), "tf": jax.random.key(1)}, X, y, 0.5,
    )
    preds, true = decode_seq2seq(model, variables, X, y)
    assert preds.shape == true.shape == (15,)
    assert set(np.unique(preds)) <= set(range(4))


def test_plot_group_comparison_and_scaling_curve(tmp_path):
    """Round-4 figure panels: save-and-close returns None; files render;
    single-group and baseline edge cases don't crash."""
    import numpy as np

    from cross_patient_speech_decoding_tpu.utils.scaling import (
        log_linear_fit,
    )
    from cross_patient_speech_decoding_tpu.utils.visualization import (
        plot_group_comparison,
        plot_scaling_curve,
        save_panel,
    )

    rng = np.random.default_rng(0)
    groups = {"a": rng.random(6), "b": rng.random(6)}
    out = plot_group_comparison(groups, "acc", baseline=0.1,
                                save_path=str(tmp_path / "g.png"))
    assert out is None and (tmp_path / "g.png").exists()
    fig = plot_group_comparison({"only": rng.random(3)}, "acc")
    assert fig is not None  # open figure when not saving

    ks = np.array([5, 20, 80])
    vals = [rng.random(4) * 50 + 20 for _ in ks]
    fit = log_linear_fit(ks, np.array([v.mean() for v in vals]))
    out = plot_scaling_curve(ks, vals, "PER (%)", fit=fit,
                             save_path=str(tmp_path / "s.png"))
    assert out is None and (tmp_path / "s.png").exists()

    p = save_panel(str(tmp_path / "sub"), "p.png", plot_group_comparison,
                   groups, "acc")
    assert p.endswith("sub/p.png")
    import os

    assert os.path.exists(p)
