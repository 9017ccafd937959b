"""The sklearn-surface shims work inside sklearn machinery (Pipeline,
BayesSearchCV-style set_params) and decode above chance."""

import numpy as np
import pytest
from sklearn.metrics import balanced_accuracy_score
from sklearn.pipeline import make_pipeline
from sklearn.svm import SVC

from cross_patient_speech_decoding_tpu.data import make_synthetic_patients
from cross_patient_speech_decoding_tpu.decoders import (
    AlignCCA,
    CrossPtDecoderSepAlign,
    CrossPtDecoderSepDimRed,
    CrossPtDecoderJointPCA,
    CrossPtDecoderMCCA,
    DimRedReshape,
    NoCenterPCA,
)


@pytest.fixture(scope="module")
def data():
    ds = make_synthetic_patients(
        seed=0, n_patients=3, n_classes=6, trials_per_class=10, T=12,
        channels=(20, 24, 18), latent_dim=5, noise=0.4,
    )
    uniq = np.unique(np.concatenate(ds.y_first))
    ys = [np.searchsorted(uniq, y) for y in ds.y_first]
    cross = [(ds.X[i], ys[i], ds.y_seq[i]) for i in (1, 2)]
    return ds, ys, cross


def test_dimredreshape_in_pipeline(data):
    ds, ys, _ = data
    clf = make_pipeline(DimRedReshape(n_components=8), SVC(kernel="rbf"))
    # set_params via pipeline path names (BayesSearchCV contract)
    clf.set_params(dimredreshape__n_components=6)
    clf.fit(ds.X[0], ys[0])
    assert clf.score(ds.X[0], ys[0]) > 0.5


def test_nocenter_pca_sklearn_surface(data):
    ds, _, _ = data
    X = ds.X[0].reshape(len(ds.X[0]), -1)
    p = NoCenterPCA(n_components=5).fit(X)
    t = p.transform(X)
    assert t.shape == (X.shape[0], 5)
    assert p.components_.shape == (5, X.shape[1])


def test_align_cca_class_surface(data):
    ds, _, _ = data
    a = AlignCCA()
    a.fit(ds.X[0][:, :, :8], ds.X[1][:, :, :8], ds.y_seq[0], ds.y_seq[1])
    out = a.transform(ds.X[1][:, :, :8])
    assert out.shape == ds.X[1][:, :, :8].shape
    assert a.canon_corrs[0] > 0.8  # shared latent -> strong top correlation


def test_align_cca_duplicated_channel_user_data(data):
    """The shim serves raw user data of unknown rank: a duplicated
    channel (non-axis-aligned rank deficiency, outside the chol fast
    path's envelope) must still produce a clean alignment — pins the
    shim's method='gram' choice."""
    ds, _, _ = data
    Xa = ds.X[0][:, :, :8]
    Xb = np.concatenate([ds.X[1][:, :, :8], ds.X[1][:, :, 3:4]], axis=2)
    a = AlignCCA().fit(Xa, Xb, ds.y_seq[0], ds.y_seq[1])
    assert np.all(np.isfinite(a.canon_corrs))
    assert a.canon_corrs[0] > 0.8
    out = a.transform(Xb)
    assert np.all(np.isfinite(out))
    assert out.shape == (Xb.shape[0], Xb.shape[1], 8)


@pytest.mark.parametrize(
    "cls,kwargs",
    [
        (CrossPtDecoderSepAlign, dict(n_comp=0.9)),
        (CrossPtDecoderSepDimRed, dict(n_comp=0.9)),
        (CrossPtDecoderJointPCA, dict(n_comp=6)),
        (CrossPtDecoderMCCA, dict(n_comp=5, regs=0.5)),
    ],
)
def test_cross_pt_decoders_fit_predict_score(data, cls, kwargs):
    ds, ys, cross = data
    n = len(ds.X[0])
    rng = np.random.default_rng(0)
    idx = rng.permutation(n)
    tr, te = idx[: int(0.8 * n)], idx[int(0.8 * n) :]

    dec = cls(cross, SVC(kernel="rbf", class_weight="balanced"), **kwargs)
    dec.fit(ds.X[0][tr], ys[0][tr], y_align=ds.y_seq[0][tr])
    preds = dec.predict(ds.X[0][te])
    acc = balanced_accuracy_score(ys[0][te], preds)
    assert acc > 1.0 / 6 + 0.15, (cls.__name__, acc)
