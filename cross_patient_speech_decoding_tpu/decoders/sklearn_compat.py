"""sklearn-surface compatibility shims backed by the JAX ops.

The reference exposes its decoders as ``sklearn.base.BaseEstimator``
subclasses so they compose with Pipelines and ``BayesSearchCV``
(`/root/reference/aligned_decoding/decoders/cross_pt_decoders.py`,
`decomposition/NoCenterPCA.py`, `decomposition/DimRedReshape.py`). These
shims preserve that exact surface — constructor signatures, ``fit(X, y,
y_align=...)``, ``predict``/``score``, ``get_params``/``set_params`` param
paths like ``dimredreshape__n_components`` — while the math runs through
the batched JAX ops. A user of the reference can swap imports and keep
their scripts/notebooks.

These wrappers are the *compatibility rim*: one decoder fit per call, host
round-trips at the boundary. The fast path (vmapped folds, one XLA launch
for a whole CV product) is ``decoders.pooled.make_cv_decoder``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from sklearn.base import BaseEstimator

from cross_patient_speech_decoding_tpu.ops.cca import (
    fit_cca_aligner,
    transform_b_to_a,
)
from cross_patient_speech_decoding_tpu.ops.joint_pca import (
    joint_pca_fit,
    joint_pca_transform,
)
from cross_patient_speech_decoding_tpu.ops.mcca import (
    fit_mcca_aligner,
    mcca_transform,
)
from cross_patient_speech_decoding_tpu.ops.pca import (
    pca_fit,
    pca_transform,
)
from cross_patient_speech_decoding_tpu.utils.labels import (
    encode_label_sequences,
    to_class_ids,
)


def _align_ids(*label_arrays):
    """Common compact id space across datasets' alignment labels."""
    encoded = [encode_label_sequences(np.asarray(y)) for y in label_arrays]
    universe = np.unique(np.concatenate(encoded))
    return [to_class_ids(e, universe)[0] for e in encoded], len(universe)


class NoCenterPCA(BaseEstimator):
    """sklearn-style PCA without mean centering (reference NoCenterPCA)."""

    def __init__(self, n_components=None):
        self.n_components = n_components

    def fit(self, X, y=None):
        X = jnp.asarray(np.asarray(X, np.float32))
        self._state = pca_fit(X, self.n_components, center=False)
        self.n_components_ = int(self._state.n_active)
        self.components_ = np.asarray(
            self._state.components[:, : self.n_components_]
        ).T
        return self

    def transform(self, X):
        t = pca_transform(self._state, jnp.asarray(np.asarray(X, np.float32)))
        return np.asarray(t[:, : self.n_components_])

    def fit_transform(self, X, y=None):
        return self.fit(X).transform(X)


class JaxPCA(BaseEstimator):
    """sklearn.decomposition.PCA drop-in backed by ops.pca."""

    def __init__(self, n_components=None):
        self.n_components = n_components

    def fit(self, X, y=None):
        X = jnp.asarray(np.asarray(X, np.float32))
        self._state = pca_fit(X, self.n_components)
        self.n_components_ = int(self._state.n_active)
        self.mean_ = np.asarray(self._state.mean)
        self.components_ = np.asarray(
            self._state.components[:, : self.n_components_]
        ).T
        return self

    def transform(self, X):
        t = pca_transform(self._state, jnp.asarray(np.asarray(X, np.float32)))
        return np.asarray(t[:, : self.n_components_])

    def fit_transform(self, X, y=None):
        return self.fit(X).transform(X)


class DimRedReshape(BaseEstimator):
    """Flatten (N, ...) -> (N, -1) around any reducer (reference
    DimRedReshape) so 3-D trial tensors work inside sklearn Pipelines."""

    def __init__(self, dim_red=None, n_components=None):
        self.dim_red = dim_red
        self.n_components = n_components

    def _reducer(self):
        cls = self.dim_red if self.dim_red is not None else JaxPCA
        return cls(n_components=self.n_components)

    def fit(self, X, y=None):
        X = np.asarray(X)
        flat = X.reshape(X.shape[0], -1)
        self._fitted = self._reducer().fit(flat)
        return self

    def transform(self, X):
        X = np.asarray(X)
        return self._fitted.transform(X.reshape(X.shape[0], -1))

    def fit_transform(self, X, y=None):
        return self.fit(X).transform(X)


class AlignCCA(BaseEstimator):
    """Reference ``AlignCCA`` surface (fit(X_a, X_b, y_a, y_b) /
    transform(X)) backed by ops.cca. type='class' only (the mode every
    reference pipeline uses); return_space='b_to_a'."""

    def __init__(self, type="class", return_space="b_to_a"):
        self.type = type
        self.return_space = return_space

    def fit(self, X_a, X_b, y_a, y_b):
        (ids_a, ids_b), n_cls = _align_ids(y_a, y_b)
        self._aligner = fit_cca_aligner(
            jnp.asarray(np.asarray(X_a, np.float32)),
            jnp.asarray(np.asarray(X_b, np.float32)),
            jnp.asarray(ids_a),
            jnp.asarray(ids_b),
            n_cls,
            # reference-compat surface: user data of unknown rank -> the
            # rank-deficiency-robust eigh path, not the chol fast path
            method="gram",
        )
        self.canon_corrs = np.asarray(self._aligner.alignment.canon_corrs)[
            : int(self._aligner.alignment.d)
        ]
        return self

    def transform(self, X):
        return np.asarray(
            transform_b_to_a(self._aligner, jnp.asarray(np.asarray(X, np.float32)))
        )


class _CrossPtBase(BaseEstimator):
    """fit/predict/score contract of the reference crossPtDecoder base."""

    def fit(self, X, y, **kwargs):
        X_p, y_p = self.preprocess_train(np.asarray(X), np.asarray(y), **kwargs)
        return self.decoder.fit(X_p, y_p)

    def predict(self, X):
        return self.decoder.predict(self.preprocess_test(np.asarray(X)))

    def score(self, X, y, **kwargs):
        return self.decoder.score(self.preprocess_test(np.asarray(X)), y, **kwargs)


class CrossPtDecoderSepAlign(_CrossPtBase):
    """crossPtDecoder_sepAlign: per-patient PCA + CCA alignment to target."""

    def __init__(self, cross_pt_data, decoder, aligner=None, dim_red=None,
                 n_comp=0.8, tar_in_train=True):
        self.cross_pt_data = cross_pt_data
        self.decoder = decoder
        self.aligner = aligner
        self.dim_red = dim_red
        self.n_comp = n_comp
        self.tar_in_train = tar_in_train

    def preprocess_train(self, X, y, y_align=None):
        if y_align is None:
            y_align = y
        T = X.shape[1]
        # independent PCA per patient over flattened (N*T, C)
        tar_pca = pca_fit(
            jnp.asarray(X.reshape(-1, X.shape[-1]), jnp.float32), self.n_comp
        )
        tar_lat = np.asarray(
            pca_transform(tar_pca, jnp.asarray(X.reshape(-1, X.shape[-1]), jnp.float32))
        ).reshape(X.shape[0], T, -1)
        self._tar_pca = tar_pca

        align_labels = [y_align] + [ya for _, _, ya in self.cross_pt_data]
        ids, n_cls = _align_ids(*align_labels)

        feats, ys = [], []
        for i, (Xc, yc, _) in enumerate(self.cross_pt_data):
            Xc = np.asarray(Xc)
            src_pca = pca_fit(
                jnp.asarray(Xc.reshape(-1, Xc.shape[-1]), jnp.float32), self.n_comp
            )
            src_lat = np.asarray(
                pca_transform(
                    src_pca, jnp.asarray(Xc.reshape(-1, Xc.shape[-1]), jnp.float32)
                )
            ).reshape(Xc.shape[0], T, -1)
            # cca_align supports different latent widths per side; the b->a
            # transform lands source data in the target's width
            aligner = fit_cca_aligner(
                jnp.asarray(tar_lat), jnp.asarray(src_lat),
                jnp.asarray(ids[0]), jnp.asarray(ids[i + 1]), n_cls,
            )
            aligned = np.asarray(
                transform_b_to_a(aligner, jnp.asarray(src_lat))
            )
            feats.append(aligned.reshape(aligned.shape[0], -1))
            ys.append(np.asarray(yc))

        tar_flat = tar_lat.reshape(tar_lat.shape[0], -1)
        if self.tar_in_train:
            return np.vstack([tar_flat] + feats), np.concatenate([y] + ys)
        return np.vstack(feats), np.concatenate(ys)

    def preprocess_test(self, X):
        T = X.shape[1]
        lat = np.asarray(
            pca_transform(
                self._tar_pca, jnp.asarray(X.reshape(-1, X.shape[-1]), jnp.float32)
            )
        ).reshape(X.shape[0], T, -1)
        return lat.reshape(X.shape[0], -1)


class CrossPtDecoderJointPCA(_CrossPtBase):
    """crossPtDecoder_jointDimRed: joint-PCA shared space."""

    def __init__(self, cross_pt_data, decoder, joint_dr_method=None,
                 n_comp=0.8, tar_in_train=True):
        self.cross_pt_data = cross_pt_data
        self.decoder = decoder
        self.joint_dr_method = joint_dr_method
        self.n_comp = n_comp
        self.tar_in_train = tar_in_train

    def preprocess_train(self, X, y, y_align=None):
        if y_align is None:
            y_align = y
        align_labels = [y_align] + [ya for _, _, ya in self.cross_pt_data]
        ids, n_cls = _align_ids(*align_labels)
        Xs = [jnp.asarray(X, jnp.float32)] + [
            jnp.asarray(np.asarray(x), jnp.float32) for x, _, _ in self.cross_pt_data
        ]
        self._state = joint_pca_fit(
            Xs, [jnp.asarray(i) for i in ids], n_cls, self.n_comp
        )
        feats = [
            np.asarray(joint_pca_transform(self._state, x, i)).reshape(
                x.shape[0], -1
            )
            for i, x in enumerate(Xs)
        ]
        ys = [np.asarray(yc) for _, yc, _ in self.cross_pt_data]
        if self.tar_in_train:
            return np.vstack(feats), np.concatenate([y] + ys)
        return np.vstack(feats[1:]), np.concatenate(ys)

    def preprocess_test(self, X):
        t = joint_pca_transform(
            self._state, jnp.asarray(np.asarray(X), jnp.float32), 0
        )
        return np.asarray(t).reshape(X.shape[0], -1)


class CrossPtDecoderMCCA(_CrossPtBase):
    """crossPtDecoder_mcca: multiview CCA shared space."""

    def __init__(self, cross_pt_data, decoder, aligner=None, n_comp=10,
                 regs=0.5, pca_var=1, tar_in_train=True):
        self.cross_pt_data = cross_pt_data
        self.decoder = decoder
        self.aligner = aligner
        self.n_comp = n_comp
        self.regs = regs
        self.pca_var = pca_var
        self.tar_in_train = tar_in_train

    def preprocess_train(self, X, y, y_align=None):
        if y_align is None:
            y_align = y
        align_labels = [y_align] + [ya for _, _, ya in self.cross_pt_data]
        ids, n_cls = _align_ids(*align_labels)
        Xs = [jnp.asarray(X, jnp.float32)] + [
            jnp.asarray(np.asarray(x), jnp.float32) for x, _, _ in self.cross_pt_data
        ]
        self._state = fit_mcca_aligner(
            Xs, [jnp.asarray(i) for i in ids], n_cls,
            int(self.n_comp), self.regs, self.pca_var,
        )
        feats = [
            np.asarray(mcca_transform(self._state, x, i)).reshape(x.shape[0], -1)
            for i, x in enumerate(Xs)
        ]
        ys = [np.asarray(yc) for _, yc, _ in self.cross_pt_data]
        if self.tar_in_train:
            return np.vstack(feats), np.concatenate([y] + ys)
        return np.vstack(feats[1:]), np.concatenate(ys)

    def preprocess_test(self, X):
        t = mcca_transform(self._state, jnp.asarray(np.asarray(X), jnp.float32), 0)
        return np.asarray(t).reshape(X.shape[0], -1)


class CrossPtDecoderSepDimRed(_CrossPtBase):
    """crossPtDecoder_sepDimRed: independent PCA, common latent width."""

    def __init__(self, cross_pt_data, decoder, dim_red=None, n_comp=0.8,
                 tar_in_train=True):
        self.cross_pt_data = cross_pt_data
        self.decoder = decoder
        self.dim_red = dim_red
        self.n_comp = n_comp
        self.tar_in_train = tar_in_train

    def preprocess_train(self, X, y, **kwargs):
        T = X.shape[1]
        tar_pca = pca_fit(
            jnp.asarray(X.reshape(-1, X.shape[-1]), jnp.float32), self.n_comp
        )
        lat = [
            np.asarray(
                pca_transform(tar_pca, jnp.asarray(X.reshape(-1, X.shape[-1]), jnp.float32))
            ).reshape(X.shape[0], T, -1)
        ]
        pcas = [tar_pca]
        widths = [int(tar_pca.n_active)]
        ys = []
        for Xc, yc, _ in self.cross_pt_data:
            Xc = np.asarray(Xc)
            p = pca_fit(
                jnp.asarray(Xc.reshape(-1, Xc.shape[-1]), jnp.float32), self.n_comp
            )
            l = np.asarray(
                pca_transform(p, jnp.asarray(Xc.reshape(-1, Xc.shape[-1]), jnp.float32))
            ).reshape(Xc.shape[0], T, -1)
            lat.append(l)
            pcas.append(p)
            widths.append(int(p.n_active))
            ys.append(np.asarray(yc))
        self._tar_pca = tar_pca
        self.common_dim = min(widths)
        lat = [l[..., : self.common_dim] for l in lat]
        flats = [l.reshape(l.shape[0], -1) for l in lat]
        if self.tar_in_train:
            return np.vstack(flats), np.concatenate([y] + ys)
        return np.vstack(flats[1:]), np.concatenate(ys)

    def preprocess_test(self, X):
        T = X.shape[1]
        lat = np.asarray(
            pca_transform(
                self._tar_pca, jnp.asarray(X.reshape(-1, X.shape[-1]), jnp.float32)
            )
        ).reshape(X.shape[0], T, -1)[..., : self.common_dim]
        return lat.reshape(X.shape[0], -1)
