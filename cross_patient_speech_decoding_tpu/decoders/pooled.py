"""Cross-patient pooled decoding strategies as one jit-compiled fold program.

TPU-native rebuild of the reference's ``crossPtDecoder`` family
(`/root/reference/aligned_decoding/decoders/cross_pt_decoders.py`):

- ``decode_fold_sep_dimred``  <-> ``crossPtDecoder_sepDimRed`` (:89-180):
  independent PCA per patient, truncate to the common latent width, pool.
- ``decode_fold_sep_align``   <-> ``crossPtDecoder_sepAlign`` (:183-285):
  independent PCA, per-source CCA alignment into the target space, pool —
  the paper's main cross-patient path.
- ``decode_fold_joint_pca``   <-> ``crossPtDecoder_jointDimRed`` (:288-364):
  joint-PCA (LFADS stitching) shared space.

Architectural difference from the reference: instead of sklearn estimators
called in a Python loop over 50 iterations x 20 folds, each fold is a pure
function of `(arrays, train_mask, test_mask)` with every data-dependent
width handled by masking, so **folds and iterations become vmap axes** and
the entire CV experiment compiles into a handful of XLA launches. The
classifier is a balanced kernel-ridge OVR machine (see ops/classifiers.py)
instead of libsvm SMO.

CV semantics match the reference: only the *target* patient is split; the
cross-patient sources contribute all their trials to every fold's training
pool (cross_pt_decoders.py fit/predict contract).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from cross_patient_speech_decoding_tpu.ops.cca import (
    fit_cca_aligner,
    transform_b_to_a,
)
from cross_patient_speech_decoding_tpu.ops.classifiers import (
    kernel_classifier_fit,
    kernel_classifier_predict,
)
from cross_patient_speech_decoding_tpu.ops.joint_pca import (
    joint_pca_fit,
    joint_pca_transform,
)
from cross_patient_speech_decoding_tpu.ops.metrics import balanced_accuracy
from cross_patient_speech_decoding_tpu.ops.pca import pca_fit, pca_transform


class PatientArrays(NamedTuple):
    """Device-resident per-patient data.

    X: (N, T, C) trials; y: (N,) decode class ids; y_align: (N,) alignment
    class ids (sequence classes, per the reference's y_align kwarg).
    """

    X: jax.Array
    y: jax.Array
    y_align: jax.Array


@dataclass(frozen=True)
class DecodeConfig:
    """Static configuration of the fold program.

    n_comp: PCA components (int) or variance fraction (float in (0,1)).
    max_k: static latent width (all PCA/CCA widths are masked to this).
    n_classes: decode class-universe size.
    n_align_classes: alignment class-universe size.
    lam: kernel ridge regularization.
    kernel: 'rbf' or 'linear'.
    tar_in_train: include target train rows in the pooled training set.
    """

    n_comp: float | int = 0.8
    max_k: int = 32
    n_classes: int = 9
    n_align_classes: int = 27
    lam: float = 1.0
    kernel: str = "rbf"
    tar_in_train: bool = True
    mcca_regs: float = 0.5
    mcca_pca_var: float = 1.0
    # bootstrap-aggregated classifier head (the reference's fixed-param
    # ``BaggingClassifier(SVC linear, 10)``, aligned_decode_svm.py:262-263);
    # 0 = single classifier
    bagging: int = 0
    seed: int = 0


def _fit_pca_latents(X, n_comp, max_k, sample_mask=None, low_refit_k=0):
    """PCA over flattened (N*T, C) with optional per-trial masking.

    Uses the Gram path: N*T >> C in every fold program, so the (C, C)
    covariance eigensolve replaces a brutally tall batched SVD.
    ``low_refit_k`` enables the CTC datamodules' low-component artifact
    guard (see :func:`ops.pca.pca_fit`); the classical decoders keep the
    reference's plain-PCA behavior (off).
    """
    N, T, C = X.shape
    flat = X.reshape(N * T, C)
    row_mask = None
    if sample_mask is not None:
        row_mask = jnp.repeat(sample_mask, T)
    st = pca_fit(flat, n_comp, max_components=max_k, sample_mask=row_mask,
                 method="gram", low_refit_k=low_refit_k)
    return st


def _transform_latents(st, X, max_k):
    N, T, C = X.shape
    return pca_transform(st, X.reshape(N * T, C)).reshape(N, T, -1)


# Public names for the figure/example flows (the fig_2/3/6 analyses PCA
# patients into latent space with exactly the decoder's recipe); the
# underscore names remain the in-package spelling.
fit_pca_latents = _fit_pca_latents
transform_latents = _transform_latents


def _pool_and_classify(
    tar_feats,
    tar_y,
    train_mask,
    test_mask,
    cross_feats,
    cross_ys,
    cfg: DecodeConfig,
    feature_mask=None,
    hp=None,
):
    """Pool flattened features, fit the classifier, score target test rows."""
    if cfg.tar_in_train:
        X_pool = jnp.concatenate([tar_feats] + list(cross_feats), axis=0)
        y_pool = jnp.concatenate([tar_y] + list(cross_ys), axis=0)
        w_pool = jnp.concatenate(
            [train_mask] + [jnp.ones(f.shape[0], train_mask.dtype) for f in cross_feats]
        )
    else:
        X_pool = jnp.concatenate(list(cross_feats), axis=0)
        y_pool = jnp.concatenate(list(cross_ys), axis=0)
        w_pool = jnp.ones(X_pool.shape[0], train_mask.dtype)

    hp = hp or {}
    gamma = None
    if "gamma_scale" in hp and cfg.kernel == "rbf":
        from cross_patient_speech_decoding_tpu.ops.classifiers import scale_gamma

        gamma = hp["gamma_scale"] * scale_gamma(X_pool, w_pool, feature_mask)
    if cfg.bagging > 0:
        # vmapped bootstrap ensemble (multiplicity-weighted refits);
        # honors the same tuned gamma / feature-mask contract as the
        # single-classifier path
        from cross_patient_speech_decoding_tpu.ops.classifiers import (
            bagged_classifier_fit,
            bagged_classifier_predict,
        )

        clf = bagged_classifier_fit(
            jax.random.key(cfg.seed),
            X_pool,
            y_pool,
            cfg.n_classes,
            n_estimators=cfg.bagging,
            kernel=cfg.kernel,
            lam=hp.get("lam", cfg.lam),
            gamma=gamma,
            sample_mask=w_pool,
            feature_mask=feature_mask,
        )
        preds = bagged_classifier_predict(clf, tar_feats, kernel=cfg.kernel)
        acc = balanced_accuracy(tar_y, preds, cfg.n_classes, test_mask)
        return acc, preds
    clf = kernel_classifier_fit(
        X_pool,
        y_pool,
        cfg.n_classes,
        gamma=gamma,
        lam=hp.get("lam", cfg.lam),
        sample_mask=w_pool,
        feature_mask=feature_mask,
        kernel=cfg.kernel,
    )
    preds = kernel_classifier_predict(clf, tar_feats, kernel=cfg.kernel)
    acc = balanced_accuracy(tar_y, preds, cfg.n_classes, test_mask)
    return acc, preds


def decode_fold_sep_align(
    tar: PatientArrays,
    cross: Sequence[PatientArrays],
    train_mask: jax.Array,
    test_mask: jax.Array,
    cfg: DecodeConfig,
    hp=None,
):
    """One fold of the sepAlign (PCA + per-source CCA-to-target) strategy."""
    hp = hp or {}
    n_comp = hp.get("n_comp", cfg.n_comp)
    T = tar.X.shape[1]
    tar_pca = _fit_pca_latents(tar.X, n_comp, cfg.max_k, train_mask)
    tar_lat = _transform_latents(tar_pca, tar.X, cfg.max_k)  # (N0, T, K)

    cross_feats, cross_ys = [], []
    for src in cross:
        src_pca = _fit_pca_latents(src.X, n_comp, cfg.max_k)
        src_lat = _transform_latents(src_pca, src.X, cfg.max_k)
        aligner = fit_cca_aligner(
            tar_lat,
            src_lat,
            tar.y_align,
            src.y_align,
            cfg.n_align_classes,
            mask_a=train_mask,
        )
        aligned = transform_b_to_a(aligner, src_lat)  # (Ni, T, K) in tar space
        cross_feats.append(aligned.reshape(aligned.shape[0], -1))
        cross_ys.append(src.y)

    tar_flat = tar_lat.reshape(tar_lat.shape[0], -1)
    feat_mask = jnp.tile(tar_pca.mask, T)
    return _pool_and_classify(
        tar_flat, tar.y, train_mask, test_mask, cross_feats, cross_ys, cfg,
        feature_mask=feat_mask, hp=hp,
    )


def decode_fold_sep_dimred(
    tar: PatientArrays,
    cross: Sequence[PatientArrays],
    train_mask: jax.Array,
    test_mask: jax.Array,
    cfg: DecodeConfig,
    hp=None,
):
    """One fold of the sepDimRed (independent PCA, common width) strategy."""
    hp = hp or {}
    n_comp = hp.get("n_comp", cfg.n_comp)
    T = tar.X.shape[1]
    tar_pca = _fit_pca_latents(tar.X, n_comp, cfg.max_k, train_mask)

    src_pcas = [_fit_pca_latents(s.X, n_comp, cfg.max_k) for s in cross]
    common = functools.reduce(
        jnp.minimum, [p.n_active for p in src_pcas], tar_pca.n_active
    )
    cmask = (jnp.arange(cfg.max_k) < common).astype(tar.X.dtype)

    tar_lat = _transform_latents(tar_pca, tar.X, cfg.max_k) * cmask
    cross_feats, cross_ys = [], []
    for s, p in zip(cross, src_pcas):
        lat = _transform_latents(p, s.X, cfg.max_k) * cmask
        cross_feats.append(lat.reshape(lat.shape[0], -1))
        cross_ys.append(s.y)

    tar_flat = tar_lat.reshape(tar_lat.shape[0], -1)
    feat_mask = jnp.tile(cmask, T)
    return _pool_and_classify(
        tar_flat, tar.y, train_mask, test_mask, cross_feats, cross_ys, cfg,
        feature_mask=feat_mask, hp=hp,
    )


def decode_fold_joint_pca(
    tar: PatientArrays,
    cross: Sequence[PatientArrays],
    train_mask: jax.Array,
    test_mask: jax.Array,
    cfg: DecodeConfig,
    hp=None,
):
    """One fold of the jointDimRed (joint-PCA stitching) strategy.

    Matches crossPtDecoder_jointDimRed: the joint space is fit on target
    *train* trials + all cross trials; test trials are projected through the
    target read-in (transform idx=0).
    """
    hp = hp or {}
    n_comp = hp.get("n_comp", cfg.n_comp)
    T = tar.X.shape[1]
    Xs = [tar.X] + [s.X for s in cross]
    ids = [tar.y_align] + [s.y_align for s in cross]
    masks = [train_mask] + [None] * len(cross)
    st = joint_pca_fit(
        Xs, ids, cfg.n_align_classes, n_comp,
        max_components=cfg.max_k, sample_masks=masks,
    )

    tar_lat = joint_pca_transform(st, tar.X, 0)
    cross_feats = [
        joint_pca_transform(st, s.X, i + 1).reshape(s.X.shape[0], -1)
        for i, s in enumerate(cross)
    ]
    cross_ys = [s.y for s in cross]
    tar_flat = tar_lat.reshape(tar_lat.shape[0], -1)
    k_mask = (jnp.arange(tar_lat.shape[-1]) < st.n_active).astype(tar.X.dtype)
    feat_mask = jnp.tile(k_mask, T)
    return _pool_and_classify(
        tar_flat, tar.y, train_mask, test_mask, cross_feats, cross_ys, cfg,
        feature_mask=feat_mask, hp=hp,
    )


def decode_fold_mcca(
    tar: PatientArrays,
    cross: Sequence[PatientArrays],
    train_mask: jax.Array,
    test_mask: jax.Array,
    cfg: DecodeConfig,
    hp=None,
):
    """One fold of the MCCA strategy (crossPtDecoder_mcca, :367-445).

    All views (target train + cross) are jointly aligned into the shared
    MCCA space; test trials are projected through the target's loading
    (transform idx=0). n_comp must be an int for MCCA.
    """
    from cross_patient_speech_decoding_tpu.ops.mcca import (
        fit_mcca_aligner,
        mcca_transform,
    )

    T = tar.X.shape[1]
    n_comp = int(cfg.n_comp) if not isinstance(cfg.n_comp, float) or cfg.n_comp >= 1 else 10
    Xs = [tar.X] + [s.X for s in cross]
    ids = [tar.y_align] + [s.y_align for s in cross]
    masks = [train_mask] + [None] * len(cross)
    st = fit_mcca_aligner(
        Xs, ids, cfg.n_align_classes, n_comp,
        regs=cfg.mcca_regs, pca_var=cfg.mcca_pca_var, sample_masks=masks,
    )

    tar_lat = mcca_transform(st, tar.X, 0)
    cross_feats = [
        mcca_transform(st, s.X, i + 1).reshape(s.X.shape[0], -1)
        for i, s in enumerate(cross)
    ]
    cross_ys = [s.y for s in cross]
    tar_flat = tar_lat.reshape(tar_lat.shape[0], -1)
    return _pool_and_classify(
        tar_flat, tar.y, train_mask, test_mask, cross_feats, cross_ys, cfg,
        hp=hp,
    )


_STRATEGIES = {
    "sep_align": decode_fold_sep_align,
    "sep_dimred": decode_fold_sep_dimred,
    "joint_pca": decode_fold_joint_pca,
    "mcca": decode_fold_mcca,
}


def make_cv_decoder(
    strategy: str,
    cfg: DecodeConfig,
    fold_batch: int = 0,
    mesh=None,
    fold_axis: str = "data",
    return_preds: bool = False,
):
    """Build a jitted CV decoder: (tar, cross, train_masks, test_masks) -> accs.

    ``train_masks``/``test_masks`` are (n_folds, N0); folds are a vmap axis.
    With ``fold_batch > 0`` folds are processed in lax.map chunks of that
    size to bound memory (each fold solves an (N_pool, N_pool) system).

    With ``return_preds=True`` the decoder returns ``(accs, preds)`` where
    ``preds`` is (n_folds, N0) predicted labels over ALL target rows (the
    caller selects test rows via its masks) — the reference persists
    per-fold ``y_pred``/``wrong_trs`` every iteration
    (`aligned_decode_svm_ncv.py:440-456`).

    With ``mesh`` given, the fold axis is sharded over the mesh's
    ``fold_axis`` — folds are embarrassingly parallel (the reference farms
    them out as SLURM job arrays, README.md:27), so the repeated-CV product
    scales linearly across chips with zero collectives on the hot path.
    """
    fold_fn = _STRATEGIES[strategy]

    def one_fold(tar, cross, tr, te):
        acc, preds = fold_fn(tar, cross, tr, te, cfg)
        return (acc, preds) if return_preds else acc

    def run(tar, cross, train_masks, test_masks):
        vm = jax.vmap(one_fold, in_axes=(None, None, 0, 0))
        if fold_batch and train_masks.shape[0] > fold_batch:
            n = train_masks.shape[0]
            pad = (-n) % fold_batch
            tr = jnp.pad(train_masks, ((0, pad), (0, 0)))
            te = jnp.pad(test_masks, ((0, pad), (0, 0)))
            tr = tr.reshape(-1, fold_batch, tr.shape[-1])
            te = te.reshape(-1, fold_batch, te.shape[-1])
            out = jax.lax.map(lambda ms: vm(tar, cross, ms[0], ms[1]), (tr, te))
            if return_preds:
                accs, preds = out
                return (
                    accs.reshape(-1)[:n],
                    preds.reshape(-1, preds.shape[-1])[:n],
                )
            return out.reshape(-1)[:n]
        return vm(tar, cross, train_masks, test_masks)

    if mesh is None:
        return jax.jit(run)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    folds_sh = NamedSharding(mesh, P(fold_axis, None))
    accs_sh = NamedSharding(mesh, P(fold_axis))
    jitted = jax.jit(
        run,
        in_shardings=(repl, repl, folds_sh, folds_sh),
        out_shardings=(accs_sh, folds_sh) if return_preds else accs_sh,
    )

    def sharded_run(tar, cross, train_masks, test_masks):
        n_dev = mesh.shape[fold_axis]
        n = train_masks.shape[0]
        pad = (-n) % n_dev
        tr = jnp.pad(train_masks, ((0, pad), (0, 0)))
        te = jnp.pad(test_masks, ((0, pad), (0, 0)))
        out = jitted(
            jax.device_put(tar, repl),
            jax.device_put(cross, repl),
            jax.device_put(tr, folds_sh),
            jax.device_put(te, folds_sh),
        )
        if return_preds:
            return out[0][:n], out[1][:n]
        return out[:n]

    return sharded_run
