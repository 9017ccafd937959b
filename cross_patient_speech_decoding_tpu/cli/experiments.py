"""End-to-end experiment drivers — the analogs of the reference scripts/.

Each function runs one experiment family (SURVEY.md §2.7):
- :func:`run_svm_decode`   <-> aligned_decode_svm[_ncv].py — repeated
  stratified CV of pooled cross-patient classical decoding, but the whole
  iter x fold product executes as vmapped fold batches on device;
- :func:`run_train_seq2seq` <-> train_seq2seq.py;
- :func:`run_train_ctc`    <-> train_ctc_rnn.py with the four contexts
  (chance / patient-specific / unaligned / aligned);
- :func:`run_tune_ctc`     <-> tune_ctc_rnn[_align].py via sweep/;
- :func:`run_realtime_sim` — streaming decode latency report.

All drivers accept ``data='synthetic'`` so every experiment is runnable
without private patient files; file-backed runs use data.loaders.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from cross_patient_speech_decoding_tpu.data import (
    make_synthetic_patients_device,
)
from cross_patient_speech_decoding_tpu.data.loaders import (
    append_results_pkl,
    decoding_data_from_dict,
    load_pkl,
)
from cross_patient_speech_decoding_tpu.data.splits import (
    repeated_stratified_kfold_masks,
    stratified_kfold_masks,
    stratified_train_subsample_masks,
    train_val_test_masks,
)
from cross_patient_speech_decoding_tpu.decoders import (
    DecodeConfig,
    PatientArrays,
    make_cv_decoder,
)
from cross_patient_speech_decoding_tpu.utils.config import (
    RealtimeSimConfig,
    SVMDecodeConfig,
    TrainCTCConfig,
    TrainSeq2SeqConfig,
    TuneCTCConfig,
)
from cross_patient_speech_decoding_tpu.utils.labels import (
    encode_label_sequences,
    to_class_ids,
)


# ----------------------------------------------------------- data assembly ----

def _build_patient_arrays(Xs, ys, aligns):
    """Encode labels to shared class ids and wrap device PatientArrays.

    Returns (pts, n_classes, n_align_classes)."""
    y_enc = [encode_label_sequences(np.asarray(y)) for y in ys]
    y_uni = np.unique(np.concatenate(y_enc))
    a_enc = [encode_label_sequences(np.asarray(a)) for a in aligns]
    a_uni = np.unique(np.concatenate(a_enc))

    pts = [
        PatientArrays(
            # jnp.asarray handles numpy (file-backed) AND device arrays
            # (synthetic generation) — np.asarray(X) here would round-trip
            # device data through the ~30 MB/s tunnel
            X=jnp.asarray(X, jnp.float32),
            y=jnp.asarray(to_class_ids(ye, y_uni)[0]),
            y_align=jnp.asarray(to_class_ids(ae, a_uni)[0]),
        )
        for X, ye, ae in zip(Xs, y_enc, a_enc)
    ]
    return pts, len(y_uni), len(a_uni)


def patients_from_config(data: str, target_pt: str, p_ind: int = -1,
                          lab_type: str = "phon", algn_type: str = "phon_seq",
                          seed: int = 0, random_data: bool = False,
                          noise: float = 0.6, trials_per_class: int = 15,
                          n_patients: int = 4, T: int = 40,
                          return_names: bool = False):
    """Assemble (tar, cross) PatientArrays from a pkl file or synthetic.

    With ``return_names`` also returns the patient-name list (target
    first; for file data the pkl's ``pre_pts`` order — the geometry-sweep
    drivers key channel maps and array dimensions by these names)."""
    if data == "synthetic":
        chans = (96, 111, 80, 64, 128, 72, 56, 104)[:n_patients]
        # device-side generation: at reference scale the host twin costs
        # ~25 s of single-core numpy + a ~150 MB upload through the tunnel
        ds = make_synthetic_patients_device(
            seed=seed, n_patients=n_patients, n_classes=9,
            trials_per_class=trials_per_class, T=T, channels=chans,
            latent_dim=10, noise=noise)
        Xs = ds.X
        ys = ds.y_first
        aligns = ds.y_seq
        names = [f"synthetic{i}" for i in range(n_patients)]
    else:
        pt_data = load_pkl(data)
        (X_t, y_t, ya_t), pre = decoding_data_from_dict(
            pt_data, target_pt, p_ind, lab_type, algn_type
        )
        Xs = [X_t] + [x for x, _, _ in pre]
        ys = [y_t] + [y for _, y, _ in pre]
        aligns = [ya_t] + [ya for _, _, ya in pre]
        names = [target_pt] + list(pt_data[target_pt]["pre_pts"])

    rng = np.random.default_rng(seed)
    if random_data:  # -r control: destroy cross-patient structure
        Xs = [Xs[0]] + [rng.random(x.shape).astype(np.float32) for x in Xs[1:]]

    pts, n_y, n_a = _build_patient_arrays(Xs, ys, aligns)
    if return_names:
        return pts[0], tuple(pts[1:]), n_y, n_a, names
    return pts[0], tuple(pts[1:]), n_y, n_a


# public name for example/analysis flows; the underscore alias remains for
# the in-package drivers
_patients_from_config = patients_from_config


# Single-entry cache keyed by (seed, sizes): pooled synthetic contexts
# re-prep every iteration (leak-free per-mask fits) but the underlying
# dataset is a pure function of (seed, sizes) — regenerating it 50x
# would redo the device datagen + host label encoding per iteration for
# bitwise-equal arrays. ONE entry only: a reference-scale dataset pins
# ~0.5 GB of HBM, so a multi-seed sweep in one process must evict the
# previous seed's arrays rather than accumulate them. Values are
# immutable jnp X + host label arrays that no caller mutates in place.
_SYNTH_CTC_CACHE: dict = {}


def _synthetic_ctc(seed=0, n_patients=3, n_trials=120, T=200, channels=(64, 80, 72),
                   vocab=9, seq_len=3):
    """Synthetic CTC dataset: (X, labels(1..9), input_lens, label_lens) per pt."""
    key = (seed, n_patients, n_trials, T, tuple(channels), vocab, seq_len)
    if key in _SYNTH_CTC_CACHE:
        return _SYNTH_CTC_CACHE[key]
    ds = make_synthetic_patients_device(
        seed=seed, n_patients=n_patients, n_classes=min(27, vocab**2),
        trials_per_class=max(1, n_trials // 27), T=T, channels=channels,
        latent_dim=12, noise=0.5, seq_len=seq_len)
    out = []
    for p in range(n_patients):
        n = len(ds.X[p])
        out.append(
            (
                # X stays ON DEVICE (np.asarray here would round-trip the
                # trial tensors through the tunnel); labels/lengths are
                # tiny and host-side for rng permutation/split logic
                jnp.asarray(ds.X[p], jnp.float32),
                np.asarray(ds.y_seq[p], np.int32),
                np.full(n, T, np.int32),
                np.full(n, seq_len, np.int32),
            )
        )
    _SYNTH_CTC_CACHE.clear()
    _SYNTH_CTC_CACHE[key] = out
    return out


def _synthetic_ctc_cfg(cfg):
    """_synthetic_ctc sized by the config's synth_* knobs (reference CTC
    production scale: 8 patients, ~250 trials, T=600 bins). Configs
    without the knobs (make-xforms) keep the historical 3-patient
    defaults; so do the default knob values, keeping test/bench
    compile-cache shapes stable."""
    n_p = getattr(cfg, "synth_patients", 3)
    chans = (64, 80, 72, 111, 96, 128, 56, 104)[:n_p]
    return _synthetic_ctc(
        seed=cfg.seed, n_patients=n_p,
        n_trials=getattr(cfg, "synth_trials", 120),
        T=getattr(cfg, "synth_T", 200), channels=chans,
    )


def _synthetic_ctc_n_trials(cfg) -> int:
    """Per-patient trial count of :func:`_synthetic_ctc_cfg` WITHOUT
    generating the dataset (27 sequence classes x trials//27 each)."""
    return 27 * max(1, getattr(cfg, "synth_trials", 120) // 27)


_CTC_PREP_JIT = None


def _ctc_prep_jit():
    """Jitted CTC-prep programs (built once per process).

    The pooled CTC prep (per-patient PCA fit+transform, per-cross-patient
    CCA fit+align) used to run EAGERLY: every jnp primitive dispatched as
    its own device program, which through the tunneled backend (~0.4 s
    D2H latency, per-op roundtrips) made prep the dominant cost of a
    train-ctc iteration at reference scale (probe: prep 678 s vs seconds
    of training). Fusing each fit into ONE jitted program turns prep into
    ~2 dispatches per patient; jit's shape cache handles the per-patient
    channel widths (one compile per distinct width, then pure exec for
    the remaining 49 iterations).
    """
    global _CTC_PREP_JIT
    if _CTC_PREP_JIT is not None:
        return _CTC_PREP_JIT
    from functools import partial

    from cross_patient_speech_decoding_tpu.decoders.pooled import (
        _fit_pca_latents,
        _transform_latents,
    )
    from cross_patient_speech_decoding_tpu.ops.cca import (
        fit_cca_aligner,
        transform_b_to_a,
    )

    @partial(jax.jit, static_argnames=("n_comp", "max_k"))
    def pca_fit_lat(X, mask, n_comp, max_k):
        # low_refit_k=30: the CTC datamodules' low-component artifact
        # guard (reduce_to_latent_space, realtime_datamodule.py:813-869)
        st = _fit_pca_latents(X, n_comp, max_k, sample_mask=mask,
                              low_refit_k=30)
        return st, _transform_latents(st, X, max_k)

    @partial(jax.jit, static_argnames=("max_k",))
    def pca_apply(st, X, max_k):
        return _transform_latents(st, X, max_k)

    @partial(jax.jit, static_argnames=("n_classes",))
    def cca_align_lat(lat_a, lat_b, ids_a, ids_b, mask_a, n_classes):
        al = fit_cca_aligner(
            lat_a, lat_b, ids_a, ids_b, n_classes, mask_a=mask_a
        )
        return transform_b_to_a(al, lat_b)

    _CTC_PREP_JIT = (pca_fit_lat, pca_apply, cca_align_lat)
    return _CTC_PREP_JIT


# ------------------------------------------------------------- svm decode ----

def apply_pool_filters(cross, cross_names, pool_train: bool, pooled_pts: str):
    """Cross-patient pool selection shared by the decode/sweep drivers.

    ``pool_train=False`` is the reference's single-patient branch (no cross
    data pooled, aligned_decode_svm_ncv.py:415-437); ``pooled_pts`` selects
    a named subset in the user's order (``-pp``,
    aligned_decode_svm_ncv.py:280-282 — also covers the legacy ``-n``
    S23 exclusion). Returns the filtered (cross, cross_names) pair.
    """
    if not pool_train:
        return (), ()
    if pooled_pts in ("", "all"):
        return tuple(cross), tuple(cross_names)
    want = [p.strip() for p in pooled_pts.split(",") if p.strip()]
    missing = [p for p in want if p not in cross_names]
    if missing:
        raise ValueError(
            f"pooled_pts {missing} not among cross patients {list(cross_names)}"
        )
    return tuple(cross[list(cross_names).index(p)] for p in want), tuple(want)


def _prediction_records(y_host, preds, test_masks):
    """(y_true, y_pred, wrong_trs) for one iteration, in the reference's
    fold-major / ascending-test-index order (aligned_decode_svm_ncv.py:
    437-445: test splits concatenated across folds; ``wrong_trs`` are
    target-trial indices of the mispredicted test rows)."""
    y_true, y_pred, wrong = [], [], []
    for f in range(test_masks.shape[0]):
        idx = np.where(test_masks[f] > 0)[0]
        yt = y_host[idx]
        yp = np.asarray(preds[f])[idx]
        y_true.append(yt)
        y_pred.append(yp)
        wrong.append(idx[yt != yp])
    return (
        np.concatenate(y_true),
        np.concatenate(y_pred),
        np.concatenate(wrong),
    )


def run_svm_decode(cfg: SVMDecodeConfig, verbose: bool = True):
    """Repeated stratified-CV pooled decode; incremental pkl persistence.

    Controls (reference SURVEY.md §4.3): ``chance`` shuffles target labels;
    ``surrogate='tme'`` replaces cross-patient tensors with TME max-ent
    surrogates (supp_fig_11); ``surrogate='shuffle'`` uses mode-shuffle
    surrogates; ``random_data`` replaces cross data with uniform noise.
    """
    tar, cross, n_y, n_a, names = _patients_from_config(
        cfg.data, cfg.target_pt, cfg.p_ind, cfg.lab_type, cfg.algn_type,
        cfg.seed, cfg.random_data,
        trials_per_class=cfg.synth_trials,
        n_patients=cfg.synth_patients, T=cfg.synth_T,
        return_names=True,
    )
    cross, _ = apply_pool_filters(cross, names[1:], cfg.pool_train,
                                  cfg.pooled_pts)
    rng_ctl = np.random.default_rng(cfg.seed + 777)
    if cfg.chance:
        perm = rng_ctl.permutation(len(np.asarray(tar.y)))
        tar = PatientArrays(X=tar.X, y=tar.y[jnp.asarray(perm)],
                            y_align=tar.y_align[jnp.asarray(perm)])
    if cfg.surrogate != "none":
        from cross_patient_speech_decoding_tpu.data.surrogates import (
            mode_shuffle_surrogate,
            tme_surrogate,
        )

        new_cross = []
        for c in cross:
            Xc = np.asarray(c.X)
            if cfg.surrogate == "tme":
                Xs, _ = tme_surrogate(Xc, steps=1000, seed=cfg.seed)
            else:
                Xs = mode_shuffle_surrogate(Xc, rng_ctl)
            new_cross.append(
                PatientArrays(X=jnp.asarray(Xs, jnp.float32), y=c.y,
                              y_align=c.y_align)
            )
        cross = tuple(new_cross)
    dcfg = DecodeConfig(
        n_comp=cfg.n_comp, max_k=cfg.max_k, n_classes=n_y,
        n_align_classes=n_a, lam=cfg.lam, kernel=cfg.kernel,
        # single-patient mode trains on the target by definition
        tar_in_train=cfg.tar_in_train or not cfg.pool_train,
        bagging=cfg.bagging, seed=cfg.seed,
    )
    y_host = np.asarray(tar.y)

    mesh = None
    if getattr(cfg, "n_devices", 0) > 0:
        from cross_patient_speech_decoding_tpu.parallel import make_mesh

        mesh = make_mesh(cfg.n_devices)

    Path(cfg.out).parent.mkdir(parents=True, exist_ok=True)
    # kill-and-resume: per-iteration fold accs already in the incremental
    # pkl are skipped (per-iteration seeds make the continuation identical
    # to an uninterrupted run) — the reference's get_completed_iters intent
    # (tune_ctc_rnn.py:905-921) applied to the SVM driver.
    all_accs = _completed_results(cfg.out, vars(cfg), scalar=False)[: cfg.n_iter]
    if all_accs and verbose:
        print(f"resuming: {len(all_accs)}/{cfg.n_iter} iterations done",
              flush=True)

    if cfg.nested:
        # per-outer-fold TPE hyperparameter search (BayesSearchCV analog,
        # aligned_decode_svm_ncv.py:398-404); the per-fold best hparams are
        # persisted next to the accuracies. With n_devices the OUTER-FOLD
        # axis shards over the mesh (embarrassingly parallel, like the
        # fixed-param fold sharding); the TPE proposal step stays host-side
        from cross_patient_speech_decoding_tpu.decoders.nested_cv import (
            nested_cv_decode_bayes,
        )

        for it in range(len(all_accs), cfg.n_iter):
            out = nested_cv_decode_bayes(
                tar, cross, dcfg, n_folds=cfg.n_folds,
                n_rounds=cfg.nested_rounds, n_points=cfg.nested_points,
                n_inner=cfg.nested_inner, strategy=cfg.strategy,
                seed=cfg.seed + 104729 * it,
                train_frac=cfg.trial_subsample,
                return_preds=cfg.save_preds,
                mesh=mesh,
            )
            extra = {}
            if cfg.save_preds:
                accs, hp_best, preds, te = out
                yt, yp, wr = _prediction_records(y_host, np.asarray(preds), te)
                extra.update(y_true=yt, y_pred=yp, wrong_trs=wr)
            else:
                accs, hp_best = out
            extra.update({k: np.asarray(v) for k, v in hp_best.items()})
            all_accs.append(accs)
            append_results_pkl(
                cfg.out, accs, params=vars(cfg), extra=extra,
            )
            if verbose:
                print(
                    f"iter {it} [nested]: balanced acc {accs.mean():.3f} "
                    f"(chance {1.0 / n_y:.3f})",
                    flush=True,
                )
        return np.stack(all_accs)

    decoder = make_cv_decoder(cfg.strategy, dcfg, fold_batch=cfg.fold_batch,
                              mesh=mesh, return_preds=cfg.save_preds)
    # iter_batch > 1 stacks several iterations' fold masks into one device
    # call (folds are just rows to the decoder; per-iteration seeds and
    # incremental persistence are unchanged, so resume stays per-iteration
    # and results are bit-identical to the sequential loop). Amortizes the
    # ~0.4 s/call tunnel sync over the chunk.
    ib = max(1, cfg.iter_batch)
    it = len(all_accs)
    while it < cfg.n_iter:
        k = min(ib, cfg.n_iter - it)
        pairs = [
            repeated_stratified_kfold_masks(
                y_host, cfg.n_folds, 1, seed=cfg.seed + it + j
            )
            for j in range(k)
        ]
        if cfg.trial_subsample < 1.0:
            # -tss: stratified per-fold target-train subsample
            # (aligned_decode_svm_ncv.py:351-360). Seeded per ITERATION
            # (not per chunk) so results are identical across iter_batch
            # settings and across kill-and-resume boundaries.
            pairs = [
                (
                    stratified_train_subsample_masks(
                        p[0], y_host, cfg.trial_subsample,
                        np.random.default_rng(cfg.seed + 3571 * (it + j + 1)),
                    ),
                    p[1],
                )
                for j, p in enumerate(pairs)
            ]
        tr = np.concatenate([p[0] for p in pairs], axis=0)
        te = np.concatenate([p[1] for p in pairs], axis=0)
        out = decoder(tar, cross, jnp.asarray(tr), jnp.asarray(te))
        if cfg.save_preds:
            accs_all, preds_all = np.asarray(out[0]), np.asarray(out[1])
        else:
            accs_all, preds_all = np.asarray(out), None
        for j in range(k):
            sl = slice(j * cfg.n_folds, (j + 1) * cfg.n_folds)
            accs = accs_all[sl]
            all_accs.append(accs)
            extra = None
            if preds_all is not None:
                yt, yp, wr = _prediction_records(y_host, preds_all[sl], te[sl])
                extra = {"y_true": yt, "y_pred": yp, "wrong_trs": wr}
            append_results_pkl(cfg.out, accs, params=vars(cfg), extra=extra)
            if verbose:
                print(
                    f"iter {it + j}: balanced acc {accs.mean():.3f} "
                    f"(chance {1.0 / n_y:.3f})",
                    flush=True,
                )
        it += k
    return np.stack(all_accs)


# ------------------------------------------------------------ train seq2seq ----

def _seq2seq_arrays(cfg: TrainSeq2SeqConfig):
    """(Xs, y_seq_raw) per patient — synthetic or pt_decoding_data*.pkl.

    The pkl path mirrors train_seq2seq.py:78-96: ``decoding_data_from_dict``
    with ``p_ind=1``, targets = full phoneme sequences (``tar_data[2]``),
    and pooled patients carry (X, y_full, y_full).
    """
    if cfg.data == "synthetic":
        # first three match the historical defaults (keeps test/bench
        # compile-cache shapes stable); the tail covers reference scale
        chans = (64, 72, 56, 96, 111, 128, 80, 104)[: cfg.synth_patients]
        ds = make_synthetic_patients_device(
            seed=cfg.seed, n_patients=cfg.synth_patients, n_classes=9,
            trials_per_class=cfg.synth_trials, T=cfg.synth_T,
            channels=chans, latent_dim=10, noise=0.5)
        return list(ds.X), [np.asarray(y) for y in ds.y_seq]

    pt_data = load_pkl(cfg.data)
    (X_t, _, ya_t), pre = decoding_data_from_dict(
        pt_data, cfg.target_pt, cfg.p_ind, cfg.lab_type, cfg.algn_type
    )
    Xs = [np.asarray(X_t, np.float32)]
    ys = [np.asarray(ya_t)]
    if cfg.pooled:
        for X, _, ya in pre:
            Xs.append(np.asarray(X, np.float32))
            ys.append(np.asarray(ya))
    return Xs, ys


def run_train_seq2seq(cfg: TrainSeq2SeqConfig, verbose: bool = True,
                      prewarm_only: bool = False):
    """Seq2seq training: aligned pooling + k-fold CV.

    One iteration x fold slice of the reference's 50x20 design (scaled by
    cfg.n_iter/n_folds), full pipeline: per-patient PCA -> CCA align ->
    pool -> Seq2SeqRNN with teacher forcing -> test accuracy. Runs from
    the reference's ``pt_decoding_data*.pkl`` when ``data`` is a path.
    """
    from cross_patient_speech_decoding_tpu.data.splits import (
        stratified_kfold_masks,
    )
    from cross_patient_speech_decoding_tpu.decoders.pooled import (
        _fit_pca_latents,
        _transform_latents,
    )
    from cross_patient_speech_decoding_tpu.models import Seq2SeqRNN
    from cross_patient_speech_decoding_tpu.ops.cca import (
        fit_cca_aligner,
        transform_b_to_a,
    )
    from cross_patient_speech_decoding_tpu.train import (
        create_train_state,
        make_seq2seq_eval_step,
        make_seq2seq_train_step,
    )
    from cross_patient_speech_decoding_tpu.train.loops import (
        fit as fit_loop,
        make_optimizer,
    )

    if getattr(cfg, "n_devices", 0) > 0 and not cfg.fold_parallel:
        raise ValueError(
            "n_devices requires fold_parallel=true: fold-axis sharding "
            "is the seq2seq driver's multi-chip strategy (the sequential "
            "path trains one fold at a time on one device)"
        )
    Xs_raw, y_raw = _seq2seq_arrays(cfg)
    n_pts = len(Xs_raw)
    T = Xs_raw[0].shape[1]
    max_k = 24

    # integer class ids of the label sequences (for stratification + CCA)
    enc = [encode_label_sequences(y) for y in y_raw]
    uni = np.unique(np.concatenate(enc))
    strat_ids = [to_class_ids(e, uni)[0] for e in enc]

    # per-patient PCA latents + CCA alignment to target (patient 0).
    # CROSS latents are fold-invariant (all cross rows are training data;
    # process_aligner gets each cross patient's full set) but the TARGET
    # PCA and every CCA fit are refit per fold on the fold's train rows
    # only (the reference's per-fold process_aligner, datamodules.py:
    # 470-472) — an all-rows fit would leak test-fold trials and y_align
    # labels into the pooled features (same leak class fixed in
    # run_train_nn). Single-patient runs train on RAW channels with no
    # dim-red, like the reference's SimpleMicroDataModule path
    # (train_seq2seq.py:110-116).
    tarX = jnp.asarray(Xs_raw[0], jnp.float32)
    ids = [jnp.asarray(i, jnp.int32) for i in strat_ids]
    cross_lats = []
    for p in range(1, n_pts):
        X = jnp.asarray(Xs_raw[p], jnp.float32)
        pca = _fit_pca_latents(X, 0.9, max_k)
        cross_lats.append(_transform_latents(pca, X, max_k))

    def fold_feats(train_mask):
        """[target latents, aligned cross latents...] for ONE fold's
        train mask; vmappable over the fold axis."""
        if not cross_lats:
            return [tarX]  # raw channels, no dim-red (ptSpecific path)
        lat_t = _transform_latents(
            _fit_pca_latents(tarX, 0.9, max_k, sample_mask=train_mask),
            tarX, max_k,
        )
        out = [lat_t]
        for p, lat in enumerate(cross_lats, start=1):
            al = fit_cca_aligner(lat_t, lat, ids[0], ids[p], len(uni),
                                 mask_a=train_mask)
            out.append(transform_b_to_a(al, lat))
        return out

    fold_feats_batched = jax.jit(jax.vmap(fold_feats))

    # labels: map phoneme digits 1..9 -> classes 0..8 (reference subtracts
    # 1 from the full sequence labels, train_seq2seq.py:95-96); start-token
    # handling is inside the model (num_classes=9)
    y_seqs = [jnp.asarray(np.asarray(y, np.int32) - 1) for y in y_raw]
    model = Seq2SeqRNN(
        n_filters=cfg.n_filters, hidden=cfg.hidden, num_classes=9,
        n_enc_layers=cfg.n_enc_layers, n_dec_layers=cfg.n_dec_layers,
        kernel_size=cfg.kernel_size,
    )
    tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.decay_iters,
                        end_factor=0.01, clip=cfg.clip)
    train_step = jax.jit(make_seq2seq_train_step(model, tx))
    eval_step = jax.jit(make_seq2seq_eval_step(model))

    # kill-and-resume: per-iteration fold accuracies persist in a progress
    # pkl next to the CSV output; per-iteration seeding keeps the
    # continuation identical to an uninterrupted run
    progress_path = Path(cfg.out).with_suffix(".progress.pkl") if cfg.out else None
    done_iters: list[np.ndarray] = []
    if progress_path is not None:
        done_iters = _completed_results(
            progress_path, vars(cfg), scalar=False
        )[: cfg.n_iter]
        if done_iters and verbose:
            print(f"resuming: {len(done_iters)}/{cfg.n_iter} iterations done",
                  flush=True)
    results = [float(a) for accs in done_iters for a in np.ravel(accs)]

    def _iter_rng(it):
        return np.random.default_rng(cfg.seed + 7919 * it)

    def _record_iter(accs):
        if progress_path is not None:
            progress_path.parent.mkdir(parents=True, exist_ok=True)
            append_results_pkl(progress_path, np.asarray(accs),
                               params=vars(cfg))

    run_name = (
        f"{cfg.target_pt}_{'aligned' if cfg.pooled else 'ptSpecific'}_seq2seq"
    )
    start_it = len(done_iters)
    if cfg.fold_parallel:
        # all folds of an iteration train as ONE vmapped program — or, at
        # scales where 20 simultaneous folds exceed HBM (reference scale:
        # ~1.2k pooled trials x T=200), equal fold CHUNKS through the SAME
        # compiled program (fold_chunk=c). The jitted trainer is built
        # ONCE: its single trace serves all 50 iterations and every chunk.
        from cross_patient_speech_decoding_tpu.train.fold_parallel import (
            make_seq2seq_fold_trainer_fn,
            pooled_fold_arrays,
        )

        mesh = None
        if getattr(cfg, "n_devices", 0) > 0:
            from cross_patient_speech_decoding_tpu.parallel import make_mesh

            # build the mesh FIRST (raises if n_devices exceeds the
            # host's devices), then validate divisibility against the
            # mesh that will actually be used — the sharding constraint
            # in the trainer would silently no-op on a mismatch
            # (fold_parallel.py:118)
            mesh = make_mesh(cfg.n_devices)
            eff = cfg.fold_chunk if cfg.fold_chunk > 0 else cfg.n_folds
            width = mesh.shape["data"]
            if eff % width:
                raise ValueError(
                    f"mesh width {width} must divide the per-program "
                    f"fold count ({eff}: fold_chunk or n_folds) for "
                    "fold-axis sharding"
                )

        trainer_fn = make_seq2seq_fold_trainer_fn(
            model, lr=cfg.lr, weight_decay=cfg.weight_decay,
            decay_iters=cfg.decay_iters, clip=cfg.clip,
            rnn_impl=getattr(cfg, "rnn_impl", "scan"),
            mesh=mesh,
        )
        aug_names = _parse_augmentations(cfg.augmentations)
        if cfg.log_metrics and cfg.out and start_it == 0:
            # fresh run (not a resume): a pre-existing fold_accs.csv is a
            # stale log from an earlier run with the same out path —
            # truncate it rather than appending rows under its old header
            # (the per-epoch iterNNN.csv logs get the same treatment in
            # _run_log_path; resumes keep appending, their prior rows are
            # this run's own)
            stale = Path(cfg.out).parent / "logs" / run_name / "fold_accs.csv"
            if stale.exists():
                stale.unlink()
        for it in range(len(done_iters), cfg.n_iter):
            tr_m, te_m = stratified_kfold_masks(
                np.asarray(strat_ids[0]), cfg.n_folds, _iter_rng(it)
            )
            # leak-free per-fold features, folds stacked on a leading axis
            fold_list = fold_feats_batched(jnp.asarray(tr_m, jnp.float32))
            tar_f = fold_list[0]  # (F, N0, T, K)
            cross_f = list(fold_list[1:])
            tar_y, cross_y = y_seqs[0], list(y_seqs[1:])
            te_pass = None
            if aug_names:
                # augmented copies of the ALIGNED rows (the reference
                # augments the pooled aligned train set per fold,
                # datamodules.py:491-494); train masks tile over the
                # copies, test masks stay on the original target rows
                reps = len(aug_names) + 1
                key_aug = jax.random.key(cfg.seed + 900 + it)
                keys = jax.random.split(key_aug, 1 + len(cross_f))
                tar_f = _augment_stack_folds(tar_f, aug_names, keys[0])
                tar_y = jnp.concatenate([tar_y] * reps)
                cross_f = [
                    _augment_stack_folds(f, aug_names, k)
                    for f, k in zip(cross_f, keys[1:])
                ]
                cross_y = [jnp.concatenate([y] * reps) for y in cross_y]
                # augmented copies of train rows train; augmented copies
                # of test rows are in NEITHER set
                tr_m = np.tile(tr_m, (1, reps))
                te_pass = np.concatenate(
                    [te_m, np.zeros((te_m.shape[0],
                                     te_m.shape[1] * (reps - 1)))], axis=1
                )
            X_pool, y_pool, w, te = pooled_fold_arrays(
                tar_f,
                tar_y,
                cross_f,
                cross_y,
                tr_m,
                test_masks=te_pass,
            )
            F = w.shape[0]
            chunk = cfg.fold_chunk if cfg.fold_chunk > 0 else F
            per_fold_x = X_pool.ndim == 4

            def _chunk_args(c0):
                sl = slice(c0, c0 + chunk)
                Xc = X_pool[sl] if per_fold_x else X_pool
                return Xc, y_pool, w[sl], te[sl]

            if prewarm_only:
                # AOT-compile the full fold-parallel program (epochs is a
                # scan length, i.e. BAKED into the program) into the
                # persistent cache without executing 500 epochs
                t0 = time.perf_counter()
                trainer_fn.lower(
                    *_chunk_args(0), cfg.seed + it, cfg.epochs
                ).compile()
                if verbose:
                    print(
                        f"seq2seq fold-parallel program compiled in "
                        f"{time.perf_counter() - t0:.1f}s "
                        f"({min(chunk, F)} folds x {cfg.epochs} epochs)",
                        flush=True,
                    )
                return np.asarray([])
            with _maybe_trace(cfg.trace and it == start_it, cfg.out, run_name):
                parts = []
                for c0 in range(0, F, chunk):
                    # distinct seed per chunk so folds in different chunks
                    # never share init/epoch key streams
                    a, _ = trainer_fn(
                        *_chunk_args(c0), cfg.seed + it + 31 * c0, cfg.epochs
                    )
                    parts.append(np.asarray(a))
            accs = np.concatenate(parts)
            results.extend(accs.tolist())
            _record_iter(accs)
            if cfg.log_metrics and cfg.out:
                # the fold-vmapped program yields no per-epoch stream;
                # log one row of per-fold final accuracies per iteration
                from cross_patient_speech_decoding_tpu.train.loops import (
                    _append_csv,
                )

                _append_csv(
                    str(Path(cfg.out).parent / "logs" / run_name
                        / "fold_accs.csv"),
                    {"iter": it,
                     **{f"fold{j}": float(a) for j, a in enumerate(accs)}},
                )
            if verbose:
                print(
                    f"iter {it}: {cfg.n_folds} folds in one program, "
                    f"mean test acc {accs.mean():.3f}",
                    flush=True,
                )
        out = np.asarray(results)
        if cfg.out:
            Path(cfg.out).parent.mkdir(parents=True, exist_ok=True)
            np.savetxt(cfg.out, out, delimiter=",")
        return out

    aug_names = _parse_augmentations(cfg.augmentations)
    fold_feats_one = jax.jit(fold_feats)
    for it in range(len(done_iters), cfg.n_iter):
        iter_accs = []
        tr_m, te_m = stratified_kfold_masks(
            np.asarray(strat_ids[0]), cfg.n_folds, _iter_rng(it)
        )
        for k in range(cfg.n_folds):
            tr_idx = np.where(tr_m[k] > 0)[0]
            te_idx = np.where(te_m[k] > 0)[0]
            # leak-free per-fold features (PCA/CCA refit on train rows)
            feats = fold_feats_one(jnp.asarray(tr_m[k], jnp.float32))
            # pooled train: target train rows + all aligned cross rows
            X_train = jnp.concatenate(
                [feats[0][jnp.asarray(tr_idx)]] + list(feats[1:])
            )
            y_train = jnp.concatenate(
                [y_seqs[0][jnp.asarray(tr_idx)]] + list(y_seqs[1:])
            )
            if aug_names:
                # per-fold augmented copies of the pooled aligned train
                # set (datamodules.py:491-494)
                X_train = _augment_stack(
                    X_train, aug_names,
                    jax.random.key(cfg.seed + 900 + it * 100 + k),
                )
                y_train = jnp.concatenate([y_train] * (len(aug_names) + 1))
            X_test = feats[0][jnp.asarray(te_idx)]
            y_test = y_seqs[0][jnp.asarray(te_idx)]

            variables = model.init(
                {"params": jax.random.key(cfg.seed + k), "tf": jax.random.key(1)},
                X_train[:1], y_train[:1], 0.5,
            )
            state = create_train_state(model, variables, tx)
            with _maybe_trace(
                cfg.trace and it == start_it and k == 0, cfg.out, run_name
            ):
                res = fit_loop(
                    state, train_step, eval_step,
                    (X_train, y_train), (X_test, y_test),
                    epochs=cfg.epochs, key=jax.random.key(cfg.seed + 100 + k),
                    monitor="acc", mode="max", batch_size=cfg.batch_size,
                    eval_every=max(1, cfg.epochs // 20),
                    log_path=(
                        _run_log_path(cfg.out, run_name, it, k,
                                      fmt=cfg.log_format)
                        if cfg.log_metrics else None
                    ),
                    log_format=cfg.log_format,
                )
            results.append(res.best_metric)
            iter_accs.append(res.best_metric)
            if verbose:
                print(f"iter {it} fold {k}: best test acc {res.best_metric:.3f}",
                      flush=True)
        _record_iter(iter_accs)
    out = np.asarray(results)
    if cfg.out:
        Path(cfg.out).parent.mkdir(parents=True, exist_ok=True)
        np.savetxt(cfg.out, out, delimiter=",")
    return out


# ------------------------------------------------------------ observability ----

def _run_log_path(out: str, run_name: str, it: int, fold: int | None = None,
                  fmt: str = "csv"):
    """Per-epoch metrics log path next to the results file.

    Mirrors the reference's context-encoded TensorBoard run naming
    ``{pt}_{ptSpecific|aligned|unaligned|chance}_ctcRnn``
    (train_ctc_rnn.py:235-261): logs land under ``logs/{run_name}/``
    beside the results pickle, one log per iteration (and fold where
    applicable). ``fmt`` follows the driver's ``log_format`` knob:
    ``csv``/``jsonl`` files, or a ``tb`` run DIRECTORY of TensorBoard
    event files (live ``tensorboard --logdir``).
    """
    if not out:
        return None
    d = Path(out).parent / "logs" / run_name
    stem = f"iter{it:03d}" + ("" if fold is None else f"_fold{fold:02d}")
    if fmt == "tb":
        # one TB sub-run per iteration/fold. Same stale-log rule as the
        # csv branch: this is only reached for iterations about to RUN,
        # so pre-existing event files are an earlier run's — TensorBoard
        # would merge the two runs into garbled curves. Clear them.
        run_dir = d / stem
        if run_dir.is_dir():
            for old_ev in run_dir.glob("events.out.tfevents.*"):
                old_ev.unlink()
        return str(run_dir)
    p = d / (stem + (".jsonl" if fmt == "jsonl" else ".csv"))
    # this is only called for iterations about to RUN (resumed-away
    # iterations never reach it), so a pre-existing file is always a
    # stale log from an earlier run with the same out path — truncate it
    # rather than appending interleaved epoch streams
    if p.exists():
        p.unlink()
    return str(p)


def _maybe_trace(enabled: bool, out: str, run_name: str):
    """Device-profile context for the first executed iteration
    (``--trace`` flag -> utils.profiling.trace; perfetto/TensorBoard dir
    under ``trace/{run_name}`` beside the results file)."""
    import contextlib

    if not enabled:
        return contextlib.nullcontext()
    from cross_patient_speech_decoding_tpu.utils.profiling import trace

    d = Path(out or "results").parent / "trace" / run_name
    d.mkdir(parents=True, exist_ok=True)
    return trace(str(d))


# ----------------------------------------------------------------- train nn ----

def _make_nn_classifier(cfg, n_classes: int):
    """Model zoo switch for the NN decode driver (the classifier the
    reference's aligned_decode_nn.py comments out and then references —
    here actually constructed; surfaces `nn_models/models.py:111-205,
    393-596`)."""
    from cross_patient_speech_decoding_tpu.models import (
        CNNTransformer,
        TCNClassifier,
        TemporalConvRNN,
        TransformerClassifier,
    )

    if cfg.model == "tcn":
        return TCNClassifier(
            n_filters=cfg.n_filters, num_classes=n_classes,
            kernel_size=cfg.kernel_size, dropout=cfg.dropout,
        )
    if cfg.model == "transformer":
        return TransformerClassifier(
            d_model=cfg.d_model, num_classes=n_classes, n_heads=cfg.n_heads,
            n_layers=cfg.n_layers, dim_ff=cfg.dim_ff, dropout=cfg.dropout,
        )
    if cfg.model == "cnn_transformer":
        return CNNTransformer(
            n_filters=cfg.n_filters, num_classes=n_classes,
            kernel_size=cfg.kernel_size, n_heads=cfg.n_heads,
            n_layers=cfg.n_layers, dim_ff=cfg.dim_ff,
            cnn_dropout=cfg.dropout,
        )
    if cfg.model == "conv_rnn":
        return TemporalConvRNN(
            n_filters=cfg.n_filters, hidden=cfg.hidden,
            num_classes=n_classes, kernel_size=cfg.kernel_size,
            n_layers=cfg.n_layers, cnn_dropout=cfg.dropout,
            rnn_dropout=cfg.dropout,
        )
    raise ValueError(
        f"unknown model {cfg.model!r}; choose tcn | transformer | "
        "cnn_transformer | conv_rnn"
    )


def run_train_nn(cfg, verbose: bool = True):
    """NN-classifier cross-patient decode — the working analog of the
    reference's defective ``scripts/aligned_decode_nn.py`` (clf never
    constructed, :262-265): per-patient PCA latents, CCA alignment of each
    source into the target space, pooled training of a TCN / Transformer /
    CNNTransformer / TemporalConvRNN classifier, k-fold CV on the target,
    confusion-matrix accuracy per fold. Incremental persistence + resume
    like the other drivers.
    """
    from cross_patient_speech_decoding_tpu.data.splits import (
        stratified_kfold_masks,
    )
    from cross_patient_speech_decoding_tpu.decoders.pooled import (
        _fit_pca_latents,
        _transform_latents,
    )
    from cross_patient_speech_decoding_tpu.ops.cca import (
        fit_cca_aligner,
        transform_b_to_a,
    )
    from cross_patient_speech_decoding_tpu.train import (
        create_train_state,
        make_classifier_eval_step,
        make_classifier_train_step,
    )
    from cross_patient_speech_decoding_tpu.train.loops import (
        fit as fit_loop,
        make_optimizer,
    )

    tar, cross, n_y, n_a = _patients_from_config(
        cfg.data, cfg.target_pt, cfg.p_ind, cfg.lab_type, cfg.algn_type,
        cfg.seed,
    )
    if not cfg.pooled:
        cross = ()

    # per-patient PCA latents + CCA alignment into the target space (the
    # process_aligner flow, nn_models datamodules.py:515-573). Source
    # latents are fold-independent (all source data is training data,
    # process_aligner gets each cross patient's full set); the TARGET
    # PCA + every CCA fit are refit per fold on the fold's train rows
    # only — the reference fits them "on each fold's training data"
    # (datamodules.py:63-65, :471) and an all-rows fit would leak
    # test-fold y_align labels into the pooled features.
    T = tar.X.shape[1]
    cross_lats = [
        _transform_latents(
            _fit_pca_latents(c.X, cfg.n_comp, cfg.max_k), c.X, cfg.max_k
        )
        for c in cross
    ]
    cross_labels = [c.y for c in cross]

    def fold_features(train_mask):
        lat_t = _transform_latents(
            _fit_pca_latents(tar.X, cfg.n_comp, cfg.max_k,
                             sample_mask=train_mask),
            tar.X, cfg.max_k,
        )
        feats = [lat_t.reshape(lat_t.shape[0], T, -1)]
        for c, lat in zip(cross, cross_lats):
            al = fit_cca_aligner(lat_t, lat, tar.y_align, c.y_align, n_a,
                                 mask_a=train_mask)
            lat = transform_b_to_a(al, lat)
            feats.append(lat.reshape(lat.shape[0], T, -1))
        return feats

    labels = [tar.y] + cross_labels

    model = _make_nn_classifier(cfg, n_y)
    tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.decay_iters,
                        end_factor=0.01, clip=cfg.clip)
    if getattr(cfg, "n_devices", 0) > 0:
        # data-parallel classifier step (batch rows shard, grads psum;
        # zero-weight padding keeps non-divisible batches exact)
        from cross_patient_speech_decoding_tpu.parallel import (
            make_mesh,
            make_sharded_classifier_train_step,
        )

        train_step = make_sharded_classifier_train_step(
            model, tx, make_mesh(cfg.n_devices)
        )
    else:
        train_step = jax.jit(make_classifier_train_step(model, tx))
    eval_step = jax.jit(make_classifier_eval_step(model))
    y_host = np.asarray(tar.y)

    if cfg.out:
        Path(cfg.out).parent.mkdir(parents=True, exist_ok=True)
    all_accs = _completed_results(cfg.out, vars(cfg), scalar=False)[: cfg.n_iter]
    if all_accs and verbose:
        print(f"resuming: {len(all_accs)}/{cfg.n_iter} iterations done",
              flush=True)

    run_name = f"{cfg.target_pt}_{cfg.model}_nnDecode"
    start_it = len(all_accs)
    for it in range(len(all_accs), cfg.n_iter):
        rng = np.random.default_rng(cfg.seed + 7919 * it)
        tr_m, te_m = stratified_kfold_masks(y_host, cfg.n_folds, rng)
        fold_accs = []
        for k in range(cfg.n_folds):
            tr_i = jnp.asarray(np.where(tr_m[k] > 0)[0])
            te_i = jnp.asarray(np.where(te_m[k] > 0)[0])
            feats = fold_features(jnp.asarray(tr_m[k], jnp.float32))
            X_train = jnp.concatenate([feats[0][tr_i]] + feats[1:])
            y_train = jnp.concatenate([labels[0][tr_i]] + labels[1:])
            test_batch = (feats[0][te_i], labels[0][te_i])

            variables = model.init(
                jax.random.key(cfg.seed + 31 * it + k), X_train[:1]
            )
            state = create_train_state(model, variables, tx)
            with _maybe_trace(
                cfg.trace and it == start_it and k == 0, cfg.out, run_name
            ):
                res = fit_loop(
                    state, train_step, eval_step,
                    (X_train, y_train), test_batch,
                    epochs=cfg.epochs,
                    key=jax.random.key(cfg.seed + 1000 + 31 * it + k),
                    monitor="acc", mode="max", batch_size=cfg.batch_size,
                    eval_every=cfg.epochs,  # final-epoch eval only: the
                    # test split must not select the checkpoint
                    log_path=(
                        _run_log_path(cfg.out, run_name, it, k,
                                      fmt=cfg.log_format)
                        if cfg.log_metrics else None
                    ),
                    log_format=cfg.log_format,
                )
            acc = float(res.history[-1]["acc"])
            fold_accs.append(acc)
        fold_accs = np.asarray(fold_accs)
        all_accs.append(fold_accs)
        if cfg.out:
            append_results_pkl(cfg.out, fold_accs, params=vars(cfg))
        if verbose:
            print(
                f"iter {it} [{cfg.model}]: mean test acc "
                f"{fold_accs.mean():.3f} (chance {1.0 / n_y:.3f})",
                flush=True,
            )
    return np.stack(all_accs)


# --------------------------------------------------------------- train ctc ----

def _tuple_arg(s: str):
    return tuple(float(x) for x in str(s).split(","))


def _subsample_ctc_set(d, frac: float, rng: np.random.Generator):
    """Stratified (by first label) row subsample of one CTC dataset tuple
    — the fig_5 data-scaling axis applied to a cross patient's pooled
    trials (same stratification as the target_subsample path,
    train_ctc_rnn.py:104-116)."""
    X, y, il, ll = d
    y = np.asarray(y)
    keep = []
    for c in np.unique(y[:, 0]):
        idx = np.where(y[:, 0] == c)[0]
        n_keep = max(1, int(round(frac * len(idx))))
        keep.append(rng.permutation(idx)[:n_keep])
    keep = np.sort(np.concatenate(keep))
    # X may live on device (synthetic latents): index with jnp, not np
    return (X[jnp.asarray(keep)] if hasattr(X, "devices") else X[keep],
            y[keep], np.asarray(il)[keep], np.asarray(ll)[keep])


def _with_labels(X, y, T=None):
    """(X, labels) -> CTC tuple (X, labels, input_lens, label_lens)."""
    n = len(X)
    T = X.shape[1] if T is None else T
    return (
        np.asarray(X, np.float32),
        np.asarray(y, np.int32),
        np.full(n, T, np.int32),
        np.full(n, y.shape[1], np.int32),
    )


def _chance_labels(cfg: TrainCTCConfig, y: np.ndarray,
                   rng: np.random.Generator) -> np.ndarray:
    """Chance-context label null: permutation (train_ctc_rnn.py:155-158)
    or fresh random sequences (tune_ctc_rnn.py make_chance_labels)."""
    if cfg.chance_mode == "random":
        from cross_patient_speech_decoding_tpu.utils.labels import (
            make_chance_labels,
        )

        return make_chance_labels(rng, len(y), y.shape[1], n_sil=cfg.n_sil)
    if cfg.chance_mode != "permute":
        raise ValueError(
            f"chance_mode must be 'permute' or 'random', got {cfg.chance_mode!r}"
        )
    return y[rng.permutation(len(y))]


def _load_ctc_files(cfg: TrainCTCConfig, rng: np.random.Generator):
    """Reference CTC ingestion from the HDF5 file (train_ctc_rnn.py:88-150).

    Target train/test from the file's split; optional stratified target
    subsample; pooled contexts load every ``train_pts`` patient (one-block
    patients train-only, others load_all), project through precomputed
    PCA/CCA transforms when ``pca_path`` is set (tune_ctc_rnn.py:109-205)
    or fit PCA+CCA on the fly otherwise.

    Returns (datasets, C, test): datasets[0] is the target train set.
    """
    from cross_patient_speech_decoding_tpu.data.loaders import (
        apply_latent_xform,
        load_cca_xform,
        load_ctc_h5,
        load_pca_xform,
    )

    tw_sel, tw_orig = _tuple_arg(cfg.tw_select), _tuple_arg(cfg.tw_orig)
    X_t, y_t, X_te, y_te = load_ctc_h5(
        cfg.data, cfg.target_pt, tw_sel, tw_orig, zscore=cfg.zscore,
        n_sil=cfg.n_sil,
    )
    if cfg.target_subsample < 1.0:
        # stratified train-size subsample by first phoneme (:104-116)
        keep = []
        for c in np.unique(y_t[:, 0]):
            idx = np.where(y_t[:, 0] == c)[0]
            n_keep = max(1, int(round(cfg.target_subsample * len(idx))))
            keep.append(rng.permutation(idx)[:n_keep])
        keep = np.concatenate(keep)
        X_t, y_t = X_t[keep], y_t[keep]

    if cfg.context == "chance":
        y_t = _chance_labels(cfg, y_t, rng)

    pooled = cfg.context in ("unaligned", "aligned")
    cross = []
    if pooled and cfg.train_pts:
        only_train_set = set(filter(None, cfg.only_train_pts.split(",")))
        for pt in cfg.train_pts.split(","):
            pt = pt.strip()
            if not pt or pt == cfg.target_pt:
                continue
            one_block = pt in only_train_set
            X_p, y_p, _, _ = load_ctc_h5(
                cfg.data, pt, tw_sel, tw_orig, zscore=cfg.zscore,
                only_train=one_block, load_all=not one_block,
                n_sil=cfg.n_sil,
            )
            cross.append((pt, X_p, y_p))

    if not pooled or not cross:
        datasets = [_with_labels(X_t, y_t)]
        return datasets, X_t.shape[-1], _with_labels(X_te, y_te)

    align_pt = cfg.align_pt or cfg.target_pt
    if cfg.pca_path:
        # precomputed offline transforms (tune_ctc_rnn.py:109-205)
        W_t = load_pca_xform(cfg.pca_path, cfg.target_pt)
        M_t = None
        if cfg.context == "aligned" and cfg.target_pt != align_pt:
            M_t = load_cca_xform(cfg.cca_path, align_pt, cfg.target_pt)
        lat_t = apply_latent_xform(X_t, W_t, M_t)
        lat_te = apply_latent_xform(X_te, W_t, M_t)
        lats = []
        for pt, X_p, y_p in cross:
            W_p = load_pca_xform(cfg.pca_path, pt)
            M_p = None
            if cfg.context == "aligned" and pt != align_pt:
                M_p = load_cca_xform(cfg.cca_path, align_pt, pt)
            lats.append((apply_latent_xform(X_p, W_p, M_p), y_p))
        if cfg.context == "unaligned":
            # truncate to common latent width (tune_ctc_rnn.py:197-205)
            min_dim = min([lat_t.shape[-1]] + [l.shape[-1] for l, _ in lats])
            lat_t, lat_te = lat_t[..., :min_dim], lat_te[..., :min_dim]
            lats = [(l[..., :min_dim], y) for l, y in lats]
        datasets = [_with_labels(lat_t, y_t)]
        datasets += [_with_labels(l, y) for l, y in lats]
        return datasets, lat_t.shape[-1], _with_labels(lat_te, y_te)

    # on-the-fly PCA (+ CCA for the aligned context), fit on train only;
    # one jitted program per fit (see _ctc_prep_jit) — eager per-op
    # dispatch through the tunneled backend dominated prep otherwise
    pca_fit_lat, pca_apply, cca_align_lat = _ctc_prep_jit()

    max_k = 32
    Xj_t = jnp.asarray(X_t)
    pca_t, lat_t = pca_fit_lat(Xj_t, None, cfg.n_components, max_k)
    lat_te = pca_apply(pca_t, jnp.asarray(X_te), max_k)

    ids = [encode_label_sequences(y_t)]
    cross_lats = []
    for pt, X_p, y_p in cross:
        _, lat_p = pca_fit_lat(
            jnp.asarray(X_p), None, cfg.n_components, max_k
        )
        cross_lats.append((lat_p, y_p))
        ids.append(encode_label_sequences(y_p))
    uni = np.unique(np.concatenate(ids))
    idsj = [jnp.asarray(to_class_ids(e, uni)[0]) for e in ids]

    datasets = [_with_labels(np.asarray(lat_t, np.float32), y_t)]
    for i, (lat, y_p) in enumerate(cross_lats):
        if cfg.context == "aligned":
            lat = cca_align_lat(lat_t, lat, idsj[0], idsj[i + 1], None,
                                len(uni))
        datasets.append(_with_labels(np.asarray(lat, np.float32), y_p))
    return datasets, max_k, _with_labels(np.asarray(lat_te, np.float32), y_te)


def _prep_ctc_context(cfg: TrainCTCConfig, rng: np.random.Generator,
                      tar_train_mask=None):
    """Pool/align CTC data per context (select_datamodule analog).

    Returns (datasets, n_features, test): datasets[0] is the target train
    set; ``test`` is the file-defined held-out set (None for synthetic
    data, where the caller splits by mask).

    ``tar_train_mask`` (synthetic pooled contexts): (n_tar,) float mask of
    the iteration's target TRAIN rows — the target PCA and every CCA fit
    are restricted to it so held-out trials (and their alignment labels)
    never shape the pooled features. Cross patients' own fits stay
    full-data: all their rows are training data.
    """
    if cfg.data != "synthetic":
        return _load_ctc_files(cfg, rng)

    pts = _synthetic_ctc_cfg(cfg)
    X_t, y_t, il_t, ll_t = pts[0]
    if cfg.context == "chance":
        y_t = _chance_labels(cfg, y_t, rng)
        return [(X_t, y_t, il_t, ll_t)], X_t.shape[-1], None

    if cfg.context == "patient":
        return [(X_t, y_t, il_t, ll_t)], X_t.shape[-1], None

    # pooled contexts: per-patient PCA to a common width. Each fit runs
    # as ONE jitted program (see _ctc_prep_jit) — this prep re-runs every
    # iteration with a fresh train mask, so dispatch count is the cost
    # driver on the remote backend.
    pca_fit_lat, _, cca_align_lat = _ctc_prep_jit()
    max_k = 32
    maskj = (
        None if tar_train_mask is None
        else jnp.asarray(tar_train_mask, jnp.float32)
    )
    lats, metas = [], []
    ids = []
    for i, (X, y, il, ll) in enumerate(pts):
        Xj = jnp.asarray(X)
        _, lat = pca_fit_lat(
            Xj, maskj if i == 0 else None, cfg.n_components, max_k
        )
        lats.append(lat)
        metas.append((y, il, ll))
        enc = encode_label_sequences(y)
        ids.append(enc)
    uni = np.unique(np.concatenate(ids))
    idsj = [jnp.asarray(to_class_ids(e, uni)[0]) for e in ids]

    out = []
    for i, lat in enumerate(lats):
        if cfg.context == "aligned" and i > 0:
            lat = cca_align_lat(lats[0], lat, idsj[0], idsj[i], maskj,
                                len(uni))
        y, il, ll = metas[i]
        out.append((lat.astype(jnp.float32), y, il, ll))
    return out, max_k, None


_HPARAM_TO_CFG = {
    # reference tuned-hparam h5 keys -> config field (train_ctc_rnn.py:394-401)
    "learning_rate": "lr",
    "gclip_val": "clip",
    "hidden_size": "hidden",
    "n_layers": "n_layers",
    "dropout": "dropout",
    "l2_reg": "weight_decay",
}

_CONTEXT_NAMES = {
    # config context -> reference context string (train_ctc_rnn.py:404-412)
    "aligned": "aligned",
    "unaligned": "unaligned",
    "chance": "chance",
    "patient": "ptSpecific",
}


def _apply_tuned_hparams(cfg: TrainCTCConfig) -> TrainCTCConfig:
    """Overlay tuned hparams from a sweep output dir onto the config."""
    if not cfg.hparam_dir:
        return cfg
    import dataclasses

    from cross_patient_speech_decoding_tpu.data.loaders import (
        load_tuned_hparams,
    )

    defaults = {k: getattr(cfg, f) for k, f in _HPARAM_TO_CFG.items()}
    tuned = load_tuned_hparams(
        cfg.hparam_dir, cfg.target_pt, _CONTEXT_NAMES[cfg.context], defaults
    )
    updates = {}
    for k, f in _HPARAM_TO_CFG.items():
        typ = type(getattr(cfg, f))
        updates[f] = typ(tuned[k])
    return dataclasses.replace(cfg, **updates)


def _same_run_config(stored: dict, current: dict) -> bool:
    """True when a persisted results file belongs to THIS run config.

    ``n_iter``/``out`` are allowed to differ (resuming with a larger
    iteration budget is the use case), as are the pure-output /
    observability fields (``results_h5``/``log_metrics``/``trace``) that
    cannot affect computed results — adding ``results_h5=`` to export an
    already-finished run must resume, not retrain. Anything else — e.g. a
    different ``context`` writing to the same default path — must NOT
    resume, or a contexts comparison would silently return the first
    context's numbers.
    """
    # n_devices is execution topology, not experiment identity: the mesh
    # paths are exact (global weighted means / deterministic fold
    # sharding), so adding chips to finish a half-done matrix must resume
    skip = {"n_iter", "out", "results_h5", "log_metrics",
            "log_format", "trace", "n_devices"}
    keys = (set(stored) | set(current)) - skip
    return all(stored.get(k) == current.get(k) for k in keys)


# retained set-aside copies per result stem: repeated config-mismatched
# reruns (smoke tests, bench loops) must leave a BOUNDED footprint while
# the newest few mismatched stores — the ones a user might still want —
# survive (round-4 verdict: 45 unreclaimed .staleN files in results/)
STALE_KEEP = 10


def _set_aside_stale(p: Path) -> Path:
    """Move a config-mismatched results file into the ``_stale/`` sidecar
    next to it (timestamped, collision-safe), then prune that stem's
    set-asides to the newest :data:`STALE_KEEP`."""
    import time as _time

    stale_dir = p.parent / "_stale"
    stale_dir.mkdir(parents=True, exist_ok=True)
    ts = _time.strftime("%Y%m%d-%H%M%S")
    stale = stale_dir / f"{ts}_{p.name}"
    n = 1
    while stale.exists():
        stale = stale_dir / f"{ts}.{n}_{p.name}"
        n += 1
    p.rename(stale)
    # rename preserves the results file's own mtime, so ordering by it
    # keeps the most recently WRITTEN stores (ns resolution breaks
    # same-second ties from rapid reruns)
    olds = sorted(
        (f for f in stale_dir.glob(f"*_{p.name}") if f.is_file()),
        key=lambda f: f.stat().st_mtime_ns,
    )
    for f in olds[:-STALE_KEEP]:
        f.unlink()
    return stale


def _completed_results(out_path: str, params: dict, scalar: bool = True,
                       set_aside: bool = True):
    """Previously persisted per-iteration results, for kill-and-resume.

    The reference sketched this as ``get_completed_iters`` scanning
    ``iter_{i}/result.pt`` files (tune_ctc_rnn.py:905-921, commented out);
    here the incremental results pickle *is* the manifest. A file written
    by a DIFFERENT config is set aside (moved into a timestamped
    ``_stale/`` sidecar, pruned to the newest :data:`STALE_KEEP` copies
    per stem — never deleted in-flight, so prior expensive TPU results
    survive even a crash right after the rename) so stale results can
    never masquerade as this run's. ``set_aside=False`` makes the check
    READ-ONLY (mismatches return [] without touching the file) — preview
    paths like ``cpsd reproduce dry_run=true`` must not mutate result
    files.
    """
    if not out_path:
        return []
    p = Path(out_path)
    if not p.is_file():
        return []
    store = load_pkl(p)
    if not _same_run_config(store.get("params", {}), params):
        if not set_aside:
            return []
        stale = _set_aside_stale(p)
        print(f"config mismatch: prior results moved to {stale}", flush=True)
        return []
    accs = store.get("accs", [])
    if scalar:
        return [float(np.asarray(a).ravel()[0]) for a in accs]
    return [np.asarray(a) for a in accs]


_CTC_AUGS = (
    "time_warping", "time_masking", "time_shifting", "noise_jitter",
    "scaling",
)


def _parse_augmentations(spec: str):
    """training.augmentations YAML list analog: '' = none, 'all' = the
    reference default (all five transforms, train_ctc_rnn_config.yaml)."""
    if not spec:
        return ()
    names = _CTC_AUGS if spec == "all" else tuple(
        s.strip() for s in spec.split(",") if s.strip()
    )
    bad = [n for n in names if n not in _CTC_AUGS]
    if bad:
        raise ValueError(f"unknown augmentations {bad}; pick from {_CTC_AUGS}")
    return names


def _augment_stack(x, names, key):
    """[x, aug1(x), aug2(x), ...] concatenated on the trial axis — each
    transform sees the ORIGINAL tensor, the reference datamodules' concat
    semantics (realtime_datamodule.py:239-244, datamodules.py:491-494)."""
    from cross_patient_speech_decoding_tpu.ops import augment as _augs

    outs = [x]
    for name in names:
        key, sub = jax.random.split(key)
        outs.append(getattr(_augs, name)(sub, x))
    return jnp.concatenate(outs)


def _augment_stack_folds(x, names, key):
    """_augment_stack over (F, N, T, C) per-fold stacks: copies concat on
    the TRIAL axis (axis 1), each fold row drawing independently."""
    Fx, N, T, C = x.shape
    outs = [x]
    for name in names:
        from cross_patient_speech_decoding_tpu.ops import augment as _augs

        key, sub = jax.random.split(key)
        outs.append(
            getattr(_augs, name)(sub, x.reshape(Fx * N, T, C))
            .reshape(Fx, N, T, C)
        )
    return jnp.concatenate(outs, axis=1)


def _apply_ctc_augmentations(train_batch, names, key):
    """Augmented copies of the pooled CTC train set; labels/lengths repeat."""
    x, y, il, ll = train_batch
    reps = len(names) + 1
    return (
        _augment_stack(x, names, key),
        jnp.concatenate([y] * reps),
        jnp.concatenate([il] * reps),
        jnp.concatenate([ll] * reps),
    )


def run_train_ctc(cfg: TrainCTCConfig, verbose: bool = True):
    """CTC training/eval for one context; returns test PER per iteration.

    File-backed runs (``data=<path.h5>``) follow the full reference
    pipeline (train_ctc_rnn.py main): h5 ingestion + pooling, tuned-hparam
    override, per-iteration incremental persistence, and resume (completed
    iterations are skipped on restart).
    """
    from cross_patient_speech_decoding_tpu.models import RealtimeRNN
    from cross_patient_speech_decoding_tpu.train import (
        create_train_state,
        make_ctc_eval_step,
        make_ctc_train_step,
    )
    from cross_patient_speech_decoding_tpu.train.loops import (
        fit as fit_loop,
        make_optimizer,
    )

    cfg = _apply_tuned_hparams(cfg)
    init_vars = None
    if cfg.init_ckpt:
        # fine-tune a reference-trained model: architecture from the
        # checkpoint, params re-loaded as the warm start every iteration
        from cross_patient_speech_decoding_tpu.models.torch_import import (
            realtime_rnn_from_ckpt,
        )

        ck_model, init_vars = realtime_rnn_from_ckpt(cfg.init_ckpt)
        if ck_model.n_classes != 11:
            raise ValueError(
                f"checkpoint has {ck_model.n_classes} classes; the CTC "
                "phoneme task uses 11 (blank + 9 phonemes + sil)"
            )
        cfg.hidden, cfg.n_layers = ck_model.hidden, ck_model.n_layers
        cfg.win_size, cfg.stride = ck_model.win_size, ck_model.stride
        init_vars = jax.tree.map(jnp.asarray, init_vars)
    if cfg.results_h5 and not (cfg.save_logits and cfg.out):
        # the reference's save_results writes `logits` unconditionally
        # (train_ctc_rnn.py:448-491); warn UP FRONT so the user can
        # restart with save_logits=true instead of discovering a
        # logits-less h5 after hours of training
        print(
            "WARNING: results_h5 is set but logits will be OMITTED from "
            "the h5 (needs save_logits=true and a results pkl via out=); "
            "reference notebooks reading f['logits'] will fail on it",
            flush=True,
        )
    done = _completed_results(cfg.out, vars(cfg)) if cfg.out else []
    pers = list(done[: cfg.n_iter])
    if pers and verbose:
        print(f"resuming: {len(pers)}/{cfg.n_iter} iterations already done",
              flush=True)
    if cfg.out:
        Path(cfg.out).parent.mkdir(parents=True, exist_ok=True)
    run_name = f"{cfg.target_pt}_{_CONTEXT_NAMES[cfg.context]}_ctcRnn"
    start_it = len(pers)

    # ingestion is rng-dependent only for chance-label shuffling and
    # target subsampling; otherwise hoist it out of the iteration loop —
    # n_iter=50 would pay 50x the h5 reads, tunnel transfers and PCA/CCA
    # fits for bitwise-identical datasets. EXCEPTION: synthetic pooled
    # contexts fit the target PCA/CCA on each iteration's TRAIN rows only
    # (leak-free, like the reference's per-run datamodule fits), so their
    # prep is mask-dependent and cannot be cached across iterations.
    synth_pooled = (
        cfg.data == "synthetic" and cfg.context in ("aligned", "unaligned")
    )
    prep_invariant = (
        cfg.context != "chance" and cfg.target_subsample >= 1.0
        and not synth_pooled
    )
    prep_cache = None
    if prep_invariant and len(pers) < cfg.n_iter:
        prep_cache = _prep_ctc_context(cfg, np.random.default_rng(cfg.seed))
    n_tar = (
        _synthetic_ctc_n_trials(cfg) if synth_pooled else None
    )

    # model/optimizer/step programs are iteration-invariant: building (and
    # jitting) them once keeps ONE trace across the n_iter loop instead of
    # re-lowering the full CTC train/eval programs every iteration
    model = RealtimeRNN(
        hidden=cfg.hidden, n_layers=cfg.n_layers, n_classes=11,
        dropout=cfg.dropout, win_size=cfg.win_size, stride=cfg.stride,
    )
    tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.decay_steps,
                        clip=cfg.clip)
    if getattr(cfg, "n_devices", 0) > 0:
        # data-parallel shard_map step over a 1-D mesh: batch rows shard,
        # params/optimizer replicate, gradients psum. Non-divisible
        # batches pad with zero-weight rows (exact gradients); only the
        # per-shard dropout key stream differs from the 1-device run.
        from cross_patient_speech_decoding_tpu.parallel import (
            make_mesh,
            make_padded_sharded_ctc_train_step,
        )

        train_step = make_padded_sharded_ctc_train_step(
            model, tx, make_mesh(cfg.n_devices)
        )
    else:
        train_step = jax.jit(make_ctc_train_step(model, tx))
    eval_step = jax.jit(make_ctc_eval_step(model))
    logits_fn = jax.jit(
        lambda s, x: jax.nn.log_softmax(
            model.apply({"params": s.params}, x, True), axis=-1
        )
    )

    for it in range(len(pers), cfg.n_iter):
        # per-iteration generator so resumed runs are deterministic
        rng = np.random.default_rng(cfg.seed + 7919 * it)
        if synth_pooled:
            # split FIRST (prep consumes no rng here), then fit the
            # target-side PCA/CCA on the train rows only
            tr, va, te = train_val_test_masks(
                n_tar, rng, cfg.val_frac, cfg.test_frac
            )
            datasets, C, test = _prep_ctc_context(
                cfg, rng, tar_train_mask=tr
            )
            te_i = np.where(te > 0)[0]
        else:
            datasets, C, test = (
                prep_cache if prep_cache is not None
                else _prep_ctc_context(cfg, rng)
            )
            n = len(datasets[0][0])
            if test is None:
                tr, va, te = train_val_test_masks(
                    n, rng, cfg.val_frac, cfg.test_frac
                )
                te_i = np.where(te > 0)[0]
            else:
                tr, va, _ = train_val_test_masks(n, rng, cfg.val_frac, 0.0)
                te_i = None
        X_t, y_t, il_t, ll_t = datasets[0]
        tr_i, va_i = np.where(tr > 0)[0], np.where(va > 0)[0]

        def batch(idx):
            return (
                jnp.asarray(X_t[idx]),
                jnp.asarray(y_t[idx]),
                jnp.asarray(il_t[idx]),
                jnp.asarray(ll_t[idx]),
            )

        train_batch = batch(tr_i)
        if len(datasets) > 1:  # append pooled cross data to train
            cross_sets = datasets[1:]
            if cfg.cross_subsample < 1.0:
                # fig_5 data-scaling axis: per-iteration stratified
                # subsample of each cross patient's pooled trials
                cross_sets = [
                    _subsample_ctc_set(d, cfg.cross_subsample, rng)
                    for d in cross_sets
                ]
            Xs = [X_t[tr_i]] + [d[0] for d in cross_sets]
            ys = [y_t[tr_i]] + [d[1] for d in cross_sets]
            ils = [il_t[tr_i]] + [d[2] for d in cross_sets]
            lls = [ll_t[tr_i]] + [d[3] for d in cross_sets]
            # X concat on device (synthetic X never leaves the chip);
            # labels/lengths are host numpy
            train_batch = (
                jnp.concatenate([jnp.asarray(x) for x in Xs]),
                jnp.asarray(np.concatenate(ys)),
                jnp.asarray(np.concatenate(ils)),
                jnp.asarray(np.concatenate(lls)),
            )

        test_batch = batch(te_i) if test is None else tuple(
            jnp.asarray(a) for a in test
        )

        aug_names = _parse_augmentations(cfg.augmentations)
        if aug_names:
            train_batch = _apply_ctc_augmentations(
                train_batch, aug_names, jax.random.key(cfg.seed + 500 + it)
            )

        if init_vars is not None:
            want = init_vars["params"]["rnn"]["fwd0"]["wi"].shape[0]
            have = train_batch[0].shape[-1] * cfg.win_size
            if want != have:
                raise ValueError(
                    f"checkpoint input width {want} != data width {have} "
                    f"({train_batch[0].shape[-1]} channels x win "
                    f"{cfg.win_size}); match n_components / channel "
                    "selection to the checkpoint's training setup"
                )
            variables = init_vars
        else:
            variables = model.init(
                jax.random.key(cfg.seed + it), train_batch[0][:1]
            )
        state = create_train_state(model, variables, tx)
        with _maybe_trace(cfg.trace and it == start_it, cfg.out, run_name):
            res = fit_loop(
                state,
                train_step,
                eval_step,
                train_batch,
                batch(va_i),
                epochs=cfg.epochs,
                key=jax.random.key(cfg.seed + 1000 + it),
                monitor="per",
                mode="min",
                batch_size=cfg.batch_size or None,
                eval_every=max(1, cfg.epochs // 30),
                log_path=(
                    _run_log_path(cfg.out, run_name, it,
                                  fmt=cfg.log_format)
                    if cfg.log_metrics else None
                ),
                log_format=cfg.log_format,
            )
        test_metrics = eval_step(res.best_state, test_batch)
        per = float(test_metrics["per"])
        if cfg.decode == "beam":
            per = _beam_rescore_per(model, res.best_state, test_batch, cfg)
        pers.append(per)
        extra = None
        if cfg.save_logits:
            # per-iteration test log-probs, the reference results-h5
            # 'logits' dataset (train_ctc_rnn.py:215-224, 483)
            lp = logits_fn(res.best_state, test_batch[0])
            extra = {"logits": np.asarray(lp)}
        if cfg.out:
            append_results_pkl(cfg.out, np.asarray([per]), params=vars(cfg),
                               extra=extra)
        if verbose:
            print(f"iter {it} [{cfg.context}]: test PER {per:.1f}%", flush=True)
    if cfg.results_h5:
        # also emit the reference's results-h5 layout
        # (train_ctc_rnn.py:448-491) so notebooks written against it keep
        # working; logits come from the incremental pkl when saved
        from cross_patient_speech_decoding_tpu.data.loaders import (
            save_ctc_results_h5,
        )
        from cross_patient_speech_decoding_tpu.utils.labels import PHON_DICT

        logits = None
        if cfg.save_logits and cfg.out and Path(cfg.out).exists():
            # extras append in lockstep with accs, so the first len(pers)
            # entries are exactly the iterations reported in `pers` (the
            # pkl may hold MORE when resuming with a smaller n_iter)
            ex = load_pkl(cfg.out).get("extra", [])[: len(pers)]
            if len(ex) == len(pers) and all(
                e and "logits" in e for e in ex
            ):
                logits = np.stack([e["logits"] for e in ex])
        save_ctc_results_h5(
            cfg.results_h5, np.asarray(pers), logits, PHON_DICT,
            model_hparams={
                "hidden_size": cfg.hidden, "n_layers": cfg.n_layers,
                "dropout": cfg.dropout, "learning_rate": cfg.lr,
                "l2_reg": cfg.weight_decay, "win_size": cfg.win_size,
                "stride": cfg.stride,
            },
        )
    return np.asarray(pers)


def _beam_rescore_per(model, state, batch, cfg):
    """Test-time PER with native prefix beam search (ctc_decoder.py beam
    path; C++ kernel via realtime.beam with Python fallback)."""
    from cross_patient_speech_decoding_tpu.models.realtime_rnn import (
        adjusted_input_lengths,
    )
    from cross_patient_speech_decoding_tpu.realtime.beam import (
        edit_distance_batch,
        prefix_beam_search,
    )

    x, labels, input_lens, label_lens = batch
    logits = model.apply({"params": state.params}, x, True)
    lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    in_adj = np.asarray(adjusted_input_lengths(input_lens, cfg.win_size, cfg.stride))
    preds, pred_lens = [], []
    max_len = lp.shape[1]
    for i in range(lp.shape[0]):
        seq, _ = prefix_beam_search(lp[i, : in_adj[i]], cfg.beam_size)
        seq = list(seq)[:max_len]
        preds.append(seq + [0] * (max_len - len(seq)))
        pred_lens.append(len(seq))
    dists = edit_distance_batch(
        np.asarray(preds, np.int32), np.asarray(pred_lens, np.int32),
        np.asarray(labels, np.int32), np.asarray(label_lens, np.int32),
    )
    return float(dists.sum() / max(1, int(np.asarray(label_lens).sum())) * 100.0)


# ----------------------------------------------------------------- prewarm ----

def run_prewarm_ctc(cfg: TrainCTCConfig, verbose: bool = True):
    """Populate the persistent compile cache with the production-shape CTC
    training programs ahead of a real run.

    The full multi-kernel train program cold-compiles in 10-25 min through
    the tunnel's remote helper (docs/ROUND2.md compile-latency policy);
    running ONE epoch of ONE iteration compiles bit-identical programs
    (epoch count is a host loop, not baked) so the real `cpsd train-ctc`
    at the same config starts training from cache in seconds. Use the SAME
    yaml/overrides as the production run.
    """
    import dataclasses

    t0 = time.perf_counter()
    warm_cfg = dataclasses.replace(
        cfg, n_iter=1, epochs=1, out="", log_metrics=False, trace=False
    )
    run_train_ctc(warm_cfg, verbose=False)
    if verbose:
        print(
            f"ctc train/eval programs compiled + cached in "
            f"{time.perf_counter() - t0:.1f}s (context={cfg.context})",
            flush=True,
        )
    return np.asarray([])


def run_prewarm_seq2seq(cfg: TrainSeq2SeqConfig, verbose: bool = True):
    """AOT-compile the seq2seq fold-parallel program into the persistent
    cache (epochs is a lax.scan length — BAKED into the program — so the
    prewarm must lower at the production epoch count; jit.lower().compile()
    populates the cache without executing)."""
    import dataclasses

    warm_cfg = dataclasses.replace(
        cfg, out="", log_metrics=False, trace=False
    )
    if not cfg.fold_parallel:
        warm_cfg = dataclasses.replace(warm_cfg, n_iter=1, epochs=1)
        t0 = time.perf_counter()
        run_train_seq2seq(warm_cfg, verbose=False)
        if verbose:
            print(f"seq2seq programs compiled + cached in "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
        return np.asarray([])
    return run_train_seq2seq(warm_cfg, verbose=verbose, prewarm_only=True)


# ---------------------------------------------------------------- tune ctc ----

def _tune_prep_cfg(cfg: TuneCTCConfig):
    """TrainCTCConfig mirror of a tune config (shared by the holdout and
    CV data paths)."""
    from cross_patient_speech_decoding_tpu.utils.config import TrainCTCConfig

    context = "aligned" if cfg.align_train else (
        "unaligned" if cfg.pool_train else "patient"
    )
    return TrainCTCConfig(
        data=cfg.data, target_pt=cfg.target_pt, train_pts=cfg.train_pts,
        only_train_pts=cfg.only_train_pts, zscore=cfg.zscore,
        tw_orig=cfg.tw_orig, tw_select=cfg.tw_select, n_sil=cfg.n_sil,
        pca_path=cfg.pca_path, cca_path=cfg.cca_path,
        align_pt=cfg.align_pt, context=context, seed=cfg.seed,
        n_components=cfg.n_components,
        synth_patients=cfg.synth_patients,
        synth_trials=cfg.synth_trials, synth_T=cfg.synth_T,
    )


def _label_seq_class_ids(y) -> np.ndarray:
    """Integer class per label SEQUENCE row (stratification key — the
    reference's select_cv stratifies on the sequence string)."""
    enc = encode_label_sequences(np.asarray(y))
    return to_class_ids(enc, np.unique(enc))[0]


def _tune_cv_trainer(cfg: TuneCTCConfig, rng: np.random.Generator, F: int):
    """The reference CV trainable (train_func_cv, tune_ctc_rnn.py:550-634):
    per-trial k-fold CV with fold-mean val PER.

    Fold membership is stratified over the TARGET label sequences; cross
    patients' rows are training data in every fold (the
    CTCHeldOutTargetValCVDataModule contract). Synthetic pooled contexts
    fit PCA/CCA per fold on that fold's target-train rows — the leak-free
    AlignCV semantics (tune_ctc_rnn_align) — producing a per-fold feature
    stack; file data uses precomputed (fold-invariant) transforms.
    """
    from cross_patient_speech_decoding_tpu.sweep.ctc import (
        make_ctc_cv_bucket_trainer,
    )

    pooled = cfg.align_train or cfg.pool_train
    if pooled or cfg.data != "synthetic":
        prep_cfg = _tune_prep_cfg(cfg)
        if cfg.data == "synthetic":
            cls = _label_seq_class_ids(_synthetic_ctc_cfg(cfg)[0][1])
            f_tr, f_va = stratified_kfold_masks(cls, F, rng)
            fold_sets = [
                _prep_ctc_context(prep_cfg, rng, tar_train_mask=f_tr[f])[0]
                for f in range(F)
            ]
            # per-fold transforms -> per-fold pooled features (F, N, T, C)
            x = jnp.stack([
                jnp.concatenate([jnp.asarray(d[0]) for d in ds])
                for ds in fold_sets
            ])
            ds0 = fold_sets[0]
        else:
            ds0, _, _ = _prep_ctc_context(prep_cfg, rng)
            cls = _label_seq_class_ids(ds0[0][1])
            f_tr, f_va = stratified_kfold_masks(cls, F, rng)
            x = jnp.concatenate([jnp.asarray(d[0]) for d in ds0])
        y = np.concatenate([np.asarray(d[1]) for d in ds0])
        il = np.concatenate([np.asarray(d[2]) for d in ds0])
        ll = np.concatenate([np.asarray(d[3]) for d in ds0])
        n_cross = len(y) - len(cls)
        w_tr = np.concatenate([f_tr, np.ones((F, n_cross))], axis=1)
        w_va = np.concatenate([f_va, np.zeros((F, n_cross))], axis=1)
    else:
        X, y, il, ll = _synthetic_ctc_cfg(cfg)[0]
        cls = _label_seq_class_ids(y)
        w_tr, w_va = stratified_kfold_masks(cls, F, rng)
        x = jnp.asarray(X)
        y, il, ll = np.asarray(y), np.asarray(il), np.asarray(ll)
    batch = (x, jnp.asarray(y), jnp.asarray(il), jnp.asarray(ll))
    return make_ctc_cv_bucket_trainer(
        batch, w_tr, w_va, n_classes=11, seed=cfg.seed,
        mesh=_tune_mesh(cfg),
        model_chunk=getattr(cfg, "model_chunk", 0),
    )


def _tune_mesh(cfg: TuneCTCConfig):
    if getattr(cfg, "n_devices", 0) <= 0:
        return None
    from cross_patient_speech_decoding_tpu.parallel import make_mesh

    return make_mesh(cfg.n_devices)


def run_tune_ctc(cfg: TuneCTCConfig, verbose: bool = True):
    from cross_patient_speech_decoding_tpu.sweep import (
        Manifest,
        SweepSpace,
        run_sweep,
        sample_trials,
    )
    from cross_patient_speech_decoding_tpu.sweep.ctc import (
        make_ctc_bucket_trainer,
    )

    rng = np.random.default_rng(cfg.seed)
    pooled = cfg.align_train or cfg.pool_train
    if cfg.cv_folds > 0:
        # reference CV trainable (train_func_cv): fold-mean val PER
        trainer = _tune_cv_trainer(cfg, rng, int(cfg.cv_folds))
    elif pooled or cfg.data != "synthetic":
        # tune_ctc_rnn[_align] analog: precomputed transforms (pca_path) or
        # on-the-fly PCA + CCA pooling; file or synthetic data
        prep_cfg = _tune_prep_cfg(cfg)
        if cfg.data == "synthetic":
            # split FIRST so the pooled PCA/CCA fit excludes the val rows
            # (the leak-free prep; prep consumes no rng on this path)
            n_tar = _synthetic_ctc_n_trials(cfg)
            tr, va, _ = train_val_test_masks(n_tar, rng)
            datasets, _, _ = _prep_ctc_context(
                prep_cfg, rng, tar_train_mask=tr
            )
        else:
            datasets, _, _ = _prep_ctc_context(prep_cfg, rng)
            tr, va, _ = train_val_test_masks(len(datasets[0][0]), rng)
        X, y, il, ll = datasets[0]
        tr_i, va_i = np.where(tr > 0)[0], np.where(va > 0)[0]
        Xs = [X[tr_i]] + [d[0] for d in datasets[1:]]
        ys = [y[tr_i]] + [d[1] for d in datasets[1:]]
        ils = [il[tr_i]] + [d[2] for d in datasets[1:]]
        lls = [ll[tr_i]] + [d[3] for d in datasets[1:]]
        # X concat on DEVICE: synthetic latents live on-chip and a
        # np.concatenate would round-trip them through the ~30 MB/s
        # tunnel; labels/lengths are tiny host arrays
        train = (
            jnp.concatenate([jnp.asarray(a) for a in Xs]),
            jnp.asarray(np.concatenate([np.asarray(a) for a in ys])),
            jnp.asarray(np.concatenate([np.asarray(a) for a in ils])),
            jnp.asarray(np.concatenate([np.asarray(a) for a in lls])),
        )
        val = tuple(jnp.asarray(a[va_i]) for a in (X, y, il, ll))
    else:
        pts = _synthetic_ctc_cfg(cfg)
        X, y, il, ll = pts[0]
        tr, va, _ = train_val_test_masks(len(X), rng)
        tr_i, va_i = np.where(tr > 0)[0], np.where(va > 0)[0]
        train = tuple(jnp.asarray(a[tr_i]) for a in (X, y, il, ll))
        val = tuple(jnp.asarray(a[va_i]) for a in (X, y, il, ll))

    if cfg.cv_folds <= 0:
        trainer = make_ctc_bucket_trainer(
            train, val, n_classes=11, seed=cfg.seed, mesh=_tune_mesh(cfg)
        )
    Path(cfg.manifest).parent.mkdir(parents=True, exist_ok=True)
    rungs = tuple(int(r) for r in cfg.rungs.split(","))
    if cfg.sampler == "tpe":
        # BOHB-style model-based acquisition (tune_ctc_rnn.py:224-232)
        from cross_patient_speech_decoding_tpu.sweep.bayes import (
            default_ctc_space,
            run_bohb,
        )

        results = run_bohb(
            default_ctc_space(), trainer, n_trials=cfg.n_trials,
            batch=min(6, cfg.n_trials), rungs=rungs, eta=cfg.eta,
            manifest=Manifest(cfg.manifest), seed=cfg.seed,
        )
    else:
        trials = sample_trials(SweepSpace(), cfg.n_trials, seed=cfg.seed)
        results = run_sweep(
            trials, trainer, manifest=Manifest(cfg.manifest), rungs=rungs,
            eta=cfg.eta,
        )
    if results and cfg.hparam_out:
        # tune -> train handoff: persist the winner in the reference's
        # tuned-hparams h5 layout so `cpsd train-ctc hparam_dir=...`
        # picks it up (train_ctc_rnn.py:375-423 contract)
        from cross_patient_speech_decoding_tpu.data.loaders import (
            save_tuned_hparams,
        )

        best_cfg = results[0]["config"]
        context = "aligned" if cfg.align_train else (
            "unaligned" if cfg.pool_train else "patient"
        )
        path = save_tuned_hparams(
            cfg.hparam_out, cfg.target_pt, _CONTEXT_NAMES[context],
            {
                "learning_rate": float(best_cfg["lr"]),
                "l2_reg": float(best_cfg["weight_decay"]),
                "hidden_size": int(best_cfg["hidden"]),
                "n_layers": int(best_cfg["n_layers"]),
                "dropout": float(best_cfg["dropout"]),
            },
        )
        if verbose:
            print(f"tuned hparams -> {path}", flush=True)
    if verbose and results:
        best = results[0]
        print(f"best val PER {best['metric']:.1f}% config {best['config']}",
              flush=True)
    return results


# ------------------------------------------------------------ make xforms ----

def _offline_pca_components(X: np.ndarray, n_components: float):
    """PCA of a (trials, T, C) tensor: demeaned over flattened rows
    (float64, mirroring ``apply_latent_xform``'s application-side demean).

    ``n_components`` follows the framework-wide spec (ops/pca
    ``_resolve_n_active``): a fraction in (0, 1) keeps the smallest count
    reaching that cumulative variance; a whole value > 1 is a fixed count
    (``n_components=30`` parses to 30.0 on the float config field); 1.0
    is rejected rather than silently meaning one component.

    Returns ``(components (k, C), latents (trials, T, k) float32)`` so
    callers never re-project what the fit already computed.
    """
    Xr = X.reshape(-1, X.shape[-1]).astype(np.float64)
    Xr = Xr - Xr.mean(axis=0, keepdims=True)
    _, s, Vt = np.linalg.svd(Xr, full_matrices=False)
    if 0 < n_components < 1:
        ev = s**2
        frac = np.cumsum(ev) / max(ev.sum(), np.finfo(np.float64).tiny)
        k = int(np.searchsorted(frac, n_components) + 1)
    elif n_components > 1 and float(n_components).is_integer():
        k = min(int(n_components), len(s))
    else:
        raise ValueError(
            "n_components must be a variance fraction in (0, 1) or a "
            f"whole component count > 1, got {n_components!r}"
        )
    k = max(k, 1)
    W = np.ascontiguousarray(Vt[:k])
    lat = np.asarray((Xr @ W.T).reshape(X.shape[0], X.shape[1], -1),
                     np.float32)
    return W, lat


def run_make_xforms(cfg, verbose: bool = True):
    """Generate the offline PCA/CCA transform h5s that ``tune-ctc`` /
    ``train-ctc`` consume via ``pca_path=``/``cca_path=``.

    File layout contract: ``{pt}/components`` (n_components, n_channels)
    and ``{src}_to_{tgt}/components`` (k_src, k_tgt)
    (`tune_ctc_rnn.py:1050-1079`). The reference repo only ever READS
    these files — its generator lived outside the repo; this produces
    them from a CTC dataset's TRAIN blocks (per-patient PCA at the
    configured variance fraction, then class-averaged CCA from each
    source's latent space into the target's).
    """
    from cross_patient_speech_decoding_tpu.data.loaders import (
        load_ctc_h5,
        save_xforms_h5,
    )
    from cross_patient_speech_decoding_tpu.ops.cca import fit_cca_aligner

    tw_sel, tw_orig = _tuple_arg(cfg.tw_select), _tuple_arg(cfg.tw_orig)
    if cfg.data == "synthetic":
        pts_data = _synthetic_ctc_cfg(cfg)
        names = [cfg.target_pt] + [
            p.strip() for p in cfg.train_pts.split(",")
            if p.strip() and p.strip() != cfg.target_pt
        ]
        names += [f"SYN{i}" for i in range(len(names), len(pts_data))]
        names = names[: len(pts_data)]
        Xs = [np.asarray(d[0], np.float32) for d in pts_data[: len(names)]]
        ys = [np.asarray(d[1]) for d in pts_data[: len(names)]]
    else:
        names = [cfg.target_pt]
        for pt in cfg.train_pts.split(","):
            pt = pt.strip()
            if pt and pt != cfg.target_pt:
                names.append(pt)
        if len(names) < 2:
            raise ValueError(
                "make-xforms needs train_pts: at least one source patient "
                "besides the target"
            )
        only_train_set = set(filter(None, cfg.only_train_pts.split(",")))
        Xs, ys = [], []
        for pt in names:
            X_p, y_p, _, _ = load_ctc_h5(
                cfg.data, pt, tw_sel, tw_orig, zscore=cfg.zscore,
                only_train=True if pt in only_train_set else False,
            )
            Xs.append(np.asarray(X_p, np.float32))
            ys.append(np.asarray(y_p))

    # per-patient PCA components + latents
    comps, lats = {}, []
    for name, X in zip(names, Xs):
        W, lat = _offline_pca_components(X, cfg.n_components)
        comps[name] = W
        lats.append(lat)
    Path(cfg.pca_out).parent.mkdir(parents=True, exist_ok=True)
    save_xforms_h5(cfg.pca_out, pca=comps)
    if verbose:
        widths = {n: comps[n].shape[0] for n in names}
        print(f"PCA components -> {cfg.pca_out} (widths {widths})",
              flush=True)

    # per-source CCA into the target latent space
    ids = [encode_label_sequences(y) for y in ys]
    cca = {}
    tgt = names[0]
    for name, lat, enc in zip(names[1:], lats[1:], ids[1:]):
        uni = np.unique(np.concatenate([ids[0], enc]))
        id_t = jnp.asarray(to_class_ids(ids[0], uni)[0])
        id_s = jnp.asarray(to_class_ids(enc, uni)[0])
        # the CCA core handles unequal latent widths natively
        # (proj_b_to_a is (k_src, k_tgt)); gram path in case a variance
        # cutoff >= 1.0x rank kept zero-variance latent columns
        al = fit_cca_aligner(
            jnp.asarray(lats[0]), jnp.asarray(lat), id_t, id_s, len(uni),
            method="gram",
        )
        proj = np.asarray(al.alignment.proj_b_to_a)
        cca[(name, tgt)] = np.ascontiguousarray(proj, np.float64)
    Path(cfg.cca_out).parent.mkdir(parents=True, exist_ok=True)
    save_xforms_h5(cfg.cca_out, cca=cca)
    if verbose:
        print(
            f"CCA transforms -> {cfg.cca_out} "
            f"({', '.join(f'{s}->{t}' for s, t in cca)})",
            flush=True,
        )
    return {"pca": comps, "cca": cca}


# ------------------------------------------------------------- realtime sim ----

def run_realtime_sim(cfg: RealtimeSimConfig, verbose: bool = True):
    """Streaming decode over a synthetic recording; reports p50 step latency.

    Latency is measured amortized on device (lax.scan over all bins / bin
    count) because every host<->device transfer pays the tunnel's fixed
    ~0.4s latency which no real deployment would see.
    """
    import scipy.signal as sps

    from cross_patient_speech_decoding_tpu.models import RealtimeRNN
    from cross_patient_speech_decoding_tpu.realtime import (
        init_realtime_state,
        simulate_stream,
    )

    rng = np.random.default_rng(cfg.seed)
    if cfg.ckpt:
        # stream a trained reference model (Lightning .ckpt import); the
        # architecture and channel count come from the checkpoint
        from cross_patient_speech_decoding_tpu.models.torch_import import (
            realtime_rnn_from_ckpt,
        )

        model, params = realtime_rnn_from_ckpt(cfg.ckpt)
        if model.bidirectional:
            raise ValueError(
                "streaming needs a unidirectional model (a bidirectional "
                "GRU cannot run causally)"
            )
        in_size = params["params"]["rnn"]["fwd0"]["wi"].shape[0]
        cfg.n_channels = in_size // model.win_size
        cfg.hidden, cfg.n_layers = model.hidden, model.n_layers
        cfg.n_classes = model.n_classes
    else:
        model = RealtimeRNN(hidden=cfg.hidden, n_layers=cfg.n_layers,
                            n_classes=cfg.n_classes)
    bs, as_ = [], []
    for lo, hi in ((0.35, 0.5), (0.5, 0.65), (0.65, 0.8)):
        b, a = sps.butter(2, [lo, hi], btype="band")
        bs.append(b)
        as_.append(a)
    b, a = np.stack(bs), np.stack(as_)

    if not cfg.ckpt:
        params = model.init(jax.random.key(cfg.seed),
                            jnp.zeros((1, 60, cfg.n_channels)))
    state = init_realtime_state(model, params, b, a, cfg.n_channels)
    chunks = jnp.asarray(
        rng.normal(size=(cfg.n_bins, cfg.n_channels, cfg.bin_len)), jnp.float32
    )
    bj, aj = jnp.asarray(b, jnp.float32), jnp.asarray(a, jnp.float32)

    sim = jax.jit(
        lambda st, ch: simulate_stream(model, params, st, ch, bj, aj)
    )
    final, (emitted, logits, did_run) = sim(state, chunks)
    _ = np.asarray(final.n_bins)  # force completion

    t0 = time.perf_counter()
    final, outs = sim(state, chunks)
    _ = np.asarray(final.n_bins)
    per_bin_ms = (time.perf_counter() - t0) / cfg.n_bins * 1e3
    if verbose:
        n_emit = int((np.asarray(outs[0]) >= 0).sum())
        print(
            f"streamed {cfg.n_bins} bins: {per_bin_ms:.3f} ms/bin amortized, "
            f"{n_emit} symbols emitted",
            flush=True,
        )
    result = {"amortized_ms": per_bin_ms, "p50_ms": None, "p99_ms": None}

    if cfg.per_step_samples > 0:
        # honest per-step latency: the SAME jitted single step is
        # dispatched from python ``per_step_chain`` times per sample (state
        # donated, so no copies), then ONE host sync. This keeps per-call
        # dispatch overhead in the measurement — unlike the fused scan —
        # and amortizes only the fixed tunnel/sync cost, whose baseline is
        # measured separately on a ready array and subtracted.
        from cross_patient_speech_decoding_tpu.realtime.simulator import (
            RealtimeConfig,
            make_realtime_step,
        )

        step = jax.jit(
            # cfg defaults from the model so imported checkpoints with
            # non-default win/stride/blank time the program they deploy
            make_realtime_step(model), donate_argnums=1
        )
        st = init_realtime_state(model, params, b, a, cfg.n_channels)
        R = cfg.per_step_chain
        for r in range(R):  # warmup/compile
            st, _ = step(params, st, chunks[r % cfg.n_bins], bj, aj)
        _ = np.asarray(st.n_bins)  # flush the warmup chain

        # sync-cost baseline: host read of an already-computed scalar
        sync = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(st.n_bins)
            sync.append(time.perf_counter() - t0)
        sync_base = float(np.median(sync))

        samples = []
        for s in range(cfg.per_step_samples):
            t0 = time.perf_counter()
            for r in range(R):
                st, _ = step(params, st, chunks[(s + r) % cfg.n_bins], bj, aj)
            _ = np.asarray(st.n_bins)
            samples.append(
                max(time.perf_counter() - t0 - sync_base, 0.0) / R * 1e3
            )
        result["p50_ms"] = float(np.percentile(samples, 50))
        # max_ms is well-defined at any sample count (bench.py reads it
        # unconditionally); an empirical p99 additionally needs >= 100
        # samples — below that the tail is reported as the max
        result["max_ms"] = float(np.max(samples))
        if cfg.per_step_samples >= 100:
            result["p99_ms"] = float(np.percentile(samples, 99))
            tail_label, tail_ms = "p99", result["p99_ms"]
        else:
            tail_label, tail_ms = "max", result["max_ms"]
        result["samples_ms"] = np.asarray(samples)
        if verbose:
            print(
                f"per-step latency over {cfg.per_step_samples} samples x "
                f"{R} dispatched steps: p50 {result['p50_ms']:.3f} ms, "
                f"{tail_label} {tail_ms:.3f} ms (sync baseline "
                f"{sync_base * 1e3:.0f} ms subtracted)",
                flush=True,
            )
    if cfg.out:
        # persist the distribution for the supp_fig_20/24 latency analyses
        # — which need per-step samples: without them the saved pkl has no
        # 'samples_ms' and the analysis flows fail downstream
        if "samples_ms" not in result:
            raise ValueError(
                "out= persists the per-step latency distribution; set "
                "per_step_samples > 0 (>= 100 for a meaningful p99)"
            )
        from cross_patient_speech_decoding_tpu.data.loaders import save_pkl

        Path(cfg.out).parent.mkdir(parents=True, exist_ok=True)
        save_pkl({"params": vars(cfg), **result}, cfg.out)
    return result


# ----------------------------------------------------------------- analyze ----

def run_analyze(cfg, verbose: bool = True):
    """Statistical comparison of saved result pickles — the reference's
    fig_4/fig_5 notebook flow over driver outputs (`figure_analyses/
    fig_4.ipynb` cells 16/18, `fig_5.ipynb` stats cells).

    Each input pickle is an incremental results store
    (``append_results_pkl``); per-iteration fold accuracies/PERs are
    reduced to per-iteration means, then: all pairwise paired tests
    (Wilcoxon or sign-flip permutation) with BH-FDR, plus one-way ANOVA +
    Tukey HSD when 3+ groups are given. Returns a dict with the
    comparison rows and the ANOVA result.
    """
    from cross_patient_speech_decoding_tpu.analysis import (
        anova_tukey_by_group,
        context_comparison_table,
        paired_permutation_test,
        wilcoxon_signed_rank,
    )

    if cfg.test not in ("wilcoxon", "permutation"):
        raise ValueError(
            f"test must be 'wilcoxon' or 'permutation', got '{cfg.test}'"
        )
    groups: dict[str, np.ndarray] = {}
    for spec in cfg.inputs.split(","):
        spec = spec.strip()
        if not spec:
            continue
        name, _, path = spec.partition("=")
        if not path:
            raise ValueError(f"input '{spec}' is not name=path")
        if name in groups:
            raise ValueError(f"duplicate input name '{name}'")
        if path.endswith((".h5", ".hdf5")):
            # a reference CTC results h5 (train_ctc_rnn.py:448-491):
            # migrating users compare their EXISTING result files
            # against runs from this framework directly
            from cross_patient_speech_decoding_tpu.data.loaders import (
                load_ctc_results_h5,
            )

            pers = load_ctc_results_h5(path)["phoneme_error_rate"]
            groups[name] = np.array(
                [float(np.ravel(p).mean()) for p in pers]
            )
            continue
        store = load_pkl(path)
        accs = store.get("accs", [])
        if not accs:
            raise ValueError(f"'{path}' has no per-iteration results")
        groups[name] = np.array([float(np.ravel(a).mean()) for a in accs])
    if len(groups) < 2:
        raise ValueError("need at least two name=path inputs to compare")
    lengths = {k: len(v) for k, v in groups.items()}
    n_common = min(lengths.values())
    if verbose and len(set(lengths.values())) > 1:
        print(f"note: unequal iteration counts {lengths}; paired tests use "
              f"the first {n_common} iterations of each", flush=True)
    groups = {k: v[:n_common] for k, v in groups.items()}

    test = (paired_permutation_test if cfg.test == "permutation"
            else wilcoxon_signed_rank)
    rows = context_comparison_table(groups, alpha=cfg.alpha, test=test)
    result = {"groups": groups, "pairwise": rows, "anova": None}
    if len(groups) >= 3:
        (anova_row,) = anova_tukey_by_group({"all": list(groups.values())})
        result["anova"] = anova_row
    if verbose:
        for name, vals in groups.items():
            print(f"{name:12s}: {vals.mean():.3f} +- {vals.std():.3f} "
                  f"(n={len(vals)})", flush=True)
        for r in rows:
            print(f"{cfg.test} {r.a} vs {r.b}: stat={r.statistic:.2f} "
                  f"p={r.pvalue:.4f} p_fdr={r.pvalue_fdr:.4f}"
                  f"{' *' if r.significant else ''}", flush=True)
        if result["anova"] is not None:
            a = result["anova"]
            print(f"ANOVA: F={a.f_statistic:.2f} p={a.anova_p:.2e}", flush=True)
    return result
