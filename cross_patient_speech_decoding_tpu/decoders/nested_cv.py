"""Nested cross-validation hyperparameter search — the BayesSearchCV analog.

The reference tunes the classical pipeline with
``BayesSearchCV(n_iter=25, n_points=5, n_jobs=-1)`` over aligner + pipeline
params inside every outer fold
(`/root/reference/aligned_decoding/scripts/aligned_decode_svm_ncv.py:
148-195,398-404`) — thousands of sklearn fits farmed out to joblib
processes.

TPU-native design: the tuned hyperparameters (PCA variance fraction /
component count, ridge strength, RBF bandwidth scale) are **traced scalars**
in the fold program (static shapes come from ``max_k`` masking), so the
whole candidates x inner-folds grid of one outer fold evaluates as a single
``vmap x vmap`` XLA launch, and outer folds ride a third batch axis. The
best candidate per outer fold is selected on device (argmax of mean inner
accuracy) and refit on the full outer-train split — no process pool, no
dispatch overhead, bit-reproducible.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cross_patient_speech_decoding_tpu.decoders.pooled import (
    DecodeConfig,
    PatientArrays,
    _STRATEGIES,
)


def sample_candidates(n: int, seed: int = 0, n_comp_range=(0.5, 0.99),
                      lam_range=(1e-3, 1e2), gamma_scale_range=(0.1, 10.0)):
    """Random candidate table (the reference's search space shape:
    dimredreshape__n_components, svc C/gamma analogs)."""
    rng = np.random.default_rng(seed)
    return {
        "n_comp": jnp.asarray(
            rng.uniform(*n_comp_range, n), jnp.float32
        ),
        "lam": jnp.asarray(
            np.exp(rng.uniform(*np.log(lam_range), n)), jnp.float32
        ),
        "gamma_scale": jnp.asarray(
            np.exp(rng.uniform(*np.log(gamma_scale_range), n)), jnp.float32
        ),
    }


def inner_cv_masks(train_mask: np.ndarray, y: np.ndarray, n_inner: int,
                   rng: np.random.Generator):
    """Split ONE outer-fold train set into inner folds (masks over the full
    trial axis; rows outside the outer-train set are excluded everywhere).

    Stratified on ``y`` like the reference's inner CV
    (``BayesSearchCV(cv=StratifiedKFold(shuffle=True))``,
    `aligned_decode_svm_ncv.py:337,398`), with the same plain-KFold
    fallback when a class has fewer members than ``n_inner``."""
    from cross_patient_speech_decoding_tpu.data.splits import (
        stratified_kfold_masks,
    )

    idx = np.where(train_mask > 0)[0]
    _, sub_te = stratified_kfold_masks(np.asarray(y)[idx], n_inner, rng)
    inner_te = np.zeros((n_inner, len(train_mask)))
    inner_te[:, idx] = sub_te
    inner_tr = train_mask[None, :] - inner_te
    return inner_tr, inner_te


def make_nested_cv_decoder(
    strategy: str,
    cfg: DecodeConfig,
    n_candidates: int = 25,
    n_inner: int = 5,
    candidate_batch: int = 5,
    seed: int = 0,
):
    """Build a nested-CV decoder.

    Returns run(tar, cross, train_masks, test_masks, inner_tr, inner_te) ->
    (accs (n_outer,), best_idx (n_outer,)) where inner_tr/inner_te are
    (n_outer, n_inner, N) mask stacks from :func:`inner_cv_masks`.
    """
    fold_fn = _STRATEGIES[strategy]
    candidates = sample_candidates(n_candidates, seed)

    def eval_candidate(tar, cross, tr, te, hp):
        acc, _ = fold_fn(tar, cross, tr, te, cfg, hp=hp)
        return acc

    def one_outer(tar, cross, tr, te, itr, ite):
        # (n_inner,) accs for one candidate
        def cand_score(hp):
            inner = jax.vmap(
                eval_candidate, in_axes=(None, None, 0, 0, None)
            )(tar, cross, itr, ite, hp)
            return jnp.mean(inner)

        # chunk candidates to bound memory
        def chunk_scores(hp_chunk):
            return jax.vmap(cand_score)(hp_chunk)

        n = n_candidates
        pad = (-n) % candidate_batch
        hp_pad = {
            k: jnp.pad(v, (0, pad)).reshape(-1, candidate_batch)
            for k, v in candidates.items()
        }
        scores = jax.lax.map(chunk_scores, hp_pad).reshape(-1)[:n]

        best = jnp.argmax(scores)
        best_hp = {k: v[best] for k, v in candidates.items()}
        acc, _ = fold_fn(tar, cross, tr, te, cfg, hp=best_hp)
        return acc, best

    def run(tar, cross, train_masks, test_masks, inner_tr, inner_te):
        return jax.lax.map(
            lambda args: one_outer(tar, cross, *args),
            (train_masks, test_masks, inner_tr, inner_te),
        )

    return jax.jit(run), candidates


def make_candidate_scorer(strategy: str, cfg: DecodeConfig,
                          fit_batch: int = 100, mesh=None,
                          fold_axis: str = "data"):
    """Jitted scorer: mean inner-CV accuracy of a (n_outer, B) candidate
    table — one XLA launch per proposal round of the Bayesian search.

    ``fit_batch`` bounds how many pipeline fits run as ONE vmap: outer
    folds are chunked so each device step evaluates ~fit_batch fits (the
    width the fixed-param fold program runs at reference scale). A plain
    per-outer-fold map would leave the chip ~4x under-batched (25-wide
    vmaps, sequential over 20 folds).

    With ``mesh`` given, the OUTER-FOLD axis is sharded over the mesh's
    ``fold_axis`` instead of lax.map-chunked: outer folds are
    embarrassingly parallel (the reference farms the whole experiment out
    as SLURM job arrays, README.md:27), data/params replicate, and each
    chip scores its fold slice with zero hot-path collectives — the same
    layout as the fixed-param fold sharding (decoders.pooled
    make_cv_decoder). Fold counts that don't divide the mesh are padded
    with repeated fold rows and sliced after.
    """
    fold_fn = _STRATEGIES[strategy]

    def eval_candidate(tar, cross, tr, te, hp):
        acc, _ = fold_fn(tar, cross, tr, te, cfg, hp=hp)
        return acc

    def one_outer_scores(tar, cross, itr, ite, hp_row):
        def cand_score(hp):
            inner = jax.vmap(
                eval_candidate, in_axes=(None, None, 0, 0, None)
            )(tar, cross, itr, ite, hp)
            return jnp.mean(inner)

        return jax.vmap(cand_score)(hp_row)

    def score(tar, cross, inner_tr, inner_te, hp_table):
        # hp_table: dict of (n_outer, B); inner_tr/te: (n_outer, n_inner, N)
        n_inner = inner_tr.shape[1]
        n_points = next(iter(hp_table.values())).shape[1]
        bs = max(1, fit_batch // max(1, n_points * n_inner))

        def one_outer(args):
            itr, ite, hp_row = args
            return one_outer_scores(tar, cross, itr, ite, hp_row)

        return jax.lax.map(
            one_outer, (inner_tr, inner_te, hp_table), batch_size=bs
        )

    def final_eval(tar, cross, train_masks, test_masks, hp_best):
        # hp_best: dict of (n_outer,) — refit each outer fold at its best;
        # returns (accs, preds-over-all-rows) per outer fold
        def one(args):
            tr, te, hp = args
            return fold_fn(tar, cross, tr, te, cfg, hp=hp)

        bs = min(train_masks.shape[0], max(1, fit_batch))
        return jax.lax.map(
            one, (train_masks, test_masks, hp_best), batch_size=bs
        )

    if mesh is None:
        return jax.jit(score), jax.jit(final_eval)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    n_dev = mesh.shape[fold_axis]

    def fsh(ndim):
        return NamedSharding(mesh, P(fold_axis, *([None] * (ndim - 1))))

    def score_vmapped(tar, cross, inner_tr, inner_te, hp_table):
        return jax.vmap(
            one_outer_scores, in_axes=(None, None, 0, 0, 0)
        )(tar, cross, inner_tr, inner_te, hp_table)

    def final_vmapped(tar, cross, train_masks, test_masks, hp_best):
        return jax.vmap(
            lambda tr, te, hp: fold_fn(tar, cross, tr, te, cfg, hp=hp)
        )(train_masks, test_masks, hp_best)

    score_j = jax.jit(
        score_vmapped,
        in_shardings=(repl, repl, fsh(3), fsh(3), fsh(2)),
        out_shardings=fsh(2),
    )
    final_j = jax.jit(
        final_vmapped,
        in_shardings=(repl, repl, fsh(2), fsh(2), fsh(1)),
        out_shardings=(fsh(1), fsh(2)),
    )

    def _pad_folds(a, pad):
        # repeat leading fold rows (cheap, sliced away after) so the fold
        # axis divides the mesh; jnp.take handles pad > n by wrapping
        if pad == 0:
            return a
        idx = jnp.arange(a.shape[0] + pad) % a.shape[0]
        return jnp.take(a, idx, axis=0)

    def sharded_score(tar, cross, inner_tr, inner_te, hp_table):
        n = inner_tr.shape[0]
        pad = (-n) % n_dev
        out = score_j(
            jax.device_put(tar, repl),
            jax.device_put(cross, repl),
            jax.device_put(_pad_folds(inner_tr, pad), fsh(3)),
            jax.device_put(_pad_folds(inner_te, pad), fsh(3)),
            {k: jax.device_put(_pad_folds(v, pad), fsh(2))
             for k, v in hp_table.items()},
        )
        return out[:n]

    def sharded_final(tar, cross, train_masks, test_masks, hp_best):
        n = train_masks.shape[0]
        pad = (-n) % n_dev
        accs, preds = final_j(
            jax.device_put(tar, repl),
            jax.device_put(cross, repl),
            jax.device_put(_pad_folds(train_masks, pad), fsh(2)),
            jax.device_put(_pad_folds(test_masks, pad), fsh(2)),
            {k: jax.device_put(_pad_folds(v, pad), fsh(1))
             for k, v in hp_best.items()},
        )
        return accs[:n], preds[:n]

    return sharded_score, sharded_final


_SCORER_CACHE: dict = {}


def _cached_scorer(strategy: str, cfg: DecodeConfig, fit_batch: int,
                   mesh=None):
    """One jitted (score, final_eval) pair per configuration: the driver
    calls nested_cv_decode_bayes once per iteration (50x per experiment)
    and a fresh jax.jit wrapper each time would retrace the large nested
    programs every iteration. (jax Mesh is hashable and participates in
    the key, so single-chip and sharded scorers coexist.)"""
    key = (strategy, tuple(sorted(vars(cfg).items())), fit_batch, mesh)
    if key not in _SCORER_CACHE:
        _SCORER_CACHE[key] = make_candidate_scorer(strategy, cfg, fit_batch,
                                                   mesh=mesh)
    return _SCORER_CACHE[key]


def nested_cv_decode_bayes(
    tar: PatientArrays,
    cross: Sequence[PatientArrays],
    cfg: DecodeConfig,
    n_folds: int = 20,
    n_rounds: int = 5,
    n_points: int = 5,
    n_inner: int = 5,
    strategy: str = "sep_align",
    seed: int = 0,
    train_frac: float = 1.0,
    return_preds: bool = False,
    fit_batch: int = 100,
    mesh=None,
):
    """Nested CV with sequential TPE acquisition — the direct analog of the
    reference's ``BayesSearchCV(n_iter=25, n_points=5)``
    (`aligned_decode_svm_ncv.py:398-404`): n_rounds batches of n_points
    candidates per outer fold, each batch proposed from that fold's
    inner-CV history. Device work stays batched: every round scores the
    whole (n_outer x n_points) table in one jitted launch; only the
    proposal step (tiny numpy TPE) runs on host.

    With ``mesh`` given, the outer-fold axis of both the scoring and the
    final refit shards over the mesh (see :func:`make_candidate_scorer`) —
    the paper's headline experiment scales across chips like the
    fixed-param path.

    ``train_frac < 1`` applies the reference's ``-tss`` stratified
    target-train subsampling per outer fold BEFORE the search
    (`aligned_decode_svm_ncv.py:351-360`), so hyperparameters are tuned on
    the subsampled train set exactly as the reference does.

    Returns (accs (n_outer,), best_hp dict of (n_outer,) arrays), plus
    preds (n_outer, N) over all target rows when ``return_preds=True``.
    """
    from cross_patient_speech_decoding_tpu.data.splits import (
        stratified_kfold_masks,
        stratified_train_subsample_masks,
    )
    from cross_patient_speech_decoding_tpu.sweep.bayes import (
        Float,
        TPESampler,
        sample_random,
    )

    space = {
        "n_comp": Float(0.5, 0.99),
        "lam": Float(1e-3, 1e2, log=True),
        "gamma_scale": Float(0.1, 10.0, log=True),
    }
    rng = np.random.default_rng(seed)
    y = np.asarray(tar.y)
    tr, te = stratified_kfold_masks(y, n_folds, rng)
    if train_frac < 1.0:
        tr = stratified_train_subsample_masks(tr, y, train_frac, rng)
    itr = np.zeros((n_folds, n_inner, len(y)))
    ite = np.zeros((n_folds, n_inner, len(y)))
    for k in range(n_folds):
        itr[k], ite[k] = inner_cv_masks(tr[k], y, n_inner, rng)

    score, final_eval = _cached_scorer(strategy, cfg, fit_batch, mesh=mesh)
    cross = tuple(cross)
    itr_j, ite_j = jnp.asarray(itr), jnp.asarray(ite)

    history = [[] for _ in range(n_folds)]  # per fold: [(cfg, -acc)]
    samplers = [
        TPESampler(space, seed=seed + 1 + k) for k in range(n_folds)
    ]
    names = list(space)
    for rnd in range(n_rounds):
        round_cfgs = []
        for k in range(n_folds):
            if rnd == 0:
                round_cfgs.append(sample_random(space, n_points, rng))
            else:
                round_cfgs.append(
                    samplers[k].fit(history[k]).propose(n_points)
                )
        hp_table = {
            name: jnp.asarray(
                [[c[name] for c in row] for row in round_cfgs], jnp.float32
            )
            for name in names
        }
        accs = np.asarray(score(tar, cross, itr_j, ite_j, hp_table))
        for k in range(n_folds):
            history[k].extend(
                (c, -float(a)) for c, a in zip(round_cfgs[k], accs[k])
            )

    best = [min(h, key=lambda cm: cm[1])[0] for h in history]
    hp_best = {
        name: jnp.asarray([b[name] for b in best], jnp.float32)
        for name in names
    }
    accs, preds = final_eval(
        tar, cross, jnp.asarray(tr), jnp.asarray(te), hp_best
    )
    if return_preds:
        return np.asarray(accs), hp_best, np.asarray(preds), te
    return np.asarray(accs), hp_best


def nested_cv_decode(
    tar: PatientArrays,
    cross: Sequence[PatientArrays],
    cfg: DecodeConfig,
    n_folds: int = 20,
    n_candidates: int = 25,
    n_inner: int = 5,
    strategy: str = "sep_align",
    seed: int = 0,
):
    """Convenience wrapper: generate masks, run nested CV, return accs."""
    from cross_patient_speech_decoding_tpu.data.splits import (
        stratified_kfold_masks,
    )

    rng = np.random.default_rng(seed)
    y = np.asarray(tar.y)
    tr, te = stratified_kfold_masks(y, n_folds, rng)
    itr = np.zeros((n_folds, n_inner, len(y)))
    ite = np.zeros((n_folds, n_inner, len(y)))
    for k in range(n_folds):
        itr[k], ite[k] = inner_cv_masks(tr[k], y, n_inner, rng)

    run, cands = make_nested_cv_decoder(
        strategy, cfg, n_candidates, n_inner, seed=seed
    )
    accs, best = run(
        tar, tuple(cross),
        jnp.asarray(tr), jnp.asarray(te),
        jnp.asarray(itr), jnp.asarray(ite),
    )
    return np.asarray(accs), np.asarray(best), cands
