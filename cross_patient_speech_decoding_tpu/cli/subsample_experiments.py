"""Subsampling sweep experiments — data-quantity and electrode-geometry
scans of cross-patient decoding.

Analogs of the reference sweep scripts (SURVEY.md §2.7):
- :func:`run_trial_subsample`  <-> aligned_decode_cross_patient_subsample.py:
  accuracy vs number of cross-patient trials (k = 5, 30, 55, ... up to the
  cross-patient median, :290-292);
- :func:`run_grid_subsample`   <-> aligned_decode_grid_subsample.py:
  electrode-density sweep over sliding sub-grids (:281-301);
- :func:`run_spatial_avg`      <-> aligned_decode_spatialAvg_subsample.py:
  contact-size sweep via channel-tile averaging;
- :func:`run_pitch_subsample`  <-> aligned_decode_pitch_subsample.py:
  electrode-pitch sweep via per-iteration Poisson-disk resampling.

Index generation is host-side numpy (tiny integer work, inherently
sequential for Poisson darts); everything numeric runs through the vmapped
fold decoder. Iterations of equal shape share one compiled program.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from cross_patient_speech_decoding_tpu.cli.experiments import (
    _patients_from_config,
)
from cross_patient_speech_decoding_tpu.data.splits import (
    stratified_kfold_masks,
)
from cross_patient_speech_decoding_tpu.data.subsample import (
    grid_subsample_sig_channels,
    pitch_subsample_sig_channels,
    spatial_avg_data,
    spatial_avg_groups,
    trial_subsample_indices,
)
from cross_patient_speech_decoding_tpu.decoders import (
    DecodeConfig,
    PatientArrays,
    make_cv_decoder,
)


@dataclass
class SubsampleConfig:
    data: str = "synthetic"
    target_pt: str = "S14"
    strategy: str = "sep_align"
    n_iter: int = 10
    n_folds: int = 5
    n_comp: float = 0.8
    max_k: int = 24
    lam: float = 1.0
    seed: int = 0
    # trial sweep
    k_start: int = 5
    k_step: int = 25
    # grid sweep
    win_sizes: tuple = (2, 4, 6)
    # spatial averaging
    contact_sizes: tuple = (2, 4)
    # pitch sweep (in electrode-grid units)
    pitches: tuple = (1.5, 2.5, 4.0)
    # synthetic-data difficulty (ignored for file-backed data): sweeps are
    # only informative when the base problem is not saturated
    noise: float = 0.6
    trials_per_class: int = 15


def _setup(cfg: SubsampleConfig):
    tar, cross, n_y, n_a = _patients_from_config(
        cfg.data, cfg.target_pt, seed=cfg.seed, noise=cfg.noise,
        trials_per_class=cfg.trials_per_class,
    )
    dcfg = DecodeConfig(
        n_comp=cfg.n_comp, max_k=cfg.max_k, n_classes=n_y,
        n_align_classes=n_a, lam=cfg.lam,
    )
    return tar, cross, dcfg


def _decode(tar, cross, dcfg, strategy, n_folds, rng):
    decoder = make_cv_decoder(strategy, dcfg)
    tr, te = stratified_kfold_masks(np.asarray(tar.y), n_folds, rng)
    accs = decoder(tar, tuple(cross), jnp.asarray(tr), jnp.asarray(te))
    return float(np.asarray(accs).mean())


def run_trial_subsample(cfg: SubsampleConfig, verbose: bool = True):
    """Accuracy vs cross-patient trial count -> (n_k, n_iter) matrix."""
    tar, cross, dcfg = _setup(cfg)
    rng = np.random.default_rng(cfg.seed)
    median_n = int(np.median([c.X.shape[0] for c in cross]))
    ks = list(range(cfg.k_start, median_n + 1, cfg.k_step))

    results = np.zeros((len(ks), cfg.n_iter))
    for ki, k in enumerate(ks):
        for it in range(cfg.n_iter):
            sub_cross = []
            for c in cross:
                idx = trial_subsample_indices(np.asarray(c.y), k, rng)
                sub_cross.append(
                    PatientArrays(
                        X=c.X[jnp.asarray(idx)],
                        y=c.y[jnp.asarray(idx)],
                        y_align=c.y_align[jnp.asarray(idx)],
                    )
                )
            results[ki, it] = _decode(
                tar, sub_cross, dcfg, cfg.strategy, cfg.n_folds, rng
            )
        if verbose:
            print(f"k={k}: acc {results[ki].mean():.3f}", flush=True)
    return np.asarray(ks), results


def _square_map(n_channels: int):
    """Approximate 2-D layout for channels (synthetic geometry)."""
    w = int(np.ceil(np.sqrt(n_channels)))
    h = int(np.ceil(n_channels / w))
    m = np.full((h, w), np.nan)
    m.ravel()[:n_channels] = np.arange(n_channels)
    return m


def _gather_channels(pt: PatientArrays, ch_idx: np.ndarray) -> PatientArrays:
    return PatientArrays(
        X=pt.X[:, :, jnp.asarray(ch_idx)], y=pt.y, y_align=pt.y_align
    )


def run_grid_subsample(cfg: SubsampleConfig, verbose: bool = True):
    """Accuracy vs sub-grid size: target iterates its sub-grids, each cross
    patient contributes a random sub-grid per iteration (:281-301)."""
    tar, cross, dcfg = _setup(cfg)
    rng = np.random.default_rng(cfg.seed)
    results = {}
    for win in cfg.win_sizes:
        accs = []
        maps = [_square_map(int(p.X.shape[-1])) for p in (tar, *cross)]
        grids = [
            grid_subsample_sig_channels(
                m, np.arange(int(p.X.shape[-1])), win
            )
            for m, p in zip(maps, (tar, *cross))
        ]
        n_iter = min(cfg.n_iter, len(grids[0]))
        for it in range(n_iter):
            tar_g = grids[0][it % len(grids[0])]
            sub_tar = _gather_channels(tar, tar_g)
            sub_cross = [
                _gather_channels(c, g[rng.integers(len(g))])
                for c, g in zip(cross, grids[1:])
            ]
            accs.append(
                _decode(sub_tar, sub_cross, dcfg, cfg.strategy, cfg.n_folds, rng)
            )
        results[win] = np.asarray(accs)
        if verbose:
            print(f"win={win}: acc {results[win].mean():.3f}", flush=True)
    return results


def run_spatial_avg(cfg: SubsampleConfig, verbose: bool = True):
    """Accuracy vs simulated contact size (channel-tile averaging)."""
    tar, cross, dcfg = _setup(cfg)
    rng = np.random.default_rng(cfg.seed)
    results = {}
    for cs in cfg.contact_sizes:
        pts_avg = []
        for p in (tar, *cross):
            cmap = _square_map(int(p.X.shape[-1]))
            groups = spatial_avg_groups(cmap, cs)
            Xa = spatial_avg_data(np.asarray(p.X), groups)
            pts_avg.append(
                PatientArrays(X=jnp.asarray(Xa), y=p.y, y_align=p.y_align)
            )
        accs = [
            _decode(pts_avg[0], pts_avg[1:], dcfg, cfg.strategy, cfg.n_folds, rng)
            for _ in range(cfg.n_iter)
        ]
        results[cs] = np.asarray(accs)
        if verbose:
            print(f"contact={cs}x{cs}: acc {results[cs].mean():.3f}", flush=True)
    return results


def run_pitch_subsample(cfg: SubsampleConfig, verbose: bool = True):
    """Accuracy vs electrode pitch (Poisson-disk resampled every iter)."""
    tar, cross, dcfg = _setup(cfg)
    rng = np.random.default_rng(cfg.seed)
    results = {}
    for pitch in cfg.pitches:
        accs = []
        for _ in range(cfg.n_iter):
            pts_sub = []
            for p in (tar, *cross):
                n_ch = int(p.X.shape[-1])
                cmap = _square_map(n_ch)
                ys, xs = np.nonzero(~np.isnan(cmap))
                pos = np.stack([xs, ys], 1).astype(float)
                _, idx = pitch_subsample_sig_channels(
                    pos, np.arange(n_ch), pitch, rng
                )
                pts_sub.append(_gather_channels(p, idx))
            accs.append(
                _decode(pts_sub[0], pts_sub[1:], dcfg, cfg.strategy,
                        cfg.n_folds, rng)
            )
        results[pitch] = np.asarray(accs)
        if verbose:
            print(f"pitch={pitch}: acc {results[pitch].mean():.3f}", flush=True)
    return results
