"""Synthetic multi-patient μECoG-like data for tests and benchmarks.

The reference has no test suite and its experiments require private patient
data files (``pt_decoding_data_S62.pkl`` etc.). To make every stage of this
framework testable and benchmarkable without that data, this module generates
datasets with the same *structure* the alignment math exploits: each patient
observes the SAME shared latent class trajectories through a different
random linear readout (per-patient channel mixing) plus noise — exactly the
generative assumption behind CCA/MCCA/joint-PCA alignment (Gallego et al.
2020; Pandarinath et al. 2018).

Shapes mirror the real data facts recorded in SURVEY.md: trial tensors
``(n_trials, n_timepoints, n_channels)``, 3-phoneme sequence labels over a
9-phoneme vocabulary, 111-256 channels per patient.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from cross_patient_speech_decoding_tpu.utils.labels import (
    encode_label_sequences,
    to_class_ids,
)


@dataclass
class SyntheticDataset:
    """One synthetic multi-patient dataset.

    Attributes:
        X: list of per-patient feature arrays (n_trials, T, channels_p).
        y_seq: list of per-patient (n_trials, seq_len) phoneme sequences.
        y_first: list of per-patient (n_trials,) first-phoneme labels
            (the 9-class classification target of the classical decoders).
        class_ids: list of per-patient (n_trials,) compact sequence-class ids.
        class_universe: sorted encoded sequence values defining the id space.
        latent: (n_classes, T, latent_dim) shared ground-truth trajectories.
        mixings: list of (latent_dim, channels_p) ground-truth readouts.
    """

    X: list = field(default_factory=list)
    y_seq: list = field(default_factory=list)
    y_first: list = field(default_factory=list)
    class_ids: list = field(default_factory=list)
    class_universe: np.ndarray = None
    latent: np.ndarray = None
    mixings: list = field(default_factory=list)

    @property
    def n_classes(self) -> int:
        return len(self.class_universe)


def _smooth_trajectories(rng, n_classes, T, latent_dim):
    """Smooth per-class latent trajectories (random Fourier series)."""
    t = np.linspace(0.0, 1.0, T)
    n_harmonics = 4
    traj = np.zeros((n_classes, T, latent_dim))
    for h in range(1, n_harmonics + 1):
        amp = rng.normal(size=(n_classes, 1, latent_dim)) / h
        phase = rng.uniform(0, 2 * np.pi, size=(n_classes, 1, latent_dim))
        traj += amp * np.sin(2 * np.pi * h * t[None, :, None] + phase)
    return traj


def make_synthetic_patients(
    seed: int = 0,
    n_patients: int = 3,
    n_classes: int = 9,
    trials_per_class: int = 12,
    T: int = 50,
    channels: tuple | int = (48, 64, 56),
    latent_dim: int = 8,
    noise: float = 0.3,
    seq_len: int = 3,
) -> SyntheticDataset:
    """Generate a multi-patient dataset with shared latent structure."""
    rng = np.random.default_rng(seed)
    if isinstance(channels, int):
        channels = tuple(
            int(c) for c in rng.integers(channels // 2, channels + 1, n_patients)
        )
    if len(channels) != n_patients:
        channels = tuple(channels) + tuple(
            int(c) for c in rng.integers(48, 128, n_patients - len(channels))
        )

    # distinct phoneme sequences (vocab 1..9), one per class
    seqs = set()
    while len(seqs) < n_classes:
        seqs.add(tuple(rng.integers(1, 10, seq_len)))
    seqs = np.array(sorted(seqs), dtype=np.int64)

    latent = _smooth_trajectories(rng, n_classes, T, latent_dim)
    universe = np.unique(encode_label_sequences(seqs))

    ds = SyntheticDataset(class_universe=universe, latent=latent)
    for p in range(n_patients):
        n_trials = n_classes * trials_per_class
        cls = np.repeat(np.arange(n_classes), trials_per_class)
        rng.shuffle(cls)
        mixing = rng.normal(size=(latent_dim, channels[p])) / np.sqrt(latent_dim)
        X = latent[cls] @ mixing + noise * rng.normal(
            size=(n_trials, T, channels[p])
        )
        y_seq = seqs[cls]
        ids, _ = to_class_ids(encode_label_sequences(y_seq), universe)
        ds.X.append(X)
        ds.y_seq.append(y_seq)
        ds.y_first.append(y_seq[:, 0].copy())
        ds.class_ids.append(ids)
        ds.mixings.append(mixing)
    return ds


def make_synthetic_patients_device(
    seed: int = 0,
    n_patients: int = 3,
    n_classes: int = 9,
    trials_per_class: int = 12,
    T: int = 50,
    channels: tuple | int = (48, 64, 56),
    latent_dim: int = 8,
    noise: float = 0.3,
    seq_len: int = 3,
) -> SyntheticDataset:
    """Device-side twin of :func:`make_synthetic_patients`.

    Same generative model (shared smooth class trajectories -> per-patient
    random readout + Gaussian noise) but the big Gaussian tensors come from
    the ACCELERATOR's RNG instead of host numpy: only the tiny trajectory
    table and label arrays cross the host link. At the reference scale
    (8 patients, T=200) host generation + upload costs ~25 s of single-core
    numpy + ~150 MB through a ~30 MB/s dev tunnel; this path does it in one
    jitted program (round-3 log). Random streams differ from the host twin
    (jax PRNG vs numpy PCG64) — fine for synthetic benchmarking/driver use;
    tests that pin exact values keep the host generator.
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    if isinstance(channels, int):
        channels = tuple(
            int(c) for c in rng.integers(channels // 2, channels + 1, n_patients)
        )
    if len(channels) != n_patients:
        channels = tuple(channels) + tuple(
            int(c) for c in rng.integers(48, 128, n_patients - len(channels))
        )

    seqs = set()
    while len(seqs) < n_classes:
        seqs.add(tuple(rng.integers(1, 10, seq_len)))
    seqs = np.array(sorted(seqs), dtype=np.int64)

    latent = _smooth_trajectories(rng, n_classes, T, latent_dim).astype(
        np.float32
    )
    universe = np.unique(encode_label_sequences(seqs))

    n_trials = n_classes * trials_per_class
    cls_list = []
    for _ in range(n_patients):
        cls = np.repeat(np.arange(n_classes), trials_per_class)
        rng.shuffle(cls)
        cls_list.append(cls)
    cls_all = np.stack(cls_list)  # (P, N)
    c_max = max(channels)

    @jax.jit
    def _gen(key, lat, cls_dev):
        kmix, knoise = jax.random.split(key)
        mixes = jax.random.normal(
            kmix, (n_patients, latent_dim, c_max), jnp.float32
        ) / np.sqrt(latent_dim)
        lat_sel = lat[cls_dev]  # (P, N, T, L) device gather
        x = jnp.einsum("pntl,plc->pntc", lat_sel, mixes)
        x = x + noise * jax.random.normal(knoise, x.shape, jnp.float32)
        return x, mixes

    X_all, mixes = _gen(
        jax.random.key(seed), jnp.asarray(latent), jnp.asarray(cls_all)
    )

    ds = SyntheticDataset(class_universe=universe, latent=latent)
    for p in range(n_patients):
        cls = cls_list[p]
        y_seq = seqs[cls]
        ids, _ = to_class_ids(encode_label_sequences(y_seq), universe)
        ds.X.append(X_all[p, :, :, : channels[p]])
        ds.y_seq.append(y_seq)
        ds.y_first.append(y_seq[:, 0].copy())
        ds.class_ids.append(ids)
        ds.mixings.append(mixes[p, :, : channels[p]])
    return ds
