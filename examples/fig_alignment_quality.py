"""Alignment-quality analysis (fig_2 analog): canonical correlations,
per-condition latent correlations, and aligned-trajectory plots.

Runs on synthetic data; with real patient files point data.loaders at them.

    python examples/fig_alignment_quality.py [out_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", jax.default_backend())


def main(out_dir="results/figs"):
    from pathlib import Path

    from cross_patient_speech_decoding_tpu.data import make_synthetic_patients
    from cross_patient_speech_decoding_tpu.decoders.pooled import (
        fit_pca_latents,
        transform_latents,
    )
    from cross_patient_speech_decoding_tpu.ops.cca import (
        cnd_avg,
        fit_cca_aligner,
        transform_b_to_a,
    )
    from cross_patient_speech_decoding_tpu.ops.metrics import (
        pt_corr,
        pt_corr_dims,
    )
    from cross_patient_speech_decoding_tpu.utils.visualization import (
        plot_latent_trajectories_1d,
        plot_latent_trajectories_2d,
    )

    Path(out_dir).mkdir(parents=True, exist_ok=True)
    ds = make_synthetic_patients(seed=0, n_patients=2, n_classes=6,
                                 trials_per_class=20, T=50,
                                 channels=(96, 111), latent_dim=8, noise=0.5)
    max_k = 16
    lats, ids = [], []
    for p in range(2):
        X = jnp.asarray(ds.X[p], jnp.float32)
        pca = fit_pca_latents(X, 0.9, max_k)
        lats.append(transform_latents(pca, X, max_k))
        ids.append(jnp.asarray(ds.class_ids[p], jnp.int32))

    al = fit_cca_aligner(lats[0], lats[1], ids[0], ids[1], ds.n_classes)
    aligned_b = transform_b_to_a(al, lats[1])
    d = int(al.alignment.d)
    corrs = np.asarray(al.alignment.canon_corrs)[:d]
    print(f"canonical correlations (d={d}): {np.round(corrs[:8], 3)}")

    avg_a, _ = cnd_avg(lats[0], ids[0], ds.n_classes)
    avg_b, _ = cnd_avg(aligned_b, ids[1], ds.n_classes)
    r_cnd = np.asarray(pt_corr(avg_a, avg_b))  # (n_classes,) reference contract
    print(f"per-condition Pearson r: {np.round(r_cnd, 3)}")
    r = np.asarray(pt_corr_dims(avg_a, avg_b))
    print(f"per-dim condition-avg Pearson r (top 6): {np.round(r[:6], 3)}")

    plot_latent_trajectories_1d(
        [np.asarray(avg_a), np.asarray(avg_b)],
        labels=["target", "aligned source"], dims=3,
        save_path=f"{out_dir}/alignment_1d.png",
    )
    plot_latent_trajectories_2d(
        [np.asarray(avg_a), np.asarray(avg_b)],
        labels=["target", "aligned source"],
        save_path=f"{out_dir}/alignment_2d.png",
    )
    print(f"wrote {out_dir}/alignment_1d.png, alignment_2d.png")


if __name__ == "__main__":
    main(*sys.argv[1:])
