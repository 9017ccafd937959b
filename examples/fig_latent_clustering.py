"""Latent-space clustering analysis (fig_2 analog).

Reproduces the reference's fig_2 flow (`figure_analyses/fig_2.ipynb`
cells 27-48) on synthetic data: per-patient latent dynamics -> t-SNE /
PCA embeddings -> silhouette (positive-mean scorer), Calinski-Harabasz
and Davies-Bouldin scores over n_iter repetitions against shuffled-label
chance distributions, compared with Mann-Whitney U + BH-FDR; then the
unaligned-vs-CCA-aligned cross-patient comparison.

    python examples/fig_latent_clustering.py [n_iter]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


import jax.numpy as jnp
import numpy as np


def main(n_iter: int = 10, out_dir: str | None = None):
    """``out_dir`` saves the silhouette comparison panel as a PNG."""
    from cross_patient_speech_decoding_tpu.analysis import (
        calinski_harabasz,
        davies_bouldin,
        fdr_bh,
        mann_whitney_u,
        pca_embed,
        silhouette_positive_mean,
        tsne_embed,
    )
    from cross_patient_speech_decoding_tpu.data import make_synthetic_patients
    from cross_patient_speech_decoding_tpu.decoders.pooled import (
        fit_pca_latents,
        transform_latents,
    )
    from cross_patient_speech_decoding_tpu.ops.cca import (
        fit_cca_aligner,
        transform_b_to_a,
    )
    from cross_patient_speech_decoding_tpu.utils.labels import phon_to_artic

    n_iter = int(n_iter)
    ds = make_synthetic_patients(seed=0, n_patients=2, n_classes=6,
                                 trials_per_class=20, T=40,
                                 channels=(96, 111), latent_dim=8, noise=0.5)
    max_k = 16
    rng = np.random.default_rng(0)

    lats, ids, artic = [], [], []
    for p in range(2):
        X = jnp.asarray(ds.X[p], jnp.float32)
        pca = fit_pca_latents(X, 0.9, max_k)
        lats.append(np.asarray(transform_latents(pca, X, max_k)))
        ids.append(jnp.asarray(ds.class_ids[p], jnp.int32))
        artic.append(phon_to_artic(ds.y_first[p]))

    def cluster_scores(flat, labels, seed):
        emb_tsne = tsne_embed(flat, perplexity=30, n_iter=300, seed=seed)
        emb_pca = pca_embed(flat, 2)
        return {
            "sil_tsne": silhouette_positive_mean(emb_tsne, labels),
            "sil_pca": silhouette_positive_mean(emb_pca, labels),
            "sil_latdyn": silhouette_positive_mean(flat, labels),
            "ch": calinski_harabasz(flat, labels),
            "db": davies_bouldin(flat, labels),
        }

    # --- patient-specific: articulator labels vs shuffled chance ----------
    flat0 = lats[0].reshape(lats[0].shape[0], -1)
    scores, scores_shuf = [], []
    for i in range(n_iter):
        scores.append(cluster_scores(flat0, artic[0], seed=i))
        scores_shuf.append(
            cluster_scores(flat0, rng.permutation(artic[0]), seed=i)
        )
    sil = np.array([s["sil_tsne"] for s in scores])
    sil_shuf = np.array([s["sil_tsne"] for s in scores_shuf])
    res_ps = mann_whitney_u(sil, sil_shuf)
    print(f"patient-specific silhouette(t-SNE) {sil.mean():.3f} vs "
          f"chance {sil_shuf.mean():.3f}: MWU U={float(res_ps.statistic):.0f} "
          f"p={float(res_ps.pvalue):.4f}")

    # --- cross-patient: unaligned vs CCA-aligned pooling -----------------
    al = fit_cca_aligner(
        jnp.asarray(lats[0]), jnp.asarray(lats[1]), ids[0], ids[1],
        ds.n_classes,
    )
    aligned_1 = np.asarray(transform_b_to_a(al, jnp.asarray(lats[1])))
    pooled_labels = np.concatenate([artic[0], artic[1]])

    un_sil, un_shuf, al_sil, al_shuf = [], [], [], []
    for i in range(n_iter):
        unaligned = np.concatenate([lats[0], lats[1]]).reshape(
            2 * lats[0].shape[0], -1
        )
        aligned = np.concatenate([lats[0], aligned_1]).reshape(
            2 * lats[0].shape[0], -1
        )
        un_sil.append(cluster_scores(unaligned, pooled_labels, i)["sil_tsne"])
        al_sil.append(cluster_scores(aligned, pooled_labels, i)["sil_tsne"])
        shuf = rng.permutation(pooled_labels)
        un_shuf.append(cluster_scores(unaligned, shuf, i)["sil_tsne"])
        al_shuf.append(cluster_scores(aligned, shuf, i)["sil_tsne"])

    tests = {
        "unaligned artic vs chance": mann_whitney_u(un_sil, un_shuf),
        "aligned artic vs chance": mann_whitney_u(al_sil, al_shuf),
        "aligned vs unaligned": mann_whitney_u(al_sil, un_sil),
    }
    _, p_fdr = fdr_bh(np.array([float(t.pvalue) for t in tests.values()]))
    for (name, t), pf in zip(tests.items(), p_fdr):
        print(f"{name}: U={float(t.statistic):.0f} "
              f"p={float(t.pvalue):.4f} p_fdr={pf:.4f}")
    print(f"mean silhouette: unaligned {np.mean(un_sil):.3f}, "
          f"aligned {np.mean(al_sil):.3f}")

    if out_dir:
        from cross_patient_speech_decoding_tpu.utils.visualization import (
            plot_group_comparison,
            save_panel,
        )

        save_panel(out_dir, "latent_clustering.png",
                   plot_group_comparison,
                   {"unaligned": np.asarray(un_sil),
                    "aligned": np.asarray(al_sil),
                    "unaligned-shuf": np.asarray(un_shuf),
                    "aligned-shuf": np.asarray(al_shuf)},
                   "silhouette (t-SNE embedding)",
                   title="Pooled latent clustering (fig_2 analog)")


if __name__ == "__main__":
    main(*sys.argv[1:])
