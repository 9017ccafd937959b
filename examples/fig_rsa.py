"""Representational-similarity analysis (fig_6 analog).

Reproduces the reference's fig_6 flow (`figure_analyses/fig_6.ipynb`
cells 15/57): per-patient RDMs (1 - Pearson r between condition-averaged
trial tensors), cross-patient RDM similarity in unaligned vs CCA-aligned
vs aligned-with-shuffled-labels conditions, Wilcoxon + BH-FDR over
repetitions.

    python examples/fig_rsa.py [n_iter]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


import jax.numpy as jnp
import numpy as np


def main(n_iter: int = 10, out_dir: str | None = None):
    """``out_dir`` saves the RDM-similarity panel as a PNG."""
    from cross_patient_speech_decoding_tpu.analysis import (
        compare_rdms,
        fdr_bh,
        rdm_correlation,
        wilcoxon_signed_rank,
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

    n_iter = int(n_iter)
    max_k = 16
    rng = np.random.default_rng(0)

    un_corr, al_corr, shuf_corr = [], [], []
    for i in range(n_iter):
        ds = make_synthetic_patients(seed=i, n_patients=2, n_classes=6,
                                     trials_per_class=16, T=40,
                                     channels=(96, 111), latent_dim=8,
                                     noise=0.6)
        lats, ids = [], []
        for p in range(2):
            X = jnp.asarray(ds.X[p], jnp.float32)
            pca = fit_pca_latents(X, 0.9, max_k)
            lats.append(np.asarray(transform_latents(pca, X, max_k)))
            ids.append(np.asarray(ds.class_ids[p]))

        al = fit_cca_aligner(
            jnp.asarray(lats[0]), jnp.asarray(lats[1]),
            jnp.asarray(ids[0], jnp.int32), jnp.asarray(ids[1], jnp.int32),
            ds.n_classes,
        )
        aligned_1 = np.asarray(transform_b_to_a(al, jnp.asarray(lats[1])))

        rdm0, u0 = rdm_correlation(lats[0], ids[0])
        rdm1_un, u1 = rdm_correlation(lats[1], ids[1])
        rdm1_al, _ = rdm_correlation(aligned_1, ids[1])
        rdm1_shuf, _ = rdm_correlation(aligned_1, rng.permutation(ids[1]))

        un_corr.append(compare_rdms(rdm0, u0, rdm1_un, u1))
        al_corr.append(compare_rdms(rdm0, u0, rdm1_al, u1))
        shuf_corr.append(compare_rdms(rdm0, u0, rdm1_shuf, u1))

    un_corr, al_corr, shuf_corr = map(np.array, (un_corr, al_corr, shuf_corr))
    print(f"RDM correlation: unaligned {un_corr.mean():.3f}, "
          f"aligned {al_corr.mean():.3f}, shuffled {shuf_corr.mean():.3f}")

    tests = {
        "aligned vs unaligned": wilcoxon_signed_rank(al_corr, un_corr),
        "aligned vs shuffled": wilcoxon_signed_rank(al_corr, shuf_corr),
    }
    _, p_fdr = fdr_bh(np.array([float(t.pvalue) for t in tests.values()]))
    for (name, t), pf in zip(tests.items(), p_fdr):
        print(f"Wilcoxon {name}: W={float(t.statistic):.0f} "
              f"p={float(t.pvalue):.4f} p_fdr={pf:.4f}")

    if out_dir:
        from cross_patient_speech_decoding_tpu.utils.visualization import (
            plot_group_comparison,
            save_panel,
        )

        save_panel(out_dir, "rsa.png", plot_group_comparison,
                   {"unaligned": un_corr, "aligned": al_corr,
                    "shuffled": shuf_corr},
                   "cross-patient RDM correlation",
                   title="Representational similarity (fig_6 analog)")
    return un_corr, al_corr, shuf_corr


if __name__ == "__main__":
    main(*sys.argv[1:])
