"""Single-patient vs pairwise vs pooled decode comparison (fig_3 analog).

The reference's ``figure_analyses/fig_3.ipynb`` compares, for one target
patient, (a) decoding from the target's own data alone, (b) decoding with
each single cross patient aligned-pooled in turn, and (c) the full pooled
set — then runs paired stats over the iteration distributions. The same
flow here uses the vmapped fold decoder, so every condition is a couple of
XLA launches.

    python examples/fig_decode_comparison.py [n_iter]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


import jax.numpy as jnp
import numpy as np


def main(n_iter: int = 5, out_dir: str | None = None):
    """``out_dir`` saves the fig_3-style single/pairwise/pooled panel."""
    from cross_patient_speech_decoding_tpu.analysis import (
        context_comparison_table,
        wilcoxon_signed_rank,
    )
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        patients_from_config,
    )
    from cross_patient_speech_decoding_tpu.data.splits import (
        repeated_stratified_kfold_masks,
    )
    from cross_patient_speech_decoding_tpu.decoders import (
        DecodeConfig,
        make_cv_decoder,
    )

    n_iter = int(n_iter)
    # hard regime so pooling and alignment visibly matter
    tar, cross, n_y, n_a = patients_from_config(
        "synthetic", "S14", seed=0, noise=3.0, trials_per_class=6
    )
    cfg = DecodeConfig(n_comp=0.9, max_k=24, n_classes=n_y,
                       n_align_classes=n_a, lam=1e-2)
    dec = make_cv_decoder("sep_align", cfg, fold_batch=10)
    tr, te = repeated_stratified_kfold_masks(
        np.asarray(tar.y), 5, n_iter, seed=0
    )
    trj, tej = jnp.asarray(tr), jnp.asarray(te)

    groups = {}
    # (a) single-patient: no cross data pooled
    groups["single"] = np.asarray(dec(tar, (), trj, tej))
    # (b) pairwise: one cross patient at a time
    for i, c in enumerate(cross):
        groups[f"pair{i + 1}"] = np.asarray(dec(tar, (c,), trj, tej))
    # (c) full pooled set
    groups["pooled"] = np.asarray(dec(tar, cross, trj, tej))

    for name, accs in groups.items():
        print(f"{name:8s}: {accs.mean():.3f} +- {accs.std():.3f} "
              f"(chance {1.0 / n_y:.3f})")

    rows = context_comparison_table(
        groups, alpha=0.05, test=wilcoxon_signed_rank
    )
    print("\npairwise Wilcoxon + BH-FDR over fold distributions:")
    for r in rows:
        print(f"  {r.a} vs {r.b}: stat={r.statistic:.1f} p={r.pvalue:.4f} "
              f"p_fdr={r.pvalue_fdr:.4f}{' *' if r.significant else ''}")

    recon = reconstruction_transfer(tar, cross, n_y, n_a)
    print("\nreconstruction transfer (target-trained classifier on other "
          "patients' data reconstructed into the target electrode space):")
    for i, (al, nu) in enumerate(recon):
        print(f"  pair{i + 1}: aligned recon acc {al:.3f} vs "
              f"unaligned-null {nu:.3f} (chance {1.0 / n_y:.3f})")

    if out_dir:
        from cross_patient_speech_decoding_tpu.utils.visualization import (
            plot_group_comparison,
            save_panel,
        )

        save_panel(out_dir, "decode_comparison.png",
                   plot_group_comparison, groups, "balanced accuracy",
                   baseline=1.0 / n_y,
                   title="Single vs pairwise vs pooled (fig_3 analog)")
    return groups, rows, recon


def reconstruction_transfer(tar, cross, n_y, n_a, max_k=24):
    """fig_3's ``reconDict_allPts`` block: PCA every patient, CCA-align each
    source into the target latent space, reconstruct to the target
    ELECTRODE space via the target PCA's inverse transform, and evaluate a
    classifier trained on the target's own electrode data on each source's
    reconstruction — aligned vs the unaligned-null control
    (`figure_analyses/fig_3.ipynb` ``recon_decode``/``aligned_data_null``
    cells)."""
    from cross_patient_speech_decoding_tpu.decoders.pooled import (
        fit_pca_latents,
        transform_latents,
    )
    from cross_patient_speech_decoding_tpu.ops.cca import (
        fit_cca_aligner,
        transform_b_to_a,
    )
    from cross_patient_speech_decoding_tpu.ops.classifiers import (
        kernel_classifier_fit,
        kernel_classifier_predict,
    )
    from cross_patient_speech_decoding_tpu.ops.metrics import cmat_acc
    from cross_patient_speech_decoding_tpu.ops.pca import (
        pca_inverse_transform,
    )

    T = tar.X.shape[1]
    st_t = fit_pca_latents(tar.X, 0.9, max_k)
    lat_t = transform_latents(st_t, tar.X, max_k)

    flat_tar = tar.X.reshape(tar.X.shape[0], -1)
    clf = kernel_classifier_fit(flat_tar, tar.y, n_y, lam=1e-2)

    out = []
    for c in cross:
        lat_c = transform_latents(
            fit_pca_latents(c.X, 0.9, max_k), c.X, max_k
        )
        al = fit_cca_aligner(lat_t, lat_c, tar.y_align, c.y_align, n_a)
        accs = []
        for lat in (transform_b_to_a(al, lat_c), lat_c):  # aligned, null
            rec = pca_inverse_transform(
                st_t, lat.reshape(-1, max_k)
            ).reshape(lat.shape[0], -1)
            pred = kernel_classifier_predict(clf, rec, kernel="rbf")
            accs.append(float(cmat_acc(c.y, pred, n_y)))
        out.append(tuple(accs))
    return out


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:2]))
