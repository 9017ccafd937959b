"""Cross-patient decode strategy comparison (fig_4 analog): balanced
accuracy of sep_align / sep_dimred / joint_pca / mcca pooling plus the
random-data control, with Wilcoxon-style paired stats.

    python examples/fig_strategy_comparison.py [n_iter]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


import jax.numpy as jnp
import numpy as np


def main(n_iter: int = 5, out_dir: str | None = None):
    """``out_dir`` saves the fig_4-style comparison panel as a PNG."""
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
    # hard regime: heavy noise + few target trials, so pooling cross-patient
    # data (and aligning it well) actually matters
    tar, cross, n_y, n_a = patients_from_config(
        "synthetic", "S14", seed=0, noise=3.0, trials_per_class=6
    )
    results = {}
    for strategy in ("sep_align", "sep_dimred", "joint_pca", "mcca"):
        cfg = DecodeConfig(n_comp=0.9 if strategy != "mcca" else 10,
                           max_k=24, n_classes=n_y, n_align_classes=n_a,
                           lam=1e-2)
        dec = make_cv_decoder(strategy, cfg, fold_batch=10)
        tr, te = repeated_stratified_kfold_masks(
            np.asarray(tar.y), 5, n_iter, seed=0
        )
        accs = np.asarray(dec(tar, cross, jnp.asarray(tr), jnp.asarray(te)))
        results[strategy] = accs
        print(f"{strategy:12s}: {accs.mean():.3f} +- {accs.std():.3f}")

    # random-data control (-r flag analog)
    tar_r, cross_r, *_ = patients_from_config(
        "synthetic", "S14", seed=0, random_data=True, noise=3.0,
        trials_per_class=6,
    )
    cfg = DecodeConfig(n_comp=0.9, max_k=24, n_classes=n_y,
                       n_align_classes=n_a, lam=1e-2)
    dec = make_cv_decoder("sep_align", cfg, fold_batch=10)
    tr, te = repeated_stratified_kfold_masks(np.asarray(tar_r.y), 5, n_iter, seed=0)
    rand_accs = np.asarray(dec(tar_r, cross_r, jnp.asarray(tr), jnp.asarray(te)))
    print(f"{'random-ctrl':12s}: {rand_accs.mean():.3f} +- {rand_accs.std():.3f}"
          f" (chance {1.0 / n_y:.3f})")

    # fig_4-style statistics: one-way ANOVA + Tukey HSD across strategies,
    # then pairwise Wilcoxon with BH-FDR over the fold distributions
    from cross_patient_speech_decoding_tpu.analysis import (
        anova_tukey_by_group,
        context_comparison_table,
    )

    (row,) = anova_tukey_by_group({"S14": list(results.values())})
    names = list(results)
    print(f"ANOVA across strategies: F={row.f_statistic:.2f} "
          f"p={row.anova_p:.2e}")
    i, j = names.index("sep_align"), names.index("sep_dimred")
    print(f"Tukey sep_align vs sep_dimred: p={row.tukey_p[i, j]:.4f}")

    results["random-ctrl"] = rand_accs
    for r in context_comparison_table(results):
        print(f"Wilcoxon {r.a} vs {r.b}: W={r.statistic:.1f} "
              f"p={r.pvalue:.4f} p_fdr={r.pvalue_fdr:.4f}"
              f"{' *' if r.significant else ''}")

    if out_dir:
        from cross_patient_speech_decoding_tpu.utils.visualization import (
            plot_group_comparison,
            save_panel,
        )

        save_panel(out_dir, "strategy_comparison.png",
                   plot_group_comparison, results, "balanced accuracy",
                   baseline=1.0 / n_y,
                   title="Cross-patient pooling strategies (fig_4 analog)")
    return results


if __name__ == "__main__":
    main(*sys.argv[1:])
