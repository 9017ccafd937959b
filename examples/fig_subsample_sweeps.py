"""Electrode/trial subsampling analyses + statistics (supp_fig_27 and the
fig_6 spatial-averaging stats cell).

Runs the trial-count and contact-size sweeps on synthetic data, then the
reference's statistical flows: log-linear scaling fit over the trial
sweep (`fig_5.ipynb` regression cell) and a paired permutation test per
contact size with BH-FDR (`fig_6.ipynb` cell 53:
``permutation_test(..., permutation_type='samples')`` + fdrcorrection).

    python examples/fig_subsample_sweeps.py [n_iter]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


import numpy as np


def main(n_iter: int = 6, out_dir: str | None = None, **overrides):
    """``overrides`` are forwarded to :class:`SubsampleConfig` — e.g.
    ``trials_per_class=4, k_step=30`` for a smoke run; ``out_dir``
    saves the trial-scaling curve + contact-size panel PNGs."""
    from cross_patient_speech_decoding_tpu.analysis import (
        fdr_bh,
        paired_permutation_test,
    )
    from cross_patient_speech_decoding_tpu.cli.subsample_experiments import (
        SubsampleConfig,
        run_spatial_avg,
        run_trial_subsample,
    )
    from cross_patient_speech_decoding_tpu.utils.scaling import log_linear_fit

    n_iter = int(n_iter)
    # hard regime: heavy noise + few trials so resolution/data actually
    # limit accuracy (a saturated sweep is uninformative)
    hard = dict(noise=3.0, trials_per_class=8, n_folds=3, n_iter=n_iter)
    hard.update(overrides)
    k_step = hard.pop("k_step", 15)
    cfg = SubsampleConfig(k_step=k_step, **hard)

    # --- trial-count sweep + log-linear scaling fit (fig_5 flow) ----------
    ks, acc = run_trial_subsample(cfg, verbose=False)
    err = 100.0 * (1.0 - acc.mean(axis=1))  # error %, decreasing with data
    fit = log_linear_fit(ks, np.maximum(err, 1e-3))
    print("trial sweep:")
    for k, a in zip(ks, acc.mean(axis=1)):
        print(f"  k={k:4d}: acc {a:.3f}")
    print(f"  log-linear slope {fit['slope']:.3f} (r={fit['r']:.3f})")

    # --- contact-size sweep + permutation test vs full resolution ---------
    res = run_spatial_avg(cfg, verbose=False)
    base = SubsampleConfig(contact_sizes=(1,), **{
        k: v for k, v in hard.items() if k != "contact_sizes"})
    full = run_spatial_avg(base, verbose=False)[1]
    stats, pvals, sizes = [], [], []
    for cs, accs in res.items():
        t = paired_permutation_test(full, accs, seed=0)
        sizes.append(cs)
        stats.append(float(t.statistic))
        pvals.append(float(t.pvalue))
    _, p_fdr = fdr_bh(np.array(pvals))
    print("contact-size sweep (perm test vs 1x1, BH-FDR):")
    for cs, s, p, pf in zip(sizes, stats, pvals, p_fdr):
        print(f"  {cs}x{cs}: acc {res[cs].mean():.3f} "
              f"diff={s:+.3f} p={p:.4f} p_fdr={pf:.4f}")

    if out_dir:
        from cross_patient_speech_decoding_tpu.utils.visualization import (
            plot_group_comparison,
            plot_scaling_curve,
            save_panel,
        )

        save_panel(out_dir, "trial_scaling.png", plot_scaling_curve,
                   ks, list(acc), "balanced accuracy")
        groups = {"1x1": full, **{f"{cs}x{cs}": res[cs] for cs in sizes}}
        save_panel(out_dir, "contact_size.png", plot_group_comparison,
                   groups, "balanced accuracy",
                   title="Contact-size sweep (fig_6 analog)")


if __name__ == "__main__":
    main(*sys.argv[1:])
