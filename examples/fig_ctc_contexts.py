"""CTC context comparison + data-scaling extrapolation (fig_5 analog):
PER across Chance / Patient-specific / Unaligned / Aligned training
contexts, then a log-linear fit of PER vs cross-patient trial count and
the extrapolated trials needed to reach 25% PER.

    python examples/fig_ctc_contexts.py [n_iter] [epochs]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


import numpy as np


def main(n_iter: int = 2, epochs: int = 150, out_dir: str | None = None,
         scaling_fracs: str = "", **overrides):
    """``overrides`` are forwarded to :class:`TrainCTCConfig` — e.g.
    ``synth_patients=2, synth_T=120, decode="greedy"`` for a smoke run;
    ``out_dir`` saves the fig_5-style context panel + scaling curve.

    ``scaling_fracs`` (e.g. ``"0.1,0.3,0.6,1.0"``): ALSO train the
    aligned context at those cross-patient trial fractions
    (``cross_subsample``) and fit the fig_5 log-regression on the REAL
    measured PERs — the data-scaling extrapolation of fig_5.ipynb's
    log-linear cell ("trials needed for 25% PER"). Without it, a
    placeholder power-law curve demonstrates the fit machinery only."""
    from cross_patient_speech_decoding_tpu.cli.experiments import run_train_ctc
    from cross_patient_speech_decoding_tpu.utils.config import TrainCTCConfig
    from cross_patient_speech_decoding_tpu.utils.scaling import (
        log_linear_fit,
        trials_to_target_per,
    )

    n_iter, epochs = int(n_iter), int(epochs)
    clash = {"context", "n_iter", "epochs"} & set(overrides)
    if clash:
        # these are explicit arguments of main()/the context loop — an
        # override would raise an opaque duplicate-keyword TypeError below
        raise ValueError(
            f"pass {sorted(clash)} as main() arguments, not overrides "
            "(context is swept over all four values by this flow)"
        )
    pers = {}
    for context in ("chance", "patient", "unaligned", "aligned"):
        kw = dict(hidden=128, n_layers=2, lr=3e-3, decay_steps=epochs,
                  decode="beam", beam_size=50)
        kw.update(overrides)
        cfg = TrainCTCConfig(context=context, n_iter=n_iter, epochs=epochs,
                             **kw)
        pers[context] = run_train_ctc(cfg, verbose=False)
        print(f"{context:10s}: PER {pers[context].mean():.1f}% "
              f"+- {pers[context].std():.1f}", flush=True)

    # fig_5 stats cell: ordered pairwise Wilcoxon over contexts + BH-FDR
    from cross_patient_speech_decoding_tpu.analysis import (
        context_comparison_table,
    )

    pairs = [("chance", "patient"), ("patient", "unaligned"),
             ("patient", "aligned"), ("unaligned", "aligned")]
    flat = {k: np.asarray(v).ravel() for k, v in pers.items()}
    if flat["chance"].size >= 5:  # needs a distribution per context
        for r in context_comparison_table(flat, pairs):
            print(f"Wilcoxon {r.a} vs {r.b}: W={r.statistic:.1f} "
                  f"p={r.pvalue:.4f} p_fdr={r.pvalue_fdr:.4f}"
                  f"{' *' if r.significant else ''}")

    # data-scaling: PER vs cross-patient trial count (fig_5 log-linear
    # extrapolation cell). With scaling_fracs: REAL training runs at each
    # cross_subsample fraction; otherwise a placeholder power-law curve
    # demonstrates the fit machinery.
    if scaling_fracs:
        fracs = [float(s) for s in str(scaling_fracs).split(",") if s]
        base = dict(hidden=128, n_layers=2, lr=3e-3, decay_steps=epochs,
                    decode="greedy")
        base.update(overrides)
        cfg0 = TrainCTCConfig(context="aligned", n_iter=n_iter,
                              epochs=epochs, **base)
        # per-patient pooled trial count of the synthetic generator
        # (27 sequence classes x trials_per_class; experiments.
        # _synthetic_ctc_n_trials contract)
        per_pt = 27 * max(1, cfg0.synth_trials // 27)
        n_cross = (cfg0.synth_patients - 1) * per_pt
        trials, per_points = [], []
        for f in fracs:
            import dataclasses

            cfg_f = dataclasses.replace(
                cfg0, cross_subsample=f,
                out=(str(Path(out_dir) / f"scaling_{f}.pkl")
                     if out_dir else ""),
            )
            p = run_train_ctc(cfg_f, verbose=False)
            trials.append(max(1, int(round(f * n_cross))))
            per_points.append(float(np.mean(p)))
            print(f"cross_subsample={f}: ~{trials[-1]} cross trials, "
                  f"PER {per_points[-1]:.1f}%", flush=True)
        trials = np.asarray(trials)
        per_curve = np.maximum(np.asarray(per_points), 0.5)
    else:
        trials = np.array([5, 30, 55, 80, 105])
        per_curve = (np.maximum(pers["aligned"].mean(), 1.0)
                     * (trials / trials[-1]) ** -0.3)
    fit = log_linear_fit(trials, per_curve)
    t25 = trials_to_target_per(trials, per_curve, 25.0)
    print(f"log-linear slope {fit['slope']:.3f} (r={fit['r']:.3f}); "
          f"extrapolated trials to 25% PER: {t25:.0f}")

    if out_dir:
        from cross_patient_speech_decoding_tpu.utils.visualization import (
            plot_group_comparison,
            plot_scaling_curve,
            save_panel,
        )

        save_panel(out_dir, "ctc_contexts.png", plot_group_comparison,
                   {k: np.ravel(v) for k, v in pers.items()}, "PER (%)",
                   title="CTC training contexts (fig_5 analog)")
        save_panel(out_dir, "ctc_scaling.png", plot_scaling_curve,
                   trials, [np.atleast_1d(v) for v in per_curve],
                   "PER (%)", fit=fit)
    return pers


if __name__ == "__main__":
    main(*sys.argv[1:])
