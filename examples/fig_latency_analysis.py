"""Realtime decode-latency analysis (supp_fig_20 / supp_fig_24 analog).

Runs the streaming simulator at two model sizes, persists the per-step
latency distributions, then applies the offline latency analysis: summary
reports (p50/p90/max, deadline-violation rate against the 60 ms
closed-loop budget) and a Mann-Whitney comparison across conditions.

    python examples/fig_latency_analysis.py [n_samples]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import tempfile
from pathlib import Path


def main(n_samples: int = 10, out_dir: str | None = None):
    """``out_dir`` saves the per-condition latency panel as a PNG."""
    from cross_patient_speech_decoding_tpu.analysis import (
        latency_comparison,
        latency_report,
    )
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        run_realtime_sim,
    )
    from cross_patient_speech_decoding_tpu.data.loaders import load_pkl
    from cross_patient_speech_decoding_tpu.utils.config import (
        RealtimeSimConfig,
    )

    n_samples = int(n_samples)
    with tempfile.TemporaryDirectory() as td:
        conditions = {"hidden64": 64, "hidden256": 256}
        dists = {}
        for name, hidden in conditions.items():
            out = str(Path(td) / f"{name}.pkl")
            run_realtime_sim(
                RealtimeSimConfig(
                    n_channels=64, n_bins=80, hidden=hidden, n_layers=2,
                    per_step_samples=n_samples, per_step_chain=30, out=out,
                ),
                verbose=False,
            )
            dists[name] = load_pkl(out)["samples_ms"]

        for name, s in dists.items():
            rep = latency_report(s, deadline_ms=60.0)
            print(
                f"{name:10s}: p50 {rep['p50_ms']:.2f} ms, "
                f"p90 {rep['p90_ms']:.2f} ms, max {rep['max_ms']:.2f} ms, "
                f"deadline misses {rep['violation_rate'] * 100:.1f}%"
            )
        rows = latency_comparison(dists)
        for r in rows:
            print(f"MWU {r.a} vs {r.b}: U={r.statistic:.0f} "
                  f"p={r.pvalue:.4f} p_fdr={r.pvalue_fdr:.4f}"
                  f"{' *' if r.significant else ''}")

        if out_dir:
            from cross_patient_speech_decoding_tpu.utils.visualization import (
                plot_group_comparison,
                save_panel,
            )

            save_panel(out_dir, "latency.png", plot_group_comparison,
                       dists, "per-step latency (ms)", baseline=60.0,
                       baseline_label="closed-loop budget",
                       title="Streaming decode latency "
                             "(supp_fig_20/24 analog)")
    return dists, rows


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:2]))
