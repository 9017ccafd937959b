"""Smoke tests for every figure flow in examples/.

The 8 example scripts are the L6 demonstration layer gluing the analysis
library to the decoders (reference: ``figure_analyses/fig_2..6.ipynb``).
Each test imports the script as a module and runs ``main()`` at tiny
synthetic scale on the CPU backend — the full-scale TPU runs are
documented in the module docstrings. A refactor that breaks an example's
imports or call contracts fails here, not at demo time.
"""

import importlib.util
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, EXAMPLES / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_no_private_imports_in_examples():
    """Example flows must sit on the PUBLIC API only (VERDICT r3 #4)."""
    import re

    bad = []
    for f in sorted(EXAMPLES.glob("fig_*.py")):
        src = f.read_text()
        for m in re.finditer(
            r"from cross_patient_speech_decoding_tpu[.\w]* import \(?"
            r"([^)\n]*(?:\n[^)]*)?)\)?", src,
        ):
            for sym in re.split(r"[,\s]+", m.group(1)):
                if sym.startswith("_"):
                    bad.append(f"{f.name}: {sym}")
    assert not bad, bad


def test_fig_alignment_quality(tmp_path):
    _load("fig_alignment_quality").main(out_dir=str(tmp_path))
    assert (tmp_path / "alignment_1d.png").exists()
    assert (tmp_path / "alignment_2d.png").exists()


def test_fig_decode_comparison(tmp_path):
    groups, rows, recon = _load("fig_decode_comparison").main(
        n_iter=2, out_dir=str(tmp_path))
    assert set(groups) >= {"single", "pooled"}
    assert all(0.0 <= a.mean() <= 1.0 for a in groups.values())
    assert len(recon) == 3  # one (aligned, null) pair per cross patient
    assert (tmp_path / "decode_comparison.png").exists()


def test_fig_strategy_comparison(tmp_path):
    _load("fig_strategy_comparison").main(n_iter=2, out_dir=str(tmp_path))
    assert (tmp_path / "strategy_comparison.png").exists()


def test_fig_latent_clustering(tmp_path):
    _load("fig_latent_clustering").main(n_iter=3, out_dir=str(tmp_path))
    assert (tmp_path / "latent_clustering.png").exists()


def test_fig_rsa(tmp_path):
    _load("fig_rsa").main(n_iter=3, out_dir=str(tmp_path))
    assert (tmp_path / "rsa.png").exists()


def test_fig_latency_analysis(tmp_path):
    dists, rows = _load("fig_latency_analysis").main(
        n_samples=5, out_dir=str(tmp_path))
    assert set(dists) == {"hidden64", "hidden256"}
    assert all(len(s) == 5 for s in dists.values())
    assert (tmp_path / "latency.png").exists()


def test_fig_ctc_contexts(capsys, tmp_path):
    _load("fig_ctc_contexts").main(
        n_iter=1, epochs=2, out_dir=str(tmp_path), synth_patients=2,
        synth_T=120, synth_trials=40, decode="greedy", hidden=32,
        n_layers=1,
    )
    out = capsys.readouterr().out
    assert "aligned" in out and "PER" in out
    assert (tmp_path / "ctc_contexts.png").exists()
    assert (tmp_path / "ctc_scaling.png").exists()


def test_fig_ctc_contexts_real_scaling_branch(capsys, tmp_path):
    """scaling_fracs trains the aligned context at real cross_subsample
    fractions and fits the fig_5 log-regression on MEASURED PERs."""
    _load("fig_ctc_contexts").main(
        n_iter=1, epochs=2, out_dir=str(tmp_path), synth_patients=2,
        synth_T=120, synth_trials=40, decode="greedy", hidden=32,
        n_layers=1, scaling_fracs="0.3,1.0",
    )
    out = capsys.readouterr().out
    assert "cross_subsample=0.3" in out
    assert "extrapolated trials to 25% PER" in out
    assert (tmp_path / "ctc_scaling.png").exists()


def test_fig_ctc_contexts_rejects_clashing_overrides():
    """'context'/'n_iter'/'epochs' in **overrides used to surface as a
    duplicate-keyword TypeError (round-4 advisor finding)."""
    import pytest

    with pytest.raises(ValueError, match="context"):
        _load("fig_ctc_contexts").main(n_iter=1, epochs=2, context="aligned")


def test_fig_subsample_sweeps(tmp_path):
    _load("fig_subsample_sweeps").main(
        n_iter=2, out_dir=str(tmp_path), trials_per_class=6, k_step=40,
    )
    assert (tmp_path / "trial_scaling.png").exists()
    assert (tmp_path / "contact_size.png").exists()
