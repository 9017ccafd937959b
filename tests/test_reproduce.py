"""Tests for `cpsd reproduce` — the manifest-driven matrix runner
(the reference's SLURM job-array workflow, README.md:27, as one
resumable command)."""

import numpy as np
import pytest
import yaml

from cross_patient_speech_decoding_tpu.cli.reproduce import (
    expand_manifest,
    run_reproduce,
)
from cross_patient_speech_decoding_tpu.utils.config import ReproduceConfig


def test_expand_manifest_cross_product_and_templates():
    manifest = {
        "defaults": {"data": "synthetic", "seed": 3},
        "jobs": [
            {
                "command": "svm-decode",
                "matrix": {"target_pt": ["S14", "S26"],
                           "strategy": ["sep_align", "joint_pca"]},
                "overrides": {"n_iter": 2,
                              "out": "r/{target_pt}_{strategy}.pkl"},
            },
            {"command": "realtime-sim"},
        ],
    }
    jobs = expand_manifest(manifest)
    assert len(jobs) == 5  # 2x2 matrix + 1 bare job
    assert jobs[0]["values"]["out"] == "r/S14_sep_align.pkl"
    assert jobs[0]["values"]["seed"] == 3  # defaults merged
    assert jobs[3]["values"]["out"] == "r/S26_joint_pca.pkl"
    assert jobs[4]["command"] == "realtime-sim"
    # matrix order: later keys vary fastest (itertools.product)
    assert [j["values"]["target_pt"] for j in jobs[:4]] == [
        "S14", "S14", "S26", "S26"]


def test_expand_manifest_chained_templates_resolve():
    """A templated value referencing ANOTHER templated value resolves to
    the final string, not the unexpanded intermediate (round-4 advisor
    finding: expansion was single-pass against a snapshot)."""
    manifest = {
        "defaults": {"run_name": "{target_pt}_{strategy}",
                     "out": "r/{run_name}.pkl"},
        "jobs": [{
            "command": "svm-decode",
            "matrix": {"target_pt": ["S14"], "strategy": ["sep_align"]},
        }],
    }
    (job,) = expand_manifest(manifest)
    assert job["values"]["out"] == "r/S14_sep_align.pkl"


def test_expand_manifest_cyclic_templates_fail_loudly():
    manifest = {
        "defaults": {"a": "{b}x", "b": "{a}y"},
        "jobs": [{"command": "svm-decode"}],
    }
    with pytest.raises(ValueError, match="converge"):
        expand_manifest(manifest)


def test_expand_manifest_rejects_bad_shapes():
    with pytest.raises(ValueError):
        expand_manifest({"jobs": []})
    with pytest.raises(ValueError):
        expand_manifest({"jobs": [{"matrix": {}}]})
    with pytest.raises(ValueError):
        expand_manifest(
            {"jobs": [{"command": "svm-decode",
                       "matrix": {"target_pt": "S14"}}]})


def test_unknown_config_key_fails_before_any_run(tmp_path):
    m = tmp_path / "m.yaml"
    m.write_text(yaml.safe_dump({
        "jobs": [{"command": "svm-decode",
                  "overrides": {"not_a_field": 1}}],
    }))
    with pytest.raises(KeyError):
        run_reproduce(ReproduceConfig(manifest=str(m), dry_run=True),
                      verbose=False)


def test_unknown_command_fails(tmp_path):
    m = tmp_path / "m.yaml"
    m.write_text(yaml.safe_dump({"jobs": [{"command": "no-such"}]}))
    with pytest.raises(KeyError):
        run_reproduce(ReproduceConfig(manifest=str(m), dry_run=True),
                      verbose=False)


def _mini_manifest(tmp_path, n_iter=1):
    return {
        "defaults": {"data": "synthetic", "seed": 0},
        "jobs": [
            {
                "command": "svm-decode",
                "matrix": {"target_pt": ["S14", "S26"],
                           "strategy": ["sep_align", "joint_pca"]},
                "overrides": {
                    "n_iter": n_iter, "n_folds": 2, "synth_patients": 2,
                    "synth_T": 12, "synth_trials": 6, "max_k": 8,
                    "save_preds": False,
                    "out": str(tmp_path) + "/{target_pt}_{strategy}.pkl",
                },
            },
        ],
    }


def test_dry_run_and_only_filter(tmp_path):
    m = tmp_path / "m.yaml"
    m.write_text(yaml.safe_dump(_mini_manifest(tmp_path)))
    s = run_reproduce(ReproduceConfig(manifest=str(m), dry_run=True),
                      verbose=False)
    assert s["ran"] == 4 and s["skipped"] == 0 and not s["failed"]
    s = run_reproduce(
        ReproduceConfig(manifest=str(m), dry_run=True, only="S26"),
        verbose=False)
    assert s["ran"] == 2 and s["filtered"] == 2


def test_mini_matrix_end_to_end_with_resume(tmp_path):
    """2 patients x 2 strategies run for real on synthetic data; a second
    invocation skips everything (cross-matrix resume)."""
    m = tmp_path / "m.yaml"
    m.write_text(yaml.safe_dump(_mini_manifest(tmp_path)))
    cfg = ReproduceConfig(manifest=str(m))
    s = run_reproduce(cfg, verbose=False)
    assert s["ran"] == 4 and not s["failed"]
    for pt in ("S14", "S26"):
        for st in ("sep_align", "joint_pca"):
            assert (tmp_path / f"{pt}_{st}.pkl").exists()
    s2 = run_reproduce(cfg, verbose=False)
    assert s2["skipped"] == 4 and s2["ran"] == 0


def test_keep_going_collects_failures(tmp_path, monkeypatch):
    m = tmp_path / "m.yaml"
    m.write_text(yaml.safe_dump(_mini_manifest(tmp_path)))
    import cross_patient_speech_decoding_tpu.cli.experiments as exp

    def boom(cfg, verbose=True):
        raise RuntimeError("injected")

    monkeypatch.setattr(exp, "run_svm_decode", boom)
    cfg = ReproduceConfig(manifest=str(m), keep_going=True)
    s = run_reproduce(cfg, verbose=False)
    assert len(s["failed"]) == 4 and s["ran"] == 0
    # without keep_going the first failure propagates
    with pytest.raises(RuntimeError):
        run_reproduce(ReproduceConfig(manifest=str(m)), verbose=False)


def test_paper_manifest_expands_and_builds_every_config():
    """The shipped paper.yaml must construct every job config (soft
    defaults like data: synthetic are dropped for commands without the
    field, e.g. realtime-sim) and cover EVERY reference experiment
    family — including the round-5 additions: the nested-CV headline,
    tune-ctc at the reference design, train-nn, subsample-grid, and CTC
    contexts for three targets (VERDICT r4 missing #1)."""
    from pathlib import Path

    from cross_patient_speech_decoding_tpu.cli.reproduce import (
        _job_config,
        expand_manifest,
    )

    manifest = yaml.safe_load(
        (Path(__file__).resolve().parent.parent / "manifests" /
         "paper.yaml").read_text())
    jobs = expand_manifest(manifest)
    assert len(jobs) > 70
    cfgs = {}
    for job in jobs:
        cfg_cls, fn, job_cfg = _job_config(
            job["command"], job["values"], job["soft_keys"])
        assert job_cfg is not None
        cfgs.setdefault(job["command"], []).append(job_cfg)
    # every experiment family present
    for cmd in ("svm-decode", "train-seq2seq", "train-nn", "train-ctc",
                "tune-ctc", "realtime-sim", "subsample-trials",
                "subsample-grid", "subsample-spatial", "subsample-pitch"):
        assert cmd in cfgs, f"{cmd} missing from paper.yaml"
    # the headline: per-patient nested-CV svm jobs at the reference's
    # 25-candidate budget (5 rounds x 5 points = BayesSearchCV n_iter=25)
    ncv = [c for c in cfgs["svm-decode"] if c.nested]
    assert len(ncv) == 6
    assert all(c.nested_rounds * c.nested_points == 25 for c in ncv)
    assert all(c.n_iter == 50 and c.n_folds == 20 for c in ncv)
    # tune-ctc at the reference tuning design (tune_ctc_rnn_config.yaml:
    # 49-53: 30 trials x 5-fold CV x 300 epochs, random search)
    (tune,) = cfgs["tune-ctc"]
    assert tune.n_trials == 30 and tune.cv_folds == 5
    assert tune.rungs == "300" and tune.sampler == "random"
    assert tune.align_train and tune.hparam_out
    # fig_5 production geometry with the single-device HBM bound
    assert (tune.synth_patients, tune.synth_T) == (8, 600)
    assert tune.model_chunk == 1
    # all four NN-classifier families
    assert {c.model for c in cfgs["train-nn"]} == {
        "tcn", "transformer", "cnn_transformer", "conv_rnn"}
    # CTC contexts for >= 3 targets, all four contexts each
    by_pt = {}
    for c in cfgs["train-ctc"]:
        by_pt.setdefault(c.target_pt, set()).add(c.context)
    assert len(by_pt) >= 3
    assert all(v == {"chance", "patient", "unaligned", "aligned"}
               for v in by_pt.values())


def test_strict_override_key_still_raises_with_soft_defaults(tmp_path):
    from cross_patient_speech_decoding_tpu.cli.reproduce import _job_config

    # defaults-only unknown key: dropped
    _, _, cfg = _job_config("realtime-sim", {"data": "synthetic"},
                            soft_keys={"data"})
    # override-level unknown key: raises
    with pytest.raises(KeyError):
        _job_config("realtime-sim", {"data": "synthetic"}, soft_keys=())


def test_dry_run_is_read_only_on_mismatched_results(tmp_path):
    """dry_run must never set aside existing result files (review
    finding: _completed_results renames on config mismatch)."""
    from cross_patient_speech_decoding_tpu.data.loaders import save_pkl

    man = _mini_manifest(tmp_path)
    m = tmp_path / "m.yaml"
    m.write_text(yaml.safe_dump(man))
    out = tmp_path / "S14_sep_align.pkl"
    # a result file from a DIFFERENT config (different seed)
    save_pkl({"params": {"seed": 999, "target_pt": "S14"},
              "accs": [np.ones(2)]}, out)
    run_reproduce(ReproduceConfig(manifest=str(m), dry_run=True),
                  verbose=False)
    assert out.exists()  # untouched
    assert not list(tmp_path.glob("*.stale"))


def test_n_devices_not_part_of_resume_identity():
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        _same_run_config,
    )

    assert _same_run_config({"target_pt": "S14", "n_devices": 0},
                            {"target_pt": "S14", "n_devices": 4})


def test_sweep_store_completion_detected(tmp_path):
    """Subsample drivers persist {'params','sweep','results'} once at
    the end; reproduce must detect those as complete (review finding:
    only incremental 'accs' stores were checked)."""
    from cross_patient_speech_decoding_tpu.cli.reproduce import (
        _already_complete,
    )
    from cross_patient_speech_decoding_tpu.cli.subsample_experiments import (
        SubsampleConfig,
    )
    from cross_patient_speech_decoding_tpu.data.loaders import save_pkl

    out = tmp_path / "sweep.pkl"
    cfg = SubsampleConfig(n_iter=3, out=str(out))
    assert not _already_complete(cfg)
    save_pkl({"params": vars(cfg), "sweep": "trials",
              "results": {10: [0.5, 0.6, 0.7]}}, out)
    assert _already_complete(cfg)
    # different n_iter: a sweep is NOT resumable mid-way -> not complete
    assert not _already_complete(
        SubsampleConfig(n_iter=5, out=str(out)), mutate=False)
