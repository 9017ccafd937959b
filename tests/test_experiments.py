"""Experiment-driver smoke tests (tiny budgets): every CLI family runs end
to end on the CPU mesh, controls behave, outputs persist."""

import numpy as np
import pytest

from cross_patient_speech_decoding_tpu.cli.experiments import (
    _patients_from_config,
    run_realtime_sim,
    run_svm_decode,
    run_train_ctc,
    run_train_seq2seq,
    run_tune_ctc,
)
from cross_patient_speech_decoding_tpu.cli.subsample_experiments import (
    SubsampleConfig,
    run_spatial_avg,
    run_trial_subsample,
)
from cross_patient_speech_decoding_tpu.utils.config import (
    RealtimeSimConfig,
    SVMDecodeConfig,
    TrainCTCConfig,
    TrainSeq2SeqConfig,
    TuneCTCConfig,
)


def test_svm_decode_and_chance_control(tmp_path):
    base = dict(n_iter=1, n_folds=3, fold_batch=3, max_k=12, seed=0)
    accs = run_svm_decode(
        SVMDecodeConfig(out=str(tmp_path / "a.pkl"), **base), verbose=False
    )
    accs_chance = run_svm_decode(
        SVMDecodeConfig(out=str(tmp_path / "b.pkl"), chance=True, **base),
        verbose=False,
    )
    assert accs.mean() > accs_chance.mean() + 0.3
    assert (tmp_path / "a.pkl").exists()


def test_svm_decode_iter_batch_matches_sequential(tmp_path):
    """iter_batch stacks iterations into one device call; results must be
    identical to the sequential loop (same per-iteration seeds)."""
    base = dict(n_iter=3, n_folds=2, fold_batch=6, max_k=10, seed=1)
    seq = run_svm_decode(
        SVMDecodeConfig(out=str(tmp_path / "seq.pkl"), **base), verbose=False
    )
    bat = run_svm_decode(
        SVMDecodeConfig(out=str(tmp_path / "bat.pkl"), iter_batch=2, **base),
        verbose=False,
    )
    np.testing.assert_allclose(bat, seq, atol=1e-6)


def test_svm_decode_shuffle_surrogate(tmp_path):
    cfg = SVMDecodeConfig(n_iter=1, n_folds=2, fold_batch=2, max_k=10,
                          surrogate="shuffle", out=str(tmp_path / "s.pkl"))
    accs = run_svm_decode(cfg, verbose=False)
    assert np.isfinite(accs).all()


def test_train_ctc_patient_context():
    cfg = TrainCTCConfig(context="patient", n_iter=1, epochs=8, hidden=16,
                         n_layers=1, out="")
    pers = run_train_ctc(cfg, verbose=False)
    assert pers.shape == (1,)
    assert np.isfinite(pers).all()


def test_train_seq2seq_fold_parallel(tmp_path):
    cfg = TrainSeq2SeqConfig(n_iter=1, n_folds=2, epochs=5, hidden=12,
                             n_filters=8, out=str(tmp_path / "s.csv"))
    accs = run_train_seq2seq(cfg, verbose=False)
    assert accs.shape == (2,)
    assert (tmp_path / "s.csv").exists()


def test_tune_ctc_smoke(tmp_path):
    cfg = TuneCTCConfig(n_trials=2, rungs="3",
                        manifest=str(tmp_path / "m.jsonl"))
    res = run_tune_ctc(cfg, verbose=False)
    assert len(res) == 2
    assert (tmp_path / "m.jsonl").exists()


def test_realtime_sim_smoke():
    res = run_realtime_sim(
        RealtimeSimConfig(n_channels=8, n_bins=40, hidden=16, n_layers=1,
                          per_step_samples=3, per_step_chain=5),
        verbose=False,
    )
    assert np.isfinite(res["amortized_ms"])
    # < 100 samples: the tail statistic is the labeled max, not a p99
    assert np.isfinite(res["p50_ms"]) and np.isfinite(res["max_ms"])
    assert res["p50_ms"] <= res["max_ms"]
    assert res["p99_ms"] is None


def test_ctc_driver_writes_epoch_logs(tmp_path):
    """Observability wiring: every training run leaves per-epoch metric
    CSVs under logs/{run_name}/ next to its results file, with the
    reference's context-encoded run naming (train_ctc_rnn.py:235-261)."""
    import csv

    out = tmp_path / "ctc.pkl"
    cfg = TrainCTCConfig(context="patient", n_iter=1, epochs=4, hidden=8,
                         n_layers=1, out=str(out))
    run_train_ctc(cfg, verbose=False)
    log = tmp_path / "logs" / "S14_ptSpecific_ctcRnn" / "iter000.csv"
    assert log.exists()
    rows = list(csv.DictReader(open(log)))
    assert rows and {"epoch", "loss", "per"} <= set(rows[0])


def test_seq2seq_fold_parallel_writes_logs(tmp_path):
    cfg = TrainSeq2SeqConfig(n_iter=1, n_folds=2, epochs=2, hidden=12,
                             n_filters=8, out=str(tmp_path / "s.csv"))
    run_train_seq2seq(cfg, verbose=False)
    log = tmp_path / "logs" / "S14_aligned_seq2seq" / "fold_accs.csv"
    assert log.exists()


def test_trace_flag_writes_profile(tmp_path):
    cfg = TrainCTCConfig(context="patient", n_iter=1, epochs=2, hidden=8,
                         n_layers=1, out=str(tmp_path / "c.pkl"), trace=True)
    run_train_ctc(cfg, verbose=False)
    trace_dir = tmp_path / "trace" / "S14_ptSpecific_ctcRnn"
    assert trace_dir.exists()
    assert any(trace_dir.rglob("*"))  # profiler wrote something


def test_svm_decode_nested(tmp_path):
    """nested=true routes the SVM driver through the per-outer-fold TPE
    search (the reference's do_cv BayesSearchCV wiring) and persists the
    per-fold best hyperparameters; with a deliberately bad fixed lam the
    tuned run must not lose to the fixed-param run."""
    from cross_patient_speech_decoding_tpu.data.loaders import load_pkl

    base = dict(n_iter=1, n_folds=3, max_k=12, seed=0, lam=100.0)
    fixed = run_svm_decode(
        SVMDecodeConfig(out=str(tmp_path / "fixed.pkl"), **base),
        verbose=False,
    )
    out = str(tmp_path / "nested.pkl")
    tuned = run_svm_decode(
        SVMDecodeConfig(out=out, nested=True, nested_rounds=2,
                        nested_points=3, nested_inner=3, **base),
        verbose=False,
    )
    assert tuned.shape == (1, 3)
    assert tuned.mean() >= fixed.mean() - 1e-9
    store = load_pkl(out)
    # per-fold best hyperparams persisted alongside the accuracies
    (hp,) = store["extra"]
    assert {"n_comp", "lam", "gamma_scale"} <= set(hp)
    assert all(hp[k].shape == (3,) for k in ("n_comp", "lam", "gamma_scale"))


def test_svm_decode_nested_resume(tmp_path):
    """Nested runs resume like fixed-param runs: a 1-iteration run
    continued to 2 matches the uninterrupted 2-iteration run."""
    base = dict(n_iter=2, n_folds=2, max_k=10, seed=0, nested=True,
                nested_rounds=1, nested_points=2, nested_inner=2)
    full = run_svm_decode(
        SVMDecodeConfig(out=str(tmp_path / "full.pkl"), **base),
        verbose=False,
    )
    part = str(tmp_path / "part.pkl")
    run_svm_decode(
        SVMDecodeConfig(out=part, **dict(base, n_iter=1)), verbose=False
    )
    resumed = run_svm_decode(SVMDecodeConfig(out=part, **base), verbose=False)
    np.testing.assert_allclose(resumed, full)


def test_prewarm_commands():
    """Compile-cache prewarm: one-epoch CTC run and AOT-lowered seq2seq
    fold program, both at the given config's shapes (VERDICT r2 #6)."""
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        run_prewarm_ctc,
        run_prewarm_seq2seq,
    )

    out = run_prewarm_ctc(
        TrainCTCConfig(context="patient", epochs=50, hidden=8, n_layers=1),
        verbose=False,
    )
    assert out.size == 0
    out = run_prewarm_seq2seq(
        TrainSeq2SeqConfig(n_folds=2, epochs=40, hidden=12, n_filters=8,
                           fold_parallel=True),
        verbose=False,
    )
    assert out.size == 0


def test_realtime_sim_persists_latency_distribution(tmp_path):
    """out= saves the per-step samples for the supp_fig_20/24 analyses."""
    from cross_patient_speech_decoding_tpu.analysis import latency_report
    from cross_patient_speech_decoding_tpu.data.loaders import load_pkl

    out = tmp_path / "lat.pkl"
    run_realtime_sim(
        RealtimeSimConfig(n_channels=8, n_bins=30, hidden=16, n_layers=1,
                          per_step_samples=4, per_step_chain=5,
                          out=str(out)),
        verbose=False,
    )
    store = load_pkl(out)
    assert store["samples_ms"].shape == (4,)
    rep = latency_report(store["samples_ms"])
    assert np.isfinite(rep["p50_ms"])


def test_single_patient_decode_empty_cross():
    """The fig_3 'single-patient' condition: the fold decoder accepts an
    empty cross tuple (only target data trains the classifier)."""
    import jax.numpy as jnp

    from cross_patient_speech_decoding_tpu.data.splits import (
        repeated_stratified_kfold_masks,
    )
    from cross_patient_speech_decoding_tpu.decoders import (
        DecodeConfig,
        make_cv_decoder,
    )

    tar, cross, n_y, n_a = _patients_from_config(
        "synthetic", "S14", seed=0, noise=0.5, trials_per_class=6
    )
    cfg = DecodeConfig(n_comp=0.9, max_k=12, n_classes=n_y,
                       n_align_classes=n_a, lam=1e-2)
    dec = make_cv_decoder("sep_align", cfg, fold_batch=3)
    tr, te = repeated_stratified_kfold_masks(np.asarray(tar.y), 3, 1, seed=0)
    accs = np.asarray(dec(tar, (), jnp.asarray(tr), jnp.asarray(te)))
    assert accs.shape == (3,)
    assert np.isfinite(accs).all() and accs.mean() > 1.0 / n_y


def test_trial_subsample_sweep():
    cfg = SubsampleConfig(n_iter=1, n_folds=2, max_k=8, k_start=10,
                          k_step=200)
    ks, results = run_trial_subsample(cfg, verbose=False)
    assert results.shape == (len(ks), 1)


def test_spatial_avg_sweep():
    cfg = SubsampleConfig(n_iter=1, n_folds=2, max_k=8, contact_sizes=(3,))
    results = run_spatial_avg(cfg, verbose=False)
    assert 3 in results


def test_svm_decode_resume(tmp_path):
    """Kill-and-resume for the SVM driver: completed iterations in the
    incremental pkl are skipped, and the continuation is identical to an
    uninterrupted run (per-iteration seeding)."""
    from cross_patient_speech_decoding_tpu.data.loaders import load_pkl

    base = dict(n_iter=2, n_folds=3, fold_batch=3, max_k=12, seed=0)
    full = run_svm_decode(
        SVMDecodeConfig(out=str(tmp_path / "full.pkl"), **base), verbose=False
    )

    part_out = str(tmp_path / "part.pkl")
    base1 = dict(base, n_iter=1)
    run_svm_decode(SVMDecodeConfig(out=part_out, **base1), verbose=False)
    resumed = run_svm_decode(
        SVMDecodeConfig(out=part_out, **base), verbose=False
    )
    np.testing.assert_allclose(resumed, full)
    assert len(load_pkl(part_out)["accs"]) == 2


def test_train_seq2seq_resume(tmp_path):
    """Seq2seq driver resumes from its progress pkl: a 1-iteration run
    followed by an n_iter=2 run reproduces the uninterrupted 2-iteration
    result exactly (per-iteration seeding)."""
    base = dict(n_iter=2, n_folds=2, epochs=3, hidden=16, n_filters=8,
                fold_parallel=True, seed=0)
    full = run_train_seq2seq(
        TrainSeq2SeqConfig(out=str(tmp_path / "full.csv"), **base),
        verbose=False,
    )
    part_out = str(tmp_path / "part.csv")
    run_train_seq2seq(
        TrainSeq2SeqConfig(out=part_out, **dict(base, n_iter=1)),
        verbose=False,
    )
    resumed = run_train_seq2seq(
        TrainSeq2SeqConfig(out=part_out, **base), verbose=False
    )
    np.testing.assert_allclose(resumed, full, rtol=1e-5)


def test_tune_ctc_tpe_sampler(tmp_path):
    """sampler=tpe routes through the BOHB acquisition layer end to end."""
    cfg = TuneCTCConfig(n_trials=3, rungs="2", manifest=str(tmp_path / "m.jsonl"),
                        sampler="tpe")
    results = run_tune_ctc(cfg, verbose=False)
    assert len(results) >= 3
    assert all(np.isfinite(r["metric"]) for r in results)


def test_resume_ignores_other_configs_results(tmp_path):
    """Sharing one out path across configs (e.g. the contexts comparison
    writing to the default path) must NOT resume from the other config's
    results — the stored params are validated, mismatches start fresh."""
    out = str(tmp_path / "shared.pkl")
    base = dict(n_iter=1, epochs=3, hidden=8, n_layers=1, out=out)
    run_train_ctc(TrainCTCConfig(context="patient", **base), verbose=False)
    shared = run_train_ctc(TrainCTCConfig(context="chance", **base), verbose=False)

    solo = run_train_ctc(
        TrainCTCConfig(context="chance",
                       **dict(base, out=str(tmp_path / "solo.pkl"))),
        verbose=False,
    )
    np.testing.assert_allclose(shared, solo)


def test_stale_results_set_aside_bounded(tmp_path):
    """Config mismatches move prior files into a timestamped _stale/
    sidecar (each under a UNIQUE name — a second mismatch must not
    destroy the first archive, round-3 review finding), and repeated
    mismatched reruns leave a BOUNDED footprint (round-4 verdict: 45
    unreclaimed .staleN files). out='' skips the resume scan entirely
    instead of treating Path('') as the cwd."""
    from cross_patient_speech_decoding_tpu.cli import experiments as exp
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        _completed_results,
    )
    from cross_patient_speech_decoding_tpu.data.loaders import (
        append_results_pkl,
        load_pkl,
    )

    out = tmp_path / "r.pkl"
    n_runs = exp.STALE_KEEP + 5
    for i in range(n_runs):
        append_results_pkl(str(out), np.asarray([float(i)]),
                           params={"cfg": i})
        got = _completed_results(str(out), {"cfg": i + 100})  # mismatch
        assert got == []
        assert not out.exists()  # always moved, never left in place
    archived = sorted((tmp_path / "_stale").glob("*_r.pkl"))
    # bounded at STALE_KEEP, newest retained (the last one holds cfg=n-1)
    assert len(archived) == exp.STALE_KEEP
    newest = max(archived, key=lambda p: p.stat().st_mtime_ns)
    assert load_pkl(newest)["params"]["cfg"] == n_runs - 1
    # a sibling result's set-asides are NOT pruned by this stem's cap
    other = tmp_path / "other.pkl"
    append_results_pkl(str(other), np.asarray([0.0]), params={"cfg": 0})
    _completed_results(str(other), {"cfg": 1})
    assert len(list((tmp_path / "_stale").glob("*_other.pkl"))) == 1
    assert len(list((tmp_path / "_stale").glob("*_r.pkl"))) == exp.STALE_KEEP

    assert _completed_results("", {"cfg": 0}) == []


def test_ctc_cross_subsample_scaling_knob(tmp_path):
    """cross_subsample (the fig_5 data-scaling axis): stratified per-class
    shrink of each cross patient's pooled rows; the aligned driver runs
    end-to-end with it."""
    import jax.numpy as jnp

    from cross_patient_speech_decoding_tpu.cli.experiments import (
        _subsample_ctc_set,
        run_train_ctc,
    )
    from cross_patient_speech_decoding_tpu.utils.config import TrainCTCConfig

    rng = np.random.default_rng(0)
    y = np.repeat(np.arange(1, 5), 10)[:, None] * np.ones((1, 3), int)
    X = jnp.asarray(rng.normal(size=(40, 8, 4)), jnp.float32)
    il = np.full(40, 8, np.int32)
    ll = np.full(40, 3, np.int32)
    Xs, ys, ils, lls = _subsample_ctc_set((X, y, il, ll), 0.5, rng)
    assert len(ys) == 20 and Xs.shape[0] == 20
    # stratified: every first-label class keeps half its rows
    for c in range(1, 5):
        assert (ys[:, 0] == c).sum() == 5
    assert len(ils) == 20 and len(lls) == 20

    pers = run_train_ctc(
        TrainCTCConfig(context="aligned", n_iter=1, epochs=2, hidden=8,
                       n_layers=1, cross_subsample=0.4, out="",
                       synth_patients=2, synth_T=60, synth_trials=40),
        verbose=False,
    )
    assert np.isfinite(pers).all()


def test_analyze_results_comparison(tmp_path):
    """cpsd analyze: fig_4/fig_5 statistics straight from driver result
    pickles, matching scipy on the same data."""
    from scipy import stats as ss

    from cross_patient_speech_decoding_tpu.cli.experiments import run_analyze
    from cross_patient_speech_decoding_tpu.data.loaders import (
        append_results_pkl,
    )
    from cross_patient_speech_decoding_tpu.utils.config import AnalyzeConfig

    rng = np.random.default_rng(0)
    paths = {}
    means = {"patient": 0.35, "unaligned": 0.3, "aligned": 0.55}
    for name, mu in means.items():
        p = tmp_path / f"{name}.pkl"
        for _ in range(8):  # 8 iterations x 4 folds
            append_results_pkl(p, rng.normal(mu, 0.04, 4), params={"x": name})
        paths[name] = str(p)

    cfg = AnalyzeConfig(
        inputs=",".join(f"{k}={v}" for k, v in paths.items())
    )
    res = run_analyze(cfg, verbose=False)
    assert res["anova"] is not None and res["anova"].anova_p < 0.05
    by_pair = {(r.a, r.b): r for r in res["pairwise"]}
    a = res["groups"]["patient"]
    b = res["groups"]["aligned"]
    ref = ss.wilcoxon(a, b)
    assert by_pair[("patient", "aligned")].pvalue == pytest.approx(ref.pvalue)
    assert by_pair[("patient", "aligned")].significant


def test_svm_decode_persists_predictions(tmp_path):
    """y_true/y_pred/wrong_trs persist per iteration (the reference's
    out_data keys, aligned_decode_svm_ncv.py:440-456) and are internally
    consistent with the stored per-fold balanced accuracies."""
    from cross_patient_speech_decoding_tpu.data.loaders import load_pkl

    out = tmp_path / "p.pkl"
    accs = run_svm_decode(
        SVMDecodeConfig(n_iter=2, n_folds=3, fold_batch=3, max_k=12,
                        out=str(out)),
        verbose=False,
    )
    store = load_pkl(out)
    assert len(store["extra"]) == 2
    rec = store["extra"][0]
    y_true, y_pred, wrong = rec["y_true"], rec["y_pred"], rec["wrong_trs"]
    # every target trial appears exactly once across the 3 test folds
    assert len(y_true) == len(y_pred)
    assert sorted(wrong.tolist()) == sorted(set(wrong.tolist()))
    # wrong_trs point at genuinely mispredicted trials
    assert (y_true != y_pred).sum() == len(wrong)
    # pooled-prediction accuracy is in the ballpark of the fold-mean accs
    pooled_acc = float((y_true == y_pred).mean())
    assert abs(pooled_acc - float(accs[0].mean())) < 0.35


def test_svm_decode_pool_train_false_and_subset(tmp_path):
    """-po/-pp analogs: single-patient mode and cross-patient subsets run
    and produce finite accuracies; unknown subset names raise."""
    base = dict(n_iter=1, n_folds=2, fold_batch=2, max_k=10, seed=3)
    single = run_svm_decode(
        SVMDecodeConfig(out=str(tmp_path / "sp.pkl"), pool_train=False,
                        **base),
        verbose=False,
    )
    assert np.isfinite(single).all()
    subset = run_svm_decode(
        SVMDecodeConfig(out=str(tmp_path / "ss.pkl"),
                        pooled_pts="synthetic2", **base),
        verbose=False,
    )
    assert np.isfinite(subset).all()
    with pytest.raises(ValueError, match="pooled_pts"):
        run_svm_decode(
            SVMDecodeConfig(out=str(tmp_path / "bad.pkl"),
                            pooled_pts="nope", **base),
            verbose=False,
        )


def test_svm_decode_trial_subsample_fraction(tmp_path):
    """-tss analog: stratified target-train subsampling runs end to end
    (and the mask helper honors fraction + stratification)."""
    from cross_patient_speech_decoding_tpu.data.splits import (
        stratified_kfold_masks,
        stratified_train_subsample_masks,
    )

    rng = np.random.default_rng(0)
    y = np.repeat(np.arange(5), 12)
    tr, te = stratified_kfold_masks(y, 3, rng)
    sub = stratified_train_subsample_masks(tr, y, 0.5, rng)
    for f in range(3):
        assert set(np.where(sub[f] > 0)[0]) <= set(np.where(tr[f] > 0)[0])
        # floor(0.5 * n_train) rows kept (up to the >=1-per-class clamp)
        n_tr = int(tr[f].sum())
        assert abs(int(sub[f].sum()) - n_tr // 2) <= 5
        for c in range(5):  # every class survives
            assert (y[sub[f] > 0] == c).sum() >= 1

    accs = run_svm_decode(
        SVMDecodeConfig(n_iter=1, n_folds=2, fold_batch=2, max_k=10,
                        trial_subsample=0.6, out=str(tmp_path / "t.pkl")),
        verbose=False,
    )
    assert np.isfinite(accs).all()


def test_svm_decode_nested_persists_predictions(tmp_path):
    from cross_patient_speech_decoding_tpu.data.loaders import load_pkl

    out = tmp_path / "np.pkl"
    run_svm_decode(
        SVMDecodeConfig(n_iter=1, n_folds=2, max_k=10, nested=True,
                        nested_rounds=1, nested_points=2, nested_inner=2,
                        trial_subsample=0.8, out=str(out)),
        verbose=False,
    )
    rec = load_pkl(out)["extra"][0]
    assert {"y_true", "y_pred", "wrong_trs", "n_comp", "lam"} <= set(rec)
    assert (rec["y_true"] != rec["y_pred"]).sum() == len(rec["wrong_trs"])


def test_subsample_sweeps_pool_flags_and_nested():
    """-po/-pp/-cv analogs on the sweep drivers: single-patient grid
    sweep, named-subset spatial sweep, and a nested trial sweep point all
    run; trial sweep without a pool raises."""
    from cross_patient_speech_decoding_tpu.cli.subsample_experiments import (
        run_grid_subsample,
        run_pitch_subsample,
    )

    base = dict(n_iter=1, n_folds=2, max_k=10, trials_per_class=8)
    res = run_grid_subsample(
        SubsampleConfig(pool_train=False, win_sizes=(4,), **base),
        verbose=False,
    )
    assert all(np.isfinite(v).all() for v in res.values())
    res = run_spatial_avg(
        SubsampleConfig(pooled_pts="synthetic1", contact_sizes=(2,), **base),
        verbose=False,
    )
    assert all(np.isfinite(v).all() for v in res.values())
    res = run_pitch_subsample(
        SubsampleConfig(nested=True, nested_rounds=1, nested_points=2,
                        nested_inner=2, pitches=(2.0,), **base),
        verbose=False,
    )
    assert all(np.isfinite(v).all() for v in res.values())
    with pytest.raises(ValueError, match="pool_train"):
        run_trial_subsample(
            SubsampleConfig(pool_train=False, **base), verbose=False
        )


def test_ctc_augmentations_and_minibatch():
    """training.augmentations + batch_size YAML knobs: each named
    transform appends one augmented copy of the pooled train set
    (realtime_datamodule.py:239-244), and minibatched training runs."""
    import jax
    import jax.numpy as jnp

    from cross_patient_speech_decoding_tpu.cli.experiments import (
        _apply_ctc_augmentations,
        _parse_augmentations,
    )

    assert _parse_augmentations("") == ()
    assert len(_parse_augmentations("all")) == 5
    with pytest.raises(ValueError, match="unknown augmentations"):
        _parse_augmentations("bogus")

    x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 20, 4)),
                    jnp.float32)
    y = jnp.arange(6, dtype=jnp.int32)[:, None].repeat(3, 1)
    il = jnp.full((6,), 20, jnp.int32)
    ll = jnp.full((6,), 3, jnp.int32)
    xa, ya, ila, lla = _apply_ctc_augmentations(
        (x, y, il, ll), _parse_augmentations("noise_jitter,scaling"),
        jax.random.key(0),
    )
    assert xa.shape == (18, 20, 4) and ya.shape == (18, 3)
    np.testing.assert_array_equal(np.asarray(ya), np.tile(np.asarray(y), (3, 1)))
    # augmented copies differ from the originals
    assert not np.allclose(np.asarray(xa[6:12]), np.asarray(x))

    pers = run_train_ctc(
        TrainCTCConfig(context="patient", n_iter=1, epochs=4, hidden=8,
                       n_layers=1, batch_size=32, augmentations="all",
                       out=""),
        verbose=False,
    )
    assert np.isfinite(pers).all()

def test_seq2seq_augmentations_both_paths(tmp_path):
    """training.augmentations in the seq2seq driver: augmented copies of
    the pooled ALIGNED train rows per fold (datamodules.py:491-494), in
    both the fold-parallel vmapped program and the sequential loop.
    Augmented copies of TEST rows must land in neither train nor eval."""
    base = dict(n_iter=1, n_folds=2, epochs=3, hidden=12, n_filters=8,
                augmentations="noise_jitter,scaling")
    accs_fp = run_train_seq2seq(
        TrainSeq2SeqConfig(out=str(tmp_path / "fp.csv"), **base),
        verbose=False,
    )
    assert accs_fp.shape == (2,) and np.isfinite(accs_fp).all()
    accs_seq = run_train_seq2seq(
        TrainSeq2SeqConfig(out=str(tmp_path / "sq.csv"),
                           fold_parallel=False, **base),
        verbose=False,
    )
    assert accs_seq.shape == (2,) and np.isfinite(accs_seq).all()


def test_pooled_fold_arrays_per_fold_and_test_mask_exclusion():
    """4-D per-fold feature stacks concat on the trial axis; an explicit
    test_masks excludes augmented test-row copies from BOTH sets."""
    import jax.numpy as jnp

    from cross_patient_speech_decoding_tpu.train.fold_parallel import (
        pooled_fold_arrays,
    )

    F, N0, T, K = 2, 4, 5, 3
    tar = jnp.zeros((F, 2 * N0, T, K))      # originals + 1 augmented copy
    cross = [jnp.ones((F, 6, T, K))]
    tar_y = jnp.zeros((2 * N0, 3), jnp.int32)
    cross_y = [jnp.ones((6, 3), jnp.int32)]
    tr = np.tile(np.asarray([[1, 1, 0, 0], [0, 0, 1, 1]], np.float32),
                 (1, 2))                     # augmented train copies train
    te_orig = 1.0 - tr[:, :N0]
    te = np.concatenate([te_orig, np.zeros((F, N0), np.float32)], axis=1)
    X, y, w, te_out = pooled_fold_arrays(tar, tar_y, cross, cross_y, tr,
                                         test_masks=te)
    assert X.shape == (F, 2 * N0 + 6, T, K)
    assert y.shape == (2 * N0 + 6, 3)
    assert w.shape == te_out.shape == (F, 2 * N0 + 6)
    # augmented copies of test rows: weight 0 AND eval-mask 0
    aug_test = (tr[:, N0:] == 0)
    assert np.all(np.asarray(w)[:, N0:2 * N0][aug_test] == 0)
    assert np.all(np.asarray(te_out)[:, N0:2 * N0][aug_test] == 0)
    # cross rows always train, never eval
    assert np.all(np.asarray(w)[:, 2 * N0:] == 1)
    assert np.all(np.asarray(te_out)[:, 2 * N0:] == 0)


def test_chance_mode_random_and_labels_util(tmp_path):
    """chance_mode='random' draws fresh uniform sequences (the tune
    scripts' make_chance_labels null) instead of permuting."""
    from cross_patient_speech_decoding_tpu.utils.labels import (
        make_chance_labels,
    )

    rng = np.random.default_rng(0)
    labs = make_chance_labels(rng, 50, 7, n_sil=2)
    assert labs.shape == (50, 7)
    assert (labs[:, :2] == 10).all() and (labs[:, -2:] == 10).all()
    inner = labs[:, 2:-2]
    assert inner.min() >= 1 and inner.max() <= 9

    cfg = TrainCTCConfig(context="chance", chance_mode="random", n_iter=1,
                         epochs=2, hidden=8, n_layers=1, out="")
    pers = run_train_ctc(cfg, verbose=False)
    assert np.isfinite(pers).all()

    import pytest

    with pytest.raises(ValueError):
        run_train_ctc(
            TrainCTCConfig(context="chance", chance_mode="bogus", n_iter=1,
                           epochs=2, hidden=8, n_layers=1, out=""),
            verbose=False,
        )


def test_ctc_save_logits(tmp_path):
    """save_logits persists per-iteration test log-probs in the results
    pkl (the reference results-h5 'logits' dataset)."""
    import pickle

    out = tmp_path / "ctc.pkl"
    cfg = TrainCTCConfig(context="patient", n_iter=1, epochs=2, hidden=8,
                         n_layers=1, out=str(out), save_logits=True,
                         log_metrics=False)
    run_train_ctc(cfg, verbose=False)
    res = pickle.load(open(out, "rb"))
    lg = res["extra"][0]["logits"]
    assert lg.ndim == 3 and lg.shape[-1] == 11  # (n_test, n_win, classes)
    # log-softmax rows normalize
    np.testing.assert_allclose(np.exp(lg).sum(-1), 1.0, atol=1e-4)


def test_trial_subsample_invariant_to_iter_batch(tmp_path):
    """-tss masks are seeded per ITERATION, so results are identical
    across iter_batch settings (and thus across resume boundaries)."""
    base = dict(n_iter=2, n_folds=2, fold_batch=0, max_k=10,
                trial_subsample=0.6, seed=5)
    a1 = run_svm_decode(
        SVMDecodeConfig(out=str(tmp_path / "a.pkl"), iter_batch=1, **base),
        verbose=False,
    )
    a2 = run_svm_decode(
        SVMDecodeConfig(out=str(tmp_path / "b.pkl"), iter_batch=2, **base),
        verbose=False,
    )
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)


def test_realtime_out_requires_samples(tmp_path):
    """out= without per_step_samples>0 raises instead of writing a pkl
    the latency analyses cannot consume."""
    import pytest

    with pytest.raises(ValueError):
        run_realtime_sim(
            RealtimeSimConfig(n_channels=8, n_bins=20, hidden=16,
                              n_layers=1, per_step_samples=0,
                              out=str(tmp_path / "lat.pkl")),
            verbose=False,
        )


def test_prep_ctc_pooled_mask_restricts_fits():
    """Synthetic pooled contexts fit target PCA/CCA on the train mask
    only: a different mask must change the pooled features (pre-fix the
    mask was ignored and the full-data fit leaked held-out rows)."""
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        _prep_ctc_context,
    )

    cfg = TrainCTCConfig(context="aligned", n_iter=1)
    rng = np.random.default_rng(0)
    n = len(_prep_ctc_context(cfg, rng)[0][0][1])
    mask = np.ones(n, np.float32)
    mask[: n // 3] = 0.0

    full, _, _ = _prep_ctc_context(cfg, rng)
    masked, _, _ = _prep_ctc_context(cfg, rng, tar_train_mask=mask)
    assert all(np.isfinite(np.asarray(d[0])).all() for d in masked)
    # the target latent projection must differ when a third of the rows
    # are excluded from the PCA fit
    assert not np.allclose(
        np.asarray(full[0][0]), np.asarray(masked[0][0]), atol=1e-6
    )


def test_positional_encoding_odd_d_model():
    from cross_patient_speech_decoding_tpu.models.layers import (
        PositionalEncoding,
    )

    import jax.numpy as jnp

    x = jnp.zeros((2, 5, 7))
    out = PositionalEncoding(7, max_len=16).apply({}, x)
    assert out.shape == (2, 5, 7)
    assert np.isfinite(np.asarray(out)).all()


def test_tune_to_train_hparam_handoff(tmp_path):
    """cpsd tune-ctc hparam_out=... writes the reference's tuned-hparams
    h5; cpsd train-ctc hparam_dir=... overlays it (the tune -> train
    handoff, train_ctc_rnn.py:375-423)."""
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        _apply_tuned_hparams,
        run_tune_ctc,
    )
    from cross_patient_speech_decoding_tpu.utils.config import TuneCTCConfig

    hp_dir = tmp_path / "hp"
    results = run_tune_ctc(
        TuneCTCConfig(n_trials=2, rungs="2", hparam_out=str(hp_dir),
                      manifest=str(tmp_path / "m.jsonl")),
        verbose=False,
    )
    best = results[0]["config"]
    f = hp_dir / "S14" / "S14_ctcRNN_ptSpecific_hp.h5"
    assert f.exists()

    cfg = _apply_tuned_hparams(
        TrainCTCConfig(context="patient", hparam_dir=str(hp_dir))
    )
    assert cfg.lr == pytest.approx(best["lr"])
    assert cfg.weight_decay == pytest.approx(best["weight_decay"])
    assert cfg.hidden == best["hidden"]
    assert cfg.n_layers == best["n_layers"]


def test_ctc_results_h5_round_trip_and_analyze(tmp_path):
    """train-ctc results_h5= writes the reference's results layout
    (train_ctc_rnn.py:448-491); load_ctc_results_h5 reads it back and
    run_analyze consumes .h5 inputs directly — migrating users compare
    their existing reference result files against new runs."""
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        run_analyze,
        run_train_ctc,
    )
    from cross_patient_speech_decoding_tpu.data.loaders import (
        load_ctc_results_h5,
    )
    from cross_patient_speech_decoding_tpu.utils.config import AnalyzeConfig

    h5 = tmp_path / "r" / "pt_ctcRNN_ptSpecific.h5"
    pers = run_train_ctc(
        TrainCTCConfig(context="patient", n_iter=3, epochs=2,
                       out=str(tmp_path / "ctc.pkl"), save_logits=True,
                       results_h5=str(h5), log_metrics=False),
        verbose=False,
    )
    store = load_ctc_results_h5(h5)
    np.testing.assert_allclose(store["phoneme_error_rate"], pers)
    assert store["phon_dict"][10] == "sil" and store["phon_dict"][0] == "blank"
    assert store["logits"].shape[0] == 3  # per-iteration test log-probs
    assert store["model_hparams"]["hidden_size"] == 128

    # analyze: reference h5 vs our pkl in one comparison
    res = run_analyze(
        AnalyzeConfig(
            inputs=f"ref={h5},ours={tmp_path / 'ctc.pkl'}",
            test="permutation",
        ),
        verbose=False,
    )
    assert len(res["pairwise"]) == 1
    # identical distributions -> no significant difference
    assert res["pairwise"][0].pvalue > 0.5


def test_output_fields_resume_instead_of_retraining(tmp_path):
    """Pure-output fields (results_h5/log_metrics/trace) are NOT run
    identity: adding results_h5= to export a finished run must resume it,
    not set the pkl aside and retrain from iteration 0 — and the exported
    logits stay in lockstep with the reported iterations even when the
    pkl holds more entries than n_iter."""
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        _same_run_config,
        run_train_ctc,
    )
    from cross_patient_speech_decoding_tpu.data.loaders import (
        load_ctc_results_h5,
        load_pkl,
    )

    pkl = tmp_path / "ctc.pkl"
    base = dict(context="patient", n_iter=3, epochs=2, out=str(pkl),
                save_logits=True, log_metrics=False)
    pers = run_train_ctc(TrainCTCConfig(**base), verbose=False)

    # same run, results_h5 added, SMALLER n_iter: resumes (no .stale
    # set-aside, no new pkl entries) and exports exactly n_iter logits
    h5 = tmp_path / "export.h5"
    pers2 = run_train_ctc(
        TrainCTCConfig(**{**base, "n_iter": 2, "results_h5": str(h5)}),
        verbose=False,
    )
    assert not (tmp_path / "ctc.pkl.stale").exists()
    np.testing.assert_allclose(pers2, pers[:2])
    assert len(load_pkl(pkl)["accs"]) == 3  # nothing retrained/appended
    store = load_ctc_results_h5(h5)
    assert store["phoneme_error_rate"].shape == (2,)
    assert store["logits"].shape[0] == 2  # sliced to the reported iters

    # the skip set, directly
    a = vars(TrainCTCConfig(**base))
    b = vars(TrainCTCConfig(**{**base, "n_iter": 1, "results_h5": "x.h5",
                               "log_metrics": True, "trace": True}))
    assert _same_run_config(a, b)
    assert not _same_run_config(a, vars(TrainCTCConfig(
        **{**base, "context": "chance"})))


def test_offline_pca_components_spec():
    """make-xforms honors the framework-wide n_components spec: fraction
    in (0,1), whole count > 1 (n_components=30 arrives as 30.0 on the
    float config field), and 1.0 rejected — not silently full-rank."""
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        _offline_pca_components,
    )

    rng = np.random.default_rng(0)
    X = rng.normal(size=(20, 15, 9)).astype(np.float32)

    W, lat = _offline_pca_components(X, 4.0)
    assert W.shape == (4, 9) and lat.shape == (20, 15, 4)
    # count capped at rank/width rather than erroring
    W_all, _ = _offline_pca_components(X, 99.0)
    assert W_all.shape == (9, 9)
    W_frac, lat_frac = _offline_pca_components(X, 0.5)
    assert 1 <= W_frac.shape[0] < 9 and lat_frac.shape[-1] == W_frac.shape[0]
    with pytest.raises(ValueError):
        _offline_pca_components(X, 1.0)
    with pytest.raises(ValueError):
        _offline_pca_components(X, 2.5)


def test_seq2seq_synth_scale_knobs():
    """train-seq2seq synth_patients/synth_T/synth_trials size the
    synthetic dataset (reference scale: 8 patients, T=200) while the
    3-patient defaults keep their historical shapes."""
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        _seq2seq_arrays,
    )

    Xs, ys = _seq2seq_arrays(TrainSeq2SeqConfig())
    assert len(Xs) == 3 and Xs[0].shape == (108, 60, 64)

    Xs, ys = _seq2seq_arrays(TrainSeq2SeqConfig(
        synth_patients=5, synth_T=30, synth_trials=2))
    assert len(Xs) == 5
    assert Xs[0].shape == (18, 30, 64) and Xs[4].shape[-1] == 111
    assert all(len(y) == 18 for y in ys)


def test_ctc_synth_scale_knobs():
    """train-ctc/tune-ctc synth_patients/synth_trials/synth_T size the
    synthetic CTC dataset; the count helper matches without generating."""
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        _synthetic_ctc_cfg,
        _synthetic_ctc_n_trials,
    )

    cfg = TrainCTCConfig(synth_patients=4, synth_trials=54, synth_T=50)
    pts = _synthetic_ctc_cfg(cfg)
    assert len(pts) == 4
    X, y, il, ll = pts[0]
    assert X.shape == (54, 50, 64) and len(y) == 54
    assert _synthetic_ctc_n_trials(cfg) == 54
    # defaults keep the historical shapes (compile-cache stability)
    d = _synthetic_ctc_cfg(TrainCTCConfig())
    assert len(d) == 3 and d[0][0].shape == (108, 200, 64)
    assert _synthetic_ctc_n_trials(TrainCTCConfig()) == 108


def test_tune_ctc_pooled_honors_synth_knobs(tmp_path):
    """The pooled tune-ctc path must size its prep dataset by the tune
    config's synth_* knobs — a mask built from _synthetic_ctc_n_trials
    against a default-sized dataset crashes inside the jitted PCA fit
    (regression: prep_cfg dropped the knobs)."""
    from cross_patient_speech_decoding_tpu.cli.experiments import run_tune_ctc

    cfg = TuneCTCConfig(
        align_train=True, n_trials=1, rungs="2",
        synth_patients=2, synth_trials=54, synth_T=40,
        manifest=str(tmp_path / "m.jsonl"),
    )
    res = run_tune_ctc(cfg, verbose=False)
    assert len(res) == 1 and np.isfinite(res[0]["metric"])


def test_tune_ctc_cv_folds_patient(tmp_path):
    """cv_folds>0 routes through the reference CV trainable
    (fold-mean val PER); results still rank/persist normally."""
    cfg = TuneCTCConfig(
        n_trials=2, rungs="2", cv_folds=2,
        synth_patients=1, synth_trials=24, synth_T=24,
        manifest=str(tmp_path / "m.jsonl"),
    )
    res = run_tune_ctc(cfg, verbose=False)
    assert len(res) == 2
    assert all(np.isfinite(r["metric"]) for r in res)
    assert (tmp_path / "m.jsonl").exists()


def test_tune_ctc_cv_folds_aligned(tmp_path):
    """align_train + cv_folds: per-fold leak-free PCA+CCA feature stacks
    (the tune_ctc_rnn_align CV datamodule semantics)."""
    cfg = TuneCTCConfig(
        n_trials=2, rungs="2", cv_folds=2, align_train=True,
        synth_patients=2, synth_trials=20, synth_T=24,
        manifest=str(tmp_path / "m.jsonl"),
    )
    res = run_tune_ctc(cfg, verbose=False)
    assert len(res) == 2
    assert all(np.isfinite(r["metric"]) for r in res)
