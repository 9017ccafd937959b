"""Parity tests for the analysis/statistics layer (reference L6).

Oracles: scipy.stats for every hypothesis test, sklearn.metrics for the
clustering scores (the exact functions the reference notebooks call —
fig_2/fig_4/fig_5/fig_6), plus independent-path oracles where the
reference used statsmodels (not installed here): RM-ANOVA is checked
against a dummy-regression projection oracle and the F == t^2 identity.
"""

import numpy as np
import pytest
from scipy import stats as ss

from cross_patient_speech_decoding_tpu import analysis as an


rng = np.random.default_rng(42)


@pytest.fixture(autouse=True)
def _fresh_rng():
    # reset the module rng before EVERY test so each test's draws are
    # independent of execution order (a -k reproduction sees the same
    # data as the full-module run)
    global rng
    rng = np.random.default_rng(42)


# ---------------------------------------------------------------------------
# hypothesis tests vs scipy
# ---------------------------------------------------------------------------


class TestWilcoxon:
    def test_exact_small_n(self):
        for seed in range(4):
            r = np.random.default_rng(seed)
            x = r.normal(size=8)
            y = x + r.normal(0.4, 1.0, 8)
            mine = an.wilcoxon_signed_rank(x, y)
            ref = ss.wilcoxon(x, y)
            assert mine.statistic == pytest.approx(ref.statistic)
            assert mine.pvalue == pytest.approx(ref.pvalue)

    def test_approx_large_n_with_ties(self):
        x = rng.integers(0, 6, 80).astype(float)
        y = rng.integers(0, 6, 80).astype(float)
        keep = x != y
        x, y = x[keep], y[keep]
        mine = an.wilcoxon_signed_rank(x, y)
        ref = ss.wilcoxon(x, y)
        assert mine.statistic == pytest.approx(ref.statistic)
        assert mine.pvalue == pytest.approx(ref.pvalue, rel=1e-6)

    def test_one_sided(self):
        x = rng.normal(size=14)
        y = x + 0.6 + rng.normal(0, 0.5, 14)
        for alt in ("greater", "less"):
            mine = an.wilcoxon_signed_rank(x, y, alternative=alt)
            ref = ss.wilcoxon(x, y, alternative=alt)
            assert mine.pvalue == pytest.approx(ref.pvalue)

    def test_batched(self):
        x = rng.normal(size=(3, 2, 20))
        y = x + rng.normal(0.3, 1.0, (3, 2, 20))
        mine = an.wilcoxon_signed_rank(x, y)
        assert mine.pvalue.shape == (3, 2)
        for i in range(3):
            for j in range(2):
                ref = ss.wilcoxon(x[i, j], y[i, j])
                assert mine.pvalue[i, j] == pytest.approx(ref.pvalue)


class TestMannWhitney:
    def test_exact(self):
        x = rng.normal(size=7)
        y = rng.normal(0.8, 1.0, 8)
        mine = an.mann_whitney_u(x, y)
        ref = ss.mannwhitneyu(x, y)
        assert mine.statistic == pytest.approx(ref.statistic)
        assert mine.pvalue == pytest.approx(ref.pvalue)

    def test_approx_ties(self):
        x = rng.integers(0, 8, 50).astype(float)
        y = rng.integers(1, 9, 45).astype(float)
        mine = an.mann_whitney_u(x, y)
        ref = ss.mannwhitneyu(x, y)
        assert mine.statistic == pytest.approx(ref.statistic)
        assert mine.pvalue == pytest.approx(ref.pvalue, rel=1e-6)

    def test_one_sided_exact(self):
        x = rng.normal(size=6)
        y = rng.normal(1.0, 1.0, 5)
        for alt in ("greater", "less"):
            mine = an.mann_whitney_u(x, y, alternative=alt)
            ref = ss.mannwhitneyu(x, y, alternative=alt)
            assert mine.pvalue == pytest.approx(ref.pvalue)


class TestParametric:
    def test_ttest_rel(self):
        a = rng.normal(size=(4, 15))
        b = a + rng.normal(0.2, 1.0, (4, 15))
        mine = an.ttest_rel(a, b)
        for i in range(4):
            ref = ss.ttest_rel(a[i], b[i])
            assert mine.statistic[i] == pytest.approx(ref.statistic)
            assert mine.pvalue[i] == pytest.approx(ref.pvalue)

    def test_ttest_ind(self):
        a = rng.normal(size=12)
        b = rng.normal(0.5, 1.0, 17)
        mine = an.ttest_ind(a, b)
        ref = ss.ttest_ind(a, b)
        assert mine.statistic == pytest.approx(ref.statistic)
        assert mine.pvalue == pytest.approx(ref.pvalue)

    def test_f_oneway(self):
        groups = [rng.normal(0.3 * i, 1.0, 10 + 2 * i) for i in range(4)]
        mine = an.f_oneway(*groups)
        ref = ss.f_oneway(*groups)
        assert mine.statistic == pytest.approx(ref.statistic)
        assert mine.pvalue == pytest.approx(ref.pvalue)

    def test_anova_rm_equals_t_squared_when_k2(self):
        data = rng.normal(size=(9, 2))
        rm = an.anova_rm(data)
        t = an.ttest_rel(data[:, 0], data[:, 1])
        assert rm.statistic == pytest.approx(t.statistic**2)
        assert rm.pvalue == pytest.approx(t.pvalue)

    def test_anova_rm_vs_projection_oracle(self):
        # independent oracle: dummy regression; F from the residual-SS drop
        # when condition dummies are removed from subject+condition model
        n, k = 8, 3
        data = rng.normal(size=(n, k)) + np.linspace(0, 1, k)
        y = data.ravel()
        subj = np.repeat(np.arange(n), k)
        cond = np.tile(np.arange(k), n)
        D_subj = np.eye(n)[subj]
        D_cond = np.eye(k)[cond]
        X_full = np.hstack([D_subj, D_cond[:, 1:]])
        X_red = D_subj
        rss = lambda X: np.sum(
            (y - X @ np.linalg.lstsq(X, y, rcond=None)[0]) ** 2
        )
        df_c, df_e = k - 1, (n - 1) * (k - 1)
        f_oracle = ((rss(X_red) - rss(X_full)) / df_c) / (rss(X_full) / df_e)
        mine = an.anova_rm(data)
        assert mine.statistic == pytest.approx(f_oracle, rel=1e-8)

    def test_tukey_hsd(self):
        groups = [rng.normal(0.4 * i, 1.0, 10 + i) for i in range(3)]
        mine = an.tukey_hsd(*groups)
        ref = ss.tukey_hsd(*groups)
        np.testing.assert_allclose(mine.statistic, ref.statistic, atol=1e-12)
        np.testing.assert_allclose(mine.pvalue, ref.pvalue, atol=2e-4)


class TestFdrAndPermutation:
    def test_fdr_bh_matches_scipy(self):
        p = rng.uniform(size=15)
        _, adj = an.fdr_bh(p)
        np.testing.assert_allclose(adj, ss.false_discovery_control(p))

    def test_fdr_batched(self):
        p = rng.uniform(size=(4, 6))
        _, adj = an.fdr_bh(p, axis=-1)
        for i in range(4):
            np.testing.assert_allclose(adj[i], ss.false_discovery_control(p[i]))

    def test_paired_permutation_exact(self):
        a = rng.normal(size=8)
        b = a + rng.normal(0.5, 1.0, 8)
        mine = an.paired_permutation_test(a, b)
        ref = ss.permutation_test(
            (a, b),
            lambda x, y, axis: np.mean(x, axis=axis) - np.mean(y, axis=axis),
            permutation_type="samples",
        )
        assert mine.statistic == pytest.approx(ref.statistic)
        assert mine.pvalue == pytest.approx(ref.pvalue)

    def test_paired_permutation_randomized_sane(self):
        a = rng.normal(size=40)
        b = a + 1.0
        res = an.paired_permutation_test(a, b, n_resamples=2000, seed=1)
        assert res.pvalue < 0.01  # strong effect detected


# ---------------------------------------------------------------------------
# clustering scores vs sklearn
# ---------------------------------------------------------------------------


def _blobs(n_per=30, k=3, d=5, spread=0.3, seed=0):
    r = np.random.default_rng(seed)
    centers = r.normal(size=(k, d)) * 3.0
    x = np.concatenate(
        [centers[i] + spread * r.normal(size=(n_per, d)) for i in range(k)]
    )
    labels = np.repeat(np.arange(k), n_per)
    return x.astype(np.float32), labels


class TestClusterScores:
    def test_silhouette_samples_vs_sklearn(self):
        from sklearn.metrics import silhouette_samples as sk_sil

        x, labels = _blobs(spread=1.0)
        mine = an.silhouette_samples(x, labels)
        ref = sk_sil(x.astype(np.float64), labels)
        np.testing.assert_allclose(mine, ref, atol=2e-4)

    def test_silhouette_positive_mean_is_reference_scorer(self):
        from sklearn.metrics import silhouette_samples as sk_sil

        x, labels = _blobs(spread=1.5, seed=3)
        sils = sk_sil(x.astype(np.float64), labels)
        expected = np.mean(sils[sils > 0])
        assert an.silhouette_positive_mean(x, labels) == pytest.approx(
            expected, abs=2e-4
        )

    def test_calinski_davies_vs_sklearn(self):
        from sklearn.metrics import calinski_harabasz_score, davies_bouldin_score

        x, labels = _blobs(spread=0.8, seed=5)
        assert an.calinski_harabasz(x, labels) == pytest.approx(
            calinski_harabasz_score(x, labels), rel=2e-4
        )
        assert an.davies_bouldin(x, labels) == pytest.approx(
            davies_bouldin_score(x, labels), rel=2e-4
        )

    def test_tsne_recovers_blobs(self):
        x, labels = _blobs(n_per=25, k=3, spread=0.2, seed=7)
        emb = an.tsne_embed(x, n_iter=300, seed=0)
        assert emb.shape == (75, 2)
        assert np.all(np.isfinite(emb))
        # well-separated blobs must stay separated in the embedding:
        # nearest neighbors keep their labels
        d2 = ((emb[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        nn = d2.argmin(1)
        assert (labels[nn] == labels).mean() > 0.9

    def test_pca_embed_shape_and_variance_order(self):
        x, _ = _blobs(seed=11)
        emb = an.pca_embed(x, 2)
        assert emb.shape == (x.shape[0], 2)
        v = emb.var(axis=0)
        assert v[0] >= v[1]


# ---------------------------------------------------------------------------
# RSA vs a direct pearson-loop oracle
# ---------------------------------------------------------------------------


class TestRSA:
    def test_rdm_matches_pearson_loop(self):
        x = rng.normal(size=(40, 10, 6))
        labels = rng.integers(0, 5, 40)
        rdm, uniq = an.rdm_correlation(x, labels)
        flat = x.reshape(40, -1)
        for i, li in enumerate(uniq):
            for j, lj in enumerate(uniq):
                a = flat[labels == li].mean(0)
                b = flat[labels == lj].mean(0)
                r, _ = ss.pearsonr(a, b)
                assert rdm[i, j] == pytest.approx(1 - r, abs=1e-10)

    def test_compare_rdms_shared_labels(self):
        x1 = rng.normal(size=(30, 8, 4))
        x2 = x1[:24] + 0.05 * rng.normal(size=(24, 8, 4))
        l1 = np.repeat(np.arange(6), 5)
        l2 = np.repeat(np.arange(6)[:4], 6)  # only labels 0-3 shared
        r1, u1 = an.rdm_correlation(x1, l1)
        r2, u2 = an.rdm_correlation(x2, l2)
        sim = an.compare_rdms(r1, u1, r2, u2)
        assert -1.0 <= sim <= 1.0
        # same data -> identical RDMs -> r == 1
        sim_self = an.compare_rdms(r1, u1, r1, u1)
        assert sim_self == pytest.approx(1.0)

    def test_subset_rdm_reorders(self):
        rdm = np.arange(16, dtype=float).reshape(4, 4)
        labels = np.array([10, 20, 30, 40])
        sub = an.subset_rdm(rdm, labels, np.array([30, 10]))
        assert sub[0, 0] == rdm[2, 2] and sub[0, 1] == rdm[2, 0]


# ---------------------------------------------------------------------------
# context tables (fig_4 / fig_5 flows)
# ---------------------------------------------------------------------------


class TestContextTables:
    def test_context_comparison_table_fig5_flow(self):
        r = np.random.default_rng(9)
        groups = {
            "chance": r.normal(90, 2, 8),
            "patient": r.normal(60, 5, 8),
            "unaligned": r.normal(70, 5, 8),
            "aligned": r.normal(40, 5, 8),
        }
        pairs = [
            ("chance", "patient"),
            ("patient", "unaligned"),
            ("patient", "aligned"),
            ("unaligned", "aligned"),
        ]
        rows = an.context_comparison_table(groups, pairs)
        pvals = [
            ss.wilcoxon(groups[a], groups[b]).pvalue for a, b in pairs
        ]
        p_fdr = ss.false_discovery_control(pvals)
        for row, p, pf in zip(rows, pvals, p_fdr):
            assert row.pvalue == pytest.approx(p)
            assert row.pvalue_fdr == pytest.approx(pf)
        assert rows[0].significant  # chance >> patient-specific

    def test_anova_tukey_by_group(self):
        r = np.random.default_rng(3)
        per_pt = {
            "S14": [r.normal(0.3, 0.05, 20), r.normal(0.2, 0.05, 20),
                    r.normal(0.5, 0.05, 20)],
            "S26": [r.normal(0.4, 0.05, 20), r.normal(0.25, 0.05, 20),
                    r.normal(0.55, 0.05, 20)],
        }
        rows = an.anova_tukey_by_group(per_pt)
        for row in rows:
            ref_f = ss.f_oneway(*per_pt[row.group])
            ref_t = ss.tukey_hsd(*per_pt[row.group])
            assert row.f_statistic == pytest.approx(ref_f.statistic)
            assert row.anova_p == pytest.approx(ref_f.pvalue)
            np.testing.assert_allclose(row.tukey_p, ref_t.pvalue, atol=2e-4)

    def test_rm_anova_followup(self):
        r = np.random.default_rng(5)
        table = 0.05 * r.normal(size=(8, 3)) + np.array([0.25, 0.2, 0.45])
        res = an.rm_anova_followup(table, ["ps", "unaligned", "aligned"])
        assert res.pvalue < 0.05
        pvals = [
            ss.ttest_rel(table[:, i], table[:, j]).pvalue
            for i in range(3)
            for j in range(i + 1, 3)
        ]
        p_fdr = ss.false_discovery_control(pvals)
        for row, p, pf in zip(res.followups, pvals, p_fdr):
            assert row.pvalue == pytest.approx(p)
            assert row.pvalue_fdr == pytest.approx(pf)


class TestDegenerateInputs:
    def test_wilcoxon_all_zero_diffs_is_nan(self):
        x = np.ones(10)
        res = an.wilcoxon_signed_rank(x, x)
        assert np.isnan(res.pvalue)

    def test_fdr_excludes_nans(self):
        p = np.array([0.01, np.nan, 0.04, 0.5])
        reject, adj = an.fdr_bh(p)
        assert np.isnan(adj[1]) and not reject[1]
        valid = np.array([0.01, 0.04, 0.5])
        ref = ss.false_discovery_control(valid)
        np.testing.assert_allclose(adj[[0, 2, 3]], ref)

    def test_context_table_with_degenerate_pair(self):
        groups = {
            "a": np.full(8, 1.0),
            "b": np.full(8, 1.0),  # identical to a -> NaN pair
            "c": np.linspace(0.1, 0.4, 8),
        }
        rows = an.context_comparison_table(groups)
        by = {(r.a, r.b): r for r in rows}
        assert np.isnan(by[("a", "b")].pvalue_fdr)
        assert np.isfinite(by[("a", "c")].pvalue_fdr)  # not poisoned


class TestLatency:
    """supp_fig_20/24 latency-analysis flows (analysis.latency)."""

    def test_latency_report_summary(self):
        from cross_patient_speech_decoding_tpu.analysis import latency_report

        rng = np.random.default_rng(0)
        s = rng.gamma(4.0, 5.0, size=500)  # ms-scale skewed latencies
        rep = latency_report(s, deadline_ms=40.0)
        assert rep["n"] == 500
        np.testing.assert_allclose(rep["p50_ms"], np.percentile(s, 50))
        np.testing.assert_allclose(rep["p90_ms"], np.percentile(s, 90))
        np.testing.assert_allclose(rep["p99_ms"], np.percentile(s, 99))
        np.testing.assert_allclose(rep["max_ms"], s.max())
        np.testing.assert_allclose(rep["violation_rate"], (s > 40.0).mean())

    def test_latency_report_small_n_has_no_p99(self):
        from cross_patient_speech_decoding_tpu.analysis import latency_report

        rep = latency_report(np.arange(1.0, 11.0))
        assert rep["p99_ms"] is None and rep["max_ms"] == 10.0

    def test_latency_comparison_scipy_oracle(self):
        import scipy.stats as ss

        from cross_patient_speech_decoding_tpu.analysis import (
            latency_comparison,
        )

        rng = np.random.default_rng(1)
        groups = {
            "small": rng.gamma(4.0, 1.0, 60),
            "large": rng.gamma(4.0, 2.0, 60),
            "same": rng.gamma(4.0, 1.0, 60),
        }
        rows = latency_comparison(groups, alpha=0.05)
        assert len(rows) == 3
        for r in rows:
            ref = ss.mannwhitneyu(groups[r.a], groups[r.b],
                                  alternative="two-sided")
            np.testing.assert_allclose(r.pvalue, ref.pvalue, rtol=1e-4)
        by_pair = {(r.a, r.b): r for r in rows}
        assert by_pair[("small", "large")].significant
        assert not by_pair[("small", "same")].significant

    def test_latency_comparison_needs_two(self):
        from cross_patient_speech_decoding_tpu.analysis import (
            latency_comparison,
        )

        with pytest.raises(ValueError):
            latency_comparison({"only": np.arange(5.0)})


def test_cohens_d_matches_definition():
    """Pooled-SD Cohen's d (fig_4 notebook ``cohend``)."""
    from cross_patient_speech_decoding_tpu.analysis.stats import cohens_d

    rng = np.random.default_rng(5)
    a = rng.normal(1.0, 1.0, 40)
    b = rng.normal(0.0, 2.0, 25)
    s = np.sqrt((39 * a.var(ddof=1) + 24 * b.var(ddof=1)) / 63)
    np.testing.assert_allclose(cohens_d(a, b), (a.mean() - b.mean()) / s)


def test_notebook_geometry_helpers():
    """canonical_channel_map / array_distance / cmat_acc_iter — the
    notebook-local helpers of fig_2/fig_3/supp_fig_19."""
    from cross_patient_speech_decoding_tpu.data.loaders import (
        canonical_channel_map,
    )
    from cross_patient_speech_decoding_tpu.data.subsample import (
        array_distance,
    )
    from cross_patient_speech_decoding_tpu.ops.metrics import cmat_acc_iter

    for pt, shape, n in (("S14", (16, 8), 128), ("S26", (16, 8), 128),
                         ("S33", (12, 24), 288), ("S39", (12, 24), 288),
                         ("S62", (12, 24), 288)):
        m = canonical_channel_map(pt)
        assert m.shape == shape
        assert sorted(m.ravel()) == list(range(1, n + 1))
    # S14 is plain column-major: first column is 1..16
    np.testing.assert_array_equal(canonical_channel_map("S14")[:, 0],
                                  np.arange(1, 17))

    a = np.array([[0.0, 0.0], [2.0, 0.0]])
    b = np.array([[5.0, 0.0], [9.0, 0.0]])
    assert array_distance(a, b, "mean") == 6.0
    assert array_distance(a, b, "min") == 3.0
    assert array_distance(a, b, "max") == 9.0
    with pytest.raises(ValueError):
        array_distance(a, b, "median")

    accs = cmat_acc_iter([[0, 1, 2], [0, 0, 0]], [[0, 1, 1], [0, 1, 2]])
    np.testing.assert_allclose(accs, [2 / 3, 1 / 3])


def test_prediction_records_from_results(tmp_path):
    """save_preds output round-trips into the cmat_wrap flow."""
    import numpy as np

    from cross_patient_speech_decoding_tpu.analysis import (
        cmat_accuracy_from_results,
        prediction_records_from_results,
    )
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        run_svm_decode,
    )
    from cross_patient_speech_decoding_tpu.utils.config import SVMDecodeConfig

    out = tmp_path / "r.pkl"
    run_svm_decode(
        SVMDecodeConfig(n_iter=2, n_folds=2, fold_batch=2, max_k=10,
                        out=str(out)),
        verbose=False,
    )
    y_true, y_pred, wrong = prediction_records_from_results(out)
    assert len(y_true) == 2
    accs = cmat_accuracy_from_results(out)
    manual = np.array([(t == p).mean() for t, p in zip(y_true, y_pred)])
    np.testing.assert_allclose(accs, manual, atol=1e-6)
