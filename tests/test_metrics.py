"""Metric parity: balanced accuracy vs sklearn, edit distance vs DP oracle."""

import jax.numpy as jnp
import numpy as np
from sklearn.metrics import balanced_accuracy_score

from cross_patient_speech_decoding_tpu.ops.metrics import (
    balanced_accuracy,
    cmat_acc,
    edit_distance,
    per_batch,
    pearson_r,
)


def _py_edit_distance(a, b):
    dp = np.arange(len(b) + 1, dtype=float)
    for i, x in enumerate(a):
        prev = dp.copy()
        dp[0] = i + 1
        for j, y in enumerate(b):
            dp[j + 1] = min(prev[j + 1] + 1, dp[j] + 1, prev[j] + (x != y))
    return dp[len(b)]


def test_balanced_accuracy_matches_sklearn():
    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 5, 200)
    y_pred = rng.integers(0, 5, 200)
    want = balanced_accuracy_score(y_true, y_pred)
    got = float(balanced_accuracy(jnp.asarray(y_true), jnp.asarray(y_pred), 5))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_balanced_accuracy_masked_and_missing_classes():
    rng = np.random.default_rng(1)
    y_true = rng.integers(0, 3, 100)  # classes 3,4 absent
    y_pred = rng.integers(0, 5, 100)
    mask = (rng.random(100) < 0.6).astype(float)
    sel = mask > 0
    want = balanced_accuracy_score(y_true[sel], y_pred[sel])
    got = float(
        balanced_accuracy(
            jnp.asarray(y_true), jnp.asarray(y_pred), 5, jnp.asarray(mask)
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_cmat_acc_is_plain_accuracy():
    rng = np.random.default_rng(2)
    y_true = rng.integers(0, 4, 50)
    y_pred = rng.integers(0, 4, 50)
    got = float(cmat_acc(jnp.asarray(y_true), jnp.asarray(y_pred), 4))
    np.testing.assert_allclose(got, np.mean(y_true == y_pred), atol=1e-6)


def test_edit_distance_matches_dp_oracle():
    rng = np.random.default_rng(3)
    for _ in range(20):
        la, lb = rng.integers(0, 7, 2)
        a = rng.integers(0, 4, 6)
        b = rng.integers(0, 4, 5)
        want = _py_edit_distance(a[:la].tolist(), b[:lb].tolist())
        got = float(
            edit_distance(
                jnp.asarray(a), jnp.asarray(la), jnp.asarray(b), jnp.asarray(lb)
            )
        )
        assert got == want, (a[:la], b[:lb], got, want)


def test_per_batch():
    preds = jnp.asarray([[1, 2, 3, 0], [1, 1, 0, 0]])
    pred_lens = jnp.asarray([3, 2])
    targets = jnp.asarray([[1, 2, 3], [2, 2, 2]])
    target_lens = jnp.asarray([3, 3])
    # first: 0 edits; second: [1,1] vs [2,2,2] = 3 edits? sub+sub+ins = 3
    got = float(per_batch(preds, pred_lens, targets, target_lens))
    np.testing.assert_allclose(got, (0 + 3) / 6 * 100.0)


def test_pearson_r():
    rng = np.random.default_rng(4)
    x, y = rng.normal(size=(2, 100))
    got = float(pearson_r(jnp.asarray(x), jnp.asarray(y)))
    want = np.corrcoef(x, y)[0, 1]
    np.testing.assert_allclose(got, want, atol=1e-6)
