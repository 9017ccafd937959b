"""Hardening tests: StageTimer, beam fallback path, augment hook in folds."""

import numpy as np
import jax
import jax.numpy as jnp


def test_stage_timer_accumulates():
    import time

    from cross_patient_speech_decoding_tpu.utils.profiling import StageTimer

    st = StageTimer()
    for _ in range(3):
        with st.stage("sleepy"):
            time.sleep(0.01)
    assert st.counts["sleepy"] == 3
    assert st.totals["sleepy"] >= 0.03
    assert "sleepy" in st.report()


def test_beam_python_fallback(monkeypatch):
    """With the native lib unavailable, the wrapper must fall back to the
    Python implementations and produce identical results."""
    import cross_patient_speech_decoding_tpu.realtime.beam as beam

    if not beam.native_available():
        import pytest

        pytest.skip(
            "native beam library unavailable: both sides would take the "
            "Python fallback and the parity check would be vacuous"
        )
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(10, 5)) * 2
    lp = (logits - np.log(np.exp(logits).sum(1, keepdims=True))).astype(
        np.float32
    )

    native_res = beam.prefix_beam_search(lp, beam_size=20)

    monkeypatch.setattr(beam, "_LIB", None)
    monkeypatch.setattr(beam, "_TRIED", True)  # force fallback
    py_res = beam.prefix_beam_search(lp, beam_size=20)
    assert py_res[0] == native_res[0]
    np.testing.assert_allclose(py_res[1], native_res[1], rtol=1e-4)

    preds = rng.integers(0, 4, (4, 6)).astype(np.int32)
    targets = rng.integers(0, 4, (4, 5)).astype(np.int32)
    pl_ = np.full(4, 6, np.int32)
    tl = np.full(4, 5, np.int32)
    d_py = beam.edit_distance_batch(preds, pl_, targets, tl)
    monkeypatch.setattr(beam, "_TRIED", False)
    monkeypatch.setattr(beam, "_LIB", None)
    d_nat = beam.edit_distance_batch(preds, pl_, targets, tl)
    np.testing.assert_array_equal(d_py, d_nat)


def test_simple_folds_augment_hook():
    from cross_patient_speech_decoding_tpu.data.datamodules import simple_folds
    from cross_patient_speech_decoding_tpu.ops.augment import noise_jitter

    rng = np.random.default_rng(1)
    X = rng.normal(size=(40, 8, 3)).astype(np.float32)
    y = np.repeat(np.arange(4), 10)

    def aug(key, X_tr, y_tr):
        return noise_jitter(key, X_tr, 0.1), y_tr

    folds = simple_folds(X, y, n_folds=4, val_frac=0.1, seed=0, augment=aug)
    f0 = folds[0]
    n_tr_plain = 40 - len(f0.val[1]) - len(f0.test[1])
    assert len(f0.train[1]) == 2 * n_tr_plain  # original + augmented
