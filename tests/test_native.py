"""Native C++ decode kernels vs the pure-Python oracles."""

import numpy as np
import pytest

from cross_patient_speech_decoding_tpu.ops.ctc import (
    prefix_beam_search as py_beam,
)
from cross_patient_speech_decoding_tpu.realtime import beam as native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.native_available():
        pytest.skip("native library unavailable and lazy build failed")
    return True


def _rand_logp(rng, T, V):
    logits = rng.normal(size=(T, V)) * 2.0
    lp = logits - np.log(np.exp(logits).sum(1, keepdims=True))
    return lp.astype(np.float32)


def test_native_beam_matches_python(lib_ok):
    rng = np.random.default_rng(0)
    for _ in range(10):
        lp = _rand_logp(rng, 15, 6)
        seq_c, nll_c = native.prefix_beam_search(lp, beam_size=30)
        seq_p, nll_p = py_beam(lp.astype(np.float64), beam_size=30)
        assert seq_c == seq_p, (seq_c, seq_p)
        np.testing.assert_allclose(nll_c, nll_p, rtol=1e-4)


def test_native_edit_distance_matches_python(lib_ok):
    rng = np.random.default_rng(1)
    B, P, L = 32, 10, 6
    preds = rng.integers(0, 5, (B, P)).astype(np.int32)
    targets = rng.integers(0, 5, (B, L)).astype(np.int32)
    pl = rng.integers(0, P + 1, B).astype(np.int32)
    tl = rng.integers(0, L + 1, B).astype(np.int32)
    got = native.edit_distance_batch(preds, pl, targets, tl)
    for b in range(B):
        want = native._py_edit(preds[b, : pl[b]], targets[b, : tl[b]])
        assert got[b] == want


def test_native_beam_is_fast(lib_ok):
    """The C++ beam should decode a realistic sequence quickly (the Python
    reference implementation takes seconds at beam=100)."""
    import time

    rng = np.random.default_rng(2)
    lp = _rand_logp(rng, 147, 11)  # CTC window count at T=600,w=14,s=4
    t0 = time.perf_counter()
    native.prefix_beam_search(lp, beam_size=100)
    dt = time.perf_counter() - t0
    assert dt < 2.0, dt
