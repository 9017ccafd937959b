"""ctypes binding for the native C++ decode kernels (native/beam.cpp).

Exposes CTC prefix beam search and batched edit distance with automatic
fallback to the pure-Python implementations in ops/ctc.py (which double as
the parity oracles in tests/test_native.py). The library is built once via
``native/build.sh``; if missing we attempt a lazy g++ build.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> pathlib.Path:
    return (
        pathlib.Path(__file__).resolve().parents[2]
        / "native"
        / "libcpsd_native.so"
    )


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not path.exists():
        build = path.parent / "build.sh"
        if build.exists():
            try:
                subprocess.run(["sh", str(build)], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
    if not path.exists():
        return None
    lib = ctypes.CDLL(str(path))
    lib.prefix_beam_search.restype = ctypes.c_int
    lib.prefix_beam_search.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
    ]
    lib.edit_distance_batch.restype = None
    lib.edit_distance_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def prefix_beam_search(log_probs: np.ndarray, beam_size: int = 100,
                       blank: int = 0):
    """CTC prefix beam search; native C++ when available, Python otherwise.

    Args:
        log_probs: (T, V) log probabilities.

    Returns:
        (sequence tuple, negative log likelihood).
    """
    lib = _load()
    if lib is None:
        from cross_patient_speech_decoding_tpu.ops.ctc import (
            prefix_beam_search as py_pbs,
        )

        return py_pbs(np.asarray(log_probs), beam_size, blank)

    lp = np.ascontiguousarray(log_probs, np.float32)
    T, V = lp.shape
    out = np.zeros(T, np.int32)
    nll = ctypes.c_double()
    n = lib.prefix_beam_search(
        lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), T, V,
        beam_size, blank,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(nll),
    )
    return tuple(int(s) for s in out[:n]), float(nll.value)


def edit_distance_batch(preds, pred_lens, targets, target_lens):
    """Batched Levenshtein distance; native C++ when available."""
    preds = np.ascontiguousarray(preds, np.int32)
    targets = np.ascontiguousarray(targets, np.int32)
    pred_lens = np.ascontiguousarray(pred_lens, np.int32)
    target_lens = np.ascontiguousarray(target_lens, np.int32)
    B, P = preds.shape
    L = targets.shape[1]

    lib = _load()
    if lib is None:
        out = np.zeros(B, np.int32)
        for b in range(B):
            out[b] = _py_edit(preds[b, : pred_lens[b]], targets[b, : target_lens[b]])
        return out

    out = np.zeros(B, np.int32)
    lib.edit_distance_batch(
        preds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pred_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        targets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        target_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        B, P, L,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def _py_edit(a, b):
    dp = np.arange(len(b) + 1)
    for x in a:
        prev = dp.copy()
        dp[0] += 1
        for j, y in enumerate(b):
            dp[j + 1] = min(prev[j + 1] + 1, dp[j] + 1, prev[j] + (x != y))
    return dp[len(b)]
