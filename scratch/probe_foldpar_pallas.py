"""Same-session A/B: fold-parallel seq2seq trainer, scan GRU vs
Pallas-under-vmap, at reference scale (fold_chunk=2, ~1.2k pooled trials,
T=200, K=24, hidden 500).

The 'pallas serializes per fold' assumption behind the scan default is
wrong in the relevant regime: jax's pallas batching rule PREPENDS the
fold axis to the kernel grid (one launch, per-fold weight blocks), and at
reference scale each fold's B*T=245k is far past the kernel's worthwhile
threshold. Measure which wins.

Run: timeout 3600 python scratch/probe_foldpar_pallas.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from cross_patient_speech_decoding_tpu.models import Seq2SeqRNN
from cross_patient_speech_decoding_tpu.train.fold_parallel import (
    make_seq2seq_fold_trainer_fn,
)


def main():
    print("backend:", jax.default_backend(), flush=True)
    F, N, T, K = 2, 1224, 200, 24
    L = 3
    EPOCHS = 40
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(F, N, T, K)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 9, size=(N, L)).astype(np.int32))
    w_np = (rng.random((F, N)) < 0.95).astype(np.float32)
    X.block_until_ready()

    w = jnp.asarray(w_np)
    te = jnp.asarray(1.0 - w_np)
    model = Seq2SeqRNN(n_filters=100, hidden=500, num_classes=9)

    impls = sys.argv[1:] or ["pallas", "scan"]
    for impl in impls:
        if impl == "pallas1":
            # per-fold launches through the same fn: fold_chunk=1 twice
            fn = make_seq2seq_fold_trainer_fn(model, rnn_impl="pallas")
            try:
                t0 = time.perf_counter()
                a0, _ = fn(X[:1], y, w[:1], te[:1], 0, EPOCHS)
                acc0 = float(a0[0])
                t1 = time.perf_counter()
                print(f"pallas1: first call (compile+{EPOCHS}ep) "
                      f"{t1 - t0:.1f}s acc={acc0:.4f}", flush=True)
                t0 = time.perf_counter()
                a0, _ = fn(X[:1], y, w[:1], te[:1], 1, EPOCHS)
                a1, _ = fn(X[1:], y, w[1:], te[1:], 2, EPOCHS)
                accs = (float(a0[0]), float(a1[0]))
                t1 = time.perf_counter()
                per = (t1 - t0) / (2 * EPOCHS) * 1000
                print(f"pallas1: warm 2 folds sequentially {t1 - t0:.2f}s "
                      f"= {per:.1f} ms/fold-epoch accs={accs}", flush=True)
            except Exception as e:
                print(f"pallas1: FAILED {type(e).__name__}: "
                      f"{str(e)[:500]}", flush=True)
            continue
        fn = make_seq2seq_fold_trainer_fn(model, rnn_impl=impl)
        try:
            t0 = time.perf_counter()
            a, _ = fn(X, y, w, te, 0, EPOCHS)
            acc0 = float(a[0])  # real scalar read = true completion
            t1 = time.perf_counter()
            print(f"{impl}: first call (compile+{EPOCHS}ep) {t1 - t0:.1f}s "
                  f"acc[0]={acc0:.4f}", flush=True)
            t0 = time.perf_counter()
            a, _ = fn(X, y, w, te, 1, EPOCHS)
            acc1 = float(a[0])
            t1 = time.perf_counter()
            per = (t1 - t0) / EPOCHS * 1000
            print(f"{impl}: warm {t1 - t0:.2f}s = {per:.1f} ms/epoch "
                  f"(2-fold chunk) acc[0]={acc1:.4f}", flush=True)
        except Exception as e:
            print(f"{impl}: FAILED {type(e).__name__}: {str(e)[:500]}",
                  flush=True)


if __name__ == "__main__":
    main()
