"""Headline benchmark: batched CCA alignment fits/sec on device.

The reference's dominant classical workload is 50 iters x 20 folds x
BayesSearchCV(25 x 5) PCA+CCA fits per patient (SURVEY.md §3.1) executed as
sequential numpy calls on a CPU cluster. The TPU-native design turns each
fit into a pure function and vmaps hundreds of them into one XLA launch.

Metric: complete CCA aligner fits/sec (condition-average -> masked SVD
orthonormalization -> CCA SVD -> manifold dirs + b->a projector) at
reference-realistic shapes (150 trials x 200 timepoints x 40 latents, 27
sequence classes). ``vs_baseline`` is the speedup over the same fit done by
the float64 numpy oracle (the reference's math) on this host's CPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _numpy_oracle_fit(X_a, X_b, y_a, y_b):
    """Reference-math CCA fit (cnd-avg -> QR -> SVD -> pinv products)."""
    classes = np.unique(y_a)
    La = np.stack([X_a[y_a == c].mean(0) for c in classes]).reshape(-1, X_a.shape[-1])
    Lb = np.stack([X_b[y_b == c].mean(0) for c in classes]).reshape(-1, X_b.shape[-1])
    La = La - La.mean(0)
    Lb = Lb - Lb.mean(0)
    d = min(np.linalg.matrix_rank(La.T), np.linalg.matrix_rank(Lb.T))
    qa, ra = np.linalg.qr(La)
    qb, rb = np.linalg.qr(Lb)
    u, s, vt = np.linalg.svd(qa.T @ qb)
    ma = np.linalg.pinv(ra) @ u[:, :d]
    mb = np.linalg.pinv(rb) @ vt.T[:, :d]
    return mb @ np.linalg.pinv(ma)


def main():
    import jax
    import jax.numpy as jnp

    from cross_patient_speech_decoding_tpu.ops.cca import fit_cca_aligner

    N, T, K, C = 150, 200, 40, 27
    BATCH = 128
    rng = np.random.default_rng(0)

    latent = rng.normal(size=(C, T, 8))
    ids = np.repeat(np.arange(C), N // C + 1)[:N].astype(np.int32)

    def make_pt(seed):
        r = np.random.default_rng(seed)
        mix = r.normal(size=(8, K))
        return (latent[ids] @ mix + 0.3 * r.normal(size=(N, T, K))).astype(
            np.float32
        )

    X_a = np.stack([make_pt(2 * i) for i in range(BATCH)])
    X_b = np.stack([make_pt(2 * i + 1) for i in range(BATCH)])
    ids_b = jnp.asarray(np.tile(ids, (BATCH, 1)))
    ids_a = ids_b

    # native batch axis (not vmap): lets the Pallas Jacobi eigensolver in
    # the gram path run at full block width
    fit = jax.jit(lambda xa, xb, ya, yb: fit_cca_aligner(xa, xb, ya, yb, C))
    Xa, Xb = jnp.asarray(X_a), jnp.asarray(X_b)

    # warmup/compile; force completion via a tiny host read — on the axon
    # tunnel, block_until_ready can return before execution finishes, and
    # any D2H transfer pays ~0.4s fixed latency, so throughput is measured
    # over several queued executions with ONE scalar read at the end.
    out = fit(Xa, Xb, ids_a, ids_b)
    _ = np.asarray(out.alignment.d[0])

    ITERS = 5
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fit(Xa, Xb, ids_a, ids_b)
    _ = np.asarray(out.alignment.d[0])  # device stream is ordered: waits all
    fits_per_sec = ITERS * BATCH / (time.perf_counter() - t0)

    # numpy oracle baseline (sequential, float64 — the reference's mode);
    # best-of-N single-fit time to be robust to host load spikes
    times_base = []
    for i in range(5):
        t0 = time.perf_counter()
        _numpy_oracle_fit(
            X_a[i].astype(np.float64), X_b[i].astype(np.float64), ids, ids
        )
        times_base.append(time.perf_counter() - t0)
    base_fits_per_sec = 1.0 / min(times_base)

    print(
        json.dumps(
            {
                "metric": "alignment_fits_per_sec",
                "value": round(fits_per_sec, 3),
                "unit": "fits/s",
                "vs_baseline": round(fits_per_sec / base_fits_per_sec, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
