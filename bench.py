"""Headline benchmarks, driver-recorded: ONE JSON line with all four
headline workloads (alignment, seq2seq, CTC, realtime) plus an MFU
estimate.

Primary metric (value/vs_baseline, unchanged from round 1): batched CCA
alignment fits/sec vs the sequential float64 numpy oracle — the
reference's dominant classical workload (50 iters x 20 folds x
BayesSearchCV(25 x 5) PCA+CCA fits, SURVEY.md §3.1).

Extra keys:
- ``seq2seq_samples_per_sec`` — Seq2SeqRNN train-step throughput at
  reference scale (B=1000, hidden 500, conv 100, T=200;
  `train_seq2seq.py:100-147`), on the Pallas fused-GRU path on TPU;
- ``seq2seq_mfu`` — analytic model FLOPs/s over the chip's nominal
  bf16-class MXU peak (matching ``_chip_peak``);
- ``ctc_samples_per_sec`` — RealtimeRNN CTC train-step throughput at the
  reference's pooled production scale (B=2000 pooled trials, T=600 bins
  -> 147 windows of width 14/stride 4, hidden 512 x 3 layers, 11
  classes; `train_ctc_rnn.py` + `realtime_datamodule.py` geometry), the
  fig_5 headline workload;
- ``realtime_amortized_ms_per_bin`` — scan-amortized streaming decode
  latency (SURVEY.md §3.5 path);
- ``realtime_p50_ms`` / ``realtime_max_ms`` — honest per-step latency
  distribution (python-dispatched single steps, donated state; only the
  fixed tunnel sync cost is amortized out).

Measurement gotchas (CLAUDE.md): D2H pays ~0.4 s tunnel latency and
``block_until_ready`` can return early, so each section queues several
executions and forces ONE tiny host read at the end.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _with_compile_retry(fn, *args, attempts: int = 3, delay: float = 5.0):
    """First-call (compile) retry: the tunnel's remote-compile helper
    occasionally 500s on large programs (docs/ROUND1.md); a retry hits
    the persistent cache or a fresh helper subprocess."""
    for i in range(attempts):
        try:
            return fn(*args)
        except Exception:
            if i == attempts - 1:
                raise
            time.sleep(delay)


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


def bench_alignment():
    import jax
    import jax.numpy as jnp

    from cross_patient_speech_decoding_tpu.ops.cca import fit_cca_aligner

    N, T, K, C = 150, 200, 40, 27
    BATCH = 128
    rng = np.random.default_rng(0)

    latent = rng.normal(size=(C, T, 8)).astype(np.float32)
    ids = np.repeat(np.arange(C), N // C + 1)[:N].astype(np.int32)

    # batch generated ON DEVICE (host datagen + the 1.2 GB H2D through the
    # tunnel cost ~10 min of the bench's budget; only the tiny shared
    # latent crosses the link). Same generative model as the host path:
    # per-patient random readout of shared class trajectories + noise.
    lat_dev = jnp.asarray(latent[ids])  # (N, T, 8)

    @jax.jit
    def make_batch(key):
        k1, k2 = jax.random.split(key)
        mixes = jax.random.normal(k1, (BATCH, 8, K), jnp.float32)
        noise = 0.3 * jax.random.normal(k2, (BATCH, N, T, K), jnp.float32)
        x = jnp.einsum("ntl,blk->bntk", lat_dev, mixes) + noise
        # flat (N, T*K) trials layout: K=40 << the 128-lane tile, so the
        # (N, T, K) layout pads every read of the trial tensor ~3x; the
        # library's t_len path keeps the class-average reduction dense
        # (ops/cca.py:fit_cca_aligner)
        return x.reshape(BATCH, N, T * K)

    Xa = make_batch(jax.random.key(0))
    Xb = make_batch(jax.random.key(1))
    ids_b = jnp.asarray(np.tile(ids, (BATCH, 1)))
    ids_a = ids_b

    # native batch axis (not vmap): lets the Pallas Jacobi eigensolver in
    # the gram path run at full block width
    fit = jax.jit(lambda xa, xb, ya, yb: fit_cca_aligner(xa, xb, ya, yb, C,
                                                         t_len=T))

    out = _with_compile_retry(fit, Xa, Xb, ids_a, ids_b)
    _ = np.asarray(out.alignment.d[0])

    ITERS = 10
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fit(Xa, Xb, ids_a, ids_b)
    _ = np.asarray(out.alignment.d[0])  # device stream is ordered: waits all
    fits_per_sec = ITERS * BATCH / (time.perf_counter() - t0)

    # numpy oracle baseline (sequential, float64 — the reference's mode):
    # one host-generated pair from the same generative model, best-of-N
    # single-fit time to be robust to host load spikes
    r = np.random.default_rng(1)
    X_ah = (latent[ids].astype(np.float64) @ r.normal(size=(8, K))
            + 0.3 * r.normal(size=(N, T, K)))
    X_bh = (latent[ids].astype(np.float64) @ r.normal(size=(8, K))
            + 0.3 * r.normal(size=(N, T, K)))
    times_base = []
    for _ in range(5):
        t0 = time.perf_counter()
        _numpy_oracle_fit(X_ah, X_bh, ids, ids)
        times_base.append(time.perf_counter() - t0)
    return fits_per_sec, fits_per_sec * min(times_base)


def _seq2seq_flops_per_step(B, T, C, F, H, K, L, n_cls):
    """Analytic model FLOPs for one train step (fwd + ~2x bwd)."""
    Tc = T - K + 1  # VALID conv shrink
    conv = 2 * B * Tc * K * C * F
    enc = 2 * (2 * B * Tc * F * 3 * H + 2 * B * Tc * H * 3 * H)  # bidir
    dec = L * (2 * B * H * 3 * H * 2 + 2 * B * H * n_cls)
    return 3 * (conv + enc + dec)


def _chip_peak():
    """Per-chip matmul peak FLOP/s (bf16-class MXU passes — the precision
    the NN stack actually runs at under JAX's default)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = {
        "v5 lite": 197e12,
        "v5e": 197e12,
        "v4": 275e12,
        "v6": 918e12,
    }
    for k, v in table.items():
        if k in kind:
            return v
    return 197e12


def bench_seq2seq():
    import jax
    import jax.numpy as jnp

    from cross_patient_speech_decoding_tpu.models import Seq2SeqRNN
    from cross_patient_speech_decoding_tpu.train import (
        create_train_state,
        make_seq2seq_train_step,
    )
    from cross_patient_speech_decoding_tpu.train.loops import make_optimizer

    B, T, C, F, H, K, L, n_cls = 1000, 200, 30, 100, 500, 10, 3, 9
    model = Seq2SeqRNN(n_filters=F, hidden=H, num_classes=n_cls)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, n_cls, (B, L)).astype(np.int32))
    variables = model.init(
        {"params": jax.random.key(0), "tf": jax.random.key(1),
         "dropout": jax.random.key(2)}, x, y, 0.5, False,
    )
    tx = make_optimizer(1e-3, 1e-5, 100)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_seq2seq_train_step(model, tx))
    key = jax.random.key(3)
    state, m = _with_compile_retry(step, state, (x, y), key)
    _ = float(m["loss"])
    N = 10
    t0 = time.perf_counter()
    for _ in range(N):
        state, m = step(state, (x, y), key)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / N
    flops = _seq2seq_flops_per_step(B, T, C, F, H, K, L, n_cls)
    return B / dt, (flops / dt) / _chip_peak()


def bench_ctc():
    """CTC train-step throughput at the reference's pooled production
    scale (the fig_5 experiment regime: ~2000 pooled-aligned trials of
    600 bins / ~60 latent channels after PCA+CCA, hidden 512 x 3, labels
    2 sil + 3 phon + 2 sil, `scripts/train_ctc_rnn.py` geometry)."""
    import jax
    import jax.numpy as jnp

    from cross_patient_speech_decoding_tpu.models import RealtimeRNN
    from cross_patient_speech_decoding_tpu.train import (
        create_train_state,
        make_ctc_train_step,
    )
    from cross_patient_speech_decoding_tpu.train.loops import make_optimizer

    B, T, C, H, NL, L = 2000, 600, 60, 512, 3, 7
    # features generated ON DEVICE: (2000, 600, 60) f32 is 288 MB — a
    # ~10 min H2D upload through the 30 MB/s tunnel if built on host
    x = jax.jit(
        lambda k: jax.random.normal(k, (B, T, C), jnp.float32)
    )(jax.random.key(0))
    rng = np.random.default_rng(0)
    y = jnp.asarray(np.concatenate(
        [np.full((B, 2), 10), rng.integers(1, 10, (B, 3)),
         np.full((B, 2), 10)], axis=1,
    ).astype(np.int32))
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), L, jnp.int32)

    model = RealtimeRNN(hidden=H, n_layers=NL, n_classes=11, dropout=0.3,
                        win_size=14, stride=4)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x,
        False,
    )
    tx = make_optimizer(1e-3, 1e-5, 100)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_ctc_train_step(model, tx))
    key = jax.random.key(3)
    batch = (x, y, il, ll)
    state, m = _with_compile_retry(step, state, batch, key)
    _ = float(m["loss"])
    N = 5
    t0 = time.perf_counter()
    for _ in range(N):
        state, m = step(state, batch, key)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / N
    return B / dt


def bench_realtime():
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        run_realtime_sim,
    )
    from cross_patient_speech_decoding_tpu.utils.config import (
        RealtimeSimConfig,
    )

    res = run_realtime_sim(
        RealtimeSimConfig(per_step_samples=7, per_step_chain=200),
        verbose=False,
    )
    return res


def main():
    import jax

    # persistent kernel cache: the fused-GRU train step is a multi-Mosaic
    # -kernel program whose cold compile through the tunnel helper takes
    # minutes; warm runs load from disk
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    fits_per_sec, vs_base = bench_alignment()
    s2s, mfu = bench_seq2seq()
    ctc = bench_ctc()
    rt = bench_realtime()
    print(
        json.dumps(
            {
                "metric": "alignment_fits_per_sec",
                "value": round(fits_per_sec, 3),
                "unit": "fits/s",
                "vs_baseline": round(vs_base, 3),
                "seq2seq_samples_per_sec": round(s2s, 1),
                "seq2seq_mfu": round(mfu, 4),
                "ctc_samples_per_sec": round(ctc, 1),
                "realtime_amortized_ms_per_bin": round(
                    rt["amortized_ms"], 4
                ),
                "realtime_p50_ms": round(rt["p50_ms"], 4),
                # 7 samples is not a p99; report the observed max honestly
                "realtime_max_ms": round(rt["max_ms"], 4),
            }
        )
    )


if __name__ == "__main__":
    main()
