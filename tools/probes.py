"""Maintained perf probes — promoted from round-3 ``scratch/``.

Each probe prints ONE JSON line: its measurements plus the session's
measured matmul ceiling (``ceiling_tfps_measured``). The axon tunnel
shows >1.4x session-to-session throughput variance on identical
programs (docs/ROUND3.md:58-61), so absolute milliseconds are only
comparable WITHIN a session; across sessions compare ratios or
ceiling-normalized numbers. Every probe therefore times all its arms in
one process.

Run on the real TPU:

    python bench.py --probe ctc_stages
    python bench.py --probe s2s_stages
    python bench.py --probe foldpar_pallas
    python bench.py --probe ctc_driver_overhead
    python bench.py --probe bf16_parity
    python bench.py --probe bwd_accum

Env knobs: ``BENCH_CALIB_N`` (calibration matmul size, default 8192 —
smaller sizes under-measure the ceiling because the tunnel's fixed D2H
sync stops amortizing), ``PROBE_EPOCHS`` (foldpar epochs, default 40).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _timeit(fn, n=10):
    """Median-free mean over n queued executions, synced by a REAL tiny
    scalar read (block_until_ready can return early through the tunnel —
    CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    out = fn()
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    return (time.perf_counter() - t0) / n


def _ceiling():
    import bench

    # full 8192 calib, same as the bench's calib section: at 4096 the
    # timed chain is ~27 ms and the tunnel's fixed D2H sync dominates —
    # measured 93 vs 163 TF/s for the same session
    os.environ.setdefault("BENCH_CALIB_N", "8192")
    return bench.section_calib()["ceiling_tfps_measured"]


def probe_ctc_stages(argv):
    """Stage split of the CTC train step at fig_5 production scale:
    full step / model fwd / model fwd+bwd (surrogate loss) / CTC loss
    alone. Implied opt+rest = full - model_fb - ctc."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cross_patient_speech_decoding_tpu.models import RealtimeRNN
    from cross_patient_speech_decoding_tpu.models.realtime_rnn import (
        adjusted_input_lengths,
    )
    from cross_patient_speech_decoding_tpu.ops.ctc import ctc_loss_mean
    from cross_patient_speech_decoding_tpu.train import (
        create_train_state,
        make_ctc_train_step,
    )
    from cross_patient_speech_decoding_tpu.train.loops import make_optimizer

    B, T, C, H, NL, L = 2000, 600, 60, 512, 3, 7
    rng = np.random.default_rng(0)
    x = jax.jit(lambda k: jax.random.normal(k, (B, T, C), jnp.float32))(
        jax.random.key(0))
    y = jnp.asarray(np.concatenate(
        [np.full((B, 2), 10), rng.integers(1, 10, (B, 3)),
         np.full((B, 2), 10)], axis=1).astype(np.int32))
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), L, jnp.int32)

    model = RealtimeRNN(hidden=H, n_layers=NL, n_classes=11, dropout=0.3,
                        win_size=14, stride=4)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x,
        False)
    tx = make_optimizer(1e-3, 1e-5, 100)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_ctc_train_step(model, tx))
    key = jax.random.key(3)
    batch = (x, y, il, ll)

    t_full = _timeit(lambda: step(state, batch, key)[1]["loss"])
    fwd = jax.jit(lambda p, xx: model.apply(
        {"params": p}, xx, False, rngs={"dropout": key}).sum())
    t_fwd = _timeit(lambda: fwd(state.params, x))

    def loss_sq(p, xx):
        logits = model.apply({"params": p}, xx, False,
                             rngs={"dropout": key})
        return jnp.mean(logits * logits)

    g_sq = jax.jit(jax.grad(loss_sq))
    t_fb = _timeit(lambda: g_sq(state.params, x))

    in_adj = adjusted_input_lengths(il, model.win_size, model.stride)
    logits = jax.jit(lambda p, xx: model.apply(
        {"params": p}, xx, False, rngs={"dropout": key}))(state.params, x)
    jax.block_until_ready(logits)
    g_ctc = jax.jit(jax.grad(
        lambda lg: ctc_loss_mean(lg, in_adj, y, ll, model.blank)))
    t_ctc = _timeit(lambda: g_ctc(logits))

    return {
        "full_step_ms": t_full * 1e3,
        "samples_per_sec": B / t_full,
        "model_fwd_ms": t_fwd * 1e3,
        "model_fwd_bwd_ms": t_fb * 1e3,
        "ctc_loss_fwd_bwd_ms": t_ctc * 1e3,
        "opt_rest_ms": (t_full - t_fb - t_ctc) * 1e3,
    }


def probe_s2s_stages(argv):
    """Stage split of the seq2seq train step at bench shape: full step /
    full fwd / conv-only grad / conv+encoder grad."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cross_patient_speech_decoding_tpu.models import Seq2SeqRNN
    from cross_patient_speech_decoding_tpu.models.layers import (
        StackedRNN,
        TemporalConv,
    )
    from cross_patient_speech_decoding_tpu.train import (
        create_train_state,
        make_seq2seq_train_step,
    )
    from cross_patient_speech_decoding_tpu.train.loops import make_optimizer

    B, T, C, F, H, K, L, n_cls = 1000, 200, 30, 100, 500, 10, 3, 9
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, n_cls, (B, L)).astype(np.int32))
    key = jax.random.key(3)

    model = Seq2SeqRNN(n_filters=F, hidden=H, num_classes=n_cls)
    variables = model.init(
        {"params": jax.random.key(0), "tf": jax.random.key(1),
         "dropout": jax.random.key(2)}, x, y, 0.5, False)
    tx = make_optimizer(1e-3, 1e-5, 100)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_seq2seq_train_step(model, tx))
    t_full = _timeit(lambda: step(state, (x, y), key)[1]["loss"])

    fwd = jax.jit(lambda v, xx, yy: model.apply(
        v, xx, yy, 0.5, False, rngs={"tf": key, "dropout": key},
        mutable=["batch_stats"])[0].sum())
    t_fwd = _timeit(lambda: fwd(variables, x, y))

    conv = TemporalConv(F, K, 1)
    cvars = conv.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x,
        False)

    def conv_loss(params, xx):
        out, _ = conv.apply(
            {"params": params, "batch_stats": cvars["batch_stats"]}, xx,
            False, rngs={"dropout": key}, mutable=["batch_stats"])
        return jnp.mean(out * out)

    conv_grad = jax.jit(jax.grad(conv_loss))
    t_conv = _timeit(lambda: conv_grad(cvars["params"], x))

    class ConvEnc(nn.Module):
        @nn.compact
        def __call__(self, xx):
            h = TemporalConv(F, K, 1)(xx, deterministic=False)
            out, lasts = StackedRNN(H, 1, dropout=0.3, bidirectional=True)(
                h, deterministic=False)
            return lasts[-2] + lasts[-1]

    ce = ConvEnc()
    cevars = ce.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x)

    def ce_loss(params, xx):
        out, _ = ce.apply(
            {"params": params, "batch_stats": cevars["batch_stats"]}, xx,
            rngs={"dropout": key}, mutable=["batch_stats"])
        return jnp.mean(out * out)

    ce_grad = jax.jit(jax.grad(ce_loss))
    t_ce = _timeit(lambda: ce_grad(cevars["params"], x))

    return {
        "full_step_ms": t_full * 1e3,
        "samples_per_sec": B / t_full,
        "full_fwd_ms": t_fwd * 1e3,
        "conv_fwd_bwd_ms": t_conv * 1e3,
        "conv_enc_fwd_bwd_ms": t_ce * 1e3,
        "implied_encoder_fwd_bwd_ms": (t_ce - t_conv) * 1e3,
        "implied_decoder_loss_opt_ms": (t_full - t_ce) * 1e3,
    }


def probe_foldpar_pallas(argv):
    """Fold-parallel seq2seq trainer A/B at reference scale: vmapped
    Pallas GRU vs the scan GRU (warm ms per fold-chunk epoch)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cross_patient_speech_decoding_tpu.models import Seq2SeqRNN
    from cross_patient_speech_decoding_tpu.train.fold_parallel import (
        make_seq2seq_fold_trainer_fn,
    )

    epochs = int(os.environ.get("PROBE_EPOCHS", "40"))
    F, N, T, K, L = 2, 1224, 200, 24, 3
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(F, N, T, K)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 9, size=(N, L)).astype(np.int32))
    w_np = (rng.random((F, N)) < 0.95).astype(np.float32)
    jax.block_until_ready(X)
    w = jnp.asarray(w_np)
    te = jnp.asarray(1.0 - w_np)
    model = Seq2SeqRNN(n_filters=100, hidden=500, num_classes=9)

    out = {}
    for impl in (argv or ["pallas", "scan"]):
        # per-arm isolation: the scan fold-parallel program reproducibly
        # crashes the remote compile at reference scale (docs/ROUND3.md;
        # the reason rnn_impl='pallas' is the production choice) — one
        # arm's failure must not take down the probe's JSON line
        try:
            fn = make_seq2seq_fold_trainer_fn(model, rnn_impl=impl)
            t0 = time.perf_counter()
            a, _ = fn(X, y, w, te, 0, epochs)
            _ = float(a[0])
            out[f"{impl}_first_call_s"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            a, _ = fn(X, y, w, te, 1, epochs)
            _ = float(a[0])
            out[f"{impl}_warm_ms_per_epoch"] = (
                (time.perf_counter() - t0) / epochs * 1e3)
        except Exception as e:
            out[f"{impl}_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


def probe_ctc_driver_overhead(argv):
    """Fixed-cost split of a reference-scale train-ctc iteration:
    datagen, cold pooled prep (PCA+CCA fits + compiles), warm re-prep
    (fresh mask, cached programs), pool concat."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cross_patient_speech_decoding_tpu.cli.experiments import (
        _prep_ctc_context,
        _synthetic_ctc_cfg,
    )
    from cross_patient_speech_decoding_tpu.utils.config import (
        TrainCTCConfig,
    )

    out = {}
    t = time.time()
    cfg = TrainCTCConfig(context="aligned", synth_patients=8,
                         synth_trials=250, synth_T=600, hidden=512,
                         n_layers=3)
    pts = _synthetic_ctc_cfg(cfg)
    _ = float(np.asarray(pts[0][0][0, 0, 0]))
    out["datagen_s"] = time.time() - t

    rng = np.random.default_rng(0)
    n_tr = pts[0][0].shape[0]
    mask = np.ones(n_tr, np.float32)
    mask[-43:] = 0.0
    t = time.time()
    prep, nf, _test = _prep_ctc_context(cfg, rng, tar_train_mask=mask)
    _ = float(np.asarray(prep[-1][0][0, 0, 0]))
    out["prep_cold_s"] = time.time() - t

    mask2 = np.ones(n_tr, np.float32)
    mask2[:43] = 0.0
    t = time.time()
    prep, nf, _test = _prep_ctc_context(cfg, rng, tar_train_mask=mask2)
    _ = float(np.asarray(prep[-1][0][0, 0, 0]))
    out["prep_warm_s"] = time.time() - t

    t = time.time()
    X_pool = jnp.concatenate([d[0] for d in prep])
    _ = float(np.asarray(X_pool[0, 0, 0]))
    out["pool_concat_s"] = time.time() - t
    return out


def probe_bwd_accum(argv):
    """Decide docs/ROUND4.md §11: cost of the backward kernels' on-chip
    dW/dWh/db VMEM read-modify-write, measured through the FULL-MODEL jit
    at fig_5 production scale (bare-kernel probes hang the remote
    compiler — CLAUDE.md). Arms: model fwd+bwd with the real backward vs
    a timing-only clone that skips the accumulate (grads wrong by
    construction; a zero-dwi check pins that the flag took effect)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cross_patient_speech_decoding_tpu.models import RealtimeRNN
    from cross_patient_speech_decoding_tpu.ops.pallas_gru import (
        timing_skip_dw_accum,
    )

    B, T, C, H, NL = 2000, 600, 60, 512, 3
    x = jax.jit(lambda k: jax.random.normal(k, (B, T, C), jnp.float32))(
        jax.random.key(0))
    key = jax.random.key(3)
    model = RealtimeRNN(hidden=H, n_layers=NL, n_classes=11, dropout=0.3,
                        win_size=14, stride=4)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x,
        False)
    params = variables["params"]

    def loss_sq(p, xx):
        logits = model.apply({"params": p}, xx, False,
                             rngs={"dropout": key})
        return jnp.mean(logits * logits)

    out = {}
    g_real = jax.jit(jax.grad(loss_sq))
    t_real = _timeit(lambda: g_real(params, x))
    out["model_fwd_bwd_ms"] = t_real * 1e3

    # round-5 mitigation A/B (REJECTED — kept for re-measurement on new
    # hardware): the half-rate (k=2) accumulate vs the per-step default
    from cross_patient_speech_decoding_tpu.ops.pallas_gru import (
        set_bwd_accum_k2,
    )

    with set_bwd_accum_k2(True):
        g_k2 = jax.jit(jax.grad(loss_sq))
        gr_k2 = g_k2(params, x)
        t_k2 = _timeit(lambda: g_k2(params, x))
    out["model_fwd_bwd_k2_ms"] = t_k2 * 1e3
    out["k2_saving_ms"] = (t_real - t_k2) * 1e3
    # grads parity across accumulate schedules (f32 reassociation only)
    gr_k1 = g_real(params, x)
    rel = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))
                           / (jnp.max(jnp.abs(b)) + 1e-12)), gr_k2, gr_k1)
    out["k2_vs_k1_max_rel_grad_delta"] = max(
        jax.tree_util.tree_leaves(rel))

    # full production train step (the bench ctc geometry) k2 vs k1
    import numpy as _np

    from cross_patient_speech_decoding_tpu.train import (
        create_train_state,
        make_ctc_train_step,
    )
    from cross_patient_speech_decoding_tpu.train.loops import make_optimizer

    rng = _np.random.default_rng(0)
    y = jnp.asarray(_np.concatenate(
        [_np.full((B, 2), 10), rng.integers(1, 10, (B, 3)),
         _np.full((B, 2), 10)], axis=1).astype(_np.int32))
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), 7, jnp.int32)
    tx = make_optimizer(1e-3, 1e-5, 100)
    state = create_train_state(model, variables, tx)
    batch = (x, y, il, ll)
    step = jax.jit(make_ctc_train_step(model, tx))
    t_step = _timeit(lambda: step(state, batch, key)[1]["loss"], n=5)
    out["full_step_ms"] = t_step * 1e3
    out["ctc_samples_per_sec"] = B / t_step
    with set_bwd_accum_k2(True):
        step_k2 = jax.jit(make_ctc_train_step(model, tx))
        _ = step_k2(state, batch, key)
        t_step_k2 = _timeit(
            lambda: step_k2(state, batch, key)[1]["loss"], n=5)
    out["full_step_k2_ms"] = t_step_k2 * 1e3

    with timing_skip_dw_accum():
        # fresh jit wrapper: the flag is read at trace time, and this
        # cache must never serve real training
        g_skip = jax.jit(jax.grad(loss_sq))
        grads_skip = g_skip(params, x)
        # the flag took effect: the fused layers' dwi are exactly zero
        dwi0 = float(jnp.abs(
            grads_skip["rnn"]["fwd0"]["wi"]).max())
        assert dwi0 == 0.0, f"skip arm still accumulates (|dwi|={dwi0})"
        t_skip = _timeit(lambda: g_skip(params, x))
    out["model_fwd_bwd_skip_accum_ms"] = t_skip * 1e3
    out["dw_accum_cost_ms"] = (t_real - t_skip) * 1e3
    out["dw_accum_fraction_of_fwd_bwd"] = (t_real - t_skip) / t_real

    # same A/B on the dropout-free eval-mode path (isolates the
    # accumulate from any dropout-mask interplay)
    def loss_det(p, xx):
        logits = model.apply({"params": p}, xx, True)
        return jnp.mean(logits * logits)

    g_det = jax.jit(jax.grad(loss_det))
    t_det = _timeit(lambda: g_det(params, x))
    with timing_skip_dw_accum():
        g_det_skip = jax.jit(jax.grad(loss_det))
        _ = g_det_skip(params, x)
        t_det_skip = _timeit(lambda: g_det_skip(params, x))
    out["det_fwd_bwd_ms"] = t_det * 1e3
    out["det_fwd_bwd_skip_accum_ms"] = t_det_skip * 1e3
    out["det_dw_accum_cost_ms"] = (t_det - t_det_skip) * 1e3
    return out


def probe_bf16_parity(argv):
    """Forward-logits parity: f32 layer-0 stream (input_grad=True, MXU
    converts implicitly) vs bf16 stream (input_grad=False, astype-RNE
    then VMEM upcast). Expected max |delta| exactly 0.0 on TPU."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cross_patient_speech_decoding_tpu.models import RealtimeRNN

    B, T, C, H, NL = 256, 600, 60, 512, 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    kw = dict(hidden=H, n_layers=NL, n_classes=11, dropout=0.0,
              win_size=14, stride=4)
    m_f32 = RealtimeRNN(input_grad=True, **kw)
    m_bf16 = RealtimeRNN(input_grad=False, **kw)
    variables = m_f32.init({"params": jax.random.key(0)}, x, True)
    lg_f32 = jax.jit(lambda xx: m_f32.apply(variables, xx, True))(x)
    lg_bf16 = jax.jit(lambda xx: m_bf16.apply(variables, xx, True))(x)
    return {
        "max_abs_logit_delta": float(jnp.max(jnp.abs(lg_f32 - lg_bf16))),
        "max_abs_logit": float(jnp.max(jnp.abs(lg_f32))),
    }


PROBES = {
    "ctc_stages": probe_ctc_stages,
    "s2s_stages": probe_s2s_stages,
    "foldpar_pallas": probe_foldpar_pallas,
    "ctc_driver_overhead": probe_ctc_driver_overhead,
    "bf16_parity": probe_bf16_parity,
    "bwd_accum": probe_bwd_accum,
}


def run(name: str, argv) -> int:
    import jax

    if name not in PROBES:
        sys.stderr.write(
            f"unknown probe {name!r}; available: {sorted(PROBES)}\n")
        return 2
    import bench

    bench._apply_platform_env()
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_tpu"))
    out = {"probe": name, "backend": jax.default_backend()}
    out.update(PROBES[name](list(argv)))
    out["ceiling_tfps_measured"] = _ceiling()
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in out.items()}), flush=True)
    return 0
