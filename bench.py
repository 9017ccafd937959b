"""Headline benchmarks, driver-recorded: ONE JSON line, always.

Architecture (round 4 — the round-3 artifact was empty because a single
monolithic process printed only after ALL sections finished, and a cold
`.jax_cache_tpu/` blew the driver's ~30-minute budget):

- The PARENT process (this file, no arguments) never imports jax. It runs
  each benchmark section in its own subprocess (``python bench.py
  --section NAME``) under a per-section wall-clock budget, aggregates the
  sections' JSON fragments, and prints the final line from code paths
  that survive section timeouts, section crashes, SIGTERM/SIGINT (the
  driver's ``timeout``), and a wedged TPU tunnel. Whatever happens, the
  artifact parses.
- Sections run FASTEST-COMPILE-FIRST (calib -> realtime -> alignment ->
  ctc -> seq2seq), so a cold compile cache loses only the tail sections,
  not the whole artifact. Missing sections appear as ``null`` plus
  entries in ``sections_timed_out`` / ``sections_failed`` /
  ``sections_skipped``.
- After a section timeout the parent health-probes the tunnel (TCP to the
  relay + a tiny-jit subprocess): killing a TPU client mid-compile can
  wedge the relay for ~10 min (CLAUDE.md), and continuing against a dead
  tunnel would burn the remaining budget hanging.
- ``calib`` measures the SESSION's actual matmul ceiling (a big bf16
  matmul), because the tunnel shows >1.4x session-to-session throughput
  variance (docs/ROUND3.md); the final line carries both nominal MFU and
  ``*_mfu_measured`` against the measured ceiling so round-over-round
  deltas are interpretable.

Budgets (seconds, env-overridable):
  BENCH_GLOBAL_BUDGET_S   total wall clock, default 1500 (driver ~30 min)
  BENCH_BUDGET_<SECTION>  per-section override, e.g. BENCH_BUDGET_CTC=600
  BENCH_SECTIONS          comma list overriding the section set/order

Primary metric (value/vs_baseline, unchanged from round 1): batched CCA
alignment fits/sec vs the sequential float64 numpy oracle — the
reference's dominant classical workload (50 iters x 20 folds x
BayesSearchCV(25 x 5) PCA+CCA fits, SURVEY.md §3.1).

Extra keys:
- ``seq2seq_samples_per_sec`` — Seq2SeqRNN train-step throughput at
  reference scale (B=1000, hidden 500, conv 100, T=200;
  `train_seq2seq.py:100-147`), Pallas fused-GRU path on TPU;
- ``seq2seq_mfu`` / ``seq2seq_mfu_measured`` — analytic model FLOPs/s
  over the chip's nominal bf16 MXU peak / over the session's measured
  matmul ceiling;
- ``ctc_samples_per_sec`` (+ mfu pair) — RealtimeRNN CTC train-step
  throughput at the reference's pooled production scale (B=2000 pooled
  trials, T=600 bins -> 147 windows of width 14/stride 4, hidden 512 x
  3, 11 classes; `train_ctc_rnn.py` + `realtime_datamodule.py`
  geometry), the fig_5 headline workload;
- ``realtime_amortized_ms_per_bin`` — streaming decode compute latency
  (SURVEY.md §3.5), the on-device truth;
- ``realtime_p50_dispatch_ms`` / ``realtime_max_dispatch_ms`` — per-step
  latency of a python-dispatched single step INCLUDING the dev tunnel's
  dispatch path (renamed from ``realtime_p50_ms`` in round 5: the number
  varies 1-5 ms across tunnel sessions and is NOT a device-kernel
  latency; compare ``realtime_amortized_ms_per_bin`` across rounds
  instead);
- ``ceiling_tfps_measured`` / ``ceiling_tfps_nominal`` — session matmul
  calibration.

Measurement gotchas (CLAUDE.md): D2H pays ~0.4 s tunnel latency and
``block_until_ready`` can return early, so each section queues several
executions and forces ONE tiny host read at the end.
"""

from __future__ import annotations

import json
import os
import signal
import socket
import subprocess
import sys
import time

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache_tpu")

# fastest-compile-first; ctc before seq2seq (ctc is the fig_5 headline)
SECTIONS = ("calib", "realtime", "alignment", "ctc", "seq2seq")

# Default per-section budgets. Cold Mosaic compiles through the tunnel's
# remote helper run 10-25+ min for the big fused-GRU train programs
# (docs/ROUND2.md) — ctc/seq2seq get whatever the global budget still
# allows, capped here; they complete on a warm cache in well under a
# minute each.
SECTION_BUDGET_S = {
    "calib": 240,
    "realtime": 420,
    "alignment": 600,
    "ctc": 900,
    "seq2seq": 900,
    "sleep": 60,  # test-only section
}

EMIT_RESERVE_S = 10  # always leave time to print the line
MIN_SECTION_S = 45  # don't start a section with less than this left


def _num(x, nd=4):
    return None if x is None else round(float(x), nd)


class Aggregate:
    """Collects section fragments; renders the one output line."""

    def __init__(self):
        self.frag: dict = {}
        self.timed_out: list[str] = []
        self.failed: list[str] = []
        self.skipped: list[str] = []
        self.emitted = False
        self._child = None

    def line(self) -> str:
        f = self.frag
        ceiling = f.get("ceiling_tfps_measured")

        def mfu(tfps_key):
            t = f.get(tfps_key)
            if t is None or not ceiling:
                return None
            return t / ceiling

        out = {
            "metric": "alignment_fits_per_sec",
            "value": _num(f.get("alignment_fits_per_sec"), 3),
            "unit": "fits/s",
            "vs_baseline": _num(f.get("alignment_vs_baseline"), 3),
            "seq2seq_samples_per_sec": _num(
                f.get("seq2seq_samples_per_sec"), 1),
            "seq2seq_mfu": _num(f.get("seq2seq_mfu")),
            "seq2seq_mfu_measured": _num(mfu("seq2seq_model_tfps")),
            "ctc_samples_per_sec": _num(f.get("ctc_samples_per_sec"), 1),
            "ctc_mfu": _num(f.get("ctc_mfu")),
            "ctc_mfu_measured": _num(mfu("ctc_model_tfps")),
            "realtime_amortized_ms_per_bin": _num(
                f.get("realtime_amortized_ms_per_bin")),
            # dispatch-path latency through the dev tunnel, NOT device
            # kernel latency (see module docstring / docs/ROUND3.md)
            "realtime_p50_dispatch_ms": _num(
                f.get("realtime_p50_dispatch_ms")),
            "realtime_max_dispatch_ms": _num(
                f.get("realtime_max_dispatch_ms")),
            "ceiling_tfps_measured": _num(ceiling, 1),
            "ceiling_tfps_nominal": _num(f.get("ceiling_tfps_nominal"), 1),
            "sections_timed_out": self.timed_out,
            "sections_failed": self.failed,
            "sections_skipped": self.skipped,
        }
        return json.dumps(out)

    def emit(self):
        if self.emitted:
            return
        self.emitted = True
        print(self.line(), flush=True)


def _parse_child_json(stdout: str):
    """Last stdout line that parses as a JSON object (warnings and any
    section chatter precede it)."""
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(obj, dict):
                return obj
    return None


def _axon_relay_in_play() -> bool:
    """True only on hosts that actually route jax through the axon relay
    (marked by the .axon_site PYTHONPATH hook). On any other host — a
    directly-attached TPU, a plain dev box — there is no relay to probe
    and a refused TCP connect must not condemn the backend."""
    if os.environ.get("BENCH_AXON_RELAY", "") == "0":
        return False
    return "axon" in os.environ.get("PYTHONPATH", "")


def _tunnel_healthy(budget_s: float = 90.0) -> bool:
    """TCP-probe the axon relay (only where one exists), then run a tiny
    jit in a bounded subprocess. A plain CPU run (JAX_PLATFORMS unset ->
    axon default) hanging here means the relay is wedged (CLAUDE.md)."""
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return True  # test mode: no tunnel in play
    if _axon_relay_in_play():
        try:
            with socket.create_connection(("127.0.0.1", 8083), timeout=3):
                pass
        except OSError:
            return False
    root = os.path.dirname(os.path.abspath(__file__))
    code = (f"import sys; sys.path.insert(0, {root!r}); "
            "import bench; bench._apply_platform_env(); "
            "import jax.numpy as jnp; "
            "x = jnp.ones((128, 128)); "
            "print(float((x @ x)[0, 0]))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=budget_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _run_section(name: str, budget_s: float, agg: Aggregate) -> bool:
    """Run one section subprocess; fold its fragment into agg.
    Returns False when the rest of the run should be abandoned
    (tunnel wedged after a kill)."""
    t0 = time.monotonic()
    # stderr inherits: a crashed section's traceback must reach the
    # driver's log (the artifact contract only needs stdout to be pure)
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--section", name],
        stdout=subprocess.PIPE, text=True,
    )
    agg._child = proc  # visible to the signal handler
    try:
        stdout, _ = proc.communicate(timeout=budget_s)
    except subprocess.TimeoutExpired:
        proc.terminate()  # SIGTERM first: lets a between-ops child exit
        partial = ""
        try:
            partial, _ = proc.communicate(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
            partial, _ = proc.communicate()
        agg.timed_out.append(name)
        # salvage any INTERMEDIATE fragment the section printed before
        # dying (sections emit one after each phase; under a degraded
        # tunnel the realtime section can compute its amortized number
        # and then blow the budget in the dispatch-heavy per-step phase)
        frag = _parse_child_json(partial or "")
        if frag:
            agg.frag.update(frag)
            sys.stderr.write(
                f"bench: salvaged partial fragment from {name}: "
                f"{json.dumps(frag)}\n")
        sys.stderr.write(
            f"bench: section {name} timed out after {budget_s:.0f}s\n")
        # a killed mid-compile client can wedge the relay; verify before
        # spending the remaining budget on sections that would hang
        if not _tunnel_healthy():
            sys.stderr.write("bench: tunnel unhealthy after kill; "
                             "abandoning remaining sections\n")
            return False
        return True
    finally:
        agg._child = None
    if proc.returncode != 0:
        agg.failed.append(name)
        sys.stderr.write(f"bench: section {name} exited rc="
                         f"{proc.returncode}\n")
        # a section crash can mean a crashed TPU worker (e.g. the batched
        # LU repro, CLAUDE.md) — it recovers in ~1-2 min; give the next
        # section a live device instead of a cascading failure
        for attempt in range(3):
            if _tunnel_healthy():
                return True
            if attempt < 2:  # sleep only BETWEEN probes
                sys.stderr.write("bench: tunnel unhealthy after section "
                                 "failure; waiting 60s\n")
                time.sleep(60)
        sys.stderr.write("bench: tunnel still unhealthy; abandoning "
                         "remaining sections\n")
        return False
    frag = _parse_child_json(stdout)
    if frag is None:
        agg.failed.append(name)
        sys.stderr.write(f"bench: section {name} printed no JSON\n")
        return True
    agg.frag.update(frag)
    sys.stderr.write(f"bench: section {name} ok in "
                     f"{time.monotonic() - t0:.0f}s: "
                     f"{json.dumps(frag)}\n")
    return True


def orchestrate() -> int:
    t_start = time.monotonic()
    global_budget = float(os.environ.get("BENCH_GLOBAL_BUDGET_S", "1500"))
    sections = tuple(
        s for s in os.environ.get(
            "BENCH_SECTIONS", ",".join(SECTIONS)).split(",") if s
    )
    agg = Aggregate()
    agg._child = None

    def on_signal(signum, frame):
        child = agg._child
        if child is not None:
            try:
                child.terminate()
            except OSError:
                pass
        agg.emit()
        # bypass finally-blocks: the driver's timeout wants us GONE
        os._exit(0)

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)

    ready = os.environ.get("BENCH_READY_FILE")
    if ready:
        # test hook: interpreter startup is slow here (the site hook
        # pre-imports jax into EVERY python process), so a tester that
        # signals on a timer races the handler installation above;
        # touching this file says the handlers are live
        with open(ready, "w") as f:
            f.write("ready\n")

    try:
        for name in sections:
            remaining = (global_budget - EMIT_RESERVE_S
                         - (time.monotonic() - t_start))
            if remaining < MIN_SECTION_S:
                agg.skipped.append(name)
                continue
            budget = float(os.environ.get(
                f"BENCH_BUDGET_{name.upper()}",
                SECTION_BUDGET_S.get(name, 600)))
            budget = min(budget, remaining)
            if not _run_section(name, budget, agg):
                idx = sections.index(name)
                agg.skipped.extend(sections[idx + 1:])
                break
    finally:
        agg.emit()
    return 0


# ---------------------------------------------------------------------------
# sections (child processes)
# ---------------------------------------------------------------------------


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


def _chip_peak():
    """Per-chip NOMINAL matmul peak FLOP/s (bf16-class MXU passes — the
    precision the NN stack actually runs at under JAX's default)."""
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


def section_calib():
    """Session matmul ceiling: best-of-N timed big bf16 matmuls.

    The axon tunnel shows >1.4x session-to-session throughput variance
    on the IDENTICAL program (docs/ROUND3.md:58-61); nominal-peak MFU is
    therefore not comparable across driver rounds. This measured ceiling
    is the denominator for the ``*_mfu_measured`` keys.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = int(os.environ.get("BENCH_CALIB_N", "8192"))
    reps = 8

    @jax.jit
    def chain(a, b):
        # a few dependent matmuls so the timed region is pure MXU work
        for _ in range(4):
            a = (a @ b).astype(jnp.bfloat16)
        return a

    key = jax.random.key(0)
    a = jax.random.normal(key, (n, n), jnp.bfloat16)
    b = jax.random.normal(jax.random.key(1), (n, n), jnp.bfloat16)
    out = _with_compile_retry(chain, a, b)
    _ = float(out[0, 0])  # real scalar read: full warmup sync (CLAUDE.md)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = chain(a, b)
        for _ in range(reps - 1):
            o = chain(o, b)
        _ = float(o[0, 0])
        best = min(best, time.perf_counter() - t0)
    flops = 2 * n * n * n * 4 * reps
    return {
        "ceiling_tfps_measured": flops / best / 1e12,
        "ceiling_tfps_nominal": _chip_peak() / 1e12,
    }


def section_realtime():
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        run_realtime_sim,
    )
    from cross_patient_speech_decoding_tpu.utils.config import (
        RealtimeSimConfig,
    )

    # amortized phase first, and PRINT it as an intermediate fragment:
    # the per-step phase below is dispatch-heavy (7x200 python-dispatched
    # steps) and under a degraded tunnel can blow the section budget —
    # the parent salvages the last JSON line from a killed section
    res_a = run_realtime_sim(RealtimeSimConfig(per_step_samples=0),
                             verbose=False)
    print(json.dumps(
        {"realtime_amortized_ms_per_bin": res_a["amortized_ms"]}),
        flush=True)

    res = run_realtime_sim(
        RealtimeSimConfig(per_step_samples=7, per_step_chain=200),
        verbose=False,
    )
    return {
        "realtime_amortized_ms_per_bin": res["amortized_ms"],
        "realtime_p50_dispatch_ms": res["p50_ms"],
        # 7 samples is not a p99; report the observed max honestly
        "realtime_max_dispatch_ms": res["max_ms"],
    }


def _numpy_oracle_fit(X_a, X_b, y_a, y_b):
    """Reference-math CCA fit (cnd-avg -> QR -> SVD -> pinv products)."""
    import numpy as np

    classes = np.unique(y_a)
    La = np.stack([X_a[y_a == c].mean(0) for c in classes]).reshape(
        -1, X_a.shape[-1])
    Lb = np.stack([X_b[y_b == c].mean(0) for c in classes]).reshape(
        -1, X_b.shape[-1])
    La = La - La.mean(0)
    Lb = Lb - Lb.mean(0)
    d = min(np.linalg.matrix_rank(La.T), np.linalg.matrix_rank(Lb.T))
    qa, ra = np.linalg.qr(La)
    qb, rb = np.linalg.qr(Lb)
    u, s, vt = np.linalg.svd(qa.T @ qb)
    ma = np.linalg.pinv(ra) @ u[:, :d]
    mb = np.linalg.pinv(rb) @ vt.T[:, :d]
    return mb @ np.linalg.pinv(ma)


def section_alignment():
    import jax
    import jax.numpy as jnp
    import numpy as np

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
    fit = jax.jit(lambda xa, xb, ya, yb: fit_cca_aligner(
        xa, xb, ya, yb, C, t_len=T))

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
    return {
        "alignment_fits_per_sec": fits_per_sec,
        "alignment_vs_baseline": fits_per_sec * min(times_base),
    }


def _seq2seq_flops_per_step(B, T, C, F, H, K, L, n_cls):
    """Analytic model FLOPs for one train step (fwd + ~2x bwd)."""
    Tc = T - K + 1  # VALID conv shrink
    conv = 2 * B * Tc * K * C * F
    enc = 2 * (2 * B * Tc * F * 3 * H + 2 * B * Tc * H * 3 * H)  # bidir
    dec = L * (2 * B * H * 3 * H * 2 + 2 * B * H * n_cls)
    return 3 * (conv + enc + dec)


def _ctc_flops_per_step(B, T, C, H, NL, n_cls, win, stride):
    """Analytic model FLOPs for one RealtimeRNN train step (fwd + ~2x
    bwd): windowed layer-0 input projection + stacked recurrences +
    dense head. CTC loss itself is excluded (measured ~5% of the step)."""
    n_win = (T - win) // stride + 1
    l0 = 2 * B * n_win * (win * C) * 3 * H
    rest = (NL - 1) * 2 * B * n_win * H * 3 * H
    rec = NL * 2 * B * n_win * H * 3 * H
    head = 2 * B * n_win * H * n_cls
    return 3 * (l0 + rest + rec + head)


def section_seq2seq():
    import jax
    import jax.numpy as jnp
    import numpy as np

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
    return {
        "seq2seq_samples_per_sec": B / dt,
        "seq2seq_mfu": (flops / dt) / _chip_peak(),
        "seq2seq_model_tfps": flops / dt / 1e12,
    }


def section_ctc():
    """CTC train-step throughput at the reference's pooled production
    scale (the fig_5 experiment regime: ~2000 pooled-aligned trials of
    600 bins / ~60 latent channels after PCA+CCA, hidden 512 x 3, labels
    2 sil + 3 phon + 2 sil, `scripts/train_ctc_rnn.py` geometry)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

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
    flops = _ctc_flops_per_step(B, T, C, H, NL, 11, 14, 4)
    return {
        "ctc_samples_per_sec": B / dt,
        "ctc_mfu": (flops / dt) / _chip_peak(),
        "ctc_model_tfps": flops / dt / 1e12,
    }


def section_sleep():
    """Test-only: simulates a section stuck in a cold compile (with
    BENCH_TEST_PARTIAL=1, one that emitted an intermediate fragment
    first, like the realtime section's amortized phase)."""
    if os.environ.get("BENCH_TEST_PARTIAL"):
        # a RENDERED key, so the salvage is observable in the final line
        print(json.dumps({"realtime_amortized_ms_per_bin": 1.5}),
              flush=True)
    time.sleep(float(os.environ.get("BENCH_TEST_SLEEP_S", "120")))
    return {"slept": True}


def _apply_platform_env():
    """Honor JAX_PLATFORMS=cpu in-process. The site hook pre-imports jax
    before user code, so the env var alone does not reliably switch the
    backend here (CLAUDE.md); config.update before first device access
    does."""
    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")


def run_child(name: str) -> int:
    if name != "sleep":
        import jax

        _apply_platform_env()
        # persistent kernel cache: the fused-GRU train step is a
        # multi-Mosaic-kernel program whose cold compile through the
        # tunnel helper takes minutes; warm runs load from disk
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    fn = globals().get(f"section_{name}")
    if fn is None:
        sys.stderr.write(f"bench: unknown section {name}\n")
        return 2
    frag = fn()
    print(json.dumps(frag), flush=True)
    return 0


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    # importable regardless of the caller's cwd (children re-exec this
    # file; tools/ and the package live next to it)
    root = os.path.dirname(os.path.abspath(__file__))
    if root not in sys.path:
        sys.path.insert(0, root)
    if argv and argv[0] in ("--section", "--probe"):
        if len(argv) < 2:
            # a typo'd flag must NOT fall through to the full ~25-minute
            # five-section benchmark run
            sys.stderr.write(f"usage: bench.py {argv[0]} <name>\n")
            return 2
        if argv[0] == "--section":
            return run_child(argv[1])
        from tools import probes

        return probes.run(argv[1], argv[2:])
    if argv:
        sys.stderr.write(f"unknown arguments {argv!r}; "
                         "run with no arguments, --section <name>, or "
                         "--probe <name>\n")
        return 2
    return orchestrate()


if __name__ == "__main__":
    sys.exit(main())
