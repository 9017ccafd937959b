"""Training loops: epoch iteration, best-checkpoint tracking, Orbax persistence.

Replaces the reference's Lightning ``Trainer(max_epochs, gradient_clip_val,
ModelCheckpoint(monitor=...))`` usage (`scripts/train_ctc_rnn.py:184-216`,
`scripts/train_seq2seq.py:171-187`) with an explicit loop over jitted steps.
Data stays device-resident for the whole run (full-batch or large-batch
regimes per the reference's batch_size=5000); the best state by the monitored
metric is kept in memory and optionally persisted with Orbax.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cross_patient_speech_decoding_tpu.train.state import TrainState


@dataclass
class FitResult:
    best_state: TrainState
    best_metric: float
    best_epoch: int
    history: list = field(default_factory=list)


def make_optimizer(lr: float, weight_decay: float, decay_steps: int,
                   end_factor: float = 0.0, clip: float | None = None):
    """AdamW + linear LR decay (+ optional grad clipping) — the reference's
    optimizer recipe (realtime_nn_model.py:287-304, models.py:368-383,
    Trainer(gradient_clip_val=0.5))."""
    sched = optax.linear_schedule(lr, lr * end_factor, decay_steps)
    tx = optax.adamw(sched, weight_decay=weight_decay)
    if clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx


def _batches(n: int, batch_size: int | None, rng: np.random.Generator):
    if batch_size is None or batch_size >= n:
        yield np.arange(n)
        return
    perm = rng.permutation(n)
    for i in range(0, n, batch_size):
        chunk = perm[i : i + batch_size]
        if len(chunk) < batch_size:
            # keep ONE compiled train-step shape: a ragged final batch
            # would trigger a second full XLA compile (minutes cold on
            # the tunneled TPU, doubling the cache footprint). Pad by
            # wrapping the same epoch's permutation — every sample still
            # trains each epoch; the first few train twice that epoch.
            chunk = np.concatenate([chunk, perm[: batch_size - len(chunk)]])
        yield chunk


def fit(
    state: TrainState,
    train_step: Callable,
    eval_step: Callable,
    train_batch,
    val_batch,
    *,
    epochs: int,
    key: jax.Array,
    monitor: str = "loss",
    mode: str = "min",
    batch_size: int | None = None,
    eval_every: int = 1,
    seed: int = 0,
    verbose: bool = False,
    log_path: str | None = None,
    log_format: str = "csv",
) -> FitResult:
    """Train with best-checkpoint tracking on the monitored val metric.

    train_batch/val_batch are tuples of device arrays with dim 0 = samples;
    mini-batching (if requested) gathers index subsets on device.
    """
    # don't re-wrap callers' already-jitted steps: a fresh jax.jit wrapper
    # per fit() call has an empty trace cache, so drivers calling fit in a
    # loop would re-trace the full program every iteration
    if not isinstance(train_step, jax.stages.Wrapped):
        train_step = jax.jit(train_step)
    if not isinstance(eval_step, jax.stages.Wrapped):
        eval_step = jax.jit(eval_step)
    sign = 1.0 if mode == "min" else -1.0
    best = math.inf
    best_state = state
    best_epoch = -1
    history = []
    host_rng = np.random.default_rng(seed)
    n = int(train_batch[0].shape[0])

    for epoch in range(epochs):
        for idx in _batches(n, batch_size, host_rng):
            mb = tuple(a[jnp.asarray(idx)] for a in train_batch) if (
                batch_size is not None and batch_size < n
            ) else train_batch
            key, sub = jax.random.split(key)
            state, train_metrics = train_step(state, mb, sub)

        if (epoch + 1) % eval_every == 0 or epoch == epochs - 1:
            val_metrics = eval_step(state, val_batch)
            m = float(val_metrics[monitor])
            rec = {"epoch": epoch, **{k: float(v) for k, v in val_metrics.items()}}
            history.append(rec)
            if log_path:
                append_metrics(log_path, rec, log_format)
            if sign * m < best:
                best = sign * m
                best_state = state
                best_epoch = epoch
            if verbose:
                print(f"epoch {epoch}: " + ", ".join(
                    f"{k}={float(v):.4f}" for k, v in val_metrics.items()
                ), flush=True)

    return FitResult(best_state, sign * best, best_epoch, history)


def _append_csv(path: str, rec: dict):
    """Append one metrics row; header on first write (TensorBoard-lite —
    the reference logs via TensorBoardLogger, train_ctc_rnn.py:235-261)."""
    import csv
    import pathlib

    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    new = not p.exists()
    with open(p, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rec.keys()))
        if new:
            w.writeheader()
        w.writerow(rec)


def append_metrics(path: str, rec: dict, fmt: str = "csv"):
    """Write one per-epoch metrics record in the configured live-log
    format (drivers' ``log_format`` knob):

    - ``csv``: appendable file, one row per eval (offline analysis).
    - ``jsonl``: one JSON object per line — tailable during a TPU run
      (``tail -f logs/<run>/iter000.jsonl | jq .per``).
    - ``tb``: TensorBoard event files; ``path`` is the run DIRECTORY and
      a live ``tensorboard --logdir logs/`` shows the reference-style
      context-encoded runs (train_ctc_rnn.py:235-261 workflow).
    """
    if fmt == "csv":
        _append_csv(path, rec)
    elif fmt == "jsonl":
        import json
        import pathlib

        p = pathlib.Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        with open(p, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
    elif fmt == "tb":
        from cross_patient_speech_decoding_tpu.utils.tb_events import (
            tb_writer,
        )

        step = int(rec.get("epoch", 0))
        scalars = {k: v for k, v in rec.items()
                   if k != "epoch" and isinstance(v, (int, float))}
        tb_writer(path).add_scalars(step, scalars)
    else:
        raise ValueError(f"unknown log_format {fmt!r} (csv|jsonl|tb)")


# ------------------------------------------------------------- checkpoint ----

def save_checkpoint(path: str, state: TrainState, metadata: dict | None = None):
    """Persist a TrainState with Orbax (self-describing, like the
    reference's save_hyperparameters'd Lightning checkpoints)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    if metadata:
        import json, pathlib

        pathlib.Path(str(path) + ".meta.json").write_text(json.dumps(metadata))
    ckptr.wait_until_finished()


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)
