"""Same-session stage probe of the CTC train step at production scale.

Reference pooled-aligned regime: ~2000 pooled trials, 600 time bins
(tw [0.5, 3.5] @ 200 Hz), ~60 latent channels, win 14 / stride 4 ->
n_win = 147, hidden 512 x 3 layers, 11 classes, labels 3 phonemes +
2 sil each side.

Times: A full train step; B model fwd only; C fwd+bwd without the CTC
loss (quadratic surrogate on logits); D CTC loss alone fwd+bwd.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

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

B, T, C, H, NL = 2000, 600, 60, 512, 3
L = 7  # 2 sil + 3 phon + 2 sil
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
y = np.concatenate([
    np.full((B, 2), 10), rng.integers(1, 10, (B, 3)), np.full((B, 2), 10)
], axis=1).astype(np.int32)
y = jnp.asarray(y)
il = jnp.full((B,), T, jnp.int32)
ll = jnp.full((B,), L, jnp.int32)

model = RealtimeRNN(hidden=H, n_layers=NL, n_classes=11, dropout=0.3,
                    win_size=14, stride=4)
variables = model.init(
    {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, False)
tx = make_optimizer(1e-3, 1e-5, 100)
state = create_train_state(model, variables, tx)
step = jax.jit(make_ctc_train_step(model, tx))
key = jax.random.key(3)


def timeit(fn, n=10):
    out = fn()
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    return (time.perf_counter() - t0) / n


batch = (x, y, il, ll)
t_full = timeit(lambda: step(state, batch, key)[1]["loss"])
print(f"A full train step: {t_full*1e3:.2f} ms  ({B/t_full:.0f} samples/s)")

fwd = jax.jit(lambda p, xx: model.apply(
    {"params": p}, xx, False, rngs={"dropout": key}).sum())
t_fwd = timeit(lambda: fwd(state.params, x))
print(f"B model fwd only:  {t_fwd*1e3:.2f} ms")

in_adj = adjusted_input_lengths(il, model.win_size, model.stride)


def loss_sq(p, xx):
    logits = model.apply({"params": p}, xx, False, rngs={"dropout": key})
    return jnp.mean(logits * logits)


g_sq = jax.jit(jax.grad(loss_sq))
t_sq = timeit(lambda: g_sq(state.params, x))
print(f"C fwd+bwd (sq loss, no CTC): {t_sq*1e3:.2f} ms")

logits = jax.jit(lambda p, xx: model.apply(
    {"params": p}, xx, False, rngs={"dropout": key}))(state.params, x)
logits = jax.block_until_ready(logits)


def ctc_only(lg):
    return ctc_loss_mean(lg, in_adj, y, ll, model.blank)


g_ctc = jax.jit(jax.grad(ctc_only))
t_ctc = timeit(lambda: g_ctc(logits))
print(f"D CTC loss alone fwd+bwd: {t_ctc*1e3:.2f} ms")

print(f"\nimplied: model f+b {t_sq*1e3:.1f} | ctc {t_ctc*1e3:.1f} | "
      f"opt+rest {(t_full-t_sq-t_ctc)*1e3:.1f} ms")
