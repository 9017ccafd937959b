"""Same-session stage probe of the seq2seq train step at bench shape.

Times (ratios-only discipline, CLAUDE.md session-variance note):
  A. full train step (the bench program)
  B. conv-block-only train step (TemporalConv fwd+bwd+update-free grad)
  C. conv+encoder train step (grad of mean(enc_hidden^2))
  D. full forward only (no grad)
Each section queues N executions and forces one tiny scalar read.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

from cross_patient_speech_decoding_tpu.models import Seq2SeqRNN
from cross_patient_speech_decoding_tpu.models.layers import TemporalConv, StackedRNN
from cross_patient_speech_decoding_tpu.train import (
    create_train_state,
    make_seq2seq_train_step,
)
from cross_patient_speech_decoding_tpu.train.loops import make_optimizer
import flax.linen as nn

B, T, C, F, H, K, L, n_cls = 1000, 200, 30, 100, 500, 10, 3, 9
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
y = jnp.asarray(rng.integers(0, n_cls, (B, L)).astype(np.int32))


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    # force real completion: tiny scalar read
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    return (time.perf_counter() - t0) / n


# ---- A. full train step
model = Seq2SeqRNN(n_filters=F, hidden=H, num_classes=n_cls)
variables = model.init(
    {"params": jax.random.key(0), "tf": jax.random.key(1),
     "dropout": jax.random.key(2)}, x, y, 0.5, False)
tx = make_optimizer(1e-3, 1e-5, 100)
state = create_train_state(model, variables, tx)
step = jax.jit(make_seq2seq_train_step(model, tx))
key = jax.random.key(3)


def full_step(s):
    s2, m = step(s, (x, y), key)
    return m["loss"]


t_full = timeit(lambda: full_step(state))
print(f"A full train step: {t_full*1e3:.2f} ms")

# ---- D. full forward only (train mode, no grad)
fwd = jax.jit(lambda v, xx, yy: model.apply(
    v, xx, yy, 0.5, False,
    rngs={"tf": key, "dropout": key},
    mutable=["batch_stats"])[0].sum())
t_fwd = timeit(lambda: fwd(variables, x, y))
print(f"D full fwd only:  {t_fwd*1e3:.2f} ms")


# ---- B. conv-only grad
conv = TemporalConv(F, K, 1)
cvars = conv.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, False)


def conv_loss(params, xx):
    out, _ = conv.apply({"params": params, "batch_stats": cvars["batch_stats"]},
                        xx, False, rngs={"dropout": key},
                        mutable=["batch_stats"])
    return jnp.mean(out * out)


conv_grad = jax.jit(jax.grad(conv_loss))
t_conv = timeit(lambda: conv_grad(cvars["params"], x))
print(f"B conv fwd+bwd:   {t_conv*1e3:.2f} ms")


# ---- C. conv + encoder grad (bidir GRU)
class ConvEnc(nn.Module):
    @nn.compact
    def __call__(self, xx):
        h = TemporalConv(F, K, 1)(xx, deterministic=False)
        out, lasts = StackedRNN(H, 1, dropout=0.3, bidirectional=True)(
            h, deterministic=False)
        return lasts[-2] + lasts[-1]


ce = ConvEnc()
cevars = ce.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x)


def ce_loss(params, xx):
    out, _ = ce.apply({"params": params, "batch_stats": cevars["batch_stats"]},
                      xx, rngs={"dropout": key}, mutable=["batch_stats"])
    return jnp.mean(out * out)


ce_grad = jax.jit(jax.grad(ce_loss))
t_ce = timeit(lambda: ce_grad(cevars["params"], x))
print(f"C conv+enc f+b:   {t_ce*1e3:.2f} ms")

print(f"\nimplied encoder f+b: {(t_ce-t_conv)*1e3:.2f} ms")
print(f"implied decoder+loss+opt (A - C): {(t_full-t_ce)*1e3:.2f} ms")
