"""Same-session A/B: CTC model fwd+bwd with vs without the layer-0 dx.

input_grad=False (new RealtimeRNN default) skips the first Pallas GRU
layer's dx matmul and its (T, B, win*C) f32 output stream in the
backward — at this scale dx_1 is ~988 MB of HBM writes plus
2*B*n_win*3Hp*840 ~ 0.76 TFLOP of pure waste (x is data; the cotangent
has no consumer, but a pallas_call output cannot be DCE'd by XLA).

Arms share the process/session; arm A forces input_grad=True through a
gru_layer wrapper, arm B is the new default.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

import cross_patient_speech_decoding_tpu.ops.pallas_gru as pg
from cross_patient_speech_decoding_tpu.models import RealtimeRNN
from cross_patient_speech_decoding_tpu.train import (
    create_train_state,
    make_ctc_train_step,
)
from cross_patient_speech_decoding_tpu.train.loops import make_optimizer

B, T, C, H, NL = 2000, 600, 60, 512, 3
L = 7
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
params = variables["params"]
key = jax.random.key(3)


def timeit(fn, n=10):
    out = fn()
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    return (time.perf_counter() - t0) / n


def loss_sq(p, xx):
    logits = model.apply({"params": p}, xx, False, rngs={"dropout": key})
    return jnp.mean(logits * logits)


_orig = pg.gru_layer


def _forced(*a, **kw):
    kw["input_grad"] = True
    return _orig(*a, **kw)


# arm A: old behavior (dx computed + written for all layers)
pg.gru_layer = _forced
g_a = jax.jit(jax.grad(loss_sq))
t_a = timeit(lambda: g_a(params, x))
print(f"A fwd+bwd input_grad=True : {t_a*1e3:.2f} ms", flush=True)

# arm B: new default (layer 0 skips dx)
pg.gru_layer = _orig
g_b = jax.jit(jax.grad(lambda p, xx: loss_sq(p, xx) + 0.0))
t_b = timeit(lambda: g_b(params, x))
print(f"B fwd+bwd input_grad=False: {t_b*1e3:.2f} ms", flush=True)
print(f"delta: {(t_a-t_b)*1e3:.2f} ms ({(t_a/t_b-1)*100:.1f}% faster)",
      flush=True)

# grad parity between arms (device-side compare, one scalar download)
ga = g_a(params, x)
gb = g_b(params, x)
err = jax.tree_util.tree_map(
    lambda a, b: jnp.max(jnp.abs(a - b)), ga, gb)
print("max param-grad |A-B|:",
      float(max(jax.tree_util.tree_leaves(err))), flush=True)

# full train step at the bench shape with the new default
tx = make_optimizer(1e-3, 1e-5, 100)
state = create_train_state(model, variables, tx)
step = jax.jit(make_ctc_train_step(model, tx))
batch = (x, y, il, ll)
t_full = timeit(lambda: step(state, batch, key)[1]["loss"])
print(f"full train step (new): {t_full*1e3:.2f} ms "
      f"({B/t_full:.0f} samples/s)", flush=True)
