"""Same-session A/B: bf16 vs f32 windowed-input stream (CTC layer 0).

With input_grad=False the layer-0 stream is write-once/read-twice
(~988 MB f32 at production scale). DEFAULT MXU precision truncates
matmul operands to bf16 regardless, so a bf16 stream should be
bit-identical math at half the traffic. Arm A forces f32 (pre-change),
arm B is the new default (FusedGRU casts data inputs to bf16).
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

B, T, C, H, NL = 2000, 600, 60, 512, 3
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
key = jax.random.key(3)

model = RealtimeRNN(hidden=H, n_layers=NL, n_classes=11, dropout=0.3,
                    win_size=14, stride=4)
variables = model.init(
    {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, False)
params = variables["params"]


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


def _forced_f32(xx, *a, **kw):
    return _orig(xx.astype(jnp.float32), *a, **kw)


# arm A: force the f32 stream (undo FusedGRU's bf16 cast at the op rim)
pg.gru_layer = _forced_f32
g_a = jax.jit(jax.grad(loss_sq))
t_a = timeit(lambda: g_a(params, x))
print(f"A fwd+bwd f32 x_win : {t_a*1e3:.2f} ms", flush=True)

# arm B: new default (bf16 data stream)
pg.gru_layer = _orig
g_b = jax.jit(jax.grad(lambda p, xx: loss_sq(p, xx) + 0.0))
t_b = timeit(lambda: g_b(params, x))
print(f"B fwd+bwd bf16 x_win: {t_b*1e3:.2f} ms", flush=True)
print(f"delta: {(t_a-t_b)*1e3:.2f} ms ({(t_a/t_b-1)*100:.1f}% faster)",
      flush=True)

ga = g_a(params, x)
gb = g_b(params, x)
err = jax.tree_util.tree_map(lambda a, b: jnp.max(jnp.abs(a - b)), ga, gb)
print("max param-grad |A-B|:",
      float(max(jax.tree_util.tree_leaves(err))), flush=True)
