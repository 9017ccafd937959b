"""Forward-logits parity: f32 vs bf16 layer-0 input stream, on TPU.

The earlier bf16 A/B (probe_bf16_xwin.py) compared arms that BOTH saw
bf16-rounded data (the wrapper sat downstream of FusedGRU's cast), so
its 0.0 grad delta could not detect a difference between astype's RNE
rounding and the MXU's implicit DEFAULT-precision operand conversion.
This probe compares the genuine pre-change numerics (input_grad=True:
f32 stream straight into the kernel, MXU converts implicitly) against
the new path (input_grad=False: bf16 stream, VMEM upcast, MXU converts
the same values back). Forward only — dx skipping cannot affect it.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

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
d = jnp.max(jnp.abs(lg_f32 - lg_bf16))
scale = jnp.max(jnp.abs(lg_f32))
print("max |logit delta|:", float(d), " max |logit|:", float(scale),
      flush=True)
