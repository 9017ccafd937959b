"""Probe: is vmap(gru_layer) over per-fold weights correct in interpret
mode, and does the batching rule produce ONE kernel launch (prepended
grid dim) rather than a python loop?

Run on CPU: python scratch/probe_vmap_pallas_gru.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from cross_patient_speech_decoding_tpu.ops.pallas_gru import (
    gru_layer,
    gru_layer_reference,
)


def main():
    rng = np.random.default_rng(0)
    E, T, B, F, H = 3, 9, 16, 12, 20
    x = jnp.asarray(rng.normal(size=(E, T, B, F)), jnp.float32)
    h0 = jnp.asarray(rng.normal(size=(E, B, H)), jnp.float32)
    wi = jnp.asarray(rng.normal(size=(E, F, 3 * H)) * 0.3, jnp.float32)
    bi = jnp.asarray(rng.normal(size=(E, 3 * H)) * 0.1, jnp.float32)
    wh = jnp.asarray(rng.normal(size=(E, H, 3 * H)) * 0.3, jnp.float32)
    bh = jnp.asarray(rng.normal(size=(E, 3 * H)) * 0.1, jnp.float32)

    for reverse in (False, True):
        f = jax.vmap(lambda *a: gru_layer(*a, reverse=reverse))
        g = jax.vmap(lambda *a: gru_layer_reference(*a, reverse=reverse))
        out_k = f(x, h0, wi, bi, wh, bh)
        out_s = g(x, h0, wi, bi, wh, bh)
        err = float(jnp.max(jnp.abs(out_k - out_s)))
        print(f"fwd reverse={reverse}: max err {err:.2e}")
        assert err < 1e-5

        def loss_k(*a):
            return jnp.sum(jnp.sin(f(*a)))

        def loss_s(*a):
            return jnp.sum(jnp.sin(g(*a)))

        gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4, 5))(x, h0, wi, bi, wh, bh)
        gs = jax.grad(loss_s, argnums=(0, 1, 2, 3, 4, 5))(x, h0, wi, bi, wh, bh)
        for name, a, b in zip("x h0 wi bi wh bh".split(), gk, gs):
            e = float(jnp.max(jnp.abs(a - b)))
            rel = e / (float(jnp.max(jnp.abs(b))) + 1e-12)
            print(f"  grad {name}: max abs {e:.2e} rel {rel:.2e}")
            assert rel < 1e-4, name

    # how does the batching rule lower? count pallas_call instances
    hlo = jax.jit(
        jax.vmap(lambda *a: gru_layer(*a))
    ).lower(x, h0, wi, bi, wh, bh).as_text()
    import re

    calls = len(re.findall(r"custom_call|pallas", hlo))
    print("lowered text pallas/custom_call mentions:", calls)
    print("OK")


if __name__ == "__main__":
    main()
