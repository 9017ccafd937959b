"""Where do ~8 fixed minutes go in a reference-scale train-ctc iteration?

Stages: import, synthetic datagen, pooled prep (PCA+CCA), split/batch
assembly, model init, 5 epochs, eval. Run on the real TPU."""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np

T0 = time.time()


def mark(name, t0):
    print(f"{name}: {time.time() - t0:.1f}s", flush=True)
    return time.time()


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cross_patient_speech_decoding_tpu.cli.experiments import (  # noqa: E402
    _prep_ctc_context,
    _synthetic_ctc_cfg,
)
from cross_patient_speech_decoding_tpu.utils.config import TrainCTCConfig  # noqa: E402

t = mark("imports", T0)

cfg = TrainCTCConfig(context="aligned", synth_patients=8, synth_trials=250,
                     synth_T=600, hidden=512, n_layers=3)

pts = _synthetic_ctc_cfg(cfg)
jax.block_until_ready(pts[0][0])
_ = float(np.asarray(pts[0][0][0, 0, 0]))
t = mark("datagen (8 pts, 243x600xC)", t)

rng = np.random.default_rng(0)
mask = np.ones(243, np.float32)
mask[200:] = 0.0
out, nf, _test = _prep_ctc_context(cfg, rng, tar_train_mask=mask)
jax.block_until_ready(out[-1][0])
_ = float(np.asarray(out[-1][0][0, 0, 0]))
t = mark("prep COLD (8 PCA + 7 CCA, leak-free; incl. compiles)", t)

# steady state: iterations 2..50 re-prep with a fresh mask but hit the
# jit shape cache — this is the real per-iteration prep cost
mask2 = np.ones(243, np.float32)
mask2[:43] = 0.0
out, nf, _test = _prep_ctc_context(cfg, rng, tar_train_mask=mask2)
jax.block_until_ready(out[-1][0])
_ = float(np.asarray(out[-1][0][0, 0, 0]))
t = mark("prep WARM (fresh mask, cached programs)", t)

X_pool = jnp.concatenate([d[0] for d in out])
y_pool = np.concatenate([d[1] for d in out])
_ = float(np.asarray(X_pool[0, 0, 0]))
t = mark("pool concat", t)
print("pooled", X_pool.shape, flush=True)
