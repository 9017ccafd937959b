"""Reproduce the refscale train-ctc iteration-0 NaN with diagnostics.

Mirrors run_train_ctc's iteration-0 path bit-for-bit (same rng/masks/
init keys) but steps the cached train program manually, checking after
every epoch whether (a) the returned loss and (b) the post-update params
are finite — distinguishing "update injected NaN" (grads/optimizer) from
"forward NaN from finite params".
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

from cross_patient_speech_decoding_tpu.cli import experiments as E
from cross_patient_speech_decoding_tpu.data.splits import train_val_test_masks
from cross_patient_speech_decoding_tpu.models import RealtimeRNN
from cross_patient_speech_decoding_tpu.train import (
    create_train_state,
    make_ctc_eval_step,
    make_ctc_train_step,
)
from cross_patient_speech_decoding_tpu.train.loops import make_optimizer
from cross_patient_speech_decoding_tpu.utils.config import TrainCTCConfig

cfg = TrainCTCConfig(
    hidden=512, n_layers=3, synth_patients=8, synth_trials=250,
    synth_T=600, epochs=300, n_iter=2, seed=0, out="",
)

t0 = time.time()
it = 0
rng = np.random.default_rng(cfg.seed + 7919 * it)
n_tar = E._synthetic_ctc_n_trials(cfg)
tr, va, te = train_val_test_masks(n_tar, rng, cfg.val_frac, cfg.test_frac)
datasets, C, test = E._prep_ctc_context(cfg, rng, tar_train_mask=tr)
print(f"prep done {time.time()-t0:.1f}s, C={C}", flush=True)

X_t, y_t, il_t, ll_t = datasets[0]
tr_i, va_i = np.where(tr > 0)[0], np.where(va > 0)[0]
Xs = [X_t[tr_i]] + [d[0] for d in datasets[1:]]
ys = [y_t[tr_i]] + [d[1] for d in datasets[1:]]
ils = [il_t[tr_i]] + [d[2] for d in datasets[1:]]
lls = [ll_t[tr_i]] + [d[3] for d in datasets[1:]]
train_batch = (
    jnp.concatenate([jnp.asarray(x) for x in Xs]),
    jnp.asarray(np.concatenate(ys)),
    jnp.asarray(np.concatenate(ils)),
    jnp.asarray(np.concatenate(lls)),
)
val_batch = (
    jnp.asarray(X_t[va_i]), jnp.asarray(y_t[va_i]),
    jnp.asarray(il_t[va_i]), jnp.asarray(ll_t[va_i]),
)
print(f"train B={train_batch[0].shape}, val B={val_batch[0].shape}", flush=True)

model = RealtimeRNN(
    hidden=cfg.hidden, n_layers=cfg.n_layers, n_classes=11,
    dropout=cfg.dropout, win_size=cfg.win_size, stride=cfg.stride,
)
tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.decay_steps, clip=cfg.clip)
train_step = jax.jit(make_ctc_train_step(model, tx))
eval_step = jax.jit(make_ctc_eval_step(model))

variables = model.init(jax.random.key(cfg.seed + it), train_batch[0][:1])
state = create_train_state(model, variables, tx)

finite_chk = jax.jit(
    lambda p: (
        jnp.asarray([jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(p)]).all(),
        sum(jnp.sum(x.astype(jnp.float64) ** 2) if x.dtype == jnp.float64
            else jnp.sum(x * x) for x in jax.tree.leaves(p)) ** 0.5,
    )
)

key = jax.random.key(cfg.seed + 1000 + it)
prev_state = state
for epoch in range(20):
    key, sub = jax.random.split(key)
    new_state, m = train_step(state, train_batch, sub)
    loss = float(m["loss"])  # loss at PRE-update params of this step
    pfin, pnorm = finite_chk(new_state.params)
    pfin, pnorm = bool(pfin), float(pnorm)
    print(f"epoch {epoch}: loss(pre-update)={loss:.6f} "
          f"params_finite_after={pfin} pnorm={pnorm:.3f} "
          f"[{time.time()-t0:.1f}s]", flush=True)
    if not np.isfinite(loss):
        ppfin, _ = finite_chk(state.params)
        print(f"  -> loss NaN; pre-step params finite={bool(ppfin)}", flush=True)
        break
    if not pfin:
        print("  -> params went non-finite AFTER this update "
              "(finite loss, bad grads/optimizer overflow)", flush=True)
        # which leaves?
        bad = [
            (jax.tree_util.keystr(kp), str(x.shape))
            for kp, x in jax.tree_util.tree_leaves_with_path(new_state.params)
            if not bool(jnp.all(jnp.isfinite(x)))
        ]
        print("  bad leaves:", bad[:10], flush=True)
        break
    prev_state = state
    state = new_state
print("done", flush=True)
