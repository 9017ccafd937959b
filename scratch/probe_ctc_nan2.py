"""Locate the NaN source in the refscale iteration-0 CTC prep."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

from cross_patient_speech_decoding_tpu.cli import experiments as E
from cross_patient_speech_decoding_tpu.data.splits import train_val_test_masks
from cross_patient_speech_decoding_tpu.utils.config import TrainCTCConfig

cfg = TrainCTCConfig(
    hidden=512, n_layers=3, synth_patients=8, synth_trials=250,
    synth_T=600, epochs=300, n_iter=2, seed=0, out="",
)

it = 0
rng = np.random.default_rng(cfg.seed + 7919 * it)
n_tar = E._synthetic_ctc_n_trials(cfg)
tr, va, te = train_val_test_masks(n_tar, rng, cfg.val_frac, cfg.test_frac)
datasets, C, test = E._prep_ctc_context(cfg, rng, tar_train_mask=tr)
print("n_tar", n_tar, "train rows", int(tr.sum()), flush=True)
for i, d in enumerate(datasets):
    X = np.asarray(d[0])
    nan_rows = np.unique(np.where(~np.isfinite(X))[0])
    print(f"dataset {i}: X{X.shape} finite={np.isfinite(X).all()} "
          f"nan_rows={len(nan_rows)}", flush=True)

# label (class) coverage of the train mask: the alignment classes are
# encoded label sequences — check whether every class present overall
# has at least one TRAIN row
y = np.asarray(datasets[0][1])
keys = [tuple(r) for r in y]
uniq = sorted(set(keys))
tr_keys = {k for k, m in zip(keys, tr) if m > 0}
missing = [k for k in uniq if k not in tr_keys]
print(f"target classes: {len(uniq)} total, {len(missing)} with zero train "
      f"rows: {missing[:10]}", flush=True)
