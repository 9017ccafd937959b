"""Isolate the NaN stage in the refscale CTC prep (CPU backend)."""
import sys

sys.path.insert(0, "/root/repo")
import jax

if "tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

import jax.numpy as jnp
import numpy as np

from cross_patient_speech_decoding_tpu.cli import experiments as E
from cross_patient_speech_decoding_tpu.data.splits import train_val_test_masks
from cross_patient_speech_decoding_tpu.utils.config import TrainCTCConfig
from cross_patient_speech_decoding_tpu.utils.labels import (
    encode_label_sequences, to_class_ids,
)

cfg = TrainCTCConfig(
    hidden=512, n_layers=3, synth_patients=8, synth_trials=250,
    synth_T=600, epochs=300, n_iter=2, seed=0, out="",
)

it = 0
rng = np.random.default_rng(cfg.seed + 7919 * it)
n_tar = E._synthetic_ctc_n_trials(cfg)
tr, va, te = train_val_test_masks(n_tar, rng, cfg.val_frac, cfg.test_frac)

pts = E._synthetic_ctc_cfg(cfg)
pca_fit_lat, _, cca_align_lat = E._ctc_prep_jit()
max_k = 32
maskj = jnp.asarray(tr, jnp.float32)

lats, ids = [], []
for i, (X, y, il, ll) in enumerate(pts):
    Xj = jnp.asarray(np.asarray(X))
    st, lat = pca_fit_lat(Xj, maskj if i == 0 else None,
                          cfg.n_components, max_k)
    lat_fin = bool(jnp.isfinite(lat).all())
    print(f"pt {i}: X finite={bool(jnp.isfinite(Xj).all())} "
          f"lat finite={lat_fin}", flush=True)
    if not lat_fin:
        for kname, v in st._asdict().items() if hasattr(st, "_asdict") else []:
            pass
    lats.append(lat)
    ids.append(encode_label_sequences(y))

uni = np.unique(np.concatenate(ids))
idsj = [jnp.asarray(to_class_ids(e, uni)[0]) for e in ids]
print("n_classes:", len(uni), flush=True)

for i in range(1, len(lats)):
    al = cca_align_lat(lats[0], lats[i], idsj[0], idsj[i], maskj, len(uni))
    print(f"align pt {i}: finite={bool(jnp.isfinite(al).all())}", flush=True)
