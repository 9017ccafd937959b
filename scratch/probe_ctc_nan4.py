"""Drill into the patient-2 CCA align NaN on TPU: stage-by-stage."""
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
from cross_patient_speech_decoding_tpu.ops import cca as CC
from cross_patient_speech_decoding_tpu.ops.precision import hdot
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
pca_fit_lat, _, _ = E._ctc_prep_jit()
max_k = 32
maskj = jnp.asarray(tr, jnp.float32)

lats, ids = [], []
for i in (0, 2):
    X, y, il, ll = pts[i]
    _, lat = pca_fit_lat(jnp.asarray(np.asarray(X)),
                         maskj if i == 0 else None, cfg.n_components, max_k)
    lats.append(lat)
    ids.append(encode_label_sequences(y))
# class universe must match the full-prep one: use all patients' ids
all_ids = [encode_label_sequences(p[1]) for p in pts]
uni = np.unique(np.concatenate(all_ids))
n_classes = len(uni)
ida = jnp.asarray(to_class_ids(ids[0], uni)[0])
idb = jnp.asarray(to_class_ids(ids[1], uni)[0])
print("prep done; n_classes", n_classes, flush=True)


def stages(lat_a, lat_b, ids_a, ids_b, mask_a):
    T = lat_a.shape[-2]
    ka, kb = lat_a.shape[-1], lat_b.shape[-1]
    avg_a, cnt_a = CC.cnd_avg(lat_a, ids_a, n_classes, mask_a)
    avg_b, cnt_b = CC.cnd_avg(lat_b, ids_b, n_classes, None)
    shared = ((cnt_a > 0) & (cnt_b > 0)).astype(lat_a.dtype)
    L_a = avg_a.reshape((n_classes * T, ka))
    L_b = avg_b.reshape((n_classes * T, kb))
    row_mask = jnp.repeat(shared, T, axis=-1)
    La = CC._masked_center_cols(L_a, row_mask)
    Lb = CC._masked_center_cols(L_b, row_mask)
    R = La.shape[-2]
    Lab = jnp.concatenate([La, Lb], axis=-1)
    G = hdot(Lab.swapaxes(-1, -2), Lab)
    ga, gb, gx = G[:ka, :ka], G[ka:, ka:], G[:ka, ka:]
    w_ab, rank_ab = CC._whiten_chol(jnp.stack([ga, gb], axis=0), R)
    w_a, w_b = w_ab[0], w_ab[1]
    g = hdot(w_a.swapaxes(-1, -2), hdot(gx, w_b))
    u, s, vt, s_keep = CC._svd_small(g, "gram")
    d = jnp.minimum(rank_ab[0], rank_ab[1])
    D = s.shape[-1]
    col_mask = (jnp.arange(D) < d[..., None]).astype(La.dtype) * s_keep
    m_a = hdot(w_a, u[..., :, :D]) * col_mask[..., None, :]
    m_b = hdot(w_b, vt.swapaxes(-1, -2)[..., :, :D]) * col_mask[..., None, :]
    pinv_ma = CC._fast_masked_pinv(m_a, col_mask)
    proj_b_to_a = hdot(m_b, pinv_ma)

    def fin(x):
        return jnp.isfinite(x).all()

    return dict(
        avg_fin=fin(avg_a) & fin(avg_b), shared_n=shared.sum(),
        G_fin=fin(G),
        ga_diag_min=jnp.diagonal(ga).min(), ga_diag_max=jnp.diagonal(ga).max(),
        gb_diag_min=jnp.diagonal(gb).min(), gb_diag_max=jnp.diagonal(gb).max(),
        W_fin=fin(w_ab), rank_a=rank_ab[0], rank_b=rank_ab[1],
        g_fin=fin(g), g_absmax=jnp.abs(g).max(),
        u_fin=fin(u), s_fin=fin(s), s_max=s.max(), s_min=s.min(),
        m_fin=fin(m_a) & fin(m_b),
        pinv_fin=fin(pinv_ma),
        proj_fin=fin(proj_b_to_a),
    )


res = jax.jit(stages)(lats[0], lats[1], ida, idb, maskj)
for k, v in res.items():
    print(f"  {k}: {np.asarray(v)}", flush=True)

# method comparison
from cross_patient_speech_decoding_tpu.ops.cca import (
    fit_cca_aligner, transform_b_to_a,
)
for method in ("chol", "gram", "svd"):
    @jax.jit
    def run(la, lb, ia, ib, m, method=method):
        al = fit_cca_aligner(la, lb, ia, ib, n_classes, mask_a=m,
                             method=method)
        out = transform_b_to_a(al, lb)
        return jnp.isfinite(out).all(), jnp.abs(out).max()
    ok, mx = run(lats[0], lats[1], ida, idb, maskj)
    print(f"method={method}: finite={bool(ok)} absmax={float(mx):.4g}",
          flush=True)
