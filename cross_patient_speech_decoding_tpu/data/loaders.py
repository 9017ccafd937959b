"""File IO: .mat feature loading, decoding-data pickles, CTC HDF5, results.

Host-side data layer mirroring the reference's
`/root/reference/aligned_decoding/processing_utils/feature_data_from_mat.py`
(.mat key conventions, filename scheme), `alignment/alignment_utils.py:
127-184` (``pt_decoding_data*.pkl`` nested-dict unpacking), and
`scripts/train_ctc_rnn.py:264-320` (CTC h5 layout ``{pt}/norm_rt_HG_pow``
stored (trials, channels, time) + time-window cropping + sil token).

Everything returns numpy; device placement happens at the pipeline rim.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from cross_patient_speech_decoding_tpu.utils.labels import phon_to_artic


# ---------------------------------------------------------------- .mat ----

def mat_filename(pt: str, phon_idx: int | None = None, sig_channel: bool = True,
                 zscore: bool = False) -> str:
    """Reference filename scheme (feature_data_from_mat.py:95-138):
    ``{pt}_HG[_p{n}]_{sigChannel|all}[_zscore]_goodTrials.mat``."""
    parts = [pt, "HG"]
    if phon_idx is not None:
        parts.append(f"p{phon_idx}")
    parts.append("sigChannel" if sig_channel else "all")
    if zscore:
        parts.append("zscore")
    parts.append("goodTrials")
    return "_".join(parts) + ".mat"


def load_high_gamma_mat(path: str | Path):
    """Load one .mat file -> dict with hgMap (tr, t, ch), labels (tr, L).

    Accepts the reference's key conventions: ``hgMap`` (trials, time,
    channels), optional ``hgTrace`` (trials, cx, cy, time), and
    ``phonSeqLabels`` (trials, seq_len).
    """
    from scipy.io import loadmat

    raw = loadmat(str(path))
    out = {}
    # pre-averaged spatial keys cs_{a}x{b} (feature_data_from_mat.py:165-185)
    cs_keys = [k for k in raw if k.startswith("cs_")]
    for k in cs_keys:
        out[k] = np.asarray(raw[k], np.float32)
    if "hgMap" in raw:
        out["X"] = np.asarray(raw["hgMap"], np.float32)
    elif "hgTrace" in raw:
        tr = np.asarray(raw["hgTrace"], np.float32)  # (tr, cx, cy, t)
        out["X"] = tr.reshape(tr.shape[0], -1, tr.shape[-1]).transpose(0, 2, 1)
    if "phonSeqLabels" in raw:
        out["y_seq"] = np.asarray(raw["phonSeqLabels"], np.int64)
    return out


def load_subject_phoneme_data(data_dir: str | Path, pt: str, n_phon: int = 3,
                              sig_channel: bool = True, zscore: bool = False):
    """Per-phoneme files -> subject dict X1..Xn, y1..yn, y_full_phon.

    Mirrors ``load_subject_high_gamma_phoneme`` (feature_data_from_mat.py:
    38-67): one .mat per phoneme position plus full sequence labels.
    """
    data_dir = Path(data_dir)
    subj = {}
    for p in range(1, n_phon + 1):
        d = load_high_gamma_mat(
            data_dir / mat_filename(pt, p, sig_channel, zscore)
        )
        subj[f"X{p}"] = d["X"]
        subj[f"y{p}"] = d["y_seq"][:, p - 1] if d["y_seq"].ndim > 1 else d["y_seq"]
        if p == 1:
            subj["y_full_phon"] = d["y_seq"]
    subj["X_collapsed"] = np.concatenate(
        [subj[f"X{p}"] for p in range(1, n_phon + 1)], axis=0
    )
    subj["y_phon_collapsed"] = np.concatenate(
        [subj[f"y{p}"] for p in range(1, n_phon + 1)], axis=0
    )
    return subj


# ------------------------------------------------------------- pickles ----

def save_pkl(obj, path):
    with open(path, "wb") as f:
        pickle.dump(obj, f, protocol=-1)


def load_pkl(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def decoding_data_from_dict(data_dict: dict, pt: str, p_ind: int,
                            lab_type: str = "phon",
                            algn_type: str = "phon_seq"):
    """Unpack ``pt_decoding_data*.pkl`` (alignment_utils.py:127-184 contract).

    Returns ((X_tar, y_tar, y_align_tar), [(X, y, y_align), ...]) with the
    reference's conventions: ``p_ind=-1`` selects collapsed-across-phonemes
    arrays and tiles the full sequence labels x3; ``lab_type='artic'``
    collapses phonemes to articulators.
    """

    def one(pt_key):
        d = data_dict[pt_key]
        lab_full = d["y_full_" + algn_type[: -len("_seq")]]
        if p_ind == -1:
            X = d["X_collapsed"]
            y = d["y_" + lab_type + "_collapsed"]
            lab_full = np.tile(lab_full, (3, 1))
        else:
            X = d[f"X{p_ind}"]
            y = d[f"y{p_ind}"]
        if lab_type == "artic":
            y = phon_to_artic(y)
        return X, y, lab_full

    tar = one(pt)
    pre = [one(p) for p in data_dict[pt]["pre_pts"]]
    return tar, pre


# ----------------------------------------------------------------- HDF5 ----

def load_ctc_h5(path: str | Path, pt: str, zscored: bool = True,
                tw_orig=(0.0, 4.0), tw_select=(0.5, 3.5), fs: float = 200.0):
    """Load one patient's CTC data from HDF5 with time-window cropping.

    Mirrors ``train_ctc_rnn.load_data`` (:264-320): dataset key
    ``{pt}/norm_rt_HG_pow[_z]`` stored (trials, channels, time), transposed
    to (trials, time, channels) on load, cropped from tw_orig to tw_select;
    labels at ``{pt}/phon_seq``.
    """
    import h5py

    key = "norm_rt_HG_pow_z" if zscored else "norm_rt_HG_pow"
    with h5py.File(str(path), "r") as f:
        X = np.asarray(f[pt][key], np.float32).transpose(0, 2, 1)
        y = np.asarray(f[pt]["phon_seq"], np.int64)
    i0 = int(round((tw_select[0] - tw_orig[0]) * fs))
    i1 = int(round((tw_select[1] - tw_orig[0]) * fs))
    return X[:, i0:i1, :], y


def save_ctc_h5(path: str | Path, pt: str, X: np.ndarray, y: np.ndarray,
                zscored: bool = True):
    """Write the reference CTC layout (inverse of load_ctc_h5)."""
    import h5py

    key = "norm_rt_HG_pow_z" if zscored else "norm_rt_HG_pow"
    with h5py.File(str(path), "a") as f:
        g = f.require_group(pt)
        for k, v in ((key, X.transpose(0, 2, 1)), ("phon_seq", y)):
            if k in g:
                del g[k]
            g.create_dataset(k, data=v)


# --------------------------------------------------------------- results ----

def append_results_pkl(path: str | Path, accs, params: dict | None = None,
                       extra: dict | None = None):
    """Incremental result persistence (data_saving.py:22-83 behavior):
    append per-iteration accuracies (+ params once) into a pickle."""
    path = Path(path)
    if path.exists():
        store = load_pkl(path)
    else:
        store = {"accs": [], "params": params or {}}
    store["accs"].append(np.asarray(accs))
    if extra:
        store.setdefault("extra", []).append(extra)
    save_pkl(store, path)
    return store
