"""Config system: type coercion (regression for the stringized-annotations
bug), YAML + override layering, unknown keys, required fields."""

import pytest

from cross_patient_speech_decoding_tpu.utils.config import (
    REQUIRED,
    RealtimeSimConfig,
    SVMDecodeConfig,
    TrainCTCConfig,
    load_config,
)


def test_overrides_coerce_types():
    cfg = load_config(
        RealtimeSimConfig,
        overrides=["n_channels=64", "bin_len=12", "seed=3"],
    )
    assert cfg.n_channels == 64 and isinstance(cfg.n_channels, int)
    assert cfg.bin_len == 12


def test_bool_and_float_coercion():
    cfg = load_config(
        SVMDecodeConfig,
        overrides=["chance=true", "random_data=0", "n_comp=0.9", "lam=1e-2"],
    )
    assert cfg.chance is True
    assert cfg.random_data is False
    assert cfg.n_comp == 0.9
    assert cfg.lam == 0.01


def test_int_or_float_union_field():
    # n_comp is float|int: integer strings become ints
    cfg = load_config(SVMDecodeConfig, overrides=["n_comp=12"])
    assert cfg.n_comp == 12


def test_yaml_plus_override_layering(tmp_path):
    y = tmp_path / "cfg.yaml"
    y.write_text("epochs: 42\ncontext: patient\n")
    cfg = load_config(TrainCTCConfig, str(y), ["epochs=7"])
    assert cfg.context == "patient"
    assert cfg.epochs == 7  # CLI override wins


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        load_config(RealtimeSimConfig, overrides=["nope=1"])


def test_required_sentinel():
    from dataclasses import dataclass

    @dataclass
    class C:
        a: int = REQUIRED  # type: ignore

    with pytest.raises(ValueError):
        load_config(C)
    assert load_config(C, overrides=["a=5"]).a == 5


def test_cli_help_renders_for_every_command(capsys):
    """`cpsd <cmd> --help` shows the config docstring + field defaults."""
    import pytest as _pytest

    from cross_patient_speech_decoding_tpu.cli.main import main

    for cmd in ("svm-decode", "reproduce", "subsample-grid"):
        with _pytest.raises(SystemExit) as e:
            main([cmd, "--help"])
        assert e.value.code == 0
        out = capsys.readouterr().out
        assert "overridable keys" in out
        assert "target_pt=" in out or "manifest=" in out


def test_cli_main_dispatches_reproduce(tmp_path):
    """End-to-end through cpsd main(): a dry-run reproduce returns 0 and
    honors the manifest."""
    import yaml

    from cross_patient_speech_decoding_tpu.cli.main import main

    m = tmp_path / "m.yaml"
    m.write_text(yaml.safe_dump({
        "defaults": {"data": "synthetic"},
        "jobs": [{"command": "svm-decode",
                  "matrix": {"target_pt": ["S14", "S26"]},
                  "overrides": {"n_iter": 1,
                                "out": str(tmp_path) + "/{target_pt}.pkl"}}],
    }))
    assert main(["reproduce", f"manifest={m}", "dry_run=true"]) == 0
