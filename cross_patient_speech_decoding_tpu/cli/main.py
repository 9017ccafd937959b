"""`cpsd` command-line interface.

One CLI replaces the reference's ten scripts (argparse generation) and its
Hydra generation (SURVEY.md §2.7, §5): subcommands take an optional
``--config file.yaml`` plus Hydra-style ``key=value`` overrides.

Examples::

    cpsd svm-decode target_pt=S14 strategy=sep_align n_iter=50 n_folds=20
    cpsd train-ctc context=aligned n_iter=5 epochs=100
    cpsd tune-ctc n_trials=30 rungs=30,100
    cpsd realtime-sim n_channels=111
"""

from __future__ import annotations

import argparse
import sys

from cross_patient_speech_decoding_tpu.cli.subsample_experiments import (
    SubsampleConfig,
)
from cross_patient_speech_decoding_tpu.utils.config import (
    AnalyzeConfig,
    MakeXformsConfig,
    RealtimeSimConfig,
    ReproduceConfig,
    SVMDecodeConfig,
    TrainCTCConfig,
    TrainNNConfig,
    TrainSeq2SeqConfig,
    TuneCTCConfig,
    load_config,
)

_COMMANDS = {
    "svm-decode": (SVMDecodeConfig, "run_svm_decode"),
    "train-seq2seq": (TrainSeq2SeqConfig, "run_train_seq2seq"),
    "train-nn": (TrainNNConfig, "run_train_nn"),
    "train-ctc": (TrainCTCConfig, "run_train_ctc"),
    # compile-cache prewarm: same configs as the train commands; see
    # docs/ROUND2.md compile-latency policy
    "prewarm-ctc": (TrainCTCConfig, "run_prewarm_ctc"),
    "prewarm-seq2seq": (TrainSeq2SeqConfig, "run_prewarm_seq2seq"),
    "tune-ctc": (TuneCTCConfig, "run_tune_ctc"),
    "realtime-sim": (RealtimeSimConfig, "run_realtime_sim"),
    "analyze": (AnalyzeConfig, "run_analyze"),
    # generate the offline PCA/CCA transform h5s consumed by
    # tune-ctc/train-ctc pca_path=/cca_path=
    "make-xforms": (MakeXformsConfig, "run_make_xforms"),
    "subsample-trials": (SubsampleConfig, "run_trial_subsample"),
    "subsample-grid": (SubsampleConfig, "run_grid_subsample"),
    "subsample-spatial": (SubsampleConfig, "run_spatial_avg"),
    "subsample-pitch": (SubsampleConfig, "run_pitch_subsample"),
    # manifest-driven full-matrix orchestration (the reference's SLURM
    # job-array workflow, README.md:27, as one resumable command)
    "reproduce": (ReproduceConfig, "run_reproduce"),
}


def _config_epilog(cfg_cls) -> str:
    """Field table for ``cpsd <cmd> --help``: every key=value override
    with its default (the config docstrings carry the semantics)."""
    import dataclasses

    from cross_patient_speech_decoding_tpu.utils.config import REQUIRED

    lines = ["overridable keys (key=value):"]
    for f in dataclasses.fields(cfg_cls):
        if f.default is dataclasses.MISSING:
            if f.default_factory is not dataclasses.MISSING:
                lines.append(f"  {f.name}={f.default_factory()!r}")
            else:
                lines.append(f"  {f.name}=(required)")
        elif f.default is REQUIRED:
            lines.append(f"  {f.name}=(required)")
        else:
            lines.append(f"  {f.name}={f.default!r}")
    return "\n".join(lines)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="cpsd",
        description="TPU-native cross-patient speech decoding framework",
    )
    sub = parser.add_subparsers(dest="command", required=True)
    for name, (cfg_cls, _) in _COMMANDS.items():
        doc = (cfg_cls.__doc__ or "").strip()
        if doc.startswith(cfg_cls.__name__ + "("):
            doc = ""  # dataclass auto-docstring (no real one written)
        first = doc.splitlines()[0] if doc else None
        p = sub.add_parser(
            name,
            help=first,
            description=doc or None,
            epilog=_config_epilog(cfg_cls),
            formatter_class=argparse.RawDescriptionHelpFormatter,
        )
        p.add_argument("--config", default=None, help="YAML config file")
        p.add_argument("overrides", nargs="*", help="key=value overrides")

    args = parser.parse_args(argv)
    cfg_cls, fn_name = _COMMANDS[args.command]
    cfg = load_config(cfg_cls, args.config, args.overrides)

    # persistent kernel cache: fused-GRU training programs cold-compile in
    # minutes on the tunneled TPU; warm runs load from disk
    import pathlib

    import jax

    if jax.default_backend() == "tpu":
        cache = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache_tpu"
        jax.config.update("jax_compilation_cache_dir", str(cache))

    from cross_patient_speech_decoding_tpu.cli import (
        experiments,
        reproduce,
        subsample_experiments,
    )

    for mod in (experiments, subsample_experiments, reproduce):
        if hasattr(mod, fn_name):
            result = getattr(mod, fn_name)(cfg)
            break
    else:  # pragma: no cover - command table/module drift
        raise AttributeError(fn_name)
    return 0 if result is not None else 1


if __name__ == "__main__":
    sys.exit(main())
