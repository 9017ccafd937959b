"""Hyperparameter search: vmapped trial batches + successive halving."""

from cross_patient_speech_decoding_tpu.sweep.search import (
    SweepSpace,
    sample_trials,
    run_sweep,
    Manifest,
)
