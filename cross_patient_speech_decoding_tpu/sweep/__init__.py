"""Hyperparameter search: vmapped trial batches, successive halving, and
TPE/BOHB model-based acquisition."""

from cross_patient_speech_decoding_tpu.sweep.search import (
    SweepSpace,
    sample_trials,
    run_sweep,
    Manifest,
)
from cross_patient_speech_decoding_tpu.sweep.bayes import (
    Categorical,
    Float,
    TPESampler,
    default_ctc_space,
    run_bohb,
    sample_random,
)
