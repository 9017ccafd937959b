"""Shared utilities: PRNG threading, label encoding, timers, IO."""

from cross_patient_speech_decoding_tpu.utils.labels import (
    encode_label_sequences,
    phon_to_artic,
    to_class_ids,
    PHON_TO_ARTIC,
)
from cross_patient_speech_decoding_tpu.utils.timers import Timer, median_ms
from cross_patient_speech_decoding_tpu.utils.scaling import (
    log_linear_fit,
    trials_to_target_per,
)
from cross_patient_speech_decoding_tpu.utils.profiling import (
    StageTimer,
    annotate,
    trace,
)
