"""Shared utilities: PRNG threading, label encoding, timers, IO."""

from cross_patient_speech_decoding_tpu.utils.labels import (
    encode_label_sequences,
    phon_to_artic,
    PHON_TO_ARTIC,
)
from cross_patient_speech_decoding_tpu.utils.timers import Timer, median_ms
