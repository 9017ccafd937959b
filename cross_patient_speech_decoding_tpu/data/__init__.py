"""Data layer: synthetic generators, file loaders, splits, subsampling."""

from cross_patient_speech_decoding_tpu.data.synthetic import (
    SyntheticDataset,
    make_synthetic_patients,
    make_synthetic_patients_device,
)
