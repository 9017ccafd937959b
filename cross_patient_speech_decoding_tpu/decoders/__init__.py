"""Cross-patient pooled decoders (classical path)."""

from cross_patient_speech_decoding_tpu.decoders.pooled import (
    DecodeConfig,
    PatientArrays,
    decode_fold_sep_align,
    decode_fold_sep_dimred,
    decode_fold_joint_pca,
    make_cv_decoder,
)
