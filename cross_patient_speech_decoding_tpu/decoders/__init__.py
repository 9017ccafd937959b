"""Cross-patient pooled decoders (classical path)."""

from cross_patient_speech_decoding_tpu.decoders.pooled import (
    DecodeConfig,
    PatientArrays,
    decode_fold_sep_align,
    decode_fold_sep_dimred,
    decode_fold_joint_pca,
    decode_fold_mcca,
    make_cv_decoder,
)
from cross_patient_speech_decoding_tpu.decoders.sklearn_compat import (
    AlignCCA,
    CrossPtDecoderSepAlign,
    CrossPtDecoderSepDimRed,
    CrossPtDecoderJointPCA,
    CrossPtDecoderMCCA,
    DimRedReshape,
    JaxPCA,
    NoCenterPCA,
)
from cross_patient_speech_decoding_tpu.decoders.nested_cv import (
    nested_cv_decode,
    make_nested_cv_decoder,
    sample_candidates,
)
