"""Core numerical ops: PCA, CCA/MCCA/JointPCA alignment, CTC, DSP, metrics."""

from cross_patient_speech_decoding_tpu.ops.pca import (
    PCAState,
    pca_fit,
    pca_transform,
    pca_fit_transform,
    nocenter_pca_fit,
    n_components_for_variance,
)
from cross_patient_speech_decoding_tpu.ops.cca import (
    CCAAlignment,
    FittedAligner,
    cca_align,
    cnd_avg,
    fit_cca_aligner,
    transform_b_to_a,
)
