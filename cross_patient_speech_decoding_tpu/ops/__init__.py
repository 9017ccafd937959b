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
from cross_patient_speech_decoding_tpu.ops.joint_pca import (
    JointPCAState,
    joint_pca_fit,
    joint_pca_transform,
)
from cross_patient_speech_decoding_tpu.ops.mcca import (
    MCCAState,
    mcca_fit,
    mcca_transform,
    fit_mcca_aligner,
)
from cross_patient_speech_decoding_tpu.ops.precision import hdot, hpinv
