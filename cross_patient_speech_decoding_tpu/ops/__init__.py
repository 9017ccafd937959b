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
    fit_cca_aligner_trial,
    shared_trial_subselect_indices,
    transform_a_to_b,
    transform_b_to_a,
    transform_shared,
)
from cross_patient_speech_decoding_tpu.ops.jacobi import (
    jacobi_eigh,
    jacobi_eigh_pallas,
    batched_eigh,
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
from cross_patient_speech_decoding_tpu.ops.classifiers import (
    KernelClassifier,
    kernel_classifier_fit,
    kernel_classifier_predict,
    bagged_classifier_fit,
    bagged_classifier_predict,
    balanced_sample_weights,
    scale_gamma,
)
from cross_patient_speech_decoding_tpu.ops.ctc import (
    ctc_loss_mean,
    greedy_decode,
    prefix_beam_search,
)
from cross_patient_speech_decoding_tpu.ops.metrics import (
    balanced_accuracy,
    cmat_acc,
    confusion_matrix,
    edit_distance,
    per_batch,
    pearson_r,
    pt_corr,
    pt_corr_dims,
    pt_corr_multi,
)
from cross_patient_speech_decoding_tpu.ops.signal import (
    car,
    compute_bin_power,
    filter_hg_bin,
    fir_filter,
    iir_filter_stateful,
    init_stream_state,
    lfilter_zi,
    process_hg_chunk,
)
