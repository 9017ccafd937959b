"""Training loops: jitted steps, fold batching, checkpointing, metrics."""

from cross_patient_speech_decoding_tpu.train.state import TrainState, create_train_state
from cross_patient_speech_decoding_tpu.train.steps import (
    make_seq2seq_train_step,
    make_seq2seq_eval_step,
    make_classifier_train_step,
    make_classifier_eval_step,
    make_ctc_train_step,
    make_ctc_eval_step,
)
