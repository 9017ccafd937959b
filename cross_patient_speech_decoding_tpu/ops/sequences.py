"""Sequence-label processing utilities.

Mirrors `/root/reference/aligned_decoding/processing_utils/
sequence_processing.py`: teacher-forcing preparation (:13-46), batched
autoregressive seq2seq inference (:194-229 — the reference's only
TensorFlow/Keras remnant, here a jitted JAX loop), and ragged fold
prediction flattening (:232-244).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pad_sequence_teacher_forcing(y: np.ndarray, n_classes: int):
    """Right-shift targets and prepend the start token; one-hot both.

    Reference ``pad_sequence_teacher_forcing`` (sequence_processing.py:13-46):
    decoder inputs are the target sequence shifted right with a start token
    (index 0 one-hot row of zeros in the legacy Keras scheme; here the
    explicit start id ``n_classes``).

    Returns (decoder_inputs (N, L), targets (N, L)) as int arrays.
    """
    y = np.asarray(y)
    start = np.full((y.shape[0], 1), n_classes, y.dtype)
    dec_in = np.concatenate([start, y[:, :-1]], axis=1)
    return dec_in, y


def one_hot_seq(y: np.ndarray, n_classes: int) -> np.ndarray:
    """(N, L) int labels -> (N, L, n_classes+1) one-hot incl. start token."""
    return np.eye(n_classes + 1, dtype=np.float32)[np.asarray(y)]


def seq2seq_predict_batch(model, variables, X: jax.Array) -> jax.Array:
    """Batched autoregressive greedy decode with a Seq2SeqRNN.

    The jitted equivalent of the reference's Keras batch inference
    (sequence_processing.py:194-229): no teacher forcing, argmax feedback.
    Returns (N, seq_length) predicted class ids.
    """
    logits = model.apply(variables, X, None, 0.0, True)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def flatten_fold_preds(fold_preds) -> np.ndarray:
    """Ragged per-fold prediction lists -> flat array
    (sequence_processing.py:232-244)."""
    return np.concatenate([np.asarray(p).reshape(-1) for p in fold_preds])


def one_hot_decode_batch(probs) -> np.ndarray:
    """(B, L, n_classes) prediction probabilities -> (B, L) int labels
    (reference ``sequence_processing.one_hot_decode_batch``)."""
    return np.argmax(np.asarray(probs), axis=-1)


def decode_seq2seq(model, variables, X_test, y_test):
    """Predict with a trained seq2seq model and return flat (pred, true)
    label arrays — the reference's ``decode_seq2seq`` contract
    (`processing_utils/sequence_processing.py:49-86`), with the TF/Keras
    inference-model pair replaced by one jitted autoregressive forward.
    """
    preds = seq2seq_predict_batch(model, variables, X_test)
    return np.asarray(preds).ravel(), np.asarray(y_test).ravel()
