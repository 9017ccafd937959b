"""TPU-native cross-patient speech decoding framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
``coganlab/cross_patient_speech_decoding`` (mounted read-only at
``/root/reference``): cross-patient latent alignment (CCA / MCCA / joint-PCA),
classical pooled decoders, seq2seq GRU phoneme decoding, CTC-trained streaming
("realtime") RNN decoding, electrode subsampling sweeps, and hyperparameter
search — all expressed as batched, jit-compiled XLA programs instead of
Python loops over sklearn / torch calls.

Import convention::

    import cross_patient_speech_decoding_tpu as cpsd
"""

__version__ = "0.1.0"

from cross_patient_speech_decoding_tpu import ops  # noqa: F401
from cross_patient_speech_decoding_tpu import data  # noqa: F401
from cross_patient_speech_decoding_tpu import utils  # noqa: F401
