"""Device-mesh parallelism: sharding helpers and SPMD training wrappers."""

from cross_patient_speech_decoding_tpu.parallel.mesh import (
    make_mesh,
    make_padded_sharded_ctc_train_step,
    make_sharded_classifier_train_step,
    make_sharded_ctc_train_step,
    batch_sharding,
    replicated,
    shard_batch,
)
