"""Device-mesh parallelism: sharding helpers and SPMD training wrappers."""

from cross_patient_speech_decoding_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
