"""Mesh/sharding substrate (data parallelism over ICI, multi-host over DCN)."""

from nspeech_tpu.parallel.lengthshard import (  # noqa: F401
    make_length_sharded_conv_stack,
    make_length_sharded_encoder_convs,
    make_length_sharded_postnet,
)
from nspeech_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    initialize_multihost,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
