from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    canonicalize_layout,
    data_sharding,
    initialize_distributed,
    make_mesh,
    pad_to_multiple,
    replicate,
    replicated,
    shard_batch,
)
