from multimodal_lipread_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    get_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)
