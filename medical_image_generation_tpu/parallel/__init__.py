from medical_image_generation_tpu.parallel.mesh import (
    get_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)

__all__ = ["get_mesh", "batch_sharding", "replicated_sharding", "shard_batch"]
