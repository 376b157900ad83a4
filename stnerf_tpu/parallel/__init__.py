from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, make_mesh,
                   pad_for_mesh, replicate, replicated, shard_params,
                   shard_ray_batch)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "make_mesh", "batch_sharding",
           "replicated", "shard_ray_batch", "replicate", "shard_params",
           "pad_for_mesh"]
