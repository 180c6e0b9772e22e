from nerfmeshes_tpu.parallel.mesh import (
    DATA_AXIS,
    create_mesh,
    ray_sharding,
    replicated,
    shard_rays,
)

__all__ = ["DATA_AXIS", "create_mesh", "ray_sharding", "replicated", "shard_rays"]
