from nerfmeshes_tpu.parallel.mesh import (
    DATA_AXIS,
    create_mesh,
    replicated,
)

__all__ = ["DATA_AXIS", "create_mesh", "replicated"]
