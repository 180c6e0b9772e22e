from nerfmeshes_tpu.buff.tree import (
    Leaf,
    TreeSampling,
    TreeState,
    integrate,
    ray_voxel_intersect,
)
from nerfmeshes_tpu.buff.system import BuFFSystem, buff_render_rays, make_buff_train_step

__all__ = [
    "Leaf",
    "TreeSampling",
    "TreeState",
    "integrate",
    "ray_voxel_intersect",
    "BuFFSystem",
    "buff_render_rays",
    "make_buff_train_step",
]
