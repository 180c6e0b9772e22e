"""nerfmeshes_tpu — a TPU-native NeRF training + mesh-extraction framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of qway/nerfmeshes
(PyTorch-Lightning reference surveyed in SURVEY.md):

- hierarchical coarse/fine NeRF training (`models.NeRFModel` analog),
- BuFF unstructured radiance volumes (adaptive AABB voxel tree sampling),
- mesh extraction via dense sigma-grid evaluation + marching cubes +
  inverse-normal appearance resampling,
- Blender / LLFF / COLMAP / ScanNet dataset loaders,
- YAML config system compatible with the reference's `config/*.yml` schema.

Design: every hot path is a single jitted program (rays sharded over a
`jax.sharding.Mesh`, samples axis fused on-chip); host code only does IO,
checkpointing and the (rare) BuFF tree consolidation.
"""

__version__ = "0.1.0"

from nerfmeshes_tpu.config import CfgNode, get_default_cfg, load_config
