from nerfmeshes_tpu.data.loaders.blender import load_blender_data

__all__ = ["load_blender_data"]
