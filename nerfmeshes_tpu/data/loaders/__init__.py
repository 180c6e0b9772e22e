from nerfmeshes_tpu.data.loaders.blender import load_blender_data
from nerfmeshes_tpu.data.loaders.llff import load_llff_data, minify
from nerfmeshes_tpu.data.loaders.colmap import (
    read_model,
    write_model,
    read_cameras_binary,
    read_images_binary,
    read_points3d_binary,
    Camera,
    Image,
    Point3D,
    qvec2rotmat,
    rotmat2qvec,
)
from nerfmeshes_tpu.data.loaders.scannet import RGBDFrame, SensorData, write_sens

__all__ = [
    "load_blender_data",
    "load_llff_data",
    "minify",
    "read_model",
    "write_model",
    "read_cameras_binary",
    "read_images_binary",
    "read_points3d_binary",
    "Camera",
    "Image",
    "Point3D",
    "qvec2rotmat",
    "rotmat2qvec",
    "RGBDFrame",
    "SensorData",
    "write_sens",
]
