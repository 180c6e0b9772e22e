"""Blender synthetic dataset loader (transforms_{split}.json).

Host-side numpy analog of the reference loader
(src/data/loaders/load_blender.py:12-120): parses the transforms JSON,
loads PNGs (+ optional per-frame *_depth.exr and *_normal.png), computes
focal from camera_angle_x, optional integer downscale, white-background
alpha compositing.

Deliberate fixes over the reference:
- white background composites with the actual alpha channel (the reference
  slices to RGB first and then composites with the blue channel,
  load_blender.py:42,107-108);
- downscale passes (W, H) to cv2.resize in the correct order
  (load_blender.py:99 swaps them, which breaks non-square images).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from nerfmeshes_tpu.data.bundle import DataBundle
from nerfmeshes_tpu.data.helpers import read_depth_from_exr


def _imread(path):
    import imageio.v2 as imageio

    return np.asarray(imageio.imread(path))


def load_blender_data(cfg, data_config: str) -> DataBundle:
    """Load one split's images/poses into a DataBundle (targets only; rays
    are generated on device from the poses).

    Args:
        cfg: full experiment CfgNode (uses cfg.dataset.*).
        data_config: path to transforms_{split}.json.
    """
    json_path = Path(data_config)
    basedir = json_path.parent

    with json_path.open("r") as fp:
        metadata = json.load(fp)

    imgs, poses, depth, normals = [], [], [], []
    for frame in metadata["frames"]:
        bundle_path = basedir / frame["file_path"]
        img = _imread(bundle_path.with_suffix(".png"))
        imgs.append(img)

        depth_path = Path(f"{bundle_path}_depth.exr")
        if os.path.exists(depth_path):
            depth_map = np.asarray(read_depth_from_exr(str(depth_path)))
            # Max-depth pixels mark empty space.
            depth_map = np.where(
                depth_map == depth_map.max(initial=0), cfg.dataset.empty, depth_map
            )
            depth.append(depth_map)

        normal_path = Path(f"{bundle_path}_normal.png")
        if os.path.exists(normal_path):
            try:
                normals.append(_imread(normal_path))
            except Exception:
                pass

        poses.append(np.asarray(frame["transform_matrix"], dtype=np.float32))

    size = len(imgs)
    imgs = (np.stack(imgs).astype(np.float32)) / 255.0
    poses = np.stack(poses).astype(np.float32)
    if poses.shape[-2] == 3:  # pad 3x4 -> 4x4
        pad = np.broadcast_to(
            np.array([0, 0, 0, 1], dtype=np.float32), (*poses.shape[:-2], 1, 4)
        )
        poses = np.concatenate([poses, pad], axis=-2)

    depth_arr = np.stack(depth).astype(np.float32) if len(depth) == size else None
    if len(normals) == size:
        # Reference parity: raw /255 decode only (load_blender.py:55-61).
        # Unit-normalizing here would NaN on black background pixels and
        # skip the 2n-1 [-1,1] decode anyway — leave interpretation to
        # the consumer, as the reference does.
        normals_arr = np.stack(normals).astype(np.float32)[..., :3] / 255.0
    else:
        normals_arr = None

    H, W = imgs.shape[1:3]
    camera_angle_x = float(metadata["camera_angle_x"])
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)

    reduced = cfg.dataset.reduced_resolution
    if reduced is not None and reduced > 1:
        import cv2

        H, W, focal = H // reduced, W // reduced, focal / reduced
        imgs = np.stack(
            [cv2.resize(im, (W, H), interpolation=cv2.INTER_AREA) for im in imgs]
        )
        if depth_arr is not None:
            depth_arr = np.stack(
                [cv2.resize(d, (W, H), interpolation=cv2.INTER_NEAREST) for d in depth_arr]
            )
        if normals_arr is not None:
            normals_arr = np.stack(
                [cv2.resize(n, (W, H), interpolation=cv2.INTER_AREA) for n in normals_arr]
            )

    if cfg.dataset.white_background and imgs.shape[-1] == 4:
        alpha = imgs[..., -1:]
        imgs = imgs[..., :3] * alpha + (1.0 - alpha)
    else:
        imgs = imgs[..., :3]

    return DataBundle(
        ray_targets=imgs,
        target_depth=depth_arr,
        target_normals=normals_arr,
        poses=poses,
        hwf=np.array([H, W, focal], dtype=np.float32),
    )
