"""COLMAP/LLFF dataset classes.

- ColmapDataset: LLFF scenes with per-image near/far bounds and stride
  holdout (reference: src/data/datasets.py:318-358).
- GeneralColmapDataset: reads a raw COLMAP sparse/0 model directly and
  builds rays from SIMPLE_RADIAL intrinsics (reference:
  src/data/datasets.py:465-581).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from nerfmeshes_tpu.data.bundle import DataBundle
from nerfmeshes_tpu.data.datasets import DatasetType, RayDataset
from nerfmeshes_tpu.data.loaders.llff import load_llff_data


class ColmapDataset(RayDataset):
    """LLFF-format scenes (poses_bounds.npy from colmap_convert)."""

    def __init__(self, cfg, type: DatasetType = DatasetType.TRAIN):
        self.downscale_factor = cfg.dataset.llff_downsample_factor
        self.spherify = bool(cfg.dataset.get("spherify", True))
        super().__init__(cfg, type)

    def load_dataset(self) -> DataBundle:
        images, pose_mats, bounds, render_poses, i_test = load_llff_data(
            self.cfg.dataset.basedir,
            factor=self.downscale_factor,
            spherify=self.spherify,
        )

        hold = int(self.cfg.dataset.llff_hold_step)
        if hold > 0:
            val_indices = np.arange(images.shape[0])[::hold]
        else:
            val_indices = np.array([i_test])
        train_indices = np.array(
            [i for i in range(images.shape[0]) if i not in set(val_indices.tolist())]
        )
        # TEST split follows validation (the reference only defines two).
        target = train_indices if self.type == DatasetType.TRAIN else val_indices

        pose_mats = pose_mats[target]
        bounds = bounds[target]
        images = images[target]

        hwf = pose_mats[0, :3, -1]
        poses34 = pose_mats[:, :3, :4]
        pad = np.broadcast_to(
            np.array([0, 0, 0, 1], np.float32), (poses34.shape[0], 1, 4)
        )
        poses = np.concatenate([poses34, pad], axis=1)

        return DataBundle(
            ray_targets=images.astype(np.float32),
            ray_bounds=bounds.astype(np.float32),
            poses=poses.astype(np.float32),
            hwf=np.array([hwf[0], hwf[1], hwf[2]], np.float32),
        )

    def synthesis(self) -> "ColmapDataset":
        """Swap targets for the LLFF render path — the spiral around the
        average camera for forward-facing captures, the spherified circle
        otherwise — instead of the base class's blender orbit (360° around
        the world origin at radius 4), which is the wrong geometry for an
        inward- or forward-facing COLMAP capture. Rebuilt from this
        split's bundle poses/bounds via render_path_from_poses, so it
        also works when the bundle came from the on-disk cache."""
        from nerfmeshes_tpu.data.loaders.llff import render_path_from_poses

        self.synthetic_poses = render_path_from_poses(
            np.asarray(self.bundle.poses),
            np.asarray(self.bundle.ray_bounds),
            spherify=self.spherify,
        )
        return self


class GeneralColmapDataset(RayDataset):
    """Rays straight from a COLMAP sparse reconstruction (sparse/0)."""

    def __init__(self, cfg, type: DatasetType = DatasetType.TRAIN, resolution: float = 1.0):
        self.resolution = resolution
        super().__init__(cfg, type)

    def load_dataset(self) -> DataBundle:
        from nerfmeshes_tpu.data.loaders.colmap import read_model

        base = Path(self.cfg.dataset.basedir)
        cameras, images_meta, _ = read_model(base / "sparse" / "0", ".bin")

        import imageio.v2 as imageio

        cam = next(iter(cameras.values()))
        imgs, poses = [], []
        for im in sorted(images_meta.values(), key=lambda i: i.name):
            img_path = base / "images" / im.name
            if not img_path.exists():
                continue
            img = np.asarray(imageio.imread(img_path))[..., :3] / 255.0
            # world-to-camera -> camera-to-world
            R = im.qvec2rotmat()
            t = im.tvec
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, :3] = R.T
            c2w[:3, 3] = -R.T @ t
            imgs.append(img.astype(np.float32))
            poses.append(c2w)

        imgs = np.stack(imgs)
        poses = np.stack(poses)
        H, W = imgs.shape[1:3]
        focal = float(cam.params[0]) * self.resolution

        return DataBundle(
            ray_targets=imgs,
            poses=poses,
            hwf=np.array([H, W, focal], np.float32),
        )
