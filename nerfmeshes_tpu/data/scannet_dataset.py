"""ScanNet RGB-D dataset over a .sens stream.

The reference declares a ScanNetDataset (src/data/datasets.py:361-462) but
wires it to NotImplementedError in the model factory
(src/models/model_base.py:110-111); here it is functional: frames decode
to color targets + depth, poses come from the stream, and rays use the
ScanNet convention (+z forward, image-down y, real principal point).
"""

from __future__ import annotations

import numpy as np

from nerfmeshes_tpu.data.bundle import DataBundle
from nerfmeshes_tpu.data.datasets import DatasetType, RayDataset
from nerfmeshes_tpu.data.loaders.scannet import SensorData
from nerfmeshes_tpu.ops.rays import CameraIntrinsics


class ScanNetDataset(RayDataset):
    def __init__(self, cfg, type: DatasetType = DatasetType.TRAIN, frame_skip: int = 1):
        self.frame_skip = max(1, int(frame_skip))
        super().__init__(cfg, type)

    def load_dataset(self) -> DataBundle:
        sens = SensorData(self.cfg.dataset.basedir)
        self._intrinsic = np.asarray(sens.intrinsic_color)

        # Stride frames; stagger val/test off the train frames.
        offset = {"train": 0, "val": 1, "test": 2}[self.type.value]
        skip = self.frame_skip if self.type.value == "train" else self.frame_skip * 8
        indices = [
            i
            for i in range(offset, len(sens.frames), skip)
            if np.isfinite(sens.frames[i].camera_to_world).all()
        ]

        import cv2

        imgs, poses, depths = [], [], []
        for i in indices:
            color = sens.color_image(i)
            depth = sens.depth_image(i)
            if depth.shape != color.shape[:2]:
                depth = cv2.resize(
                    depth, (color.shape[1], color.shape[0]),
                    interpolation=cv2.INTER_NEAREST,
                )
            imgs.append(color[..., :3].astype(np.float32) / 255.0)
            depths.append(depth.astype(np.float32))
            poses.append(sens.frames[i].camera_to_world.astype(np.float32))

        return DataBundle(
            ray_targets=np.stack(imgs),
            target_depth=np.stack(depths),
            poses=np.stack(poses),
            hwf=np.array(
                [imgs[0].shape[0], imgs[0].shape[1], self._intrinsic[0, 0]],
                np.float32,
            ),
        )

    def intrinsics(self) -> CameraIntrinsics:
        # On a dataset-cache hit load_dataset() never runs, so read the
        # intrinsic matrix from the .sens header on demand (cheap: header
        # only, no frame decode).
        if not hasattr(self, "_intrinsic"):
            sens = SensorData(self.cfg.dataset.basedir, header_only=True)
            self._intrinsic = np.asarray(sens.intrinsic_color)
        K = self._intrinsic
        return CameraIntrinsics(
            fx=float(K[0, 0]),
            fy=float(K[1, 1]),
            cx=float(K[0, 2]),
            cy=float(K[1, 2]),
            z_sign=1.0,
            flip_y=False,
            normalize=False,
        )
