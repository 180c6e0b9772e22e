"""Host-side batching and image-cast helpers (API surface of the
reference's nerf_helpers: batchify, cast_to_image/pil/disparity,
export_point_cloud — src/nerf/nerf_helpers.py:114-181,142-152)."""

from __future__ import annotations

from typing import Iterator

import numpy as np


def batchify(*data, batch_size: int = 1024, progress: bool = False) -> Iterator:
    """Slice N-first arrays into aligned chunks (host-side; device paths
    use the jitted fixed-shape renderers instead)."""
    assert all(
        sample is None or sample.shape[0] == data[0].shape[0] for sample in data
    ), "Sizes of tensors must match for dimension 0."

    def gen():
        size = data[0].shape[0]
        for start in range(0, size, batch_size):
            sl = slice(start, start + batch_size)
            yield [s[sl] if s is not None else None for s in data]

    it = gen()
    if progress:
        try:
            from tqdm import tqdm

            total = (data[0].shape[0] - 1) // batch_size + 1
            return tqdm(it, total=total)
        except ImportError:
            pass
    return it


def cast_to_image(tensor) -> np.ndarray:
    """(H, W, 3) float [0,1] -> (3, H, W) uint8 (TB channels-first)."""
    img = cast_to_pil_image(tensor)
    return np.moveaxis(img, -1, 0)


def cast_to_pil_image(tensor) -> np.ndarray:
    """(H, W, 3) float [0,1] -> (H, W, 3) uint8."""
    arr = np.asarray(tensor)
    return (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)


def cast_to_disparity_image(tensor, white_background: bool = False) -> np.ndarray:
    """(H, W) disparity -> min-max normalized uint8; optional white holes
    (reference: src/nerf/nerf_helpers.py:172-181)."""
    disp = np.asarray(tensor)
    rng = max(float(disp.max() - disp.min()), 1e-10)
    img = (np.clip((disp - disp.min()) / rng, 0.0, 1.0) * 255).astype(np.uint8)
    if white_background:
        img[img == 0] = 255
    return img


def export_point_cloud(
    iteration: int,
    ray_origins,
    ray_directions,
    depth_output,
    depth_target,
    save_dir: str = ".",
) -> str:
    """Red predicted / blue target depth point clouds as OBJ
    (reference: src/nerf/nerf_helpers.py:142-152)."""
    import os

    from nerfmeshes_tpu.mesh.export import export_obj

    origins = np.broadcast_to(
        np.asarray(ray_origins).reshape(-1, 3), np.asarray(ray_directions).shape
    ).reshape(-1, 3)
    dirs = np.asarray(ray_directions).reshape(-1, 3)
    v_out = origins + dirs * np.asarray(depth_output).reshape(-1, 1)
    v_tgt = origins + dirs * np.asarray(depth_target).reshape(-1, 1)
    vertices = np.concatenate([v_out, v_tgt], 0)
    colors = np.concatenate(
        [
            np.tile([1.0, 0.0, 0.0], (len(v_out), 1)),
            np.tile([0.0, 0.0, 1.0], (len(v_tgt), 1)),
        ],
        0,
    )
    normals = np.concatenate([-dirs, -dirs], 0)
    path = os.path.join(save_dir, f"{iteration:04d}.obj")
    export_obj(vertices, [], colors, normals, path)
    return path
