"""Host-side data helpers: synthetic orbit poses, depth decoding, sampling.

Analog of src/data/data_helpers.py:10-76 in the reference.
"""

from __future__ import annotations

import numpy as np


def _trans_t(t):
    m = np.eye(4, dtype=np.float32)
    m[2, 3] = t
    return m


def _rot_phi(phi):
    m = np.eye(4, dtype=np.float32)
    c, s = np.cos(phi), np.sin(phi)
    m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
    return m


def _rot_theta(th):
    m = np.eye(4, dtype=np.float32)
    c, s = np.cos(th), np.sin(th)
    m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, -s, s, c
    return m


def pose_spherical(theta: float, phi: float, radius: float) -> np.ndarray:
    """Synthetic orbit camera pose (degrees), the standard NeRF convention
    (reference: src/data/data_helpers.py:32-37)."""
    c2w = _trans_t(radius)
    c2w = _rot_phi(phi / 180.0 * np.pi) @ c2w
    c2w = _rot_theta(theta / 180.0 * np.pi) @ c2w
    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.float32
    )
    return flip @ c2w


def synthesis_poses(
    step: float = 3.0, phi: float = -30.0, radius: float = 4.0
) -> np.ndarray:
    """120 orbit poses for novel-view synthesis (reference:
    src/data/datasets.py:105-130: 360°/3° steps, phi=-30°, r=4)."""
    thetas = np.arange(-180.0, 180.0, step)
    return np.stack([pose_spherical(t, phi, radius) for t in thetas])


def batch_random_sampling(rng: np.random.Generator, coords: np.ndarray, num_rays: int):
    """Random pixel-coordinate subsample without replacement
    (reference: src/data/data_helpers.py:40-51). Host-side variant; the
    jitted train path samples on device instead."""
    idx = rng.permutation(coords.shape[0])[:num_rays]
    return coords[idx]


def read_depth_from_exr(path: str) -> np.ndarray:
    """Decode a single-channel depth EXR. Tries OpenEXR bindings, then
    imageio, then OpenCV (reference uses OpenEXR/Imath:
    src/data/data_helpers.py:54-76)."""
    try:
        import OpenEXR
        import Imath

        f = OpenEXR.InputFile(path)
        dw = f.header()["dataWindow"]
        size = (dw.max.y - dw.min.y + 1, dw.max.x - dw.min.x + 1)
        pt = Imath.PixelType(Imath.PixelType.FLOAT)
        chan = f.channels(["R"], pt)[0]
        return np.frombuffer(chan, dtype=np.float32).reshape(size)
    except ImportError:
        pass
    try:
        import imageio.v2 as imageio

        img = np.asarray(imageio.imread(path))
        return img[..., 0].astype(np.float32) if img.ndim == 3 else img.astype(np.float32)
    except Exception:
        pass
    import os

    os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
    import cv2

    img = cv2.imread(path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
    if img is None:
        raise IOError(f"Could not decode EXR {path}")
    return (img[..., 0] if img.ndim == 3 else img).astype(np.float32)


def resize_image(img: np.ndarray, new_hw: tuple[int, int]) -> np.ndarray:
    """Area resize via OpenCV (reference uses cv2.resize with INTER_AREA,
    src/data/loaders/load_blender.py:89-103)."""
    import cv2

    return cv2.resize(img, (new_hw[1], new_hw[0]), interpolation=cv2.INTER_AREA)
