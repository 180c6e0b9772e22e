"""Camera-ray generation and coordinate transforms.

All functions are pure jnp, vectorized over whole images / pose stacks so
they jit onto the TPU without per-pixel host loops.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class CameraIntrinsics(NamedTuple):
    """Pinhole intrinsics + axis convention for ray generation.

    Blender/LLFF scenes use the OpenGL-style convention (camera looks down
    -z, y up, centered principal point, normalized directions — the
    reference's get_ray_bundle); RGB-D streams like ScanNet use +z,
    image-down y, explicit principal point, unnormalized directions (the
    reference's dummy_rays_simple_radial, src/data/datasets.py:29-44).
    """

    fx: float
    fy: float
    cx: float
    cy: float
    z_sign: float = -1.0
    flip_y: bool = True
    normalize: bool = True

    @classmethod
    def from_hwf(cls, H: int, W: int, focal: float) -> "CameraIntrinsics":
        return cls(fx=float(focal), fy=float(focal), cx=W * 0.5, cy=H * 0.5)


def pixel_directions(
    x: jnp.ndarray, y: jnp.ndarray, intr: CameraIntrinsics
) -> jnp.ndarray:
    """Camera-space direction for pixel coords x, y (any shape) -> (..., 3)."""
    ydir = (y - intr.cy) / intr.fy
    if intr.flip_y:
        ydir = -ydir
    dirs = jnp.stack(
        [
            (x - intr.cx) / intr.fx,
            ydir,
            jnp.full_like(x, intr.z_sign),
        ],
        axis=-1,
    )
    if intr.normalize:
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return dirs


def get_ray_bundle(
    height: int,
    width: int,
    focal_length,
    cam2world: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pinhole-camera ray bundle for an image (one ray per pixel).

    Matches the reference's convention (src/nerf/nerf_helpers.py:226-277):
    pixel directions are *normalized in camera space before* rotation into
    world space, and the origin is the single camera-center translation.

    Args:
        height/width: image size in pixels.
        focal_length: scalar focal length in pixels.
        cam2world: (..., 4, 4) camera-to-world transform(s).

    Returns:
        origins: (..., 3) one origin per pose.
        directions: (..., H, W, 3) world-space unit directions.
    """
    intr = CameraIntrinsics.from_hwf(height, width, focal_length)
    return get_ray_bundle_intrinsics(height, width, intr, cam2world)


def get_ray_bundle_intrinsics(
    height: int,
    width: int,
    intr: CameraIntrinsics,
    cam2world: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ray bundle under arbitrary pinhole intrinsics/conventions."""
    cam2world = jnp.asarray(cam2world)
    dtype = cam2world.dtype
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    ii, jj = jnp.meshgrid(xs, ys, indexing="xy")  # each (H, W)

    directions = pixel_directions(ii, jj, intr)

    rot = cam2world[..., :3, :3]  # (..., 3, 3)
    # world_dir = R @ cam_dir, batched over leading pose dims and pixels.
    world_dirs = jnp.einsum("...ij,hwj->...hwi", rot, directions)
    origins = cam2world[..., :3, -1]
    return origins, world_dirs


def ndc_rays(
    height: int,
    width: int,
    focal: float,
    near: float,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shift rays to the near plane and warp to normalized device coords.

    Used for forward-facing (LLFF) scenes. Matches the reference transform
    (src/nerf/nerf_helpers.py:280-307).
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox, oy, oz = rays_o[..., 0], rays_o[..., 1], rays_o[..., 2]
    dx, dy, dz = rays_d[..., 0], rays_d[..., 1], rays_d[..., 2]

    o0 = -1.0 / (width / (2.0 * focal)) * ox / oz
    o1 = -1.0 / (height / (2.0 * focal)) * oy / oz
    o2 = 1.0 + 2.0 * near / oz

    d0 = -1.0 / (width / (2.0 * focal)) * (dx / dz - ox / oz)
    d1 = -1.0 / (height / (2.0 * focal)) * (dy / dz - oy / oz)
    d2 = -2.0 * near / oz

    return jnp.stack([o0, o1, o2], axis=-1), jnp.stack([d0, d1, d2], axis=-1)


def intervals_to_ray_points(
    intervals: jnp.ndarray, directions: jnp.ndarray, origins: jnp.ndarray
) -> jnp.ndarray:
    """points = o + d * t, broadcast over the samples axis.

    intervals: (..., S), directions: (..., 3), origins: (..., 3) or (3,)
    -> (..., S, 3). (reference: src/models/model_helpers.py:32-35)
    """
    return origins[..., None, :] + directions[..., None, :] * intervals[..., :, None]
