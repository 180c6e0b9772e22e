"""Camera-ray generation and coordinate transforms.

All functions are pure jnp, vectorized over whole images / pose stacks so
they jit onto the TPU without per-pixel host loops.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


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
    cam2world = jnp.asarray(cam2world)
    dtype = cam2world.dtype
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    ii, jj = jnp.meshgrid(xs, ys, indexing="xy")  # each (H, W)

    directions = jnp.stack(
        [
            (ii - width * 0.5) / focal_length,
            -(jj - height * 0.5) / focal_length,
            -jnp.ones_like(ii),
        ],
        axis=-1,
    )
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)

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
