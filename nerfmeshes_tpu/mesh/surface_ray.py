"""Surface-point-cloud export by ray casting (colored, oriented points).

Rebuild of the reference's ``src/mesh_surface_ray.py`` — dead code there
(its imports at ``mesh_surface_ray.py:9-16`` name symbols the reference
package does not export, so the CLI cannot run) — as a working feature:

- render an orbit of views (``pose_spherical`` grid, 8 azimuths x 4
  elevations by default, ``mesh_surface_ray.py:82-88``),
- lift each pixel's expected depth to a world-space surface point
  ``o + d * depth`` (``:115``),
- keep only pixels whose surface point agrees with its (2s+1)^2 pixel
  neighborhood (``:117-133``) and has positive depth (``:135``; the eval
  render path zeroes depth where the ray never saturates, matching the
  reference's eval-mode depth semantics),
- export points with normals ``-d`` and the rendered color to PLY
  (``:141-154``).

TPU-native differences: the neighborhood test is ONE jitted stencil
program over an edge-padded surface map — 25 static slices XLA fuses into
a single elementwise pass — instead of the reference's python loop of 25
full-image gather round-trips; rays are generated on device and only the
rendered maps cross the host boundary.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("step_size",))
def neighborhood_consistency_mask(
    surface_points: jnp.ndarray,
    step_size: int = 2,
    dist_threshold: float = 0.002,
    prob_threshold: float = 0.6,
) -> jnp.ndarray:
    """Per-pixel surface-consistency mask (reference semantics).

    For every pixel, count the (2s+1)^2 window entries (border-clamped,
    self included) whose surface point lies within squared distance
    ``dist_threshold``; keep pixels where the count exceeds
    ``prob_threshold`` of the (2s+1)^2 - 1 true neighbors — exactly the
    reference's accumulation at ``mesh_surface_ray.py:117-133`` (its
    index clamp equals edge padding; the always-true self-comparison is
    included there too).

    Args:
        surface_points: (H, W, 3) world-space expected-depth points.
        step_size: neighborhood half-width s.
        dist_threshold: max SQUARED distance for a neighbor to agree.
        prob_threshold: fraction of the (2s+1)^2 - 1 neighbors that must
            agree.

    Returns:
        (H, W) bool mask.
    """
    s = int(step_size)
    h, w = surface_points.shape[:2]
    padded = jnp.pad(surface_points, ((s, s), (s, s), (0, 0)), mode="edge")
    count = jnp.zeros((h, w), jnp.int32)
    for a in range(2 * s + 1):
        for b in range(2 * s + 1):
            nb = padded[a : a + h, b : b + w, :]
            d2 = jnp.sum((nb - surface_points) ** 2, axis=-1)
            count = count + (d2 < dist_threshold).astype(jnp.int32)
    size_samples = (2 * s + 1) ** 2 - 1
    return count > size_samples * prob_threshold


def orbit_poses(
    poses_y: int = 8, poses_x: int = 4, radius: float = 4.0
) -> np.ndarray:
    """The reference's spherical pose grid (``mesh_surface_ray.py:82-88``):
    ``poses_y`` azimuths over [-180, 180) x ``poses_x`` elevations over
    [-90, 90]."""
    from nerfmeshes_tpu.data.helpers import pose_spherical

    return np.stack(
        [
            pose_spherical(float(ay), float(ax), float(radius))
            for ay in np.linspace(-180.0, 180.0, poses_y, endpoint=False)
            for ax in np.linspace(-90.0, 90.0, poses_x, endpoint=True)
        ]
    )


def _pixel_dirs_cam(h: int, w: int, focal: float) -> np.ndarray:
    """Host-side camera-space unit pixel directions — the numpy mirror of
    ``ops.rays.pixel_directions`` under ``CameraIntrinsics.from_hwf``
    (OpenGL convention: -z forward, y up, centered principal point).
    Normals are view directions rotated by each pose; computing them on
    host avoids fetching the (H, W, 3) world-direction map per view."""
    ii, jj = np.meshgrid(
        np.arange(w, dtype=np.float32),
        np.arange(h, dtype=np.float32),
        indexing="xy",
    )
    dirs = np.stack(
        [(ii - w * 0.5) / focal, -(jj - h * 0.5) / focal, -np.ones_like(ii)],
        axis=-1,
    )
    return dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)


@partial(jax.jit, static_argnames=("step_size",))
def _mask_pack(origin, dirs, depth, rgb, dist_threshold, prob_threshold,
               *, step_size: int = 2):
    """Device post-render pass: lift depths to surface points, run the
    consistency mask, quantize color — so the host fetch per view is
    points f32 + mask bool + rgb uint8 (~10 MB at 800^2) instead of the
    old depth/rgb/dirs f32 maps plus a points re-upload (~26 MB)."""
    h, w = dirs.shape[:2]
    depth = depth.reshape(h, w)
    points = origin.reshape(1, 1, 3) + dirs * depth[..., None]
    mask = neighborhood_consistency_mask(
        points,
        step_size=step_size,
        dist_threshold=dist_threshold,
        prob_threshold=prob_threshold,
    ) & (depth > 0)
    rgb_u8 = jnp.clip(rgb.reshape(h, w, 3) * 255.0, 0, 255).astype(jnp.uint8)
    return points, mask, rgb_u8


def surface_points_from_views(
    system,
    poses: Sequence[np.ndarray],
    hwf,
    near: float,
    far: float,
    step_size: int = 2,
    dist_threshold: float = 0.002,
    prob_threshold: float = 0.6,
    log_every: int = 0,
):
    """Ray-cast ``poses`` through ``system`` and collect masked surface
    points (reference loop at ``mesh_surface_ray.py:93-145``).

    ``system`` needs ``query_rays(o, d, near, far, fields=..., as_numpy=
    False)`` returning maps with ``rgb_map`` and ``depth_map``
    (NeRFSystem/BuFFSystem both qualify; numpy-returning stand-ins work
    too — outputs are re-wrapped as device arrays).

    All views are DISPATCHED before any is fetched (the render + mask
    programs queue asynchronously); per view only the packed
    points/mask/uint8-color triple crosses the host boundary, and normals
    come from rotating one cached camera-space direction grid by each
    pose on the host.

    Returns:
        (points, normals, colors): float32 (N, 3) host arrays. Normals are
        the negated view directions; colors in [0, 1] (uint8-quantized —
        exactly what the PLY stores).
    """
    from nerfmeshes_tpu.ops.rays import get_ray_bundle

    h, w, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])
    dirs_cam = _pixel_dirs_cam(h, w, focal)

    pending = []
    for pose in poses:
        origin, dirs = get_ray_bundle(h, w, focal, jnp.asarray(pose, jnp.float32))
        out = system.query_rays(
            origin.reshape(1, 3), dirs.reshape(-1, 3), float(near), float(far),
            fields=("rgb_map", "depth_map"), as_numpy=False,
        )
        pending.append((pose, _mask_pack(
            origin, dirs,
            jnp.asarray(out.depth_map, jnp.float32),
            jnp.asarray(out.rgb_map, jnp.float32),
            dist_threshold, prob_threshold,
            step_size=int(step_size),
        )))

    pts_all, nrm_all, rgb_all = [], [], []
    for i, (pose, (points_d, mask_d, rgb_d)) in enumerate(pending):
        mask = np.asarray(mask_d)
        points = np.asarray(points_d, np.float32)
        rgb = np.asarray(rgb_d)
        rot = np.asarray(pose, np.float32)[:3, :3]
        world_dirs = dirs_cam @ rot.T

        pts_all.append(points[mask])
        nrm_all.append(-world_dirs[mask])
        rgb_all.append(rgb[mask].astype(np.float32) / 255.0)
        if log_every and (i + 1) % log_every == 0:
            kept = sum(len(p) for p in pts_all)
            print(
                f"[surface-ray] view {i + 1}/{len(pending)}: {kept} points kept",
                flush=True,
            )

    cat = lambda xs: (
        np.concatenate(xs, axis=0) if xs else np.zeros((0, 3), np.float32)
    )
    return cat(pts_all), cat(nrm_all), cat(rgb_all)


def export_surface_ray(
    system,
    filename: str,
    hwf=None,
    near: Optional[float] = None,
    far: Optional[float] = None,
    poses_y: int = 8,
    poses_x: int = 4,
    radius: float = 4.0,
    step_size: int = 2,
    dist_threshold: float = 0.002,
    prob_threshold: float = 0.6,
    binary: bool = True,
    log_every: int = 4,
):
    """End-to-end: orbit poses -> masked surface points -> PLY file.

    Defaults mirror the reference's hardcoded values
    (``mesh_surface_ray.py:71-90``: 8x4 poses, r=4, 800^2 @ focal
    1111.1111, s=2, dist 0.002, prob 0.6). Returns (points, normals,
    colors) after writing."""
    from nerfmeshes_tpu.mesh.export import export_ply, export_ply_binary

    if hwf is None:
        hwf = (800, 800, 1111.1111)
    if near is None:
        near = float(system.cfg.dataset.near)
    if far is None:
        far = float(system.cfg.dataset.far)
    poses = orbit_poses(poses_y, poses_x, radius)
    points, normals, colors = surface_points_from_views(
        system, poses, hwf, near, far,
        step_size=step_size,
        dist_threshold=dist_threshold,
        prob_threshold=prob_threshold,
        log_every=log_every,
    )
    writer = export_ply_binary if binary else export_ply
    writer(points, triangles=None, colors=colors, normals=normals,
           filename=filename)
    return points, normals, colors
