"""Surface-ray exporter tests (mesh/surface_ray.py — working rebuild of
the reference's dead src/mesh_surface_ray.py).

The mask op is pinned against a brute-force clamped-gather loop that
replicates the reference's accumulation (mesh_surface_ray.py:117-133)
literally; the view pipeline is driven by an analytic ray-traced sphere
(no training needed).
"""

from __future__ import annotations

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
import pytest

from nerfmeshes_tpu.mesh.surface_ray import (
    export_surface_ray,
    neighborhood_consistency_mask,
    orbit_poses,
    surface_points_from_views,
)


def _reference_mask(sp, s, dist, prob):
    """Literal numpy transcription of the reference's loop semantics:
    clamped index gathers, self-comparison included, strict > on
    (2s+1)^2 - 1 neighbors * prob."""
    h, w, _ = sp.shape
    acc = []
    for a in range(-s, s + 1):
        for b in range(-s, s + 1):
            rows = np.clip(np.arange(h)[:, None] + a, 0, h - 1)
            cols = np.clip(np.arange(w)[None, :] + b, 0, w - 1)
            nb = sp[rows, cols]
            acc.append(((nb - sp) ** 2).sum(-1) < dist)
    count = np.stack(acc, -1).sum(-1)
    return count > ((2 * s + 1) ** 2 - 1) * prob


@pytest.mark.parametrize("step_size", [1, 2])
def test_mask_matches_reference_semantics(step_size):
    rng = np.random.default_rng(0)
    # Mixture of a smooth sheet and scattered outliers.
    h = w = 23
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    sp = np.stack([xx, yy, 0.05 * np.sin(7 * xx)], -1).astype(np.float32)
    outliers = rng.random((h, w)) < 0.15
    sp[outliers] += rng.normal(0, 0.5, size=(int(outliers.sum()), 3))

    got = np.asarray(
        neighborhood_consistency_mask(
            jnp.asarray(sp), step_size=step_size,
            dist_threshold=0.002, prob_threshold=0.6,
        )
    )
    want = _reference_mask(sp, step_size, 0.002, 0.6)
    np.testing.assert_array_equal(got, want)


def test_mask_keeps_plane_drops_outlier():
    h = w = 16
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    sp = np.stack([xx * 1e-3, yy * 1e-3, np.zeros_like(xx)], -1).astype(
        np.float32
    )
    base = np.asarray(neighborhood_consistency_mask(jnp.asarray(sp)))
    assert base.all()  # a smooth sheet is fully consistent

    sp_out = sp.copy()
    sp_out[8, 8] += 10.0  # one pixel flies off the surface
    m = np.asarray(neighborhood_consistency_mask(jnp.asarray(sp_out)))
    assert not m[8, 8]
    # Its neighbors lose only 1 of 24 agreeing samples: still kept.
    assert m.sum() == h * w - 1


class _SphereSystem:
    """Analytic stand-in for NeRFSystem.query_rays: ray-traces a sphere
    of radius R at the origin; depth 0 on miss (the render path's
    eval-mode semantics), constant color on hit."""

    def __init__(self, radius=1.0, color=(0.2, 0.5, 0.8)):
        self.radius = radius
        self.color = np.asarray(color, np.float32)

    def query_rays(self, o, d, near, far, fields=None, as_numpy=True):
        o = np.asarray(o, np.float64)
        d = np.asarray(d, np.float64)
        b = 2.0 * np.sum(o * d, -1)
        c = np.sum(o * o, -1) - self.radius**2
        disc = b * b - 4.0 * np.sum(d * d, -1) * c
        hit = disc > 0
        t = np.where(
            hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / (2.0 * np.sum(d * d, -1)), 0.0
        )
        depth = np.where(hit & (t > near) & (t < far), t, 0.0)
        rgb = np.where(
            depth[..., None] > 0, self.color, np.zeros(3, np.float32)
        )
        return SimpleNamespace(
            rgb_map=rgb.astype(np.float32),
            depth_map=depth.astype(np.float32),
        )


def test_surface_points_from_sphere_views():
    system = _SphereSystem(radius=1.0)
    poses = orbit_poses(poses_y=4, poses_x=2, radius=4.0)
    pts, nrm, rgb = surface_points_from_views(
        system, poses, hwf=(48, 48, 60.0), near=0.5, far=8.0,
        # 48^2 at focal 60 has coarse pixel footprints on the sphere:
        # neighboring surface points are ~0.07 apart near the silhouette,
        # so use a looser agreement threshold than the 800^2 default.
        dist_threshold=0.05,
    )
    assert len(pts) > 500
    radii = np.linalg.norm(pts, axis=-1)
    # Masked points lie ON the sphere (silhouette-grazing pixels culled
    # by the consistency mask keep the tail tight).
    np.testing.assert_allclose(radii, 1.0, atol=0.05)
    # Normals are the negated unit view directions.
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-5)
    # Colors pass through (uint8-quantized on device — exactly the PLY
    # payload — so agreement is to the byte).
    np.testing.assert_allclose(
        rgb, np.broadcast_to(system.color, rgb.shape), atol=1.0 / 255.0
    )


def test_export_surface_ray_writes_ply(tmp_path):
    out = tmp_path / "sphere.ply"
    pts, _, _ = export_surface_ray(
        _SphereSystem(),
        str(out),
        hwf=(32, 32, 40.0),
        near=0.5,
        far=8.0,
        poses_y=2,
        poses_x=1,
        radius=4.0,
        dist_threshold=0.05,
        log_every=0,
    )
    data = out.read_bytes()
    assert data.startswith(b"ply\nformat binary_little_endian 1.0")
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    assert f"element vertex {len(pts)}".encode() in data[:header_end]
    # 3 floats pos + 3 floats normal + 3 uchar color per vertex.
    assert len(data) - header_end == len(pts) * (12 + 12 + 3)
    assert len(pts) > 50
