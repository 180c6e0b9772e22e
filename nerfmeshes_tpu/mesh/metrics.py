"""Mesh metrics: normalization, surface point sampling, chamfer distance.

Replaces the reference's pytorch3d dependency (Meshes,
sample_points_from_meshes, chamfer_distance; src/models/model_base.py:4-8,
97-101) with host-side numpy sampling and a jitted O(N*M) chamfer — at the
default 2400-point sampling size the distance matrix is ~6M entries, well
inside one TPU tile pass.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def normalize_mesh(vertices: np.ndarray) -> np.ndarray:
    """Center at the origin and scale into a unit sphere (the reference's
    create_mesh, src/mesh_nerf.py:14-24)."""
    v = np.asarray(vertices, np.float32)
    v = v - v.mean(0)
    scale = np.abs(v).max()
    return v / (scale if scale > 0 else 1.0)


def sample_points_from_mesh(
    vertices: np.ndarray,
    triangles: np.ndarray,
    num_samples: int,
    seed: int = 0,
) -> np.ndarray:
    """Area-weighted uniform surface sampling (the reference uses
    pytorch3d.ops.sample_points_from_meshes)."""
    v = np.asarray(vertices, np.float32)
    t = np.asarray(triangles, np.int64)
    a, b, c = v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1)
    total = areas.sum()
    if total <= 0:
        raise ValueError("mesh has zero surface area")
    probs = areas / total

    rng = np.random.default_rng(seed)
    face_idx = rng.choice(len(t), size=num_samples, p=probs)
    u = rng.uniform(size=(num_samples, 1))
    w = rng.uniform(size=(num_samples, 1))
    flip = (u + w) > 1.0
    u = np.where(flip, 1.0 - u, u)
    w = np.where(flip, 1.0 - w, w)
    return (
        a[face_idx] + u * (b[face_idx] - a[face_idx]) + w * (c[face_idx] - a[face_idx])
    ).astype(np.float32)


@jax.jit
def _chamfer(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    d2 = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
    return jnp.mean(jnp.min(d2, axis=1)) + jnp.mean(jnp.min(d2, axis=0))


def chamfer_distance(points_a: np.ndarray, points_b: np.ndarray) -> float:
    """Symmetric mean squared chamfer distance (pytorch3d convention:
    mean over both directions, squared distances, summed)."""
    return float(_chamfer(jnp.asarray(points_a), jnp.asarray(points_b)))


def chamfer_between_meshes(
    mesh_a: Tuple[np.ndarray, np.ndarray],
    mesh_b: Tuple[np.ndarray, np.ndarray],
    num_samples: int = 2400,
    seed: int = 0,
) -> float:
    pa = sample_points_from_mesh(*mesh_a, num_samples, seed)
    pb = sample_points_from_mesh(*mesh_b, num_samples, seed + 1)
    return chamfer_distance(pa, pb)
