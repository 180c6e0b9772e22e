"""Specialized periodic loggers (the reference's src/nerf/loggers.py):

- DepthProjectionLogger: predicted-vs-target depth point clouds as TB
  meshes every `projection_step_size` steps (loggers.py:7-31).
- TreeWeightsLogger: sorted memm curve as a matplotlib figure
  (loggers.py:34-54).
- TreeLogger: the BuFF voxel boxes as a TB mesh (loggers.py:57-72).
- DepthLossLogger: masked surface/void rgb+depth loss decomposition when
  ground-truth depth exists (loggers.py:75-108).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

# Point-cloud color coding (reference: src/nerf/nerf_helpers.py:7-10).
POINT_GROUND_TRUTH = np.array([0.0, 0.0, 255.0])
POINT_OUT_TRUE = np.array([0.0, 255.0, 0.0])
POINT_OUT_FALSE_VOID = np.array([0.0, 0.0, 0.0])
POINT_OUT_FALSE_SURFACE = np.array([255.0, 0.0, 0.0])

# Unit-cube triangulation for voxel meshes (8 corners / 12 tris).
_CUBE_CORNERS = np.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
     [1, 1, 0], [0, 1, 1], [1, 0, 1], [1, 1, 1]],
    np.float32,
)
_CUBE_FACES = np.array(
    [0, 2, 1, 2, 4, 1, 0, 3, 2, 2, 3, 5, 0, 1, 6, 6, 3, 0,
     1, 4, 7, 7, 6, 1, 3, 6, 7, 7, 5, 3, 2, 7, 4, 7, 2, 5],
    np.int32,
).reshape(-1, 3)


def create_point_cloud(ray_origins, ray_directions, depth, color, mask=None):
    """(vertices, colors, normals) for depth-projected ray endpoints
    (reference: src/nerf/nerf_helpers.py:56-64)."""
    ray_origins = np.broadcast_to(
        np.asarray(ray_origins).reshape(-1, 3), np.asarray(ray_directions).shape
    )
    d = np.asarray(ray_directions)
    z = np.asarray(depth)
    if mask is not None:
        ray_origins, d, z = ray_origins[mask], d[mask], z[mask]
    vertices = (ray_origins + d * z[..., None]).reshape(-1, 3)
    colors = np.broadcast_to(color, vertices.shape)
    normals = -d.reshape(-1, 3)
    return vertices, colors, normals


def depth_point_clouds(
    ray_origins, ray_directions, depth_output, depth_target=None,
    threshold: float = 0.2, empty: float = 0.0,
):
    """Color-coded TP/FP depth point cloud (reference:
    src/nerf/nerf_helpers.py:26-53): blue ground truth, green accurate,
    black false-void, red false-surface."""
    if depth_target is None:
        return create_point_cloud(
            ray_origins, ray_directions, depth_output, POINT_GROUND_TRUTH
        )
    target = create_point_cloud(
        ray_origins, ray_directions, depth_target, POINT_GROUND_TRUTH
    )
    err = np.abs(np.asarray(depth_output) - np.asarray(depth_target))
    ok = err < threshold
    surface = (np.asarray(depth_target) != empty) & ~ok
    void = (np.asarray(depth_target) == empty) & ~ok
    parts = [
        target,
        create_point_cloud(ray_origins, ray_directions, depth_output, POINT_OUT_TRUE, ok),
        create_point_cloud(ray_origins, ray_directions, depth_output, POINT_OUT_FALSE_VOID, void),
        create_point_cloud(ray_origins, ray_directions, depth_output, POINT_OUT_FALSE_SURFACE, surface),
    ]
    return tuple(np.concatenate(xs, 0) for xs in zip(*parts))


def comp_depth(depth_output, depth_target, empty_value: float = 0.0):
    """(total, empty-space, surface, signed-l1) depth-loss decomposition
    (reference: src/nerf/nerf_helpers.py:67-83)."""
    out = np.asarray(depth_output)
    tgt = np.asarray(depth_target)
    mask = tgt > empty_value
    depth_loss = float(np.mean((out - tgt) ** 2))
    depth_empty = float(np.mean((out[~mask] - tgt[~mask]) ** 2)) if (~mask).any() else 0.0
    depth_space = float(np.mean((out[mask] - tgt[mask]) ** 2)) if mask.any() else 0.0
    depth_l1 = float(np.mean(out[mask] - tgt[mask])) if mask.any() else 0.0
    return depth_loss, depth_empty, depth_space, depth_l1


def voxel_mesh(voxels: np.ndarray):
    """(vertices, faces, colors) cube mesh of AABB boxes (V, 2, 3)
    (reference: TreeSampling.flatten, src/nerf/tree.py:104-125)."""
    voxels = np.asarray(voxels)
    V = voxels.shape[0]
    lo, hi = voxels[:, 0, :], voxels[:, 1, :]
    verts = lo[:, None, :] + _CUBE_CORNERS[None] * (hi - lo)[:, None, :]
    faces = _CUBE_FACES[None] + (np.arange(V) * 8)[:, None, None]
    colors = np.tile(
        np.array([[0, 0, 0], [128, 128, 128]], np.int32).repeat(4, 0)[None],
        (V, 1, 1),
    )
    return verts.reshape(-1, 3), faces.reshape(-1, 3), colors.reshape(-1, 3)


class DepthProjectionLogger:
    """Every `step_size` steps, log predicted vs target depth point clouds
    as a TB mesh (reference: src/nerf/loggers.py:7-31)."""

    def __init__(self, step_size: int, tag: str = "Point Cloud"):
        self.step_size = max(1, int(step_size))
        self.tag = tag
        self._last = -1

    def tick(self, tb_writer, step, ray_origins, ray_directions, depth_output,
             depth_target=None):
        if tb_writer is None or step // self.step_size == self._last // self.step_size:
            self._last = step
            return
        self._last = step
        verts, colors, _ = depth_point_clouds(
            ray_origins, ray_directions, np.asarray(depth_output),
            None if depth_target is None else np.asarray(depth_target),
        )
        try:
            import torch

            tb_writer.add_mesh(
                self.tag,
                vertices=torch.from_numpy(np.asarray(verts, np.float32))[None],
                colors=torch.from_numpy(np.asarray(colors, np.uint8).astype(np.int32))[None],
                global_step=step,
            )
        except Exception:
            pass


class TreeWeightsLogger:
    """Sorted memm curve as a matplotlib figure (reference: loggers.py:34-54)."""

    def __init__(self, tag: str = "Tree Memm"):
        self.tag = tag

    def tick(self, tb_writer, step: int, memm: np.ndarray, active: Optional[np.ndarray] = None):
        if tb_writer is None:
            return
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            memm = np.asarray(memm)
            if active is not None:
                memm = memm[np.asarray(active)]
            fig = plt.figure()
            plt.plot(np.sort(memm)[::-1])
            plt.xlabel("voxel (sorted)")
            plt.ylabel("memm")
            tb_writer.add_figure(self.tag, fig, global_step=step)
            plt.close(fig)
        except Exception:
            pass


class TreeLogger:
    """BuFF voxel boxes as a TB mesh (reference: loggers.py:57-72)."""

    def __init__(self, tag: str = "Tree"):
        self.tag = tag

    def tick(self, tb_writer, step: int, voxels: np.ndarray, active: Optional[np.ndarray] = None):
        if tb_writer is None:
            return
        voxels = np.asarray(voxels)
        if active is not None:
            voxels = voxels[np.asarray(active)]
        verts, faces, colors = voxel_mesh(voxels)
        try:
            import torch

            tb_writer.add_mesh(
                self.tag,
                vertices=torch.from_numpy(verts.astype(np.float32))[None],
                colors=torch.from_numpy(colors)[None],
                faces=torch.from_numpy(faces)[None],
                global_step=step,
            )
        except Exception:
            pass


class DepthLossLogger:
    """Fold the depth decomposition into the metric dict when GT depth is
    available (reference: loggers.py:75-108)."""

    def __init__(self, scope: str = "train", empty: float = 0.0):
        self.scope = scope
        self.empty = empty

    def tick(self, log_vals: Dict, rgb_output, rgb_target, depth_output,
             depth_target) -> Dict:
        if depth_target is None:
            return log_vals
        total, empty, space, l1 = comp_depth(depth_output, depth_target, self.empty)
        log_vals = dict(log_vals)
        log_vals[f"{self.scope}/depth_loss"] = total
        log_vals[f"{self.scope}/depth_empty"] = empty
        log_vals[f"{self.scope}/depth_space"] = space
        log_vals[f"{self.scope}/depth_l1"] = l1
        mask = np.asarray(depth_target) > self.empty
        if mask.any():
            log_vals[f"{self.scope}/rgb_surface_loss"] = float(
                np.mean((np.asarray(rgb_output)[mask] - np.asarray(rgb_target)[mask]) ** 2)
            )
        if (~mask).any():
            log_vals[f"{self.scope}/rgb_void_loss"] = float(
                np.mean((np.asarray(rgb_output)[~mask] - np.asarray(rgb_target)[~mask]) ** 2)
            )
        return log_vals
