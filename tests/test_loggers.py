"""Tests for the specialized loggers (point clouds, tree viz, depth
decomposition)."""

import numpy as np

from nerfmeshes_tpu.utils.loggers import (
    DepthLossLogger,
    comp_depth,
    create_point_cloud,
    depth_point_clouds,
    voxel_mesh,
)


def test_create_point_cloud():
    origins = np.zeros(3)
    dirs = np.tile(np.array([0, 0, -1.0]), (5, 1))
    depth = np.arange(1.0, 6.0)
    verts, colors, normals = create_point_cloud(origins, dirs, depth, np.array([0, 0, 255.0]))
    np.testing.assert_allclose(verts[:, 2], -depth)
    np.testing.assert_allclose(normals, -dirs)
    assert colors.shape == verts.shape


def test_depth_point_clouds_color_coding():
    origins = np.zeros(3)
    dirs = np.tile(np.array([0, 0, -1.0]), (4, 1))
    target = np.array([2.0, 0.0, 3.0, 0.0])  # 0 = empty
    output = np.array([2.05, 0.05, 4.5, 2.0])  # ok, ok, bad-surface, bad-void
    verts, colors, normals = depth_point_clouds(origins, dirs, output, target)
    # 4 target (blue) + 2 accurate (green) + 1 false-void + 1 false-surface.
    assert verts.shape[0] == 8
    blue = (colors == [0, 0, 255.0]).all(-1).sum()
    green = (colors == [0, 255.0, 0]).all(-1).sum()
    red = (colors == [255.0, 0, 0]).all(-1).sum()
    black = (colors == [0.0, 0, 0]).all(-1).sum()
    assert (blue, green, red, black) == (4, 2, 1, 1)


def test_comp_depth():
    target = np.array([0.0, 0.0, 2.0, 4.0])
    output = np.array([0.5, 0.0, 2.5, 4.0])
    total, empty, space, l1 = comp_depth(output, target, empty_value=0.0)
    assert total == np.mean((output - target) ** 2)
    assert empty == np.mean([0.25, 0.0])
    assert space == np.mean([0.25, 0.0])
    assert l1 == np.mean([0.5, 0.0])


def test_voxel_mesh():
    voxels = np.array([[[0, 0, 0], [1, 1, 1]], [[2, 2, 2], [3, 3, 3]]], np.float32)
    verts, faces, colors = voxel_mesh(voxels)
    assert verts.shape == (16, 3)
    assert faces.shape == (24, 3)
    assert faces.max() == 15
    assert colors.shape == (16, 3)
    np.testing.assert_allclose(verts[:8].min(0), [0, 0, 0])
    np.testing.assert_allclose(verts[8:].max(0), [3, 3, 3])


def test_depth_loss_logger():
    logger = DepthLossLogger("train", empty=0.0)
    rgb = np.random.default_rng(0).uniform(size=(6, 3))
    depth_t = np.array([0.0, 1, 2, 0, 3, 4])
    out = logger.tick({}, rgb, rgb * 0.9, depth_t + 0.1, depth_t)
    assert "train/depth_loss" in out and "train/depth_space" in out
    assert "train/rgb_surface_loss" in out and "train/rgb_void_loss" in out
    assert logger.tick({}, rgb, rgb, None, None) == {}
