"""Utility helpers: batchify, image casting, point-cloud export, acronyms,
profiling harness."""

import numpy as np

from nerfmeshes_tpu.utils.images import (
    batchify,
    cast_to_disparity_image,
    cast_to_image,
    cast_to_pil_image,
    export_point_cloud,
)
from nerfmeshes_tpu.utils.logging import acronym


def test_batchify():
    a = np.arange(10)
    b = np.arange(20).reshape(10, 2)
    chunks = list(batchify(a, b, None, batch_size=4))
    assert len(chunks) == 3
    assert chunks[0][0].shape == (4,) and chunks[2][0].shape == (2,)
    assert chunks[1][1].shape == (4, 2) and chunks[0][2] is None


def test_cast_to_image():
    img = np.random.default_rng(0).uniform(size=(5, 7, 3))
    out = cast_to_image(img)
    assert out.shape == (3, 5, 7) and out.dtype == np.uint8
    assert cast_to_pil_image(img).shape == (5, 7, 3)


def test_cast_to_disparity_image():
    disp = np.array([[0.0, 1.0], [2.0, 4.0]])
    out = cast_to_disparity_image(disp)
    assert out.dtype == np.uint8 and out[0, 0] == 0 and out[1, 1] == 255
    out_w = cast_to_disparity_image(disp, white_background=True)
    assert out_w[0, 0] == 255


def test_export_point_cloud(tmp_path):
    rng = np.random.default_rng(0)
    dirs = rng.standard_normal((6, 3))
    path = export_point_cloud(
        7, np.zeros(3), dirs, rng.uniform(1, 2, 6), rng.uniform(1, 2, 6),
        save_dir=str(tmp_path),
    )
    text = open(path).read()
    assert text.count("v ") == 12 and "0007.obj" in path


def test_acronym():
    assert acronym("train/coarse_loss") == "t/cl"
    assert acronym("validation/fine_psnr") == "v/fp"
    assert acronym("train/loss") == "t/loss"
    assert acronym("train/lr") == "t/lr"
