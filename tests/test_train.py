"""End-to-end training smoke tests on the synthetic analytic scene."""

import numpy as np
import pytest
import jax.numpy as jnp

from nerfmeshes_tpu.config import load_config
from nerfmeshes_tpu.config.paths import ExperimentPaths
from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
from nerfmeshes_tpu.train.system import NeRFSystem

TINY = "/root/repo/configs/tiny.yml"


@pytest.fixture(scope="module")
def tiny_cfg():
    return load_config(TINY)


@pytest.fixture(scope="module")
def trained(tiny_cfg, tmp_path_factory):
    """Train the tiny system once; several tests inspect the result."""
    paths = ExperimentPaths(tmp_path_factory.mktemp("run")).create()
    system = NeRFSystem(tiny_cfg, paths)
    train_ds = SyntheticDataset(tiny_cfg, DatasetType.TRAIN, num_images=6, image_size=24)
    val_ds = SyntheticDataset(tiny_cfg, DatasetType.VALIDATION, num_images=2, image_size=24)
    system.setup(train_ds, val_ds)

    first = system.validate(log_images=False)
    metrics = system.fit()
    last = system.validate(log_images=False)
    return system, first, metrics, last


def test_loss_decreases(trained):
    _, first, _, last = trained
    assert last["validation/loss"] < first["validation/loss"] * 0.7, (
        f"val loss {first['validation/loss']:.4f} -> {last['validation/loss']:.4f}"
    )


def test_psnr_reasonable(trained):
    _, _, _, last = trained
    assert last["validation/coarse_psnr"] > 12.0


def test_step_counter_advances(trained):
    system, _, metrics, _ = trained
    assert int(system.state.step) == system.cfg.experiment.train_iters
    assert "train/loss" in metrics


def test_checkpoint_roundtrip(trained, tiny_cfg, tmp_path):
    system, _, _, _ = trained
    loss_before = system.validate(log_images=False)["validation/loss"]
    system.save(val_loss=loss_before)

    fresh = NeRFSystem(tiny_cfg, system.paths)
    fresh.setup(system.train_dataset, system.val_dataset)
    fresh.restore(last=True)
    assert int(fresh.state.step) == int(system.state.step)
    np.testing.assert_allclose(
        fresh.validate(log_images=False)["validation/loss"], loss_before, rtol=1e-5
    )


def test_query_rays_shapes(trained):
    system, _, _, _ = trained
    bundle = system.val_dataset.image_bundle(0).to_ray_batch()
    out = system.query_rays(
        bundle.ray_origins, bundle.ray_directions, 2.0, 6.0, chunk=512
    )
    H, W, _ = system.val_dataset.hwf
    assert out.rgb_map.shape == (int(H) * int(W), 3)
    assert np.isfinite(out.rgb_map).all()


def test_sample_points(trained):
    system, _, _, _ = trained
    pts = jnp.zeros((5, 3))
    out = system.sample_points(pts, pts)
    assert out.shape == (5, 4)


def test_sample_all_images_mode(tiny_cfg):
    """Global-ray-pool sampling trains and uses per-ray poses/bounds."""
    import jax

    from nerfmeshes_tpu.train.optim import build_optimizer
    from nerfmeshes_tpu.train.step import init_train_state, make_train_step
    from nerfmeshes_tpu.train.system import create_models, init_params

    cfg = tiny_cfg.clone()
    cfg.nerf.train.sample_all_images = True
    cfg.experiment.steps_per_call = 5
    ds = SyntheticDataset(cfg, DatasetType.TRAIN, num_images=4, image_size=16)
    data = ds.device_arrays()
    H, W, focal = ds.hwf
    coarse, fine = create_models(cfg)
    opt = build_optimizer(cfg)
    params = init_params(cfg, coarse, fine, jax.random.key(0))
    state = init_train_state(params, opt, 0)
    fn = make_train_step(cfg, coarse, fine, opt, H=int(H), W=int(W), focal=float(focal), donate=False)
    first = None
    for _ in range(10):
        state, m = fn(state, data)
        if first is None:
            first = float(m["train/loss"])
    assert np.isfinite(float(m["train/loss"]))
    assert float(m["train/loss"]) < max(first, 0.2)


def test_query_rgb_matches_query_rays(trained):
    """The single-dispatch batched rgb renderer must agree with the
    per-chunk render_image path (same settings, same params)."""
    system, _, _, _ = trained
    rng = np.random.default_rng(3)
    d = rng.standard_normal((50, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((50, 3), np.float32)

    ref = np.asarray(
        system.query_rays(o, d, 2.0, 6.0, chunk=16, fields=("rgb_map",)).rgb_map
    )
    got = system.query_rgb(o, d, 2.0, 6.0, chunk=16)
    assert got.shape == (50, 3)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_bfloat16_compute_dtype_trains(tiny_cfg, tmp_path):
    """--precision 16 path: bf16 compute trains to a finite decreasing
    loss (params/accum stay f32)."""
    import copy

    cfg = copy.deepcopy(tiny_cfg)
    cfg.defrost() if hasattr(cfg, "defrost") else None
    cfg.experiment.compute_dtype = "bfloat16"
    cfg.experiment.train_iters = 40
    paths = ExperimentPaths(tmp_path).create()
    system = NeRFSystem(cfg, paths)
    system.setup(
        SyntheticDataset(cfg, DatasetType.TRAIN, num_images=3, image_size=16),
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=1, image_size=16),
    )
    first = system.validate(log_images=False)["validation/loss"]
    system.fit()
    last = system.validate(log_images=False)["validation/loss"]
    assert np.isfinite(last) and last < first
