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


def test_query_rays_device_path_matches_numpy(trained):
    """as_numpy=False must return DEVICE arrays bit-equal to the fetched
    path (the surface-ray exporter post-processes these on device)."""
    import jax

    system, _, _, _ = trained
    bundle = system.val_dataset.image_bundle(0).to_ray_batch()
    o, d = bundle.ray_origins, bundle.ray_directions
    ref = system.query_rays(o, d, 2.0, 6.0, chunk=512,
                            fields=("rgb_map", "depth_map"))
    dev = system.query_rays(o, d, 2.0, 6.0, chunk=512,
                            fields=("rgb_map", "depth_map"), as_numpy=False)
    assert isinstance(dev.rgb_map, jax.Array)
    assert dev.disp_map is None  # field filtering applies on device too
    np.testing.assert_array_equal(np.asarray(dev.rgb_map), ref.rgb_map)
    np.testing.assert_array_equal(np.asarray(dev.depth_map), ref.depth_map)


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


def test_grad_accumulation_matches_big_batch(tiny_cfg):
    """N accumulated micro-grads apply exactly like ONE update with their
    mean (= one big batch, since the MSE loss means over rays). SURVEY
    §2.10 knob; the reference hardcodes it off (src/train_nerf.py:91)."""
    import jax

    from nerfmeshes_tpu.train.optim import build_optimizer

    accum = 4
    cfg_a = tiny_cfg.clone()
    cfg_a.optimizer.accumulate_steps = accum
    cfg_b = tiny_cfg.clone()

    params = {"w": jnp.ones((3, 2)), "b": jnp.arange(2.0)}
    grads = [
        jax.tree_util.tree_map(
            lambda p, i=i: (i + 1.0) * 0.01 * jnp.ones_like(p), params
        )
        for i in range(accum)
    ]
    mean_grad = jax.tree_util.tree_map(
        lambda *gs: sum(gs) / len(gs), *grads
    )

    opt_a = build_optimizer(cfg_a)
    st_a = opt_a.init(params)
    p_a = params
    for i, g in enumerate(grads):
        upd, st_a = opt_a.update(g, st_a, p_a)
        p_prev = p_a
        p_a = __import__("optax").apply_updates(p_a, upd)
        if i < accum - 1:  # params must not move mid-accumulation
            np.testing.assert_array_equal(p_a["w"], p_prev["w"])

    opt_b = build_optimizer(cfg_b)
    st_b = opt_b.init(params)
    upd, _ = opt_b.update(mean_grad, st_b, params)
    p_b = __import__("optax").apply_updates(params, upd)

    np.testing.assert_allclose(p_a["w"], p_b["w"], rtol=1e-6)
    np.testing.assert_allclose(p_a["b"], p_b["b"], rtol=1e-6)


def test_grad_accumulation_train_step(tiny_cfg):
    """The jitted step with accumulate_steps=2 holds params between
    boundaries, steps them at boundaries, and trains to a finite loss."""
    import jax

    from nerfmeshes_tpu.train.optim import build_optimizer
    from nerfmeshes_tpu.train.step import init_train_state, make_train_step
    from nerfmeshes_tpu.train.system import create_models, init_params

    cfg = tiny_cfg.clone()
    cfg.optimizer.accumulate_steps = 2
    cfg.experiment.steps_per_call = 1
    # key(0) inits this tiny net with sigma < 0 everywhere (relu-dead, zero
    # grads); seed 42 + sigma noise matches the trainable system setup.
    cfg.nerf.train.radiance_field_noise_std = 0.2
    ds = SyntheticDataset(cfg, DatasetType.TRAIN, num_images=3, image_size=16)
    data = ds.device_arrays()
    H, W, focal = ds.hwf
    coarse, fine = create_models(cfg)
    opt = build_optimizer(cfg)
    params = init_params(cfg, coarse, fine, jax.random.key(42))
    state = init_train_state(params, opt, 0)
    fn = make_train_step(
        cfg, coarse, fine, opt, H=int(H), W=int(W), focal=float(focal), donate=False
    )

    p0 = np.asarray(
        jax.tree_util.tree_leaves(state.params)[0]
    ).copy()
    state, m = fn(state, data)  # micro-step 1: grads stashed, params held
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    np.testing.assert_array_equal(p0, p1)
    state, m = fn(state, data)  # micro-step 2: optimizer applies
    p2 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert np.any(p2 != p1)
    assert np.isfinite(float(m["train/loss"]))


def test_depth_diagnostics_wired(tiny_cfg, tmp_path):
    """Training on a depth-bearing dataset emits the per-step depth-loss
    decomposition, the periodic TB depth-projection mesh, and the
    coarse/fine/disparity validation images (reference:
    src/nerf/loggers.py:7-108, src/models/model_nerf.py:186-220)."""
    import json as json_mod

    cfg = tiny_cfg.clone()
    cfg.experiment.train_iters = 60
    cfg.experiment.validate_every = 60
    cfg.experiment.print_every = 20
    cfg.experiment.steps_per_call = 10
    cfg.models.use_fine = True
    cfg.logging.use_projection = True
    cfg.logging.projection_step_size = 30
    paths = ExperimentPaths(tmp_path / "depthrun").create()
    system = NeRFSystem(cfg, paths)
    system.setup(
        SyntheticDataset(cfg, DatasetType.TRAIN, num_images=3, image_size=16, with_depth=True),
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=1, image_size=16, with_depth=True),
    )
    system.fit()

    # Scalar decomposition present every logged step.
    lines = [
        json_mod.loads(ln)
        for ln in (paths.events_dir / "metrics.jsonl").read_text().splitlines()
    ]
    train_recs = [r for r in lines if "train/depth_loss" in r]
    assert train_recs, "train/depth_loss missing from metrics"
    for key in (
        "train/depth_empty",
        "train/depth_space",
        "train/depth_l1",
        "train/rgb_surface_loss",
        "train/rgb_void_loss",
    ):
        assert key in train_recs[-1], key

    # Validation images: fine + coarse + disparity + target.
    imgs = {p.name for p in (paths.events_dir / "images").glob("*.png")}
    assert any(n.startswith("validation_rgb_fine") for n in imgs), imgs
    assert any(n.startswith("validation_rgb_coarse") for n in imgs), imgs
    assert any(n.startswith("validation_disparity") for n in imgs), imgs

    # TB depth-projection mesh tag written at the projection cadence.
    if system.logger._tb is not None:
        blobs = b"".join(
            p.read_bytes() for p in paths.events_dir.glob("events.out.tfevents.*")
        )
        assert b"Point Cloud" in blobs


def test_query_rgb_uint8_matches_quantized_float(trained):
    """Device-side uint8 quantization equals quantizing the float fetch."""
    system, _, _, _ = trained
    rng = np.random.default_rng(5)
    d = rng.standard_normal((40, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((40, 3), np.float32)
    f = system.query_rgb(o, d, 2.0, 6.0, chunk=16)
    u = system.query_rgb(o, d, 2.0, 6.0, chunk=16, as_uint8=True)
    assert u.dtype == np.uint8
    expected = np.round(np.clip(f, 0, 1) * 255).astype(np.uint8)
    # Float rounding at the .5 boundary may differ by 1 LSB.
    assert np.abs(u.astype(int) - expected.astype(int)).max() <= 1


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


def test_validation_views_redrawn_per_epoch(tiny_cfg):
    """The per-epoch validation view draw changes with the step (matching
    the reference's RandomSampler(replacement=True) redraw each epoch,
    src/models/model_base.py:139-142) and pins to seed 0 under
    nerf.validation.fixed_views."""
    import copy

    cfg = copy.deepcopy(tiny_cfg)
    cfg.nerf.validation.num_samples = 3
    system = NeRFSystem(cfg)
    system.setup_eval(
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=8, image_size=8)
    )
    system.validate(log_images=False, step=0)
    idx_a = system._last_val_indices
    system.validate(log_images=False, step=5000)
    idx_b = system._last_val_indices
    assert idx_a != idx_b, "view draw must change across validation epochs"
    system.validate(log_images=False, step=5000)
    assert system._last_val_indices == idx_b, "draw must be deterministic per step"

    cfg.nerf.validation.fixed_views = True
    system.validate(log_images=False, step=0)
    fixed_a = system._last_val_indices
    system.validate(log_images=False, step=5000)
    assert system._last_val_indices == fixed_a, "fixed_views must pin the draw"


def test_divergence_guard_raises(trained):
    """A non-finite loss must abort the fit loop with a clear error at
    print cadence, not train on poisoned params to the end. Reuses the
    trained system (compiled train_fn); state is restored afterwards."""
    import jax

    system, _, _, _ = trained
    orig_state = system.state
    try:
        system.state = system.state._replace(
            params=jax.tree_util.tree_map(
                lambda x: x * np.nan, system.state.params
            )
        )
        with pytest.raises(RuntimeError, match="diverged"):
            system.fit(max_steps=int(system.state.step) + 40)
    finally:
        system.state = orig_state


def test_progress_bar_both_paths(monkeypatch):
    """progress_bar mirrors the reference's LoggerCallback tqdm bars
    (src/lightning_modules.py:14-143): a real tqdm when forced on, an
    inert stub when off — identical call surface either way."""
    from nerfmeshes_tpu.utils.logging import progress_bar

    monkeypatch.setenv("NERFMESHES_PROGRESS", "1")
    bar = progress_bar(10, "train", initial=2)
    assert type(bar).__name__ == "tqdm"
    bar.update(3)
    bar.set_postfix_str("loss=0.1", refresh=False)
    assert bar.n == 5
    bar.close()

    monkeypatch.setenv("NERFMESHES_PROGRESS", "0")
    noop = progress_bar(10, "val", position=1)
    assert type(noop).__name__ != "tqdm"
    noop.update(1)
    noop.set_postfix_str("x")
    noop.close()
