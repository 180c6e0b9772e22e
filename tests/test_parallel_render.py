"""Sharded render-path tests (SURVEY §2.10/§5: eval tiles over the mesh)
plus the full multi-device fit-loop composition the CLI defaults to on
real multi-chip hardware: consolidation boundaries, chord-cap recompile,
checkpoint save/restore, and the validation interleave — all on the
8-device virtual CPU mesh.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerfmeshes_tpu.config import load_config
from nerfmeshes_tpu.config.paths import ExperimentPaths
from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
from nerfmeshes_tpu.parallel.mesh import create_mesh
from nerfmeshes_tpu.train.system import NeRFSystem

TINY = "/root/repo/configs/tiny.yml"


def tiny_cfg():
    cfg = load_config(TINY)
    cfg.experiment.use_fused_kernel = False  # interpret-mode pallas is slow
    return cfg


@pytest.fixture(scope="module")
def ray_batch():
    rng = np.random.default_rng(7)
    d = rng.standard_normal((96, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((96, 3), np.float32)
    return o, d


def test_sharded_render_chunk_matches_single_device(ray_batch):
    """make_render_chunk(mesh=...) must equal the single-device render
    numerically (same params, deterministic eval settings)."""
    from nerfmeshes_tpu.train.step import make_render_chunk, render_image
    from nerfmeshes_tpu.train.system import create_models, init_params

    cfg = tiny_cfg()
    coarse, fine = create_models(cfg)
    params = init_params(cfg, coarse, fine, jax.random.key(0))
    mesh = create_mesh()

    single = make_render_chunk(cfg, coarse, fine)
    sharded = make_render_chunk(cfg, coarse, fine, mesh=mesh)

    o, d = ray_batch
    c_s, f_s = render_image(single, params, o, d, 2.0, 6.0, chunk_size=32)
    c_m, f_m = render_image(sharded, params, o, d, 2.0, 6.0, chunk_size=32)
    np.testing.assert_allclose(c_m.rgb_map, c_s.rgb_map, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(c_m.depth_map, c_s.depth_map, rtol=1e-5, atol=1e-6)
    if f_s is not None:
        np.testing.assert_allclose(f_m.rgb_map, f_s.rgb_map, rtol=1e-5, atol=1e-6)


def test_sharded_render_chunk_rejects_bad_chunk(ray_batch):
    """A chunk not divisible by the mesh size must fail loudly, not
    silently mis-shard."""
    from nerfmeshes_tpu.train.step import make_render_chunk

    cfg = tiny_cfg()
    from nerfmeshes_tpu.train.system import create_models, init_params

    coarse, fine = create_models(cfg)
    params = init_params(cfg, coarse, fine, jax.random.key(0))
    sharded = make_render_chunk(cfg, coarse, fine, mesh=create_mesh())
    o = jnp.zeros((12, 3), jnp.float32)  # 12 % 8 != 0
    d = jnp.ones((12, 3), jnp.float32)
    with pytest.raises(Exception):
        jax.block_until_ready(sharded(params, o, d, 2.0, 6.0))


def test_round_chunk():
    from nerfmeshes_tpu.train.step import round_chunk

    mesh = create_mesh()
    assert round_chunk(1024, mesh) == 1024
    assert round_chunk(1025, mesh) == 1032
    assert round_chunk(3, mesh) == 8
    assert round_chunk(100, None) == 100


def test_sharded_query_rgb_matches(ray_batch):
    """System-level: query_rgb through the sharded batched renderer ==
    unsharded (identical params from identical seeds)."""
    cfg = tiny_cfg()
    sys_single = NeRFSystem(cfg)
    sys_sharded = NeRFSystem(cfg, mesh=create_mesh())
    o, d = ray_batch
    a = sys_single.query_rgb(o, d, 2.0, 6.0, chunk=32)
    b = sys_sharded.query_rgb(o, d, 2.0, 6.0, chunk=32)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_sharded_grid_eval_matches():
    """extract_density over the mesh == single device, including a grid
    size that does not divide evenly into tiles."""
    from nerfmeshes_tpu.mesh.extract import extract_density

    cfg = tiny_cfg()
    system = NeRFSystem(cfg)

    def density_fn(params, pts):
        return system.density_apply(params, pts)

    single = extract_density(
        system.sample_points, 1.2, 17, tile=1024,
        density_fn=lambda pts: system.density_points(pts),
    )
    sharded = extract_density(
        system.sample_points, 1.2, 17, tile=1024,
        density_fn=lambda pts: system.density_points(pts), mesh=create_mesh(),
    )
    np.testing.assert_allclose(sharded, single, rtol=1e-3, atol=1e-3)  # f16 wire


def test_sharded_sparse_extract_matches():
    """The sparse block-transfer geometry path under the mesh returns the
    same surface as single-device."""
    from nerfmeshes_tpu.mesh.extract import MeshArgs, extract_geometry

    cfg = tiny_cfg()
    system = NeRFSystem(cfg)
    args = MeshArgs(res=32, limit=1.2, iso_level=0.0)
    v_s, t_s, _, _ = extract_geometry(
        system.sample_points, args,
        density_fn=system.density_apply, density_params=system.finest_params,
    )
    v_m, t_m, _, _ = extract_geometry(
        system.sample_points, args,
        density_fn=system.density_apply, density_params=system.finest_params,
        mesh=create_mesh(),
    )
    assert v_s.shape == v_m.shape and t_s.shape == t_m.shape
    np.testing.assert_allclose(v_m, v_s, atol=1e-4)


def test_buff_sharded_render_matches():
    """BuFF tree renderer sharded == single device (identical init)."""
    from nerfmeshes_tpu.buff.system import BuFFSystem

    cfg = tiny_cfg()
    cfg.tree.subdivision_outer_count = 4
    cfg.tree.max_voxel_count = 128
    rng = np.random.default_rng(5)
    d = rng.standard_normal((64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((64, 3), np.float32)

    sys_single = BuFFSystem(cfg).setup_eval(
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=1, image_size=8)
    )
    sys_sharded = BuFFSystem(cfg, mesh=create_mesh()).setup_eval(
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=1, image_size=8)
    )
    a = sys_single.query_rays(o, d, 2.0, 6.0, chunk=32, fields=("rgb_map",))
    b = sys_sharded.query_rays(o, d, 2.0, 6.0, chunk=32, fields=("rgb_map",))
    np.testing.assert_allclose(b.rgb_map, a.rgb_map, rtol=1e-5, atol=1e-6)
    c = sys_single.query_rgb(o, d, 2.0, 6.0, chunk=32)
    e = sys_sharded.query_rgb(o, d, 2.0, 6.0, chunk=32)
    np.testing.assert_allclose(e, c, rtol=1e-5, atol=1e-6)


def test_nerf_fit_multidevice_e2e(tmp_path):
    """The CLI-default multi-device composition for NeRFSystem: fit with
    a live mesh (sharded train step + sharded validation interleave +
    checkpointing), then restore and reproduce validation exactly."""
    cfg = tiny_cfg()
    cfg.experiment.train_iters = 60
    cfg.experiment.validate_every = 30
    cfg.experiment.print_every = 30
    cfg.experiment.steps_per_call = 10
    mesh = create_mesh()
    paths = ExperimentPaths(tmp_path / "run").create()
    system = NeRFSystem(cfg, paths, mesh=mesh)
    system.setup(
        SyntheticDataset(cfg, DatasetType.TRAIN, num_images=4, image_size=16),
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=2, image_size=16),
    )
    first = system.validate(log_images=False, step=0)["validation/loss"]
    system.fit()
    last = system.validate(log_images=False, step=0)["validation/loss"]
    assert np.isfinite(last) and last < first
    assert int(system.state.step) == 60

    # Restore into a fresh sharded system: step + validation reproduce.
    fresh = NeRFSystem(cfg, paths, mesh=mesh)
    fresh.setup_eval(system.val_dataset)
    fresh.restore(last=True)
    assert int(fresh.state.step) == 60
    re_val = fresh.validate(log_images=False, step=0)["validation/loss"]
    np.testing.assert_allclose(re_val, last, rtol=1e-5)


def test_topology_change_resume(tmp_path):
    """Checkpoints are topology-portable: save under the 8-device mesh,
    restore and continue on 1 device, save there, restore back onto 8.

    Pinned contracts: (a) a disk round-trip on the SAME topology does not
    perturb the continued trajectory (params/step/key bit-restore, so one
    more steps_per_call block reproduces exactly); (b) cross-topology
    restores (8→1 and 1→8) are exact — validation reproduces — and
    training continues on the new topology. Trajectories across DIFFERENT
    topologies legitimately diverge (per-device axis_index key folding),
    so only same-topology trajectories are compared."""
    cfg = tiny_cfg()
    cfg.experiment.train_iters = 30
    cfg.experiment.validate_every = 30
    cfg.experiment.print_every = 30
    cfg.experiment.steps_per_call = 10
    train_ds = SyntheticDataset(cfg, DatasetType.TRAIN, num_images=4, image_size=16)
    val_ds = SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=2, image_size=16)

    mesh8 = create_mesh()
    paths = ExperimentPaths(tmp_path / "topo").create()
    sys8 = NeRFSystem(cfg, paths, mesh=mesh8)
    sys8.setup(train_ds, val_ds)
    sys8.fit()  # validates + checkpoints at step 30
    assert int(sys8.state.step) == 30
    val8 = sys8.validate(log_images=False, step=0)["validation/loss"]

    # (a) same-topology round-trip: one more block, original vs restored.
    cont_state, cont_metrics = sys8._train_fn(sys8.state, sys8._data)
    re8 = NeRFSystem(cfg, paths, mesh=mesh8)
    re8.setup(train_ds, val_ds)
    re8.restore(last=True)
    assert int(re8.state.step) == 30
    re_state, re_metrics = re8._train_fn(re8.state, re8._data)
    np.testing.assert_allclose(
        float(re_metrics["train/loss"]), float(cont_metrics["train/loss"]),
        rtol=1e-6,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6
        ),
        re_state.params, cont_state.params,
    )

    # (b) 8 → 1: restore onto a single device; exact val, then continue.
    sys1 = NeRFSystem(cfg, paths, mesh=None)
    sys1.setup(train_ds, val_ds)
    sys1.restore(last=True)
    assert int(sys1.state.step) == 30
    val1 = sys1.validate(log_images=False, step=0)["validation/loss"]
    np.testing.assert_allclose(val1, val8, rtol=1e-5)
    sys1.fit(max_steps=40)  # one block on the new topology; saves at 40
    assert int(sys1.state.step) == 40
    val1_end = sys1.validate(log_images=False, step=0)["validation/loss"]
    assert np.isfinite(val1_end)

    # 1 → 8: the single-device checkpoint restores back onto the mesh.
    back8 = NeRFSystem(cfg, paths, mesh=mesh8)
    back8.setup(train_ds, val_ds)
    back8.restore(last=True)
    assert int(back8.state.step) == 40
    val_back = back8.validate(log_images=False, step=0)["validation/loss"]
    np.testing.assert_allclose(val_back, val1_end, rtol=1e-5)
    _, metrics_next = back8._train_fn(back8.state, back8._data)
    assert np.isfinite(float(metrics_next["train/loss"]))


def test_buff_fit_multidevice_e2e(tmp_path):
    """BuFFSystem multi-device fit through TWO consolidation boundaries
    AND a chord-cap recompile, with sharded validation + checkpoint
    restore — the exact composition the multi-chip CLI runs by default."""
    from nerfmeshes_tpu.buff.system import BuFFSystem

    cfg = tiny_cfg()
    cfg.experiment.train_iters = 80
    cfg.experiment.validate_every = 40
    cfg.experiment.print_every = 20
    cfg.experiment.steps_per_call = 10
    cfg.nerf.train.num_random_rays = 256
    cfg.nerf.train.num_coarse = 8
    cfg.nerf.validation.num_coarse = 8
    cfg.nerf.train.radiance_field_noise_std = 1.0
    cfg.models.coarse.num_layers = 2
    cfg.models.coarse.hidden_size = 16
    cfg.tree.subdivision_outer_count = 4
    cfg.tree.max_voxel_count = 256
    cfg.tree.step_size_integration_offset = 10
    cfg.tree.step_size_tree = 20  # boundaries at steps 30, 50, 70
    cfg.tree.max_chords_per_ray = 4  # binds on the 4^3 grid -> recompile

    mesh = create_mesh()
    paths = ExperimentPaths(tmp_path / "buffrun").create()
    system = BuFFSystem(cfg, paths, mesh=mesh)
    system.setup(
        SyntheticDataset(cfg, DatasetType.TRAIN, num_images=4, image_size=16),
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=2, image_size=16),
    )
    v0 = int(np.asarray(system.tree_state.active).sum())
    system.fit()
    assert int(system.state.step) == 80
    # Consolidation ran (voxel population changed from the uniform root
    # grid) and the binding cap auto-doubled mid-run.
    assert int(np.asarray(system.tree_state.active).sum()) != v0
    assert system._effective_max_chords() > 4

    final_val = system.validate(log_images=False, step=0)["validation/loss"]
    system.save(val_loss=final_val)

    # A later eval session reloads the run's hparams.yaml — which the cap
    # growth re-saved, so the fresh system renders with the grown cap
    # (building from the ORIGINAL cfg would silently drop chords at eval).
    from nerfmeshes_tpu.config.paths import load_hparams

    cfg_eval = load_hparams(str(paths.log_dir))
    assert int(cfg_eval.tree.max_chords_per_ray) == system._effective_max_chords()
    fresh = BuFFSystem(cfg_eval, paths, mesh=mesh)
    fresh.setup_eval(system.val_dataset)
    fresh.restore(last=True)
    assert int(fresh.state.step) == 80
    np.testing.assert_allclose(
        np.asarray(fresh.tree_state.memm), np.asarray(system.tree_state.memm),
        rtol=1e-6,
    )
    re_val = fresh.validate(log_images=False, step=0)["validation/loss"]
    np.testing.assert_allclose(re_val, final_val, rtol=1e-5)
