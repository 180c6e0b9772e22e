"""Sharded training tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerfmeshes_tpu.config import load_config
from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
from nerfmeshes_tpu.parallel.mesh import create_mesh, replicated
from nerfmeshes_tpu.train.optim import build_optimizer
from nerfmeshes_tpu.train.step import init_train_state, make_train_step
from nerfmeshes_tpu.train.system import create_models, init_params


@pytest.fixture(scope="module")
def setup():
    cfg = load_config("/root/repo/configs/tiny.yml")
    cfg.experiment.steps_per_call = 5
    cfg.nerf.train.num_random_rays = 256  # divisible by 8
    cfg.experiment.use_fused_kernel = False  # interpret-mode pallas is slow
    ds = SyntheticDataset(cfg, DatasetType.TRAIN, num_images=4, image_size=16)
    data = ds.device_arrays()
    H, W, focal = ds.hwf
    coarse, fine = create_models(cfg)
    opt = build_optimizer(cfg)
    params = init_params(cfg, coarse, fine, jax.random.key(0))
    return cfg, ds, data, (int(H), int(W), float(focal)), coarse, fine, opt, params


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_step_runs_and_learns(setup):
    cfg, ds, data, (H, W, focal), coarse, fine, opt, params = setup
    mesh = create_mesh()
    assert int(np.prod(mesh.devices.shape)) == 8

    rep = replicated(mesh)
    state = jax.device_put(init_train_state(params, opt, 0), rep)
    data_r = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), data)

    fn = make_train_step(
        cfg, coarse, fine, opt, H=H, W=W, focal=focal, mesh=mesh, donate=False
    )
    state, m0 = fn(state, data_r)
    first = float(m0["train/loss"])
    for _ in range(9):
        state, m = fn(state, data_r)
    last = float(m["train/loss"])
    assert np.isfinite(first) and np.isfinite(last)
    # Untrained loss on this scene is ~0.19; converged-ish is well below.
    # (last < first is too noisy at 256 rays/step.)
    assert last < 0.12
    assert int(state.step) == 50


def test_sharded_matches_single_device_loss_scale(setup):
    """Sharded and unsharded steps must optimize the same objective: after
    the same number of steps from the same init, losses land in the same
    ballpark (different pixel draws, same distribution)."""
    cfg, ds, data, (H, W, focal), coarse, fine, opt, params = setup
    mesh = create_mesh()
    rep = replicated(mesh)

    fn_sharded = make_train_step(
        cfg, coarse, fine, opt, H=H, W=W, focal=focal, mesh=mesh, donate=False
    )
    fn_single = make_train_step(
        cfg, coarse, fine, opt, H=H, W=W, focal=focal, mesh=None, donate=False
    )

    s_sh = jax.device_put(init_train_state(params, opt, 0), rep)
    data_r = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), data)
    s_si = init_train_state(params, opt, 0)

    for _ in range(6):
        s_sh, m_sh = fn_sharded(s_sh, data_r)
        s_si, m_si = fn_single(s_si, data)
    l_sh, l_si = float(m_sh["train/loss"]), float(m_si["train/loss"])
    assert l_sh < 0.15 and l_si < 0.15
    assert abs(np.log(l_sh / l_si)) < 1.5  # same objective scale


def test_graft_dryrun():
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft", "/root/repo/__graft_entry__.py")
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)
    g.dryrun_multichip(8)


def test_sharded_buff_step_runs_and_integrates(setup):
    """BuFF sharded path: per-device ray slices + psum'ed voxel
    accumulators; params stay in sync and the tree integrates."""
    from nerfmeshes_tpu.buff.system import BuffCarry, make_buff_train_step
    from nerfmeshes_tpu.buff.tree import TreeSampling

    cfg = load_config("/root/repo/configs/tiny.yml")
    cfg.experiment.steps_per_call = 3
    cfg.nerf.train.num_random_rays = 256
    cfg.experiment.use_fused_kernel = False
    cfg.tree.subdivision_outer_count = 4
    cfg.tree.max_voxel_count = 256
    cfg.tree.step_size_integration_offset = 0
    cfg.tree.step_size_tree = 10_000  # no consolidation inside this test
    # At init relu(sigma) can be dead everywhere on the white-background
    # scene (zero gradient); sigma noise is the reference's kick for this.
    cfg.nerf.train.radiance_field_noise_std = 1.0
    ds = SyntheticDataset(cfg, DatasetType.TRAIN, num_images=4, image_size=16)
    data = ds.device_arrays()
    H, W, focal = ds.hwf
    coarse, fine = create_models(cfg)
    opt = build_optimizer(cfg)
    params = init_params(cfg, coarse, fine, jax.random.key(0))

    mesh = create_mesh()
    tree = TreeSampling(cfg)
    tree_state = tree.device_state()
    rep = replicated(mesh)
    state = jax.device_put(init_train_state(params, opt, 0), rep)
    data_r = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), data)
    carry = BuffCarry(state, jax.device_put(tree_state, rep))

    fn = make_buff_train_step(
        cfg, coarse, opt, H=int(H), W=int(W), focal=float(focal),
        mesh=mesh, donate=False,
    )
    # Several calls: at init relu(sigma) is ~all-zero so the first steps
    # legitimately integrate nothing; density turns on within a few dozen.
    for _ in range(10):
        carry, metrics = fn(carry, data_r)
    assert np.isfinite(float(metrics["train/loss"]))
    assert int(carry.train.step) == 30
    assert int(carry.tree.counter) == tree_state.counter + 30
    # integration actually moved the running means
    assert float(jnp.abs(carry.tree.memm - tree_state.memm).max()) > 0


def test_integrate_psum_matches_global_batch():
    """integrate under shard_map over per-device slices == integrate of
    the full batch on one device."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from nerfmeshes_tpu.buff.tree import TreeState, integrate
    from nerfmeshes_tpu.parallel.mesh import DATA_AXIS, create_mesh

    rng = np.random.default_rng(3)
    V, R, S = 16, 64, 5
    state = TreeState(
        voxels=jnp.zeros((V, 2, 3)),
        active=jnp.ones((V,), bool),
        memm=jnp.asarray(rng.uniform(0, 1, (V,)).astype(np.float32)),
        counter=jnp.asarray(4, jnp.int32),
    )
    vox = jnp.asarray(rng.integers(0, V, (R, S)).astype(np.int32))
    w = jnp.asarray(rng.uniform(0, 1, (R, S)).astype(np.float32))
    mw = jnp.asarray((rng.uniform(0, 1, (R, S)) > 0.3).astype(np.float32))
    rmask = jnp.asarray((rng.uniform(0, 1, (R,)) > 0.2))

    ref = integrate(state, vox, w, mw, rmask)

    mesh = create_mesh()
    sharded = shard_map(
        partial(integrate, axis_name=DATA_AXIS),
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    got = jax.jit(sharded)(state, vox, w, mw, rmask)
    np.testing.assert_allclose(
        np.asarray(got.memm), np.asarray(ref.memm), rtol=1e-5, atol=1e-6
    )
    assert int(got.counter) == int(ref.counter)


def test_sharded_buff_step_with_chords_kernel_matches_xla(monkeypatch):
    """The fused chords Pallas kernel through the SHARDED BuFF step
    (VERDICT r4 item 3: off-TPU the kernel is normally disabled, so the
    multi-device apparatus never exercised it — force it interpreted
    here). Same init + seeds, kernel vs XLA compaction: the whole step's
    loss and integrated tree state must match bit-for-bit."""
    from nerfmeshes_tpu.buff.system import BuffCarry, make_buff_train_step
    from nerfmeshes_tpu.buff.tree import TreeSampling

    cfg = load_config("/root/repo/configs/tiny.yml")
    cfg.experiment.steps_per_call = 2
    cfg.nerf.train.num_random_rays = 256
    cfg.experiment.use_fused_kernel = False
    cfg.tree.subdivision_outer_count = 4
    cfg.tree.max_voxel_count = 256
    cfg.tree.step_size_integration_offset = 0
    cfg.tree.step_size_tree = 10_000
    cfg.nerf.train.radiance_field_noise_std = 1.0
    ds = SyntheticDataset(cfg, DatasetType.TRAIN, num_images=2, image_size=16)
    data = ds.device_arrays()
    H, W, focal = ds.hwf
    coarse, fine = create_models(cfg)
    opt = build_optimizer(cfg)
    params = init_params(cfg, coarse, fine, jax.random.key(0))

    mesh = create_mesh()
    rep = replicated(mesh)
    data_r = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), data)

    def run(env_value):
        monkeypatch.setenv("NERFMESHES_CHORDS_KERNEL", env_value)
        tree = TreeSampling(cfg)
        carry = BuffCarry(
            jax.device_put(init_train_state(params, opt, 0), rep),
            jax.device_put(tree.device_state(), rep),
        )
        fn = make_buff_train_step(
            cfg, coarse, opt, H=int(H), W=int(W), focal=float(focal),
            mesh=mesh, donate=False,
        )
        carry, metrics = fn(carry, data_r)
        return carry, metrics

    c_k, m_k = run("1")  # kernel path, interpreted on the CPU mesh
    c_x, m_x = run("0")  # XLA one-hot compaction
    np.testing.assert_array_equal(
        np.asarray(m_k["train/loss"]), np.asarray(m_x["train/loss"])
    )
    np.testing.assert_array_equal(
        np.asarray(c_k.tree.memm), np.asarray(c_x.tree.memm)
    )
    np.testing.assert_array_equal(
        np.asarray(
            jax.tree_util.tree_leaves(c_k.train.params)[0]
        ),
        np.asarray(jax.tree_util.tree_leaves(c_x.train.params)[0]),
    )
