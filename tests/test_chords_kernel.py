"""Parity: fused Pallas chord-compaction kernel == the XLA paths.

ops/pallas/chords.py replaces buff.tree's monolithic (R, V, K) one-hot
compaction (and, within its supported V range, the slab-scan) on TPU.
These tests force each implementation through `_force_kernel` and pin
bit-identical outputs on the CPU mesh (the kernel runs interpreted
off-TPU), across scalar and per-ray bounds, inactive voxels, cap
binding, axis-aligned rays, and non-aligned shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfmeshes_tpu.buff.tree import ray_voxel_intersect
from nerfmeshes_tpu.ops.pallas import chords


def grid_voxels(n, lo=-1.0, hi=1.0):
    """Disjoint n^3 cell partition of [lo,hi]^3 (the tree's geometry)."""
    edges = np.linspace(lo, hi, n + 1, dtype=np.float32)
    cells = []
    for i in range(n):
        for j in range(n):
            for k in range(n):
                cells.append(
                    [
                        [edges[i], edges[j], edges[k]],
                        [edges[i + 1], edges[j + 1], edges[k + 1]],
                    ]
                )
    return jnp.asarray(np.array(cells, np.float32))


def make_rays(rng, R, src=(0.0, 0.0, -3.0)):
    origins = jnp.broadcast_to(jnp.asarray(src, jnp.float32), (R, 3))
    targets = rng.uniform(-0.9, 0.9, (R, 3)).astype(np.float32)
    d = targets - np.asarray(src, np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return origins, jnp.asarray(d)


def both(voxels, active, origins, dirs, near, far, **kw):
    a = ray_voxel_intersect(
        voxels, active, origins, dirs, near, far, _force_kernel=True, **kw
    )
    b = ray_voxel_intersect(
        voxels, active, origins, dirs, near, far, _force_kernel=False, **kw
    )
    return a, b


def assert_match(a, b):
    for name, x, y in zip(("z_vals", "voxel_idx", "ray_mask", "dropped"), a, b):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=name
        )


def test_kernel_matches_monolithic():
    rng = np.random.default_rng(0)
    voxels = grid_voxels(3)
    active = jnp.ones(voxels.shape[0], bool)
    o, d = make_rays(rng, 37)
    a, b = both(voxels, active, o, d, 0.1, 10.0,
                samples_count=24, max_chords=16)
    assert_match(a, b)
    assert bool(jnp.all(a[2]))  # every ray crosses the cube


def test_kernel_matches_slab_scan_above_slab_v(monkeypatch):
    # V > _SLAB_V forces the XLA side onto the slab scan; the kernel must
    # still match. Shrink the slab bound instead of building 2049 boxes.
    import nerfmeshes_tpu.buff.tree as tree_mod

    monkeypatch.setattr(tree_mod, "_SLAB_V", 16)
    tree_mod.ray_voxel_intersect.clear_cache()
    rng = np.random.default_rng(1)
    voxels = grid_voxels(4)  # 64 voxels > 16
    active = jnp.ones(voxels.shape[0], bool)
    o, d = make_rays(rng, 19)
    a, b = both(voxels, active, o, d, 0.1, 10.0,
                samples_count=16, max_chords=16)
    tree_mod.ray_voxel_intersect.clear_cache()
    assert_match(a, b)


def test_per_ray_bounds():
    rng = np.random.default_rng(2)
    voxels = grid_voxels(3)
    active = jnp.ones(voxels.shape[0], bool)
    o, d = make_rays(rng, 21)
    near = jnp.asarray(rng.uniform(0.05, 2.2, 21).astype(np.float32))
    far = near + jnp.asarray(rng.uniform(1.0, 8.0, 21).astype(np.float32))
    a, b = both(voxels, active, o, d, near, far,
                samples_count=12, max_chords=8)
    assert_match(a, b)


def test_cap_binding_counts_dropped():
    rng = np.random.default_rng(3)
    # On an n^3 grid these rays cross ~n..3n cells; n=6 gave only 6-8
    # crossings so max_chords=8 never bound (the r4 red test). n=12
    # guarantees >8 crossings per ray, so the cap genuinely binds.
    voxels = grid_voxels(12)
    active = jnp.ones(voxels.shape[0], bool)
    o, d = make_rays(rng, 16)
    a, b = both(voxels, active, o, d, 0.1, 10.0,
                samples_count=16, max_chords=8)
    assert_match(a, b)
    assert int(jnp.sum(a[3])) > 0  # the tiny cap actually binds here


def test_inactive_voxels_excluded():
    rng = np.random.default_rng(4)
    voxels = grid_voxels(3)
    active = jnp.asarray(rng.uniform(size=voxels.shape[0]) > 0.5)
    o, d = make_rays(rng, 23)
    a, b = both(voxels, active, o, d, 0.1, 10.0,
                samples_count=16, max_chords=16)
    assert_match(a, b)
    # No sample may land in an inactive voxel on a hit ray.
    idx, mask = np.asarray(a[1]), np.asarray(a[2])
    act = np.asarray(active)
    assert act[idx[mask]].all()


def test_axis_aligned_rays_zero_dir_components():
    voxels = grid_voxels(3)
    active = jnp.ones(voxels.shape[0], bool)
    o = jnp.asarray(
        [[-3.0, 0.1, 0.2], [0.1, -3.0, -0.2], [0.3, -0.1, -3.0]],
        jnp.float32,
    )
    d = jnp.asarray(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32
    )
    a, b = both(voxels, active, o, d, 0.1, 10.0,
                samples_count=8, max_chords=8)
    assert_match(a, b)
    assert bool(jnp.all(a[2]))


def test_misses_and_tiny_shapes():
    voxels = grid_voxels(1)
    active = jnp.ones(1, bool)
    o = jnp.asarray([[0.0, 0.0, -3.0]], jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)  # misses the cube
    a, b = both(voxels, active, o, d, 0.1, 10.0,
                samples_count=8, max_chords=8)
    assert_match(a, b)
    assert not bool(a[2][0])


def test_supported_shapes():
    assert chords.supported(1728, 64)
    assert chords.supported(4096, 128)
    assert chords.supported(1728, 256)
    assert not chords.supported(1728, 12)  # K not group-aligned
    assert not chords.supported(64 * 1024, 64)  # V beyond VMEM residency
    # Auto-doubled caps past 256 fall back to the slab-scan XLA path:
    # the kernel unrolls K/K_GROUP blocks per chunk, so an oversized cap
    # would inflate compile time (tunnel-wedge risk) instead.
    assert not chords.supported(1728, 512)


def test_kernel_usable_falls_back_when_probe_fails(monkeypatch):
    """A Mosaic-style compile failure must degrade to the XLA path with a
    warning, never crash BuFF (the r4 ship-break: broken kernel was the
    default with no fallback)."""
    import warnings

    import nerfmeshes_tpu.buff.tree as tree_mod

    def boom(*a, **k):
        raise RuntimeError("synthetic Mosaic verification failure")

    monkeypatch.setattr(chords, "_interpret", lambda: False)
    monkeypatch.setattr(chords, "compact_chords", boom)
    monkeypatch.setattr(chords, "_HEALTH", {})
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert not chords.kernel_usable(1728, 64)
        assert any("compile probe" in str(w.message) for w in rec)
    # Cached: the probe must not re-run (boom would raise out of the
    # cache-hit path only if called again — assert via a counter).
    calls = []
    monkeypatch.setattr(
        chords, "compact_chords", lambda *a, **k: calls.append(1) or boom()
    )
    assert not chords.kernel_usable(1728, 64)
    assert calls == []

    # End-to-end: kernel requested via env, probe fails -> XLA result.
    monkeypatch.setenv("NERFMESHES_CHORDS_KERNEL", "1")
    rng = np.random.default_rng(6)
    voxels = grid_voxels(3)
    active = jnp.ones(voxels.shape[0], bool)
    o, d = make_rays(rng, 9)
    got = tree_mod.ray_voxel_intersect(
        voxels, active, o, d, 0.1, 10.0, samples_count=12, max_chords=16
    )
    want = tree_mod.ray_voxel_intersect(
        voxels, active, o, d, 0.1, 10.0, samples_count=12, max_chords=16,
        _force_kernel=False,
    )
    assert_match(got, want)


def test_compact_chords_direct_contract():
    """Empty slots: lo/hi big, ids 0; n_hit counts chords beyond K."""
    rng = np.random.default_rng(5)
    voxels = grid_voxels(4)
    active = jnp.ones(voxels.shape[0], bool)
    o, d = make_rays(rng, 9)
    lo_k, hi_k, ids_k, n_hit = chords.compact_chords(
        voxels, active, o, d, 0.1, 10.0, K=8
    )
    assert lo_k.shape == (9, 8) and n_hit.shape == (9,)
    nv = np.minimum(np.asarray(n_hit), 8)
    k = np.arange(8)[None, :]
    empty = k >= nv[:, None]
    assert (np.asarray(lo_k)[empty] == chords._BIG).all()
    assert (np.asarray(hi_k)[empty] == chords._BIG).all()
    assert (np.asarray(ids_k)[empty] == 0.0).all()
    filled = ~empty
    assert (np.asarray(hi_k)[filled] >= np.asarray(lo_k)[filled]).all()
