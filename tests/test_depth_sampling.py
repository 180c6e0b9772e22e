"""Depth-informed samplers (ops/depth_sampling.py) + density_weights.

Rebuilds of reference dead code (src/models/model_helpers.py:38-127,
src/nerf/modules.py:124-145) — semantics pinned here since no live
reference path exercises them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfmeshes_tpu.ops.depth_sampling import (
    STRATEGIES,
    depth_guided_intervals,
    depth_informed_intervals,
    proximal_intervals,
    random_intervals,
    surface_band_intervals,
)
from nerfmeshes_tpu.ops.render import density_weights, volume_render
from nerfmeshes_tpu.ops.sampling import ray_sample_interval


KEY = jax.random.key(7)
R, S = 32, 24
EMPTY = 5.0


def _depth_with_holes():
    """Per-ray GT depth where half the rays are 'empty' (no surface)."""
    rng = np.random.default_rng(0)
    depth = rng.uniform(2.5, 4.5, size=R).astype(np.float32)
    depth[::2] = EMPTY
    return jnp.asarray(depth)


def test_density_weights_matches_volume_render_weights():
    rng = np.random.default_rng(1)
    field = jnp.asarray(rng.standard_normal((R, S, 4)).astype(np.float32))
    z = jnp.sort(jnp.asarray(rng.uniform(2.0, 6.0, (R, S)).astype(np.float32)), -1)
    dirs = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))
    out = volume_render(field, z, dirs, train=True)
    w = density_weights(field[..., 3], z, dirs)
    np.testing.assert_allclose(np.asarray(w), np.asarray(out.weights), rtol=1e-6)


def test_random_intervals_sorted_and_bounded_per_ray():
    near = jnp.linspace(1.0, 2.0, R)
    far = jnp.linspace(5.0, 8.0, R)
    z = np.asarray(random_intervals(KEY, near, far, R, S))
    assert z.shape == (R, S)
    assert (np.diff(z, axis=-1) >= 0).all()
    assert (z >= np.asarray(near)[:, None]).all()
    assert (z <= np.asarray(far)[:, None]).all()
    # Uniform law sanity: mean of sorted uniforms spans the interval.
    mids = (z - np.asarray(near)[:, None]) / np.asarray(far - near)[:, None]
    assert abs(mids.mean() - 0.5) < 0.05


def test_depth_informed_concentrates_before_surface():
    depth = _depth_with_holes()
    z = np.asarray(
        depth_informed_intervals(
            KEY, depth, 2.0, 6.0, S, empty=EMPTY, threshold=0.5
        )
    )
    assert (np.diff(z, axis=-1) >= 0).all()
    has = np.asarray(depth) != EMPTY
    # Known-depth rays: linear ramp ending exactly at depth + threshold.
    np.testing.assert_allclose(z[has, -1], np.asarray(depth)[has] + 0.5, rtol=1e-6)
    np.testing.assert_allclose(z[has, 0], 2.0, atol=1e-6)
    # Unknown rays: random fill within [near, far].
    assert (z[~has] >= 2.0).all() and (z[~has] <= 6.0).all()
    # And genuinely random (not the linear ramp).
    ramp = np.linspace(2.0, 6.0, S)
    assert np.abs(z[~has] - ramp).max() > 1e-3


def test_surface_band_is_banded_where_depth_known():
    depth = _depth_with_holes()
    fc2, off = 2.0, 0.5
    z = np.asarray(
        surface_band_intervals(
            KEY, depth, 2.0, 6.0, S, empty=EMPTY, fc2=fc2, off=off
        )
    )
    assert (np.diff(z, axis=-1) >= 0).all()
    has = np.asarray(depth) != EMPTY
    lo, hi = (0.0 - off) / fc2, (1.0 - off) / fc2
    assert (z[has] >= lo - 1e-6).all() and (z[has] <= hi + 1e-6).all()
    # Unknown rays take the plain linear ramp. (assert_allclose does NOT
    # broadcast non-scalar shapes — materialize the expected rows.)
    expect = np.broadcast_to(np.linspace(2.0, 6.0, S), z[~has].shape)
    np.testing.assert_allclose(z[~has], expect, rtol=1e-5)


def test_proximal_exact_formula():
    depth = _depth_with_holes()
    off = 0.4
    z = np.asarray(proximal_intervals(depth, 2.0, 6.0, S, empty=EMPTY, off=off))
    has = np.asarray(depth) != EMPTY
    t = np.linspace(0.0, 1.0, S, dtype=np.float32)
    near_t = np.where(has, np.asarray(depth) - off, 2.0).astype(np.float32)
    expect = near_t[:, None] * (1.0 - t) + 6.0 * t
    np.testing.assert_allclose(z, expect, rtol=1e-5)


def test_dispatch_linear_matches_ray_sample_interval():
    z = depth_guided_intervals("linear", 2.0, 6.0, R, S)
    ref = ray_sample_interval(S, R, 2.0, 6.0)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref))


def test_dispatch_extra_merge_matches_full_sort():
    rng = np.random.default_rng(3)
    extra = np.sort(rng.uniform(2.0, 6.0, (R, 7)).astype(np.float32), -1)
    z = np.asarray(
        depth_guided_intervals(
            "random", 2.0, 6.0, R, S, key=KEY, extra_intervals=jnp.asarray(extra)
        )
    )
    base = np.asarray(random_intervals(KEY, 2.0, 6.0, R, S))
    expect = np.sort(np.concatenate([base, extra], axis=-1), axis=-1)
    np.testing.assert_allclose(z, expect, rtol=1e-6)


def test_dispatch_validates_arguments():
    with pytest.raises(ValueError, match="unknown strategy"):
        depth_guided_intervals("nope", 2.0, 6.0, R, S)
    with pytest.raises(ValueError, match="requires per-ray depth"):
        depth_guided_intervals("proximal", 2.0, 6.0, R, S)
    with pytest.raises(ValueError, match="requires a PRNG key"):
        depth_guided_intervals("random", 2.0, 6.0, R, S)


def test_all_strategies_jit_and_static_shape():
    depth = _depth_with_holes()

    for strat in STRATEGIES:
        fn = jax.jit(
            lambda k, d, s=strat: depth_guided_intervals(
                s, 2.0, 6.0, R, S, key=k, depth=d, empty=EMPTY
            )
        )
        z = fn(KEY, depth)
        assert z.shape == (R, S)
        assert np.isfinite(np.asarray(z)).all()
