"""Fused Pallas MLP kernel: forward/backward parity with the flax model
(interpret mode on the CPU mesh; compiled parity is exercised on TPU by
bench/verification runs)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerfmeshes_tpu.models import FlexibleNeRFModel, SimpleModel
from nerfmeshes_tpu.ops.pallas.fused_mlp import (
    fused_flexible_apply,
    spec_from_model,
    supports_fused,
)


def make(num_layers=4, hidden=128, skip=2, Lx=4, Ld=2):
    return FlexibleNeRFModel(
        num_layers=num_layers,
        hidden_size=hidden,
        skip_step=skip,
        num_encoding_fn_xyz=Lx,
        num_encoding_fn_dir=Ld,
        dtype=jnp.bfloat16,
    )


@pytest.mark.parametrize("num_layers,skip", [(4, 2), (8, 4), (3, 4)])
def test_forward_parity(rng, num_layers, skip):
    model = make(num_layers=num_layers, skip=skip)
    pts = jnp.asarray(rng.standard_normal((40, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((40, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), pts, dirs)
    ref = model.apply(params, pts, dirs)
    got = fused_flexible_apply(model, params, pts, dirs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_forward_parity_batched_shape(rng):
    model = make()
    pts = jnp.asarray(rng.standard_normal((6, 7, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((6, 7, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), pts, dirs)
    got = fused_flexible_apply(model, params, pts, dirs)
    assert got.shape == (6, 7, 4)


def test_grad_parity(rng):
    model = make()
    pts = jnp.asarray(rng.standard_normal((32, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((32, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), pts, dirs)

    g_ref = jax.grad(lambda p: jnp.sum(model.apply(p, pts, dirs) ** 2))(params)
    g_fused = jax.grad(
        lambda p: jnp.sum(fused_flexible_apply(model, p, pts, dirs) ** 2)
    )(params)
    rels = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-6)),
        g_ref,
        g_fused,
    )
    worst = max(jax.tree_util.tree_leaves(rels))
    assert worst < 5e-2, f"worst grad rel err {worst}"


def test_supports_fused():
    assert supports_fused(make())
    assert not supports_fused(make(hidden=100))  # unaligned hidden
    assert not supports_fused(
        FlexibleNeRFModel(use_viewdirs=False, dtype=jnp.bfloat16)
    )
    assert not supports_fused(SimpleModel())


def test_spec_skip_layers():
    spec = spec_from_model(make(num_layers=8, skip=4))
    assert spec.skip_layers == (4,)
    spec = spec_from_model(make(num_layers=6, skip=2))
    assert spec.skip_layers == (2, 4)


@pytest.mark.parametrize(
    "kw",
    [
        # comb_width = 256: pe_x (2*3*11+3 = 69) pushes d_off to 128.
        # (Bands stay moderate: at L~16 the 2^15-rad sin arguments make
        # reference-vs-kernel f32 rounding diverge visibly in the grads.)
        dict(num_encoding_fn_xyz=11, num_encoding_fn_dir=4),
        # linear frequency sampling (non-power-of-two bands)
        dict(log_sampling_xyz=False, log_sampling_dir=False),
        # no raw-input embed lanes
        dict(include_input_xyz=False, include_input_dir=False),
        # wide trunk: half_pad = 256 in the transposed heads
        dict(hidden_size=384, num_layers=6, skip_step=3),
        # deep trunk with two skip connections
        dict(num_layers=10, skip_step=3),
    ],
)
def test_forward_and_grad_parity_architectures(rng, kw):
    """Layout edge cases of the combined-PE kernel: comb_width > 128,
    linear bands, missing raw-input lanes, non-256 trunks."""
    base = dict(
        num_layers=4,
        hidden_size=128,
        skip_step=2,
        num_encoding_fn_xyz=4,
        num_encoding_fn_dir=2,
        dtype=jnp.bfloat16,
    )
    base.update(kw)
    model = FlexibleNeRFModel(**base)
    assert supports_fused(model) or not (
        base.get("include_input_xyz", True)
    ), "gate changed"
    if not supports_fused(model):
        pytest.skip("not fused-eligible")
    pts = jnp.asarray(rng.standard_normal((33, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((33, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), pts, dirs)

    ref = model.apply(params, pts, dirs)
    got = fused_flexible_apply(model, params, pts, dirs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)

    # With many high-frequency PE bands, bf16 noise in the grads is large
    # for ANY implementation — so judge the kernel against a float64 truth
    # and require it to be no worse than the flax bf16 path itself.
    def grads(fn, p):
        return jax.grad(lambda q: jnp.sum(fn(q) ** 2))(p)

    g_ref = grads(lambda p: model.apply(p, pts, dirs), params)
    g_fused = grads(lambda p: fused_flexible_apply(model, p, pts, dirs), params)

    model64 = FlexibleNeRFModel(**{**base, "dtype": jnp.float64})
    with jax.enable_x64(True):
        params64 = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), params
        )
        g64 = grads(
            lambda p: model64.apply(
                p,
                jnp.asarray(np.asarray(pts), jnp.float64),
                jnp.asarray(np.asarray(dirs), jnp.float64),
            ),
            params64,
        )
        g64 = jax.tree_util.tree_map(lambda x: np.asarray(x), g64)

    def worst_vs_truth(g):
        return max(
            float(
                np.abs(t - np.asarray(v, np.float64)).max()
                / (np.abs(t).max() + 1e-9)
            )
            for t, v in zip(
                jax.tree_util.tree_leaves(g64), jax.tree_util.tree_leaves(g)
            )
        )

    err_ref = worst_vs_truth(g_ref)
    err_fused = worst_vs_truth(g_fused)
    assert err_fused < max(2.0 * err_ref, 5e-2), (
        f"fused grads ({err_fused:.4f} vs f64) worse than flax ({err_ref:.4f})"
    )


@pytest.mark.parametrize("num_layers,skip", [(4, 2), (8, 4)])
def test_sigma_only_parity(rng, num_layers, skip):
    from nerfmeshes_tpu.ops.pallas.fused_mlp import fused_sigma_points

    model = make(num_layers=num_layers, skip=skip)
    pts = jnp.asarray(rng.standard_normal((40, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), pts, pts)
    ref = model.apply(params, pts, pts)[..., 3]
    got = fused_sigma_points(model, params, pts)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_sigma_only_matches_full_fused(rng):
    # The sigma row of the full fused forward and the sigma-only kernel
    # must agree exactly (same weights, same contraction order).
    from nerfmeshes_tpu.ops.pallas.fused_mlp import fused_sigma_points

    model = make()
    pts = jnp.asarray(rng.standard_normal((33, 3)).astype(np.float32))
    dirs = jnp.zeros_like(pts)
    params = model.init(jax.random.key(0), pts, dirs)
    full = fused_flexible_apply(model, params, pts, dirs, inference=True)[..., 3]
    sig = fused_sigma_points(model, params, pts)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(full), atol=1e-5, rtol=1e-5)
