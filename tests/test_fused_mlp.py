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
