"""Model zoo tests.

The FlexibleNeRFModel (used by every shipped reference config) is checked
for exact forward parity by transplanting torch reference weights into the
flax params. The rest of the zoo is checked structurally (shapes, init,
grad flow).
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from nerfmeshes_tpu.models import MODEL_REGISTRY, build_model, FlexibleNeRFModel

from refload import ref_models


def _np(x):
    return np.asarray(x)


def _copy_linear(params_leaf, torch_linear):
    params_leaf["kernel"] = jnp.asarray(torch_linear.weight.detach().numpy().T)
    params_leaf["bias"] = jnp.asarray(torch_linear.bias.detach().numpy())


def _transplant_flexible(flax_params, ref_model, use_viewdirs, num_layers):
    """Map reference module weights onto flax param tree (call order:
    layer1, layers_xyz..., then fc_feat, fc_alpha, layers_dir[0], fc_rgb)."""
    p = jax.tree_util.tree_map(np.asarray, flax_params["params"])
    p = {k: dict(v) for k, v in p.items()}
    idx = 0
    _copy_linear(p[f"TorchLinear_{idx}"], ref_model.layer1)
    idx += 1
    for layer in ref_model.layers_xyz:
        _copy_linear(p[f"TorchLinear_{idx}"], layer)
        idx += 1
    if use_viewdirs:
        _copy_linear(p[f"TorchLinear_{idx}"], ref_model.fc_feat)
        idx += 1
        _copy_linear(p[f"TorchLinear_{idx}"], ref_model.fc_alpha)
        idx += 1
        _copy_linear(p[f"TorchLinear_{idx}"], ref_model.layers_dir[0])
        idx += 1
        _copy_linear(p[f"TorchLinear_{idx}"], ref_model.fc_rgb)
    else:
        _copy_linear(p[f"TorchLinear_{idx}"], ref_model.fc_out)
    return {"params": p}


@pytest.mark.parametrize("use_viewdirs", [True, False])
@pytest.mark.parametrize("num_layers,skip_step", [(6, 2), (8, 4), (4, 4)])
def test_flexible_nerf_forward_parity(rng, use_viewdirs, num_layers, skip_step):
    m = ref_models()
    kwargs = dict(
        num_layers=num_layers,
        hidden_size=64,
        skip_step=skip_step,
        num_encoding_fn_xyz=6,
        num_encoding_fn_dir=4,
        use_viewdirs=use_viewdirs,
    )
    torch.manual_seed(0)
    ref = m.FlexibleNeRFModel(**kwargs)
    ref.eval()

    model = FlexibleNeRFModel(**kwargs)
    pts = rng.standard_normal((10, 3)).astype(np.float32)
    dirs = rng.standard_normal((10, 3)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(pts), jnp.asarray(dirs))
    params = _transplant_flexible(params, ref, use_viewdirs, num_layers)

    with torch.no_grad():
        expected = ref(torch.from_numpy(pts), torch.from_numpy(dirs)).numpy()
    got = _np(model.apply(params, jnp.asarray(pts), jnp.asarray(dirs)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_zoo_shapes(rng, name):
    cfg = {
        "num_layers": 2,
        "num_layers_view": 1,
        "hidden_size": 32,
        "skip_step": 2,
        "encoding": "spatial",
        "num_encoding_fn_xyz": 8,
        "num_encoding_fn_dir": 2,
        "include_input_xyz": True,
        "include_input_dir": True,
        "log_sampling_xyz": True,
        "log_sampling_dir": True,
        "use_viewdirs": True,
        "luminance_function": "min1",
    }
    model = build_model(name, cfg)
    pts = jnp.asarray(rng.standard_normal((4, 5, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((4, 5, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), pts, dirs)
    out = model.apply(params, pts, dirs)
    if isinstance(out, tuple):  # SpecularSimpleModel returns (field, specular)
        out = out[0]
    assert out.shape == (4, 5, 4)
    assert bool(jnp.all(out[..., :3] >= 0)) and bool(jnp.all(out[..., :3] <= 1))


def test_flexible_grad_flow(rng):
    model = FlexibleNeRFModel(num_layers=3, hidden_size=16, num_encoding_fn_xyz=2)
    pts = jnp.asarray(rng.standard_normal((6, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((6, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), pts, dirs)

    def loss_fn(p):
        return jnp.mean(model.apply(p, pts, dirs) ** 2)

    grads = jax.grad(loss_fn)(params)
    norms = [float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(norms)) and sum(norms) > 0


def test_build_model_ignores_unknown_cfg_keys():
    model = build_model("FlexibleNeRFModel", {"hidden_size": 32, "encoding": "positional", "num_layers_view": -1})
    assert model.hidden_size == 32


@pytest.mark.parametrize(
    "name",
    ["SirenModule", "SirenModuleNormal", "SirenModuleExp", "PotCoSirenModule",
     "CoSirenModule", "Embbed2"],
)
def test_experimental_encoders(rng, name):
    import nerfmeshes_tpu.models as M

    cls = getattr(M, name)
    mod = cls(32)
    x = jnp.asarray(rng.standard_normal((7, 4)).astype(np.float32))
    params = mod.init(jax.random.key(0), x)
    out = mod.apply(params, x)
    # Embbed2 emits [a*sin, a*cos] of the full projection: 2x out_features.
    expect = 64 if name == "Embbed2" else 32
    assert out.shape == (7, expect)
    assert bool(jnp.all(jnp.abs(out) <= 32.0 + 1e-4))  # bounded-ish outputs


def test_dropmodel_dropout_active_in_training():
    """DropModel's defining dropout must actually fire on the training
    path (torch train-mode semantics) and stay off at inference."""
    import jax
    import jax.numpy as jnp

    from nerfmeshes_tpu.models.nerf_models import DropModel
    from nerfmeshes_tpu.train.render import _apply_field

    model = DropModel(num_layers=2, hidden_size=32, num_encoding_fn_xyz=8)
    o = jnp.zeros((4, 3))
    d = jnp.ones((4, 3)) / np.sqrt(3.0)
    z = jnp.linspace(2.0, 6.0, 5)[None, :].repeat(4, 0)
    pts = jnp.zeros((2, 3))
    params = model.init(jax.random.key(0), pts, pts)

    train1 = _apply_field(model, params, o, d, z, key=jax.random.key(1))
    train2 = _apply_field(model, params, o, d, z, key=jax.random.key(2))
    # Different dropout masks -> different outputs.
    assert float(jnp.abs(train1 - train2).max()) > 1e-6
    # Inference is deterministic regardless of key.
    inf1 = _apply_field(model, params, o, d, z, inference=True, key=jax.random.key(1))
    inf2 = _apply_field(model, params, o, d, z, inference=True, key=jax.random.key(2))
    np.testing.assert_allclose(np.asarray(inf1), np.asarray(inf2))
