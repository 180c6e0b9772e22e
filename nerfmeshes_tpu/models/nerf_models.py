"""The radiance-field model zoo, as Flax linen modules.

Every model maps (ray_points (..., 3), ray_directions (..., 3) | None) to a
radiance field (..., 4) = [rgb in [0,1], raw sigma]. Architectures mirror
the reference zoo (src/nerf/models.py) exactly — layer counts, skip wiring,
heads — but are expressed as compiled-friendly Flax modules whose matmuls
run in a configurable compute dtype (bf16 by default on TPU).

Model selection by config name happens in `build_model` (the analog of
`getattr(models, cfg.models.coarse_type)(**cfg.models.coarse)` at
src/models/model_nerf.py:10-19).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from nerfmeshes_tpu.models.layers import (
    FastRotPos,
    MultiSkipModule,
    PositionalEncoding,
    ResBlock,
    SimpleModule,
    SimpleSpatialEmbedding,
    SpatialEmbedding,
    TorchLinear,
    get_encoding,
    get_luminance_function,
)

Dtype = Any


class FlexibleNeRFModel(nn.Module):
    """The canonical NeRF MLP (reference: src/nerf/models.py:4-80).

    PE(xyz, L=num_encoding_fn_xyz) -> `num_layers-1` hidden layers with a
    PE-concat skip every `skip_step`; view-conditioned rgb head (sigmoid)
    plus a linear sigma head.
    """

    num_layers: int = 4
    hidden_size: int = 128
    skip_step: int = 4
    num_encoding_fn_xyz: int = 6
    num_encoding_fn_dir: int = 4
    include_input_xyz: bool = True
    include_input_dir: bool = True
    log_sampling_xyz: bool = True
    log_sampling_dir: bool = True
    use_viewdirs: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ray_points, ray_directions=None):
        encode_xyz = PositionalEncoding(
            self.num_encoding_fn_xyz, self.include_input_xyz, self.log_sampling_xyz
        )
        xyz = encode_xyz(ray_points)
        x = TorchLinear(self.hidden_size, dtype=self.dtype)(xyz)
        for i in range(self.num_layers - 1):
            if i % self.skip_step == 0 and i > 0 and i != self.num_layers - 1:
                x = jnp.concatenate([x, xyz], axis=-1)
            x = jax.nn.relu(TorchLinear(self.hidden_size, dtype=self.dtype)(x))

        if self.use_viewdirs:
            view = PositionalEncoding(
                self.num_encoding_fn_dir, self.include_input_dir, self.log_sampling_dir
            )(ray_directions)
            feat = jax.nn.relu(TorchLinear(self.hidden_size, dtype=self.dtype)(x))
            alpha = TorchLinear(1, dtype=self.dtype)(x)
            x = jnp.concatenate([feat, view], axis=-1)
            x = jax.nn.relu(TorchLinear(self.hidden_size // 2, dtype=self.dtype)(x))
            rgb = jax.nn.sigmoid(TorchLinear(3, dtype=self.dtype)(x))
            return jnp.concatenate([rgb, alpha], axis=-1).astype(jnp.float32)

        out = TorchLinear(4, dtype=self.dtype)(x)
        return jnp.concatenate(
            [jax.nn.sigmoid(out[..., :3]), out[..., 3:]], axis=-1
        ).astype(jnp.float32)


class SimpleModel(nn.Module):
    """Learned-encoding trunk with separate color/sigma heads and an optional
    view branch (reference: src/nerf/models.py:83-131)."""

    num_layers: int = 4
    num_layers_view: int = 2
    hidden_size: int = 128
    num_encoding_fn_xyz: int = 128
    num_encoding_fn_dir: int = 4
    include_input_dir: bool = True
    log_sampling_dir: bool = True
    skip_step: int = 1
    encoding: str = "spatial"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ray_points, ray_directions=None):
        encode_xyz = get_encoding(self.encoding)(
            self.num_encoding_fn_xyz, 8, dtype=self.dtype
        )
        encode_dir = PositionalEncoding(
            self.num_encoding_fn_dir, self.include_input_dir, self.log_sampling_dir
        )
        xyz = encode_xyz(ray_points)
        x = SimpleModule(self.hidden_size, dtype=self.dtype)(xyz)
        x = MultiSkipModule(
            self.hidden_size, self.num_layers, skip_step=self.skip_step, dtype=self.dtype
        )(x, xyz)
        depth = TorchLinear(1, dtype=self.dtype)(x)
        if self.num_layers_view >= 0 and ray_directions is not None:
            xyzdir = jnp.concatenate([xyz, encode_dir(ray_directions)], axis=-1)
            x = MultiSkipModule(
                self.hidden_size, self.num_layers_view, dtype=self.dtype
            )(x, xyzdir)
        color = SimpleModule(3, activation=jax.nn.sigmoid, dtype=self.dtype)(x)
        return jnp.concatenate([color, depth], axis=-1).astype(jnp.float32)


class SpecularSimpleModel(nn.Module):
    """SimpleModel plus a specular scalar combined through a luminance
    function; returns (field, specular) (reference: src/nerf/models.py:134-187)."""

    num_layers: int = 4
    num_layers_view: int = 2
    hidden_size: int = 128
    num_encoding_fn_xyz: int = 128
    num_encoding_fn_dir: int = 4
    include_input_dir: bool = True
    log_sampling_dir: bool = True
    skip_step: int = 1
    luminance_function: str = "min1"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ray_points, ray_directions=None):
        encode_xyz = SpatialEmbedding(self.num_encoding_fn_xyz, 8, dtype=self.dtype)
        encode_dir = PositionalEncoding(
            self.num_encoding_fn_dir, self.include_input_dir, self.log_sampling_dir
        )
        xyz = encode_xyz(ray_points)
        x = SimpleModule(self.hidden_size, dtype=self.dtype)(xyz)
        x = MultiSkipModule(
            self.hidden_size, self.num_layers, skip_step=self.skip_step, dtype=self.dtype
        )(x, xyz)
        depth = TorchLinear(1, dtype=self.dtype)(x)
        color = SimpleModule(3, activation=jax.nn.sigmoid, dtype=self.dtype)(x)
        specular = jnp.zeros_like(depth)
        if self.num_layers_view >= 0 and ray_directions is not None:
            xyzdir = jnp.concatenate([xyz, encode_dir(ray_directions)], axis=-1)
            x = MultiSkipModule(
                self.hidden_size, self.num_layers_view, dtype=self.dtype
            )(x, xyzdir)
            specular = jax.nn.relu(
                SimpleModule(1, activation=jnp.tanh, dtype=self.dtype)(x)
            )
            color = get_luminance_function(self.luminance_function)(color, specular)
        return jnp.concatenate([color, depth], axis=-1).astype(jnp.float32), specular


class FlatModel(nn.Module):
    """Fixed FastRot embedding + plain MLP (reference: src/nerf/models.py:190-209)."""

    hidden_size: int = 256
    num_layers: int = 2
    num_encoding_fn_xyz: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ray_points, ray_directions=None):
        x = FastRotPos(self.num_encoding_fn_xyz, 10, dtype=self.dtype)(ray_points)
        x = SimpleModule(self.hidden_size, dtype=self.dtype)(x)
        for _ in range(self.num_layers):
            x = SimpleModule(self.hidden_size, dtype=self.dtype)(x)
        depth = SimpleModule(1, dtype=self.dtype)(x)
        color = SimpleModule(3, activation=jax.nn.sigmoid, dtype=self.dtype)(x)
        return jnp.concatenate([color, depth], axis=-1).astype(jnp.float32)


class ResModel(nn.Module):
    """Residual-block trunk (reference: src/nerf/models.py:212-232)."""

    hidden_size: int = 128
    num_layers: int = 2
    num_encoding_fn_xyz: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ray_points, ray_directions=None):
        x = SimpleSpatialEmbedding(self.num_encoding_fn_xyz, 8, dtype=self.dtype)(
            ray_points
        )
        x = SimpleModule(self.hidden_size, dtype=self.dtype)(x)
        for _ in range(self.num_layers):
            x = ResBlock(self.hidden_size, self.hidden_size // 2, dtype=self.dtype)(x)
        depth = SimpleModule(1, dtype=self.dtype)(x)
        color = SimpleModule(3, activation=jax.nn.sigmoid, dtype=self.dtype)(x)
        return jnp.concatenate([color, depth], axis=-1).astype(jnp.float32)


class DropModel(nn.Module):
    """SimpleModel with dropout 0.5 on the trunk output
    (reference: src/nerf/models.py:235-285)."""

    num_layers: int = 4
    num_layers_view: int = 2
    hidden_size: int = 128
    num_encoding_fn_xyz: int = 128
    num_encoding_fn_dir: int = 4
    include_input_dir: bool = True
    log_sampling_dir: bool = True
    skip_step: int = 1
    encoding: str = "spatial"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ray_points, ray_directions=None, *, deterministic: bool = True):
        encode_xyz = get_encoding(self.encoding)(
            self.num_encoding_fn_xyz, 8, dtype=self.dtype
        )
        encode_dir = PositionalEncoding(
            self.num_encoding_fn_dir, self.include_input_dir, self.log_sampling_dir
        )
        xyz = encode_xyz(ray_points)
        x = SimpleModule(self.hidden_size, dtype=self.dtype)(xyz)
        x = MultiSkipModule(
            self.hidden_size, self.num_layers, skip_step=self.skip_step, dtype=self.dtype
        )(x, xyz)
        x = nn.Dropout(rate=0.5, deterministic=deterministic)(x)
        depth = TorchLinear(1, dtype=self.dtype)(x)
        if self.num_layers_view >= 0 and ray_directions is not None:
            xyzdir = jnp.concatenate([xyz, encode_dir(ray_directions)], axis=-1)
            x = MultiSkipModule(
                self.hidden_size, self.num_layers_view, dtype=self.dtype
            )(x, xyzdir)
        color = SimpleModule(3, activation=jax.nn.sigmoid, dtype=self.dtype)(x)
        return jnp.concatenate([color, depth], axis=-1).astype(jnp.float32)


class RotFlexibleNeRFModel(nn.Module):
    """FlexibleNeRFModel with a pluggable learned xyz encoding
    (reference: src/nerf/models.py:288-366)."""

    num_layers: int = 4
    hidden_size: int = 128
    skip_step: int = 4
    num_encoding_fn_xyz: int = 64
    num_encoding_fn_dir: int = 4
    include_input_dir: bool = True
    log_sampling_dir: bool = True
    use_viewdirs: bool = True
    encoding: str = "spatial"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ray_points, ray_directions=None):
        encode_xyz = get_encoding(self.encoding)(
            self.num_encoding_fn_xyz, 8, dtype=self.dtype
        )
        xyz = encode_xyz(ray_points)
        x = TorchLinear(self.hidden_size, dtype=self.dtype)(xyz)
        for i in range(self.num_layers - 1):
            if i % self.skip_step == 0 and i > 0 and i != self.num_layers - 1:
                x = jnp.concatenate([x, xyz], axis=-1)
            x = jax.nn.relu(TorchLinear(self.hidden_size, dtype=self.dtype)(x))

        if self.use_viewdirs:
            view = PositionalEncoding(
                self.num_encoding_fn_dir, self.include_input_dir, self.log_sampling_dir
            )(ray_directions)
            feat = jax.nn.relu(TorchLinear(self.hidden_size, dtype=self.dtype)(x))
            alpha = TorchLinear(1, dtype=self.dtype)(x)
            x = jnp.concatenate([feat, view], axis=-1)
            x = jax.nn.relu(TorchLinear(self.hidden_size // 2, dtype=self.dtype)(x))
            rgb = jax.nn.sigmoid(TorchLinear(3, dtype=self.dtype)(x))
            return jnp.concatenate([rgb, alpha], axis=-1).astype(jnp.float32)

        out = TorchLinear(4, dtype=self.dtype)(x)
        return jnp.concatenate([jax.nn.sigmoid(out[..., :3]), out[..., 3:]], axis=-1).astype(jnp.float32)


MODEL_REGISTRY = {
    "FlexibleNeRFModel": FlexibleNeRFModel,
    "SimpleModel": SimpleModel,
    "SpecularSimpleModel": SpecularSimpleModel,
    "FlatModel": FlatModel,
    "ResModel": ResModel,
    "DropModel": DropModel,
    "RotFlexibleNeRFModel": RotFlexibleNeRFModel,
}


def build_model(type_name: str, model_cfg: dict, dtype: Dtype = jnp.float32) -> nn.Module:
    """Instantiate a model by config name, ignoring cfg keys the chosen
    architecture doesn't take (the reference uses **kwargs the same way)."""
    cls = MODEL_REGISTRY[type_name]
    # Exclude flax's inherited dataclass fields: 'dtype' is passed
    # explicitly below, and 'name'/'parent' are module-tree internals.
    fields = set(cls.__dataclass_fields__) - {"dtype", "name", "parent"}
    kwargs = {k: v for k, v in dict(model_cfg).items() if k in fields}
    return cls(dtype=dtype, **kwargs)
