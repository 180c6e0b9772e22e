"""Shared layers and encodings for the model zoo, as Flax linen modules.

Initialization follows torch.nn.Linear's scheme (uniform ±1/sqrt(fan_in)
for kernel and bias) so training dynamics track the reference; compute
dtype is configurable (bf16 on the MXU, params stay fp32).

Reference modules these mirror: src/nerf/modules.py:251-529.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import flax.linen as nn

from nerfmeshes_tpu.ops.encoding import positional_encoding

Dtype = Any


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchLinear(nn.Module):
    """Dense layer with torch-style init and configurable compute dtype."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        bound = 1.0 / math.sqrt(in_features)
        kernel = self.param("kernel", torch_kernel_init, (in_features, self.features))
        bias = self.param(
            "bias",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.features,),
        )
        x = x.astype(self.dtype)
        # Accumulate on the MXU in f32, but *store* the activation in the
        # compute dtype: inter-layer activations are the dominant HBM
        # traffic of the whole train step (393k x 256 x 4B x 8 layers), and
        # bf16 halves it.
        y = jnp.dot(x, kernel.astype(self.dtype), preferred_element_type=jnp.float32)
        return (y + bias).astype(self.dtype)


class PositionalEncoding(nn.Module):
    """Classic NeRF sin/cos encoding (reference: src/nerf/modules.py:8-37)."""

    num_encoding_functions: int = 6
    include_input: bool = True
    log_sampling: bool = True

    def __call__(self, x):
        return positional_encoding(
            x, self.num_encoding_functions, self.include_input, self.log_sampling
        )

    def output_size(self, in_dim: int = 3) -> int:
        return 2 * in_dim * self.num_encoding_functions + (
            in_dim if self.include_input else 0
        )


class SimpleModule(nn.Module):
    """Linear + activation (reference: src/nerf/modules.py:251-258)."""

    features: int
    activation: Callable = jax.nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return self.activation(TorchLinear(self.features, dtype=self.dtype)(x))


class MultiSkipModule(nn.Module):
    """Trunk of layers each re-fed the skip value, with `skip_step` extra
    layers after each (reference: src/nerf/modules.py:275-294)."""

    hidden_size: int
    layer_count: int
    skip_step: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip_value):
        value = x
        for _ in range(self.layer_count):
            value = jnp.concatenate([value, skip_value], axis=-1)
            value = SimpleModule(self.hidden_size, dtype=self.dtype)(value)
            for _ in range(self.skip_step):
                value = SimpleModule(self.hidden_size, dtype=self.dtype)(value)
        return value


class ResBlock(nn.Module):
    """Two-layer bottleneck residual block (reference: src/nerf/modules.py:473-481)."""

    hidden: int
    hidden_mid: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = SimpleModule(self.hidden_mid, dtype=self.dtype)(x)
        y = SimpleModule(self.hidden, dtype=self.dtype)(y)
        return y + x


# ---------------------------------------------------------------------------
# Learned / random-Fourier encodings (reference: src/nerf/modules.py:354-529)
# ---------------------------------------------------------------------------


class SpatialEmbedding(nn.Module):
    """Trainable random-Fourier embedding: B ~ 2^N(0, mult) - 1, with a
    trainable per-feature amplitude (reference: src/nerf/modules.py:386-400)."""

    out_features: int
    weight_multiplier: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        b = self.param(
            "b",
            lambda k, s: 2.0 ** (jax.random.normal(k, s) * self.weight_multiplier) - 1.0,
            (in_features, self.out_features),
        )
        a = self.param("a", lambda k, s: jnp.ones(s), (self.out_features,))
        proj = jnp.dot(x.astype(self.dtype), b.astype(self.dtype), preferred_element_type=jnp.float32)
        return jnp.concatenate([a * jnp.sin(proj), a * jnp.cos(proj)], axis=-1)

    def output_size(self) -> int:
        return 2 * self.out_features


class SimpleSpatialEmbedding(nn.Module):
    """SpatialEmbedding without the amplitude parameter
    (reference: src/nerf/modules.py:403-416)."""

    out_features: int
    weight_multiplier: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        b = self.param(
            "b",
            lambda k, s: 2.0 ** (jax.random.normal(k, s) * self.weight_multiplier) - 1.0,
            (in_features, self.out_features),
        )
        proj = jnp.dot(x.astype(self.dtype), b.astype(self.dtype), preferred_element_type=jnp.float32)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    def output_size(self) -> int:
        return 2 * self.out_features


class FastRotPos(nn.Module):
    """Fixed (non-trainable) random-direction Fourier features with
    log-uniform frequency magnitudes (reference: src/nerf/modules.py:484-498)."""

    out_features: int
    weight_multiplier: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]

        def init_b(key, shape):
            k1, k2 = jax.random.split(key)
            b = jax.random.normal(k1, shape)
            b = b / jnp.linalg.norm(b, axis=0, keepdims=True)
            mult = 2.0 ** (jax.random.uniform(k2, (1, shape[1])) * self.weight_multiplier) - 1.0
            return b * mult

        # Fixed random directions, NOT a parameter: the reference registers
        # this as a non-trainable buffer. A stop_gradient'ed param would
        # still be mutated by decoupled weight decay (AdamW updates params
        # regardless of grad), so derive it from a constant key instead.
        b = init_b(jax.random.PRNGKey(0), (in_features, self.out_features))
        proj = jnp.dot(x.astype(self.dtype), b.astype(self.dtype), preferred_element_type=jnp.float32)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    def output_size(self) -> int:
        return 2 * self.out_features


class FlexiblePositionalEncoding(nn.Module):
    """Positional encoding with a configurable band count spread over
    2^[0, mult] per input dim (reference: src/nerf/modules.py:501-521)."""

    out_features: int
    weight_multiplier: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        bands = 2.0 ** jnp.linspace(0.0, self.weight_multiplier, self.out_features)
        freq = (jnp.eye(in_features)[..., None] * bands).reshape(in_features, -1)
        proj = jnp.dot(x, freq.astype(x.dtype))
        return jnp.concatenate([x, jnp.sin(proj), jnp.cos(proj)], axis=-1)

    def output_size(self, in_dim: int = 3) -> int:
        return 2 * in_dim * self.out_features + in_dim


def get_encoding(name: str):
    """Encoding registry (reference: src/nerf/modules.py:524-529)."""
    return {
        "fastrot": FastRotPos,
        "spatial": SpatialEmbedding,
        "positional": FlexiblePositionalEncoding,
    }[name]


# ---------------------------------------------------------------------------
# Siren-style layers (reference: src/nerf/modules.py:297-351)
# ---------------------------------------------------------------------------


class SirenModule(nn.Module):
    """sin(linear(x)) with uniform ±sqrt(6/fan_in)*mult kernel init."""

    out_features: int
    weight_multiplier: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        bound = math.sqrt(6.0 / in_features) * self.weight_multiplier
        kernel = self.param(
            "kernel", lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (in_features, self.out_features),
        )
        bias = self.param(
            "bias",
            lambda k, s: jax.random.uniform(
                k, s, jnp.float32, -1 / math.sqrt(in_features), 1 / math.sqrt(in_features)
            ),
            (self.out_features,),
        )
        proj = jnp.dot(
            x.astype(self.dtype), kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        return jnp.sin(proj + bias)


class SirenModuleNormal(nn.Module):
    """sin(linear(x)) with N(0, mult) kernel init
    (reference: src/nerf/modules.py:308-315)."""

    out_features: int
    weight_multiplier: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            lambda k, s: jax.random.normal(k, s) * self.weight_multiplier,
            (in_features, self.out_features),
        )
        bias = self.param(
            "bias",
            lambda k, s: jax.random.uniform(
                k, s, jnp.float32, -1 / math.sqrt(in_features), 1 / math.sqrt(in_features)
            ),
            (self.out_features,),
        )
        proj = jnp.dot(
            x.astype(self.dtype), kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        return jnp.sin(proj + bias)


class SirenModuleExp(nn.Module):
    """sin(linear(x)) with 2^U(-mult, mult) kernel init
    (reference: src/nerf/modules.py:318-326)."""

    out_features: int
    weight_multiplier: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            lambda k, s: 2.0
            ** jax.random.uniform(
                k, s, jnp.float32, -self.weight_multiplier, self.weight_multiplier
            ),
            (in_features, self.out_features),
        )
        bias = self.param(
            "bias",
            lambda k, s: jax.random.uniform(
                k, s, jnp.float32, -1 / math.sqrt(in_features), 1 / math.sqrt(in_features)
            ),
            (self.out_features,),
        )
        proj = jnp.dot(
            x.astype(self.dtype), kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        return jnp.sin(proj + bias)


class PotCoSirenModule(nn.Module):
    """[sin, cos](linear(x)) with power-of-two kernel init
    (reference: src/nerf/modules.py:329-339)."""

    out_features: int
    weight_multiplier: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            lambda k, s: 2.0
            ** jax.random.uniform(
                k, s, jnp.float32, -self.weight_multiplier, self.weight_multiplier
            ),
            (in_features, self.out_features // 2),
        )
        bias = self.param(
            "bias",
            lambda k, s: jax.random.uniform(
                k, s, jnp.float32, -1 / math.sqrt(in_features), 1 / math.sqrt(in_features)
            ),
            (self.out_features // 2,),
        )
        proj = jnp.dot(
            x.astype(self.dtype), kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ) + bias
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class Embbed2(nn.Module):
    """Trainable diagonal-frequency Fourier embedding with amplitude
    (reference: src/nerf/modules.py:369-383)."""

    out_features: int
    weight_multiplier: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]

        def init_b(key, shape):
            bands = 2.0 ** jnp.linspace(
                0.0, self.weight_multiplier, self.out_features // in_features
            ) - 1.0
            eye = jnp.eye(in_features)
            return (eye * bands[:, None, None]).reshape(self.out_features, in_features).T

        b = self.param("b", init_b, (in_features, self.out_features))
        a = self.param("a", lambda k, s: jnp.ones(s), (self.out_features,))
        proj = jnp.dot(x, b)
        return jnp.concatenate([a * jnp.sin(proj), a * jnp.cos(proj)], axis=-1)

    def output_size(self) -> int:
        return 2 * self.out_features


class CoSirenModule(nn.Module):
    """[sin, cos](linear(x)) - pi/4 (reference: src/nerf/modules.py:342-351)."""

    out_features: int
    weight_multiplier: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        bound = math.sqrt(24.0 / in_features) * self.weight_multiplier
        kernel = self.param(
            "kernel", lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (in_features, self.out_features // 2),
        )
        bias = self.param(
            "bias",
            lambda k, s: jax.random.uniform(
                k, s, jnp.float32, -1 / math.sqrt(in_features), 1 / math.sqrt(in_features)
            ),
            (self.out_features // 2,),
        )
        proj = jnp.dot(
            x.astype(self.dtype), kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ) + bias
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1) - (math.pi / 4)


# ---------------------------------------------------------------------------
# Luminance combination functions (reference: src/nerf/modules.py:419-470)
# ---------------------------------------------------------------------------


def get_luminance_function(name: str) -> Callable:
    return {
        "simple": lambda color, lum: color + lum,
        "disabled": lambda color, lum: color,
        "multiply": lambda color, lum: color * (1.0 + lum),
        "fillup": lambda color, lum: color + (1.0 - color) * lum,
        "min1": lambda color, lum: jnp.minimum(color + lum, 1.0),
    }[name]
