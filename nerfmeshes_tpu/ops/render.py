"""Volume rendering: alpha compositing of a sampled radiance field.

Single fused jnp pass (XLA fuses the elementwise chain into the producing
matmul epilogue). Semantics match the reference VolumeRenderer
(src/nerf/modules.py:50-121) including its metric-affecting quirks:
sigma noise only in training, eval-only depth zeroing where acc < 1,
and the `mask_weights` transmittance mask used by BuFF integration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nerfmeshes_tpu.ops.math import cumprod_exclusive


class RenderOutput(NamedTuple):
    rgb_map: jnp.ndarray  # (..., 3)
    depth_map: jnp.ndarray  # (...)
    weights: jnp.ndarray  # (..., S)
    mask_weights: jnp.ndarray  # (..., S)
    acc_map: jnp.ndarray  # (...)
    disp_map: jnp.ndarray  # (...)


def volume_render(
    radiance_field: jnp.ndarray,
    depth_values: jnp.ndarray,
    ray_directions: jnp.ndarray,
    *,
    train: bool,
    radiance_field_noise_std: float = 0.0,
    white_background: bool = False,
    attenuation_threshold: float = 1e-5,
    key: jax.Array | None = None,
    channels_first: bool = False,
) -> RenderOutput:
    """Composite per-sample (rgb, sigma) into per-ray maps.

    radiance_field: (..., S, 4) — rgb in [0,1] plus raw sigma — or, with
    `channels_first`, (4, ..., S): the fused MLP kernel's native output
    layout (channel-minor arrays lane-pad 4->128 physically on TPU, so
    the hot path keeps channels leading and only the tiny per-ray maps
    ever exist channel-minor).
    depth_values:   (..., S) sample depths along each ray.
    ray_directions: (..., 3) (norm scales the inter-sample distances).
    """
    dtype = radiance_field.dtype
    one_e_10 = jnp.full_like(depth_values[..., :1], 1e10)
    dists = jnp.concatenate(
        [depth_values[..., 1:] - depth_values[..., :-1], one_e_10], axis=-1
    )
    dists = dists * jnp.linalg.norm(ray_directions, axis=-1)[..., None]

    if channels_first:
        rgb = radiance_field[:3]
        sigma = radiance_field[3]
    else:
        rgb = radiance_field[..., :3]
        sigma = radiance_field[..., 3]
    if radiance_field_noise_std > 0.0:
        if key is None:
            raise ValueError("sigma noise requires a PRNG key")
        sigma = sigma + (
            jax.random.normal(key, sigma.shape, dtype=dtype)
            * radiance_field_noise_std
        )

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    transmittance = cumprod_exclusive(1.0 - alpha + 1e-10)
    mask_weights = (transmittance > attenuation_threshold).astype(dtype)
    weights = alpha * transmittance

    if channels_first:
        rgb_map = jnp.moveaxis(jnp.sum(weights[None] * rgb, axis=-1), 0, -1)
    else:
        rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    acc_map = jnp.sum(weights, axis=-1)
    depth_map = jnp.sum(weights * depth_values, axis=-1)

    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)
    disp_map = jnp.where(jnp.isnan(disp_map), 0.0, disp_map)

    if not train:
        depth_map = jnp.where(acc_map < 1.0, 0.0, depth_map)

    if white_background:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return RenderOutput(
        rgb_map=rgb_map,
        depth_map=depth_map,
        weights=weights,
        mask_weights=mask_weights,
        acc_map=acc_map,
        disp_map=disp_map,
    )


def density_weights(
    sigma: jnp.ndarray,
    depth_values: jnp.ndarray,
    ray_directions: jnp.ndarray,
) -> jnp.ndarray:
    """Per-sample compositing weights from raw sigma alone — the geometry
    half of `volume_render` with no color pipeline.

    Equivalent of the reference's DensityExtractor
    (src/nerf/modules.py:124-145; instantiated nowhere there — rebuilt as
    a working op). Takes sigma (..., S) directly rather than a (..., S, 4)
    radiance field so callers on the sigma-only fused kernel path (density
    grids, surface queries) feed its output straight in without ever
    materializing a channel-minor field.
    """
    one_e_10 = jnp.full_like(depth_values[..., :1], 1e10)
    dists = jnp.concatenate(
        [depth_values[..., 1:] - depth_values[..., :-1], one_e_10], axis=-1
    )
    dists = dists * jnp.linalg.norm(ray_directions, axis=-1)[..., None]
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    return alpha * cumprod_exclusive(1.0 - alpha + 1e-10)
