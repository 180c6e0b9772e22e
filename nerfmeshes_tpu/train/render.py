"""Functional hierarchical NeRF renderer.

One pure function from (params, rays, key) to rendered bundles — the analog
of NeRFModel.forward / BuFFModel.forward (src/models/model_nerf.py:37-78)
— composed entirely of jittable ops so the whole coarse→PDF→fine pipeline
is a single XLA program. No host chunk loop: render tiling for big images
happens by calling the same jitted function over fixed-size ray slabs.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from nerfmeshes_tpu.ops.rays import intervals_to_ray_points
from nerfmeshes_tpu.ops.render import RenderOutput, volume_render
from nerfmeshes_tpu.ops.sampling import hierarchical_intervals, ray_sample_interval


class RenderSettings(NamedTuple):
    """Static per-mode settings (from cfg.nerf.train / cfg.nerf.validation)."""

    num_coarse: int
    num_fine: int
    perturb: bool
    lindisp: bool
    radiance_field_noise_std: float
    white_background: bool
    use_fine: bool
    attenuation_threshold: float = 1e-5
    use_fused_kernel: bool = True

    @classmethod
    def from_cfg(cls, cfg, train: bool) -> "RenderSettings":
        mode = cfg.nerf.train if train else cfg.nerf.validation
        return cls(
            num_coarse=mode.num_coarse,
            num_fine=mode.num_fine,
            perturb=bool(mode.perturb),
            lindisp=bool(mode.lindisp),
            radiance_field_noise_std=float(mode.radiance_field_noise_std),
            white_background=bool(cfg.dataset.white_background),
            use_fine=bool(cfg.models.use_fine),
            use_fused_kernel=bool(cfg.experiment.get("use_fused_kernel", True)),
        )


def _apply_field(model, params, origins, ray_directions, intervals,
                 use_fused: bool = False, inference: bool = False,
                 key: Optional[jax.Array] = None):
    """Run a radiance-field model over rays: o,d (R,3), intervals (R,S).
    Returns the field CHANNELS-FIRST, (4, R, S) — feed
    volume_render(channels_first=True). Unwraps (field, aux) tuples
    (SpecularSimpleModel returns a tuple, see src/models/model_base.py:69-72).

    With `use_fused`, eligible models (the FlexibleNeRF family) run through
    the fused Pallas MLP kernel straight from the rays (no (R,S,3) points
    array materializes); others expand points/dirs for flax apply.
    `key` feeds stochastic modules (DropModel's train-mode dropout, the
    reference's torch train() semantics)."""
    if use_fused:
        from nerfmeshes_tpu.ops.pallas.fused_mlp import (
            fused_flexible_apply_rays,
            supports_fused,
        )

        if supports_fused(model):
            return fused_flexible_apply_rays(
                model, params, origins, ray_directions, intervals,
                inference=inference,
            )
    points = intervals_to_ray_points(intervals, ray_directions, origins)
    dirs = jnp.broadcast_to(ray_directions[..., None, :], points.shape)
    from nerfmeshes_tpu.models.nerf_models import DropModel

    if isinstance(model, DropModel) and not inference:
        out = model.apply(
            params, points, dirs,
            deterministic=False,
            rngs={"dropout": key if key is not None else jax.random.key(0)},
        )
    else:
        out = model.apply(params, points, dirs)
    if isinstance(out, tuple):
        out = out[0]
    return jnp.moveaxis(out, -1, 0)


def render_rays(
    coarse_model,
    fine_model,
    params: Any,
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    near,
    far,
    settings: RenderSettings,
    *,
    train: bool,
    key: Optional[jax.Array] = None,
) -> Tuple[RenderOutput, Optional[RenderOutput]]:
    """Hierarchical render of a ray batch.

    ray_origins: (R, 3) or (3,); ray_directions: (R, 3);
    near/far: scalars or (R,). params: {"coarse": ..., "fine": ...}.
    """
    R = ray_directions.shape[0]
    needs_rng = train and (
        settings.perturb or settings.radiance_field_noise_std > 0.0
    )
    if needs_rng and key is None:
        raise ValueError("training render with perturb/noise requires a key")
    if key is None:
        key = jax.random.key(0)
    k_perturb, k_noise_c, k_pdf, k_noise_f, k_field_c, k_field_f = (
        jax.random.split(key, 6)
    )

    origins = jnp.broadcast_to(jnp.reshape(ray_origins, (-1, 3)), (R, 3))

    intervals = ray_sample_interval(
        settings.num_coarse,
        R,
        near,
        far,
        lindisp=settings.lindisp,
        perturb=settings.perturb,
        key=k_perturb,
    )
    coarse_field = _apply_field(
        coarse_model, params["coarse"], origins, ray_directions, intervals,
        use_fused=settings.use_fused_kernel, inference=not train,
        key=k_field_c,
    )
    noise_std = settings.radiance_field_noise_std if train else 0.0
    coarse_bundle = volume_render(
        coarse_field,
        intervals,
        ray_directions,
        train=train,
        radiance_field_noise_std=noise_std,
        white_background=settings.white_background,
        attenuation_threshold=settings.attenuation_threshold,
        key=k_noise_c,
        channels_first=True,
    )

    fine_bundle = None
    if settings.use_fine and fine_model is not None:
        fine_intervals = hierarchical_intervals(
            intervals,
            coarse_bundle.weights,
            settings.num_fine,
            perturb=settings.perturb,
            key=k_pdf,
        )
        fine_field = _apply_field(
            fine_model, params["fine"], origins, ray_directions, fine_intervals,
            use_fused=settings.use_fused_kernel, inference=not train,
            key=k_field_f,
        )
        fine_bundle = volume_render(
            fine_field,
            fine_intervals,
            ray_directions,
            train=train,
            radiance_field_noise_std=noise_std,
            white_background=settings.white_background,
            attenuation_threshold=settings.attenuation_threshold,
            key=k_noise_f,
            channels_first=True,
        )

    return coarse_bundle, fine_bundle
