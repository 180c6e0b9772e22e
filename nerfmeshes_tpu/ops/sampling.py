"""Depth-sample generation along rays: stratified and hierarchical (PDF).

Pure jnp with explicit PRNG keys; every shape is static so the whole
sampler inlines into the jitted train step. Semantics follow the reference
modules RaySampleInterval / SamplePDF (src/nerf/modules.py:148-248).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ray_sample_interval(
    num_samples: int,
    ray_count: int,
    near,
    far,
    *,
    lindisp: bool = False,
    perturb: bool = False,
    key: jax.Array | None = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Stratified coarse sampling of `num_samples` depths per ray.

    near/far may be scalars or per-ray (ray_count,) arrays (COLMAP scenes
    carry per-image depth bounds). With `lindisp` the samples are linear in
    disparity rather than depth. With `perturb` each sample is jittered
    uniformly within its mid-point bin (requires `key`).
    (reference: src/nerf/modules.py:148-186)
    """
    t = jnp.linspace(0.0, 1.0, num_samples, dtype=dtype)[None, :]  # (1, S)
    near = jnp.asarray(near, dtype=dtype)
    far = jnp.asarray(far, dtype=dtype)
    if near.ndim > 0 and near.shape[0] == ray_count:
        near, far = near[:, None], far[:, None]

    if not lindisp:
        intervals = near * (1.0 - t) + far * t
    else:
        intervals = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)

    intervals = jnp.broadcast_to(intervals, (ray_count, num_samples))

    if perturb:
        if key is None:
            raise ValueError("perturb=True requires a PRNG key")
        mids = 0.5 * (intervals[..., 1:] + intervals[..., :-1])
        upper = jnp.concatenate([mids, intervals[..., -1:]], axis=-1)
        lower = jnp.concatenate([intervals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, intervals.shape, dtype=dtype)
        intervals = lower + (upper - lower) * t_rand

    return intervals


def _searchsorted_right(sorted_seq: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Batched searchsorted(side='right') via a comparison contraction.

    sorted_seq: (..., B), values: (..., S) -> int32 (..., S).
    A dense (S, B) comparison per batch row maps onto the VPU far better
    than a per-row binary search would.
    """
    return jnp.sum(
        (sorted_seq[..., None, :] <= values[..., :, None]).astype(jnp.int32), axis=-1
    )


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    *,
    deterministic: bool = True,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Inverse-CDF sampling of `num_samples` new depths from bin weights.

    bins: (..., B) sorted bin positions; weights: (..., B-1), one weight per
    bin interval. Gradients are stopped (the reference detaches).
    (reference: src/nerf/modules.py:208-248)
    """
    if weights.shape[-1] != bins.shape[-1] - 1:
        raise ValueError(
            f"sample_pdf expects weights.shape[-1] == bins.shape[-1]-1, got "
            f"{weights.shape[-1]} vs {bins.shape[-1]}"
        )
    weights = jax.lax.stop_gradient(weights) + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (..., B+1)

    batch_shape = cdf.shape[:-1]
    if deterministic:
        u = jnp.linspace(0.0, 1.0, num_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (*batch_shape, num_samples))
    else:
        if key is None:
            raise ValueError("stochastic sample_pdf requires a PRNG key")
        u = jax.random.uniform(key, (*batch_shape, num_samples), dtype=cdf.dtype)

    inds = _searchsorted_right(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    # len(bins) == len(cdf) - 1 == B, and below/above are in [0, B-1].
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def hierarchical_intervals(
    intervals: jnp.ndarray,
    weights: jnp.ndarray,
    num_fine: int,
    *,
    perturb: bool = False,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Fine-pass depth intervals: PDF-sample between coarse mid-points, then
    merge with the coarse intervals and sort (reference SamplePDF.forward,
    src/nerf/modules.py:197-206).

    intervals: (..., Sc), weights: (..., Sc) -> (..., Sc + num_fine).
    """
    mids = 0.5 * (intervals[..., 1:] + intervals[..., :-1])
    samples = sample_pdf(
        mids,
        weights[..., 1:-1],
        num_fine,
        deterministic=not perturb,
        key=key,
    )
    samples = jax.lax.stop_gradient(samples)
    return jnp.sort(jnp.concatenate([intervals, samples], axis=-1), axis=-1)
