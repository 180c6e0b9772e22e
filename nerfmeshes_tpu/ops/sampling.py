"""Depth-sample generation along rays: stratified and hierarchical (PDF).

Pure jnp with explicit PRNG keys; every shape is static so the whole
sampler inlines into the jitted train step. Semantics follow the reference
modules RaySampleInterval / SamplePDF (src/nerf/modules.py:148-248).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nerfmeshes_tpu.ops.math import cumsum_lastaxis


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
    # near/far handled independently: each may be a scalar or per-ray
    # (ray_count,) (COLMAP per-image bounds) in any combination.
    near = jnp.asarray(near, dtype=dtype)
    far = jnp.asarray(far, dtype=dtype)
    if near.ndim > 0:
        near = near[:, None]
    if far.ndim > 0:
        far = far[:, None]

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


def sorted_uniforms(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """Order statistics of iid U(0,1) along the last axis WITHOUT a sort.

    Normalized cumulative sums of exponential spacings are exactly jointly
    distributed as sorted uniforms — an O(S) construction that avoids the
    TPU's expensive bitonic sort (the sort of the merged coarse+fine depth
    samples dominated the whole sampling pipeline before this).
    """
    *batch, n = shape
    e = jax.random.exponential(key, (*batch, n + 1), dtype=dtype)
    cums = cumsum_lastaxis(e)
    return cums[..., :-1] / cums[..., -1:]


def merge_sorted(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Merge two per-row sorted arrays (..., n) + (..., m) -> (..., n+m).

    Positions come from cross-searchsorted rank sums (a dense comparison
    contraction, VPU-friendly) instead of sorting the concatenation.
    Ties break with `a` first, matching a stable ascending sort of
    concatenate([a, b]).
    """
    n, m = a.shape[-1], b.shape[-1]
    # a[i] precedes b[j] when a[i] <= b[j].
    pos_a = (
        jnp.arange(n) + jnp.sum((b[..., None, :] < a[..., :, None]), axis=-1)
    )
    pos_b = (
        jnp.arange(m) + jnp.sum((a[..., None, :] <= b[..., :, None]), axis=-1)
    )
    # The positions form a permutation and the result is ascending, so
    # slot k holds the max of every value placed at slots <= k — two
    # masked prefix-max reductions instead of one-hot scatter
    # contractions (cheaper: compare/select/max, nothing materialized).
    big = jnp.asarray(jnp.finfo(a.dtype).max, a.dtype)
    ks = jnp.arange(n + m)
    a_sel = jnp.where(pos_a[..., :, None] <= ks, a[..., :, None], -big)
    b_sel = jnp.where(pos_b[..., :, None] <= ks, b[..., :, None], -big)
    return jnp.maximum(jnp.max(a_sel, axis=-2), jnp.max(b_sel, axis=-2))


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    *,
    deterministic: bool = True,
    key: jax.Array | None = None,
    sorted_uniform: bool = False,
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
    cdf = cumsum_lastaxis(pdf)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (..., B+1)

    batch_shape = cdf.shape[:-1]
    if deterministic:
        u = jnp.linspace(0.0, 1.0, num_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (*batch_shape, num_samples))
    else:
        if key is None:
            raise ValueError("stochastic sample_pdf requires a PRNG key")
        if sorted_uniform:
            # Same joint law as sorting iid uniforms, but sort-free — and
            # monotone u makes the output samples already depth-sorted.
            u = sorted_uniforms(key, (*batch_shape, num_samples), dtype=cdf.dtype)
        else:
            u = jax.random.uniform(key, (*batch_shape, num_samples), dtype=cdf.dtype)

    # Inverse-CDF lookup as masked extremum reductions: because cdf and
    # bins are sorted, gather-at-(inds-1) == prefix-max under the mask
    # cdf[b] <= u, and gather-at-inds == suffix-min under its complement
    # (clamped to the last bin when u >= cdf[-1]). This replaces
    # searchsorted + four one-hot gather contractions with compare/select
    # reductions — no (..., S, B) one-hot ever materializes.
    big = jnp.asarray(jnp.finfo(cdf.dtype).max, cdf.dtype)
    le = cdf[..., None, :] <= u[..., :, None]  # (..., S, B)
    cdf_below = jnp.max(jnp.where(le, cdf[..., None, :], -big), axis=-1)
    bins_below = jnp.max(jnp.where(le, bins[..., None, :], -big), axis=-1)
    cdf_above = jnp.min(jnp.where(le, big, cdf[..., None, :]), axis=-1)
    bins_above = jnp.min(jnp.where(le, big, bins[..., None, :]), axis=-1)
    cdf_above = jnp.where(cdf_above == big, cdf[..., -1:], cdf_above)
    bins_above = jnp.where(bins_above == big, bins[..., -1:], bins_above)

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
        sorted_uniform=True,
    )
    samples = jax.lax.stop_gradient(samples)
    # Both inputs are sorted (deterministic u is a linspace; stochastic u
    # uses the order-statistics construction), so a rank-sum merge replaces
    # the reference's full sort of the concatenation — the sort was the
    # single most expensive op in the train step on TPU.
    return merge_sorted(intervals, samples)
