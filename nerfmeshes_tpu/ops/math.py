"""Small numeric primitives shared across the framework.

Semantics match the reference helpers (src/nerf/nerf_helpers.py:13-23,199-223)
but are expressed as pure, jit-friendly jnp functions.
"""

from __future__ import annotations

import jax.numpy as jnp


def cumsum_lastaxis(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum along the last axis via a log-step (Hillis-Steele)
    scan — XLA lowers jnp.cumsum to a serial while loop on TPU; this is
    ceil(log2 S) fused elementwise passes instead."""
    s = x.shape[-1]
    out = x
    k = 1
    while k < s:
        out = out + jnp.concatenate(
            [jnp.zeros_like(out[..., :k]), out[..., :-k]], axis=-1
        )
        k *= 2
    return out


def cumprod_exclusive(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """TF-style exclusive cumulative product along `axis`.

    out[..., i] = prod(x[..., :i]), with out[..., 0] = 1.
    (reference: src/nerf/nerf_helpers.py:199-223)
    """
    if axis != -1:
        x = jnp.moveaxis(x, axis, -1)
    ones = jnp.ones_like(x[..., :1])
    shifted = jnp.concatenate([ones, x[..., :-1]], axis=-1)
    # Log-step (Hillis-Steele) scan: ceil(log2 S) shifted multiplies. XLA
    # lowers jnp.cumprod to a serial while loop on TPU (~1ms at render
    # scale); this is a handful of fused elementwise passes instead.
    s = shifted.shape[-1]
    out = shifted
    k = 1
    while k < s:
        out = out * jnp.concatenate(
            [jnp.ones_like(out[..., :k]), out[..., :-k]], axis=-1
        )
        k *= 2
    if axis != -1:
        out = jnp.moveaxis(out, -1, axis)
    return out


def img2mse(src: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error between two images / ray batches."""
    return jnp.mean((src - target) ** 2)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    """PSNR for signals in [0, 1]; zero MSE is clamped for stability.

    (reference: src/nerf/nerf_helpers.py:17-23)
    """
    mse = jnp.where(mse == 0, 1e-5, mse)
    return -10.0 * jnp.log10(mse)


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    *,
    max_val: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Structural similarity (Wang et al. 2004) between (H, W, C) images.

    Gaussian-windowed (11x11, sigma 1.5), standard constants
    C1=(0.01 L)^2, C2=(0.03 L)^2, mean over pixels and channels — the
    customary NeRF evaluation metric alongside PSNR (the reference
    reports only MSE/PSNR; this is an addition)."""
    from jax import lax

    x = jnp.asarray(img1, jnp.float32)
    y = jnp.asarray(img2, jnp.float32)
    half = window_size // 2
    g = jnp.exp(-0.5 * ((jnp.arange(window_size) - half) / sigma) ** 2)
    g = g / jnp.sum(g)

    def blur(z):  # (H, W, C) -> (H', W', C), separable 'valid' gaussian
        z = jnp.moveaxis(z, -1, 0)[:, None]  # (C, 1, H, W)
        kh = g.reshape(1, 1, -1, 1)
        kw = g.reshape(1, 1, 1, -1)
        # Precision pinned: TPU convs default to bf16 multiplies, whose
        # ~1e-2 relative error survives the blur(x*x) - mu^2 cancellation
        # and swamps C2 = 9e-4 — measured SSIM "1.0043" on an 800^2 eval
        # view. f32 convs match an f64 reference to ~5e-7.
        hi = lax.Precision.HIGHEST
        z = lax.conv_general_dilated(z, kh, (1, 1), "VALID", precision=hi)
        z = lax.conv_general_dilated(z, kw, (1, 1), "VALID", precision=hi)
        return jnp.moveaxis(z[:, 0], 0, -1)

    mu_x, mu_y = blur(x), blur(y)
    sxx = blur(x * x) - mu_x * mu_x
    syy = blur(y * y) - mu_y * mu_y
    sxy = blur(x * y) - mu_x * mu_y
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    num = (2 * mu_x * mu_y + c1) * (2 * sxy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sxx + syy + c2)
    return jnp.mean(num / den)
