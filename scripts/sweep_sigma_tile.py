"""Sweep the sigma-only kernel tile size on the live TPU and compare with
the previous full-forward grid-eval path. Loop-carried chaining: the axon
tunnel's block_until_ready is unreliable for independent dispatches.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_sigma_tile.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from nerfmeshes_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from nerfmeshes_tpu.models import FlexibleNeRFModel
from nerfmeshes_tpu.ops.pallas.fused_mlp import (
    fused_flexible_apply,
    fused_sigma_points,
)

model = FlexibleNeRFModel(
    num_layers=8, hidden_size=256, skip_step=4,
    num_encoding_fn_xyz=10, num_encoding_fn_dir=4, dtype=jnp.bfloat16,
)
pts0 = jnp.zeros((4, 3), jnp.float32)
params = model.init(jax.random.key(0), pts0, pts0)

N = 262144
MACS_SIGMA = 524544  # layer1 128x256 + 6x 256x256 + skip (256+128)x256 + alpha 256
MACS_FULL = 640256
REPS = 20


def synth_pts(n, bias):
    idx = jnp.arange(n)
    nyz, nz = 64 * 64, 64
    return jnp.stack(
        [
            (idx // nyz).astype(jnp.float32) / 32.0 - 1.0 + bias,
            ((idx % nyz) // nz).astype(jnp.float32) / 32.0 - 1.0,
            (idx % nz).astype(jnp.float32) / 32.0 - 1.0,
        ],
        axis=-1,
    )


def chain_time(step_fn, carry0):
    """Time REPS loop-carried calls; returns seconds/call after warmup."""
    c = step_fn(carry0)
    jax.block_until_ready(c)
    float(np.asarray(c))  # full readback sync
    t0 = time.time()
    c2 = c
    for _ in range(REPS):
        c2 = step_fn(c2)
    float(np.asarray(c2))
    return (time.time() - t0) / REPS


for tile in (2048, 4096, 8192, 16384):
    @jax.jit
    def f(carry, tile=tile):
        sig = fused_sigma_points(model, params, synth_pts(N, carry * 1e-12), tile=tile)
        return sig[0]

    dt = chain_time(f, jnp.float32(0.0))
    tflops = 2 * MACS_SIGMA * N / dt / 1e12
    print(f"sigma tile={tile:6d}: {dt*1e3:7.2f} ms  {N/dt/1e6:7.1f} Mpts/s  {tflops:6.1f} TFLOPS", flush=True)


from nerfmeshes_tpu.ops.pallas.fused_mlp import fused_sigma_from_packed


def synth_packed(n, bias):
    """Packed (8, N) sigma-kernel input straight from flat indices — no
    (N, 3) intermediate (physically (N, 128) = 32x its logical size)."""
    idx = jnp.arange(n)
    nyz, nz = 64 * 64, 64
    z = jnp.zeros((n,), jnp.float32)
    return jnp.stack(
        [
            (idx // nyz).astype(jnp.float32) / 32.0 - 1.0 + bias,
            ((idx % nyz) // nz).astype(jnp.float32) / 32.0 - 1.0,
            (idx % nz).astype(jnp.float32) / 32.0 - 1.0,
            z, z, z,
            jnp.ones((n,), jnp.float32),
            z,
        ]
    )


for tile in (4096, 8192):
    @jax.jit
    def fp(carry, tile=tile):
        sig = fused_sigma_from_packed(
            model, params, synth_packed(N, carry * 1e-12), tile=tile
        )
        return sig[0]

    dt = chain_time(fp, jnp.float32(0.0))
    tflops = 2 * MACS_SIGMA * N / dt / 1e12
    print(f"packed tile={tile:5d}: {dt*1e3:7.2f} ms  {N/dt/1e6:7.1f} Mpts/s  {tflops:6.1f} TFLOPS", flush=True)


@jax.jit
def old(carry):
    pts = synth_pts(N, carry * 1e-12)
    out = fused_flexible_apply(model, params, pts, pts, inference=True)
    return out[0, 3]


dt = chain_time(old, jnp.float32(0.0))
print(f"old full path      : {dt*1e3:7.2f} ms  {N/dt/1e6:7.1f} Mpts/s  {2*MACS_FULL*N/dt/1e12:6.1f} TFLOPS")
