"""On-TPU parity + timing for the fused chords Pallas kernel.

ADVICE r4 item 4: kernel-vs-XLA bit-parity was pinned only in interpret
mode on the CPU mesh; the default-on TPU path itself was never
parity-checked on device (and in r4 never even compiled there). This
script runs on the REAL backend:

  1. compiles the kernel at the shipped BuFF shapes (V=1728 K=64, and
     the first auto-doubled K=128),
  2. asserts kernel == XLA outputs bit-for-bit at R=2048 over a real
     12^3 tree geometry with mixed active masks and per-ray bounds,
  3. times both paths steady-state (loop-carried dependency through the
     z_vals so the tunnel cannot pipeline-hide the op).

Writes r5_kernel_parity_tpu.json.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from nerfmeshes_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    from nerfmeshes_tpu.buff.tree import ray_voxel_intersect
    from nerfmeshes_tpu.ops.pallas import chords

    backend = jax.default_backend()
    print(f"backend: {backend}, device: {jax.devices()[0]}", flush=True)

    out = {"backend": backend, "device": str(jax.devices()[0])}

    # 12^3 disjoint grid over [-1.5, 1.5]^3 — the shipped root subdivision.
    n = 12
    edges = np.linspace(-1.5, 1.5, n + 1, dtype=np.float32)
    lo = np.stack(
        np.meshgrid(edges[:-1], edges[:-1], edges[:-1], indexing="ij"), -1
    ).reshape(-1, 3)
    hi = np.stack(
        np.meshgrid(edges[1:], edges[1:], edges[1:], indexing="ij"), -1
    ).reshape(-1, 3)
    voxels = jnp.asarray(np.stack([lo, hi], axis=1))  # (1728, 2, 3)
    rng = np.random.default_rng(0)
    active = jnp.asarray(rng.uniform(size=1728) > 0.25)

    R = 2048
    origins = jnp.asarray(
        np.broadcast_to(np.array([0.0, 0.0, -4.0], np.float32), (R, 3))
    )
    tgt = rng.uniform(-1.2, 1.2, (R, 3)).astype(np.float32)
    d = tgt - np.array([0.0, 0.0, -4.0], np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.asarray(d)
    near = jnp.asarray(rng.uniform(0.05, 1.5, R).astype(np.float32))
    far = near + jnp.asarray(rng.uniform(4.0, 9.0, R).astype(np.float32))

    for K in (64, 128):
        usable = chords.kernel_usable(1728, K)
        out[f"kernel_usable_V1728_K{K}"] = bool(usable)
        print(f"kernel_usable(1728, {K}) = {usable}", flush=True)
        if not usable:
            continue
        a = ray_voxel_intersect(
            voxels, active, origins, dirs, near, far,
            samples_count=192, max_chords=K, _force_kernel=True,
        )
        b = ray_voxel_intersect(
            voxels, active, origins, dirs, near, far,
            samples_count=192, max_chords=K, _force_kernel=False,
        )
        names = ("z_vals", "voxel_idx", "ray_mask", "dropped")
        for name, x, y in zip(names, a, b):
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg=f"K={K} {name}"
            )
        out[f"parity_K{K}"] = "bit-identical"
        print(f"K={K}: kernel == XLA bit-identical on {backend}", flush=True)

    # Steady-state timing: chain calls through a perturbed origin so each
    # dispatch depends on the previous result (honest through the tunnel).
    def timed(force, K, reps=30):
        @jax.jit
        def step(o_carry):
            z, idx, m, dr = ray_voxel_intersect(
                voxels, active, o_carry, dirs, near, far,
                samples_count=192, max_chords=K, _force_kernel=force,
            )
            return o_carry + 1e-12 * jnp.mean(z), z

        o_carry = origins
        o_carry, z = step(o_carry)
        jax.block_until_ready(z)
        t0 = time.time()
        for _ in range(reps):
            o_carry, z = step(o_carry)
        jax.block_until_ready(z)
        return (time.time() - t0) / reps * 1e3  # ms/call

    if out.get("kernel_usable_V1728_K64"):
        ms_k = timed(True, 64)
        ms_x = timed(False, 64)
        out["kernel_ms_per_call_K64_R2048"] = round(ms_k, 3)
        out["xla_ms_per_call_K64_R2048"] = round(ms_x, 3)
        out["kernel_speedup_K64"] = round(ms_x / ms_k, 3)
        print(
            f"K=64 R=2048: kernel {ms_k:.3f} ms/call, XLA {ms_x:.3f} "
            f"ms/call -> speedup {ms_x / ms_k:.2f}x",
            flush=True,
        )

    with open("/root/repo/r5_kernel_parity_tpu.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
