"""Diagnose the force_shard (size-1 shard_map) train-step slowdown found
by bench.py's sharded-vs-unsharded A/B (r4): 124.7k -> 34.0k rays/s.

Times four variants of the same 20-step train program and dumps a device-op
trace breakdown for the sharded one:
  A  unsharded (mesh=None)                      — the 124.7k baseline
  B  shard_map, full body (pmean + axis_index)  — the 34.0k regression
  C  shard_map, body WITHOUT collectives        — isolates shard_map itself
  D  shard_map, no donation                     — isolates donation failure
"""

from __future__ import annotations

import sys
import time

import jax

from nerfmeshes_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from nerfmeshes_tpu.config import get_default_cfg
from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
from nerfmeshes_tpu.parallel.mesh import create_mesh
from nerfmeshes_tpu.train.optim import build_optimizer
from nerfmeshes_tpu.train.step import init_train_state, make_train_step
from nerfmeshes_tpu.train.system import create_models, init_params


def main():
    cfg = get_default_cfg()
    cfg.experiment.compute_dtype = "bfloat16"
    cfg.experiment.steps_per_call = 20
    cfg.nerf.train.perturb = True
    cfg.dataset.type = "synthetic"

    dataset = SyntheticDataset(cfg, DatasetType.TRAIN, num_images=4, image_size=800)
    data = dataset.device_arrays()
    H, W, focal = dataset.hwf

    coarse, fine = create_models(cfg)
    optimizer = build_optimizer(cfg)
    mesh = create_mesh(jax.devices()[:1])

    def build(tag, **kw):
        return tag, make_train_step(
            cfg, coarse, fine, optimizer,
            H=int(H), W=int(W), focal=float(focal), **kw,
        )

    variants = [
        build("A_unsharded"),
        build("B_shard_full", mesh=mesh, force_shard=True),
        build("D_shard_nodonate", mesh=mesh, force_shard=True, donate=False),
    ]

    n_calls = 10
    results = {}
    fns = {}
    for tag, fn in variants:
        params = init_params(cfg, coarse, fine, jax.random.key(0))
        state = init_train_state(params, optimizer, seed=0)
        t0 = time.time()
        state, m = fn(state, data)
        jax.block_until_ready(m["train/loss"])
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(n_calls):
            state, m = fn(state, data)
        jax.block_until_ready(m["train/loss"])
        dt = time.time() - t0
        rays = n_calls * 20 * int(cfg.nerf.train.num_random_rays)
        results[tag] = rays / dt
        fns[tag] = fn
        print(f"{tag}: {rays / dt:,.0f} rays/s (compile {compile_s:.1f}s)",
              flush=True)

    if "--trace" in sys.argv:
        from nerfmeshes_tpu.utils.profiling import summarize_trace, trace

        for tag in ("A_unsharded", "B_shard_full"):
            fn = fns[tag]
            params = init_params(cfg, coarse, fine, jax.random.key(0))
            state = init_train_state(params, optimizer, seed=0)
            state, m = fn(state, data)
            jax.block_until_ready(m["train/loss"])
            tdir = f"/tmp/trace_{tag}"
            with trace(tdir):
                for _ in range(3):
                    state, m = fn(state, data)
                jax.block_until_ready(m["train/loss"])
            print(f"== top device ops: {tag} ==", flush=True)
            for name, ms in summarize_trace(tdir, top=14):
                print(f"  {ms:9.2f} ms  {name}")


if __name__ == "__main__":
    main()
