"""Diagnose the sharded-vs-unsharded train-step gap on one TPU chip.

bench.py's r4 A/B leg measured the force_shard=True program at ~0.16x of
the unsharded one (logs/r4b_bench.log). This reproduces the gap in
isolation and, with --trace, captures a profiler trace of each variant so
the slow op shows up by name.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--calls", type=int, default=5)
    ap.add_argument("--steps-per-call", type=int, default=20)
    args = ap.parse_args()

    import jax

    from nerfmeshes_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    from nerfmeshes_tpu.config import get_default_cfg
    from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
    from nerfmeshes_tpu.parallel.mesh import create_mesh
    from nerfmeshes_tpu.train.optim import build_optimizer
    from nerfmeshes_tpu.train.step import init_train_state, make_train_step
    from nerfmeshes_tpu.train.system import create_models, init_params

    cfg = get_default_cfg()
    cfg.experiment.compute_dtype = "bfloat16"
    cfg.experiment.steps_per_call = args.steps_per_call
    cfg.nerf.train.perturb = True
    cfg.dataset.type = "synthetic"

    dataset = SyntheticDataset(cfg, DatasetType.TRAIN, num_images=4, image_size=800)
    data = dataset.device_arrays()
    H, W, focal = dataset.hwf

    coarse, fine = create_models(cfg)
    optimizer = build_optimizer(cfg)

    rays = args.calls * args.steps_per_call * int(cfg.nerf.train.num_random_rays)

    def run(tag, mesh, force):
        fn = make_train_step(
            cfg, coarse, fine, optimizer,
            H=int(H), W=int(W), focal=float(focal),
            mesh=mesh, force_shard=force, donate=False,
        )
        p = init_params(cfg, coarse, fine, jax.random.key(0))
        s = init_train_state(p, optimizer, seed=0)
        t0 = time.time()
        s, m = fn(s, data)
        jax.block_until_ready(m["train/loss"])
        print(f"{tag}: compile+first {time.time()-t0:.1f}s", flush=True)

        def timed():
            t0 = time.time()
            s2, m2 = s, m
            for _ in range(args.calls):
                s2, m2 = fn(s2, data)
            jax.block_until_ready(m2["train/loss"])
            return rays / (time.time() - t0)

        r = timed()
        print(f"{tag}: {r:,.0f} rays/s", flush=True)
        if args.trace:
            from nerfmeshes_tpu.utils.profiling import summarize_trace, trace

            tdir = f"/tmp/diag_{tag}"
            with trace(tdir):
                timed()
            for name, ms in summarize_trace(tdir, top=14):
                print(f"  {ms:10.1f} ms  {name}", flush=True)
        return r

    r_plain = run("unsharded", None, False)
    r_shard = run("sharded1", create_mesh(jax.devices()), True)
    print(f"ratio sharded/unsharded: {r_shard / r_plain:.4f}", flush=True)


if __name__ == "__main__":
    main()
