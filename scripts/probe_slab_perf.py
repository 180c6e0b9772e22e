"""A/B the V-slab chord compaction against the monolithic fusion at a
given voxel capacity on the live backend (each arm in its own process:
jit caches key on shapes, not on _SLAB_V, and the tunnel compiler keeps
per-process state).

The flagship BuFF workload shape (2048 rays, 192 samples, 8x256 model)
at V=4096 sits exactly at the decision point: monolithic compiled and
ran at 95.7k rays/s in round 2; the slab scan bounds workspace but adds
a scan + per-slab append shift. This probe reports rays/s for both so
the default _SLAB_V is a measured choice, not a guess.

Usage: python scripts/probe_slab_perf.py [--voxels 4096] [--calls 12]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def child(voxels: int, calls: int) -> None:
    from nerfmeshes_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    from nerfmeshes_tpu.buff.system import BuffCarry, make_buff_train_step
    from nerfmeshes_tpu.buff.tree import TreeSampling, _SLAB_V
    from nerfmeshes_tpu.config import load_config
    from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
    from nerfmeshes_tpu.train.optim import build_optimizer
    from nerfmeshes_tpu.train.step import init_train_state
    from nerfmeshes_tpu.train.system import create_models, init_params

    cfg = load_config("configs/buff-hard-250k.yml")
    cfg.tree.max_voxel_count = voxels
    cfg.tree.step_size_integration_offset = 0
    cfg.dataset.synthetic.image_size = 96
    cfg.dataset.synthetic.num_images = 8
    cfg.dataset.synthetic.gt_samples = 128
    steps_per_call = int(cfg.experiment.steps_per_call)
    rays = int(cfg.nerf.train.num_random_rays)

    ds = SyntheticDataset(cfg, DatasetType.TRAIN)
    data = ds.device_arrays()
    H, W, focal = ds.hwf
    coarse, _ = create_models(cfg)
    opt = build_optimizer(cfg)
    params = init_params(cfg, coarse, None, jax.random.key(0))
    state = init_train_state(params, opt, 0)
    tree = TreeSampling(cfg)
    carry = BuffCarry(state, tree.device_state())

    fn = make_buff_train_step(
        cfg, coarse, opt, H=int(H), W=int(W), focal=float(focal),
        donate=False,
    )
    # Force VALUE readbacks, not block_until_ready: through the axon
    # tunnel block_until_ready returns without waiting (CLAUDE.md —
    # naive microbenchmarks lie), so timings must close with a fetch.
    t0 = time.time()
    carry, metrics = fn(carry, data)
    float(metrics["train/loss"])
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(calls):
        carry, metrics = fn(carry, data)
    float(metrics["train/loss"])
    elapsed = time.time() - t0
    print(json.dumps({
        "slab_v": _SLAB_V,
        "voxels": voxels,
        "capacity": tree.capacity,
        "path": "slab" if tree.capacity > _SLAB_V else "monolithic",
        "compile_s": round(compile_s, 1),
        "rays_per_sec": round(calls * steps_per_call * rays / elapsed, 1),
        "loss": float(metrics["train/loss"]),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--voxels", type=int, default=4096)
    ap.add_argument("--calls", type=int, default=12)
    args = ap.parse_args()
    for slab in (2048, max(args.voxels, 2048)):
        env = dict(os.environ, NERFMESHES_SLAB_V=str(slab),
                   NERFMESHES_PROBE_CHILD="1")
        print(f"--- NERFMESHES_SLAB_V={slab} ---", flush=True)
        subprocess.run(
            [sys.executable, __file__, "--voxels", str(args.voxels),
             "--calls", str(args.calls)],
            env=env, timeout=1800,
        )


if __name__ == "__main__":
    if os.environ.get("NERFMESHES_PROBE_CHILD"):
        ap = argparse.ArgumentParser()
        ap.add_argument("--voxels", type=int, default=4096)
        ap.add_argument("--calls", type=int, default=12)
        a = ap.parse_args()
        child(a.voxels, a.calls)
    else:
        main()
