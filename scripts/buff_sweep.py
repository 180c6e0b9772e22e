"""BuFF match-or-beat study (VERDICT r1 item 5): quality vs voxel budget.

Round-1 measurement showed BuFF long-run quality saturating below the
hierarchical system at 96^2 with the reference's shipped cap of 1536
voxels (the tree filled 1535/1536). This sweep measures PSNR as a
function of `tree.max_voxel_count` (and optionally max_depth) on the same
schedule, locating where BuFF crosses hierarchical quality. Results feed
the BASELINE.md table.

Runs on the TPU. Usage:
  python scripts/buff_sweep.py [--steps 12000] [--size 96]
  [--caps 1536 4096 8192] [--scene blobs]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_one(cap: int, steps: int, size: int, scene: str, lr: float,
            seed: int = 42) -> dict:
    import numpy as np

    from nerfmeshes_tpu.config import load_config
    from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
    from nerfmeshes_tpu.train.factory import build_system

    cfg = load_config("/root/repo/configs/buff-synthetic-lego.yml")
    cfg.experiment.randomseed = seed
    cfg.experiment.train_iters = steps
    cfg.experiment.validate_every = 0
    cfg.experiment.print_every = 1000
    cfg.experiment.steps_per_call = 50
    cfg.optimizer.lr = lr
    cfg.dataset.type = "synthetic"
    cfg.dataset.scene = scene
    cfg.tree.max_voxel_count = cap
    # Short-run cadence (the shipped 6k/6k schedule is built for 250k iters).
    cfg.tree.step_size_integration_offset = 500
    cfg.tree.step_size_tree = 2000
    # Benchmark comparability: evaluate ALL val views at a pinned draw
    # (validate() otherwise redraws views per step since round 3).
    cfg.nerf.validation.fixed_views = True
    cfg.nerf.validation.num_samples = -1

    system = build_system(cfg)
    system.setup(
        SyntheticDataset(cfg, DatasetType.TRAIN, num_images=16, image_size=size),
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=2, image_size=size),
    )
    t0 = time.time()
    system.fit()
    train_s = time.time() - t0
    m = system.validate(log_images=False)
    active = int(np.asarray(system.tree_state.active).sum())
    depths = sorted({leaf.depth for leaf in system.tree.leaves})
    out = {
        "max_voxel_count": cap,
        "seed": seed,
        "psnr": float(m["validation/coarse_psnr"]),
        "active_voxels": active,
        "depths": depths,
        "train_s": train_s,
        "rays_per_sec": steps * int(cfg.nerf.train.num_random_rays) / train_s,
    }
    print(json.dumps(out), flush=True)
    return out


def run_hierarchical(steps: int, size: int, scene: str, lr: float,
                     seed: int = 42) -> dict:
    """Matching hierarchical run — the bar BuFF must meet."""
    import numpy as np  # noqa: F401

    from nerfmeshes_tpu.config import get_default_cfg
    from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
    from nerfmeshes_tpu.train.system import NeRFSystem

    cfg = get_default_cfg()
    cfg.experiment.randomseed = seed
    cfg.experiment.compute_dtype = "bfloat16"
    cfg.experiment.train_iters = steps
    cfg.experiment.validate_every = 0
    cfg.experiment.print_every = 1000
    cfg.experiment.steps_per_call = 50
    cfg.optimizer.lr = lr
    cfg.dataset.type = "synthetic"
    cfg.dataset.scene = scene
    cfg.nerf.train.perturb = True
    cfg.nerf.validation.fixed_views = True
    cfg.nerf.validation.num_samples = -1

    system = NeRFSystem(cfg)
    system.setup(
        SyntheticDataset(cfg, DatasetType.TRAIN, num_images=16, image_size=size),
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=2, image_size=size),
    )
    t0 = time.time()
    system.fit()
    train_s = time.time() - t0
    m = system.validate(log_images=False)
    out = {
        "system": "hierarchical",
        "seed": seed,
        "psnr": float(m.get("validation/fine_psnr", m["validation/coarse_psnr"])),
        "coarse_psnr": float(m["validation/coarse_psnr"]),
        "train_s": train_s,
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--caps", type=int, nargs="+", default=[1536, 4096, 8192])
    ap.add_argument("--scene", default="blobs")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--skip-hierarchical", action="store_true")
    ap.add_argument("--seeds", type=int, nargs="+", default=[42],
                    help="experiment.randomseed values; each system/cap runs "
                    "once per seed (quality near saturation is seed-chaotic, "
                    "so match-or-beat claims need the spread).")
    ap.add_argument("--out", default="buff_sweep.json")
    args = ap.parse_args()

    from nerfmeshes_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    # "hierarchical" is ALWAYS a list (len 1 for one seed) so consumers
    # never branch on shape.
    results = {"steps": args.steps, "size": args.size, "scene": args.scene,
               "seeds": args.seeds, "buff": [], "hierarchical": []}

    def checkpoint():
        # Runs are minutes each and the tunnel compiler can wedge any of
        # them; persist after every completed run so nothing is lost.
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=2)

    if not args.skip_hierarchical:
        for seed in args.seeds:
            results["hierarchical"].append(
                run_hierarchical(args.steps, args.size, args.scene, args.lr, seed)
            )
            checkpoint()
    for cap in args.caps:
        if cap <= 0:  # hierarchical-only invocation (e.g. --caps 0)
            continue
        for seed in args.seeds:
            results["buff"].append(
                run_one(cap, args.steps, args.size, args.scene, args.lr, seed)
            )
            checkpoint()
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
