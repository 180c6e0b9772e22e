"""Measure BuFF train-step cost vs the chord-compaction cap K
(tree.max_chords_per_ray) on the live TPU — the cheap lever on the tree
tail (docs/DESIGN.md section 7.2). Also reports dropped chords at each K
so the safety margin is visible (auto-doubling protects production runs).

Usage: python scripts/probe_chord_cap.py [--ks 192 128 96 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", type=int, nargs="+", default=[192, 128, 96, 64])
    args = ap.parse_args()

    import jax

    from nerfmeshes_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    from nerfmeshes_tpu.config import load_config
    from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
    from nerfmeshes_tpu.buff.system import BuFFSystem

    for k in args.ks:
        cfg = load_config("configs/buff-synthetic-lego.yml")
        cfg.experiment.compute_dtype = "bfloat16"
        cfg.experiment.steps_per_call = 20
        cfg.dataset.type = "synthetic"
        cfg.tree.max_chords_per_ray = k
        system = BuFFSystem(cfg)
        system.setup(
            SyntheticDataset(cfg, DatasetType.TRAIN, num_images=4, image_size=800),
            None,
        )

        def calls(n):
            m = None
            for _ in range(n):
                system.state, m = system._train_fn(system.state, system._data)
            jax.block_until_ready(m["train/loss"])
            return m

        calls(1)
        t0 = time.time()
        m = calls(5)
        el = time.time() - t0
        print(
            json.dumps(
                {
                    "K": k,
                    "rays_per_sec": 5 * 20 * int(cfg.nerf.train.num_random_rays) / el,
                    "step_ms": el / 100 * 1000,
                    "dropped_chords_last_step": float(m["train/dropped_chords"]),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
