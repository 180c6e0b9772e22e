"""Profile the BuFF train step on the live TPU (lego-shaped workload:
2048 rays, 192 samples, <=1536 voxels).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_buff.py
"""

from __future__ import annotations

import sys
import tempfile
import time

import jax

from nerfmeshes_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from nerfmeshes_tpu.config import load_config
from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
from nerfmeshes_tpu.utils.profiling import summarize_trace, trace


def main() -> None:
    cfg = load_config("/root/repo/configs/buff-synthetic-lego.yml")
    cfg.experiment.compute_dtype = "bfloat16"
    cfg.experiment.steps_per_call = 20
    cfg.dataset.type = "synthetic"

    from nerfmeshes_tpu.buff.system import BuFFSystem

    system = BuFFSystem(cfg)
    dataset = SyntheticDataset(cfg, DatasetType.TRAIN, num_images=4, image_size=800)
    system.setup(dataset, None)

    def calls(n):
        for _ in range(n):
            system.state, metrics = system._train_fn(system.state, system._data)
        jax.block_until_ready(metrics["train/loss"])

    t0 = time.time()
    calls(1)
    print(f"compile+first: {time.time()-t0:.1f}s")
    t0 = time.time()
    calls(5)
    per_step_ms = (time.time() - t0) / (5 * 20) * 1000
    rays = int(cfg.nerf.train.num_random_rays)
    print(f"per-step: {per_step_ms:.2f} ms  ({rays/per_step_ms*1000:.0f} rays/s)")

    logdir = tempfile.mkdtemp(prefix="bufftrace_")
    with trace(logdir):
        calls(1)

    total = 0.0
    for name, ms in summarize_trace(logdir, top=25):
        total += ms
        print(f"{ms/20:9.3f} ms/step  {name}")
    print(f"device total: {total/20:.3f} ms/step", file=sys.stderr)


if __name__ == "__main__":
    main()
