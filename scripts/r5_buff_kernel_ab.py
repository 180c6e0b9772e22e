"""End-to-end BuFF train A/B: chords Pallas kernel vs XLA compaction,
same process, same data, bench-shaped workload (2048 rays, 192 samples,
<=1536 voxels) — VERDICT r4 item 5 (quantify the kernel's measured win
and re-profile the post-kernel step tails).

The kernel/XLA decision is resolved at trace time of the outer train-step
jit (buff/tree.py:ray_voxel_intersect wrapper), so each arm builds its own
train fn with NERFMESHES_CHORDS_KERNEL pinned. Both arms run in ONE
process back-to-back so tunnel run-to-run variance (CLAUDE.md) cancels.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_buff_kernel_ab.py
Writes r5_buff_ab.json + prints the top device ops per arm for DESIGN §7.2.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import jax

from nerfmeshes_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from nerfmeshes_tpu.config import load_config
from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
from nerfmeshes_tpu.utils.profiling import summarize_trace, trace

REPS = 8  # timed calls x 20 steps/call per arm


def build_system():
    from nerfmeshes_tpu.buff.system import BuFFSystem

    cfg = load_config("/root/repo/configs/buff-synthetic-lego.yml")
    cfg.experiment.compute_dtype = "bfloat16"
    cfg.experiment.steps_per_call = 20
    cfg.dataset.type = "synthetic"
    system = BuFFSystem(cfg)
    system.setup(
        SyntheticDataset(cfg, DatasetType.TRAIN, num_images=4, image_size=800),
        None,
    )
    return cfg, system


def run_arm(label: str, kernel: str) -> dict:
    os.environ["NERFMESHES_CHORDS_KERNEL"] = kernel
    cfg, system = build_system()

    def calls(n):
        m = None
        for _ in range(n):
            system.state, m = system._train_fn(system.state, system._data)
        jax.block_until_ready(m["train/loss"])

    t0 = time.time()
    calls(1)
    compile_s = time.time() - t0
    t0 = time.time()
    calls(REPS)
    wall = time.time() - t0
    steps = REPS * 20
    rays = int(cfg.nerf.train.num_random_rays)
    per_step_ms = wall / steps * 1000
    rate = rays * steps / wall

    logdir = tempfile.mkdtemp(prefix=f"buffab_{label}_")
    with trace(logdir):
        calls(1)
    ops = [
        {"op": name, "ms_per_step": round(ms / 20, 4)}
        for name, ms in summarize_trace(logdir, top=20)
    ]
    dev_total = sum(o["ms_per_step"] for o in ops)

    print(f"\n=== {label} (NERFMESHES_CHORDS_KERNEL={kernel}) ===")
    print(f"compile+first: {compile_s:.1f}s  per-step: {per_step_ms:.3f} ms  "
          f"rate: {rate:.0f} rays/s")
    for o in ops:
        print(f"  {o['ms_per_step']:9.4f} ms/step  {o['op']}")
    print(f"  device-op total (top20): {dev_total:.3f} ms/step")
    return {
        "label": label,
        "kernel": kernel,
        "compile_s": round(compile_s, 1),
        "per_step_ms": round(per_step_ms, 4),
        "rays_per_sec": round(rate),
        "top_ops_ms_per_step": ops,
        "device_top20_total_ms": round(dev_total, 4),
    }


def main() -> None:
    # Interleave arms kernel->xla->kernel so a monotonic tunnel drift can't
    # masquerade as a kernel win.
    arms = [
        run_arm("kernel_a", "1"),
        run_arm("xla", "0"),
        run_arm("kernel_b", "1"),
    ]
    k = (arms[0]["rays_per_sec"] + arms[2]["rays_per_sec"]) / 2.0
    x = arms[1]["rays_per_sec"]
    out = {
        "device": str(jax.devices()[0]),
        "reps_x_steps": REPS * 20,
        "arms": arms,
        "kernel_mean_rays_per_sec": round(k),
        "xla_rays_per_sec": x,
        "kernel_vs_xla": round(k / x, 4),
    }
    with open("/root/repo/r5_buff_ab.json", "w") as f:
        json.dump(out, f, indent=2)
    print(f"\nkernel/XLA end-to-end: {out['kernel_vs_xla']}x "
          f"({round(k)} vs {x} rays/s)")


if __name__ == "__main__":
    main()
