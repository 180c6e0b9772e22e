"""Profile the lego-workload train step on the live TPU: trace one
steps_per_call dispatch and print the top device ops, to locate the
non-MLP-kernel time in the step (sampling, render, optimizer, PE...).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_step.py
"""

from __future__ import annotations

import sys
import tempfile
import time

import jax

from nerfmeshes_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from nerfmeshes_tpu.config import get_default_cfg
from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
from nerfmeshes_tpu.train.optim import build_optimizer
from nerfmeshes_tpu.train.step import init_train_state, make_train_step
from nerfmeshes_tpu.train.system import create_models, init_params
from nerfmeshes_tpu.utils.profiling import summarize_trace, trace


def main() -> None:
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
    params = init_params(cfg, coarse, fine, jax.random.key(0))
    state = init_train_state(params, optimizer, seed=0)
    train_fn = make_train_step(
        cfg, coarse, fine, optimizer, H=int(H), W=int(W), focal=float(focal)
    )

    state, metrics = train_fn(state, data)
    jax.block_until_ready(metrics["train/loss"])
    # steady-state timing
    t0 = time.time()
    for _ in range(5):
        state, metrics = train_fn(state, data)
    jax.block_until_ready(metrics["train/loss"])
    per_step_ms = (time.time() - t0) / (5 * 20) * 1000
    print(f"per-step: {per_step_ms:.2f} ms  ({2048/per_step_ms*1000:.0f} rays/s)")

    logdir = tempfile.mkdtemp(prefix="nerftrace_")
    with trace(logdir):
        state, metrics = train_fn(state, data)
        jax.block_until_ready(metrics["train/loss"])

    total = 0.0
    for name, ms in summarize_trace(logdir, top=40):
        total += ms
        print(f"{ms/20:9.3f} ms/step  {name}")
    print(f"device total: {total/20:.3f} ms/step", file=sys.stderr)


if __name__ == "__main__":
    main()
