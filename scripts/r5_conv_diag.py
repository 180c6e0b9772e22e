"""Diagnose the convergence_check fine<coarse failure (r5).

convergence_check.py (written r2, numbers dated 2026-08-16: coarse 42.2 /
fine 44.0 at lr=1e-3) now measures coarse 45.7 / fine 38.3 on HEAD — the
fine network lags coarse by 7.4 dB on the single redrawn validation view.
Production-scale hierarchical runs reproduce bit-identically across
rounds, so this is either (a) the documented marginal-lr fine-collapse
basin (docstring itself warns 1e-3 is the edge of the 5e-4..1e-3 robust
band), reachable after r3's legitimate trajectory changes (sampling
rewrite, validation redraw), or (b) a real fine-path regression.

This script separates them: trains the identical workload at a given lr,
then validates on ALL val views (fixed, num_samples=-1) and prints
per-view coarse/fine PSNR plus the train-batch fine/coarse PSNR history.

Usage: python scripts/r5_conv_diag.py [lr] [iters] [use_fused] [platform]

Passing platform=cpu runs the identical workload on the CPU backend,
where the fused Pallas kernel never engages (kernel gate is TPU-only):
if the fine-lag reproduces there, the kernel + in-kernel PE polynomial
are exonerated without needing the (relay-dead) TPU.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

if len(sys.argv) > 4 and sys.argv[4]:
    import jax

    jax.config.update("jax_platforms", sys.argv[4])

from nerfmeshes_tpu.config import load_config
from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
from nerfmeshes_tpu.train.system import NeRFSystem


def main(lr: float, iters: int, use_fused: bool = True) -> None:
    cfg = load_config("/root/repo/configs/nerf-synthetic-lego.yml")
    cfg.experiment.train_iters = iters
    cfg.experiment.validate_every = iters
    cfg.experiment.print_every = 250
    cfg.experiment.steps_per_call = 50
    cfg.experiment.use_fused_kernel = use_fused
    cfg.optimizer.lr = lr
    cfg.dataset.type = "synthetic"

    system = NeRFSystem(cfg)
    system.setup(
        SyntheticDataset(cfg, DatasetType.TRAIN, num_images=12, image_size=64),
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=2, image_size=64),
    )
    system.fit()
    # All val views, pinned — not the step-seeded single draw.
    m = system.validate(max_images=-1, log_images=False)
    out = {"lr": lr, "iters": iters, "use_fused_kernel": use_fused,
           "metrics": {k: round(float(v), 3) for k, v in m.items()}}

    # Same coarse/fine metrics on TRAIN views: a large train-vs-val gap
    # on fine (but not coarse) means the fine net is overfitting the 12
    # train views; fine lagging coarse on train views too would point at
    # the fine training path itself.
    val_ds = system.val_dataset
    system.val_dataset = system.train_dataset
    try:
        mt = system.validate(max_images=3, log_images=False)
    finally:
        system.val_dataset = val_ds
    out["train_view_metrics"] = {k: round(float(v), 3) for k, v in mt.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 1e-3,
         int(sys.argv[2]) if len(sys.argv) > 2 else 2000,
         (sys.argv[3] != "0") if len(sys.argv) > 3 else True)
