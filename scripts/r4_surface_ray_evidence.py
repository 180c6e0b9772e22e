"""TPU evidence run for the surface-ray exporter (mesh/surface_ray.py).

Trains the lego-architecture model briefly on the hard analytic scene,
then exports the surface-ray point cloud at the reference's hardcoded
settings (800^2, 8x4 orbit poses, r=4 — src/mesh_surface_ray.py:71-90)
and scores it the only way a procedural scene allows but a real one
never could: chamfer of the exported points against the ANALYTIC surface
(SDF Newton projection, same target as quality_800).

Output: surface_ray_evidence.json + logs/surface_ray.ply.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_surface_ray_evidence.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--img-size", type=int, default=800)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--out", default="surface_ray_evidence.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfmeshes_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    from nerfmeshes_tpu.config import get_default_cfg
    from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
    from nerfmeshes_tpu.data.synthetic import hard_sdf
    from nerfmeshes_tpu.mesh.metrics import chamfer_distance
    from nerfmeshes_tpu.mesh.surface_ray import export_surface_ray
    from nerfmeshes_tpu.train.system import NeRFSystem

    cfg = get_default_cfg()
    # The schema default keeps the reference's shipped lr=5e-3, which can
    # collapse the fine network early (BASELINE.md quality caveat) — the
    # first run of this script hit exactly that: fine rendered all-zero,
    # every view masked to 0 points. Train at the stable lr.
    cfg.optimizer.lr = args.lr
    cfg.experiment.compute_dtype = "bfloat16"
    cfg.experiment.steps_per_call = 50
    cfg.experiment.train_iters = args.steps
    cfg.experiment.validate_every = 0
    cfg.experiment.print_every = 500
    cfg.dataset.type = "synthetic"
    cfg.dataset.scene = "hard"
    cfg.nerf.train.perturb = True

    t0 = time.time()
    system = NeRFSystem(cfg)
    system.setup(
        SyntheticDataset(cfg, DatasetType.TRAIN, num_images=12, image_size=256,
                         keep_on_device=True),
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=1, image_size=256,
                         keep_on_device=True),
    )
    system.fit()
    train_s = time.time() - t0
    print(f"train ({args.steps} steps): {train_s:.1f}s", flush=True)

    Path("logs").mkdir(exist_ok=True)
    ply = "logs/surface_ray.ply"
    t0 = time.time()
    points, normals, colors = export_surface_ray(
        system, ply, hwf=(args.img_size, args.img_size, 1111.1111 * args.img_size / 800.0),
    )
    export_s = time.time() - t0
    n_views = 8 * 4
    print(
        f"surface-ray: {len(points)} points from {n_views} x {args.img_size}^2 "
        f"views in {export_s:.1f}s", flush=True,
    )
    if len(points) == 0:
        sys.exit(
            "surface-ray export kept 0 points — the field is degenerate "
            "(collapsed fine net?) or the consistency thresholds reject "
            "everything; no evidence to score."
        )

    # Analytic surface points (quality_800's Newton projection, verbatim).
    @jax.jit
    def project(key):
        pts = jax.random.uniform(key, (131072, 3), minval=-1.2, maxval=1.2)
        g = jax.grad(lambda p: jnp.sum(hard_sdf(p)))

        def body(pts, _):
            s = hard_sdf(pts)
            grad = g(pts)
            denom = jnp.maximum(jnp.sum(grad * grad, axis=-1, keepdims=True), 1e-8)
            return pts - s[..., None] * grad / denom, None

        pts, _ = jax.lax.scan(body, pts, None, length=5)
        return pts, hard_sdf(pts)

    pts_a, sdf = jax.device_get(project(jax.random.key(0)))
    surf = pts_a[np.abs(sdf) < 1e-3]
    rng = np.random.default_rng(0)
    n_cmp = 20000
    surf = surf[rng.choice(len(surf), size=n_cmp, replace=len(surf) < n_cmp)]
    pts_cmp = points[rng.choice(len(points), size=min(n_cmp, len(points)),
                                replace=False)]
    ch = float(chamfer_distance(surf, pts_cmp))
    # One-sided accuracy (exported point -> nearest analytic surface
    # point): the metric the exporter controls. The symmetric chamfer also
    # penalizes COVERAGE (orbit-occluded surface has no points), which the
    # reference's method inherently leaves incomplete.
    from scipy.spatial import cKDTree

    d, _ = cKDTree(surf).query(pts_cmp, k=1)
    acc_rms = float(np.sqrt(np.mean(d**2)))
    result = {
        "steps": args.steps,
        "img_size": args.img_size,
        "views": n_views,
        "points": int(len(points)),
        "train_s": train_s,
        "export_s": export_s,
        "chamfer_sq": ch,
        "chamfer_rms": float(np.sqrt(ch / 2.0)),
        "accuracy_rms": acc_rms,
        "ply": ply,
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result, indent=2), flush=True)


if __name__ == "__main__":
    main()
