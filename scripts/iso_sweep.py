"""Iso-level sweep at a trained checkpoint: diagnose the 20k->50k chamfer
inversion (VERDICT r2 weak #2 — mesh chamfer worsened with more training
while PSNR improved; suspected cause is the adaptive iso clamp
`min(max(iso, min+std), max-std)` drifting up as the density field
sharpens, eroding thin geometry; reference: src/mesh_nerf.py:56-65).

For each iso value (plus the adaptive clamp), extracts geometry from the
checkpoint and chamfers it against the hard scene's analytic SDF surface,
printing one JSON row per iso with the clamp diagnostics.

Usage:
  python scripts/iso_sweep.py --log-checkpoint logs/hard-250k/r3_250k/version_0 \
      [--checkpoint 25000] [--res 320] [--isos 10 20 30 50 80]
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
    ap.add_argument("--log-checkpoint", required=True)
    ap.add_argument("--checkpoint", default="last")
    ap.add_argument("--res", type=int, default=320)
    ap.add_argument("--isos", type=float, nargs="+",
                    default=[10.0, 20.0, 30.0, 50.0, 80.0])
    ap.add_argument("--out", default=None)
    ap.add_argument("--no-tree-mask", action="store_true", default=False,
                    help="(BuFF) disable masking extraction to the tree's "
                    "active-voxel support.")
    args = ap.parse_args()

    from nerfmeshes_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfmeshes_tpu.config.paths import resolve_paths
    from nerfmeshes_tpu.data.synthetic import hard_sdf
    from nerfmeshes_tpu.mesh import MeshArgs, chamfer_distance, extract_geometry
    from nerfmeshes_tpu.mesh.extract import LAST_TIMINGS
    from nerfmeshes_tpu.mesh.metrics import sample_points_from_mesh
    from nerfmeshes_tpu.train.factory import build_system

    cfg, paths = resolve_paths(log_checkpoint=args.log_checkpoint)
    system = build_system(cfg, paths)
    system.setup_eval()
    system.restore(
        step=None if args.checkpoint == "last" else int(args.checkpoint),
        last=args.checkpoint == "last",
    )
    step = int(system.state.step)
    print(f"checkpoint step {step}", flush=True)

    # Analytic surface point cloud (matches scripts/quality_800.py).
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

    pts, sdf = jax.device_get(project(jax.random.key(0)))
    surf = pts[np.abs(sdf) < 1e-3]
    rng = np.random.default_rng(0)
    n_cmp = 20000
    surf = surf[rng.choice(len(surf), size=n_cmp, replace=len(surf) < n_cmp)]

    rows = []
    # Unclamped sweep over the requested isos (the adaptive clamp would
    # pull everything below min+std up to the same floor, making low-iso
    # rows indistinguishable), plus one final row with the reference's
    # adaptive clamp at the shipped request (the production behavior).
    cases = [(float(iso), False) for iso in args.isos] + [(30.0, True)]
    for iso, clamp in cases:
        t0 = time.time()
        verts, faces, _, _ = extract_geometry(
            system.sample_points,
            MeshArgs(res=args.res, limit=1.2, iso_level=float(iso),
                     clamp_iso=clamp),
            density_fn=system.density_apply,
            density_params=system.finest_params,
            mesh=getattr(system, "mesh", None),
            mask_aabbs=(
                system.mesh_mask_aabbs()
                if not args.no_tree_mask and hasattr(system, "mesh_mask_aabbs")
                else None
            ),
        )
        if len(faces) == 0:
            rows.append({"iso_requested": iso, "empty": True})
            print(json.dumps(rows[-1]), flush=True)
            continue
        mesh_pts = sample_points_from_mesh(verts, faces, n_cmp)
        ch = float(chamfer_distance(surf, mesh_pts))
        row = {
            "step": step,
            "res": args.res,
            "adaptive_clamp": clamp,
            "iso_requested": float(iso),
            "iso_effective": LAST_TIMINGS.get("iso_effective"),
            "density_min": LAST_TIMINGS.get("density_min"),
            "density_max": LAST_TIMINGS.get("density_max"),
            "density_std": LAST_TIMINGS.get("density_std"),
            "verts": int(len(verts)),
            "tree_masked_blocks": LAST_TIMINGS.get("tree_masked_blocks"),
            "chamfer_sq": ch,
            "chamfer_rms": float(np.sqrt(ch / 2.0)),
            "wall_s": time.time() - t0,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"step": step, "rows": rows}, fh, indent=2)


if __name__ == "__main__":
    main()
