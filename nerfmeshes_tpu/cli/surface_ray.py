"""Surface-ray point-cloud CLI: ray-cast an orbit of views through a
trained checkpoint and export the neighborhood-consistent surface points
(with normals + colors) to PLY.

Working rebuild of the reference's ``src/mesh_surface_ray.py`` CLI — dead
there (``:9-16`` imports symbols its package does not export). The
reference hardcodes every knob (``:71-90``); here they are flags with the
same defaults.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Export a masked surface point cloud by ray casting"
    )
    parser.add_argument("--log-checkpoint", type=str, required=True,
                        help="Run log dir containing hparams.yaml + checkpoints.")
    parser.add_argument("--checkpoint", type=str, default="last",
                        help="'last' or a step number.")
    parser.add_argument("--save-path", type=str, default="surface_points.ply",
                        help="Output PLY path.")
    parser.add_argument("--img-size", type=int, default=800,
                        help="Render resolution per view (ref: 800).")
    parser.add_argument("--focal", type=float, default=1111.1111,
                        help="Focal length in pixels (ref: 1111.1111); pass 0 "
                        "to take it from the dataset.")
    parser.add_argument("--poses-y", type=int, default=8,
                        help="Azimuth samples over [-180, 180) (ref: 8).")
    parser.add_argument("--poses-x", type=int, default=4,
                        help="Elevation samples over [-90, 90] (ref: 4).")
    parser.add_argument("--radius", type=float, default=4.0,
                        help="Orbit radius (ref: plane_far = 4.0).")
    parser.add_argument("--step-size", type=int, default=2,
                        help="Neighborhood half-width s (ref: 2).")
    parser.add_argument("--dist-threshold", type=float, default=0.002,
                        help="Max squared neighbor distance (ref: 0.002).")
    parser.add_argument("--prob-threshold", type=float, default=0.6,
                        help="Fraction of neighbors that must agree (ref: 0.6).")
    parser.add_argument("--ascii", action="store_true", default=False,
                        help="Write ASCII PLY instead of binary.")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from nerfmeshes_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    from nerfmeshes_tpu.config.paths import resolve_paths
    from nerfmeshes_tpu.mesh.surface_ray import export_surface_ray
    from nerfmeshes_tpu.parallel.mesh import default_mesh
    from nerfmeshes_tpu.train.factory import build_system

    cfg, paths = resolve_paths(log_checkpoint=args.log_checkpoint)
    system = build_system(cfg, paths, default_mesh())
    system.setup_eval(None)
    system.restore(
        step=None if args.checkpoint == "last" else int(args.checkpoint),
        last=args.checkpoint == "last",
    )

    focal = args.focal
    if not focal:
        from nerfmeshes_tpu.data.datasets import DatasetType, build_dataset

        focal = float(build_dataset(cfg, DatasetType.VALIDATION).hwf[2])

    out = Path(args.save_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    points, _, _ = export_surface_ray(
        system,
        str(out),
        hwf=(args.img_size, args.img_size, focal),
        poses_y=args.poses_y,
        poses_x=args.poses_x,
        radius=args.radius,
        step_size=args.step_size,
        dist_threshold=args.dist_threshold,
        prob_threshold=args.prob_threshold,
        binary=not args.ascii,
    )
    print(f"wrote {len(points)} surface points -> {out}", flush=True)


if __name__ == "__main__":
    main()
