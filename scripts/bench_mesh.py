"""End-to-end mesh-extraction benchmark on the live TPU.

Trains the lego-architecture model briefly on the analytic synthetic scene
(so the iso-surface is a real object, not noise), then times the full
480^3 pipeline: density grid eval (device) -> adaptive iso-level ->
marching cubes (native C++) -> inverse-normal appearance resampling.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_mesh.py [res]
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

from nerfmeshes_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from nerfmeshes_tpu.config import load_config
from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
from nerfmeshes_tpu.mesh.extract import MeshArgs, extract_geometry
from nerfmeshes_tpu.train.system import NeRFSystem


def main() -> None:
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 480

    cfg = load_config("/root/repo/configs/nerf-synthetic-lego.yml")
    cfg.experiment.train_iters = 2000
    cfg.experiment.validate_every = 10**9
    cfg.experiment.print_every = 500
    cfg.experiment.steps_per_call = 50
    cfg.optimizer.lr = 1e-3
    cfg.dataset.type = "synthetic"

    system = NeRFSystem(cfg)
    system.setup(
        SyntheticDataset(cfg, DatasetType.TRAIN, num_images=8, image_size=64),
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=1, image_size=64),
    )
    t0 = time.time()
    system.fit()
    print(f"train (2k steps): {time.time()-t0:.1f}s")

    args = MeshArgs(res=res, limit=2.0, iso_level=32.0)

    # Warm the jitted grid-eval tile (compile excluded from the timing).
    warm = MeshArgs(res=64, limit=2.0, iso_level=32.0)
    dkw = dict(density_fn=system.density_apply, density_params=system.finest_params)
    extract_geometry(system.sample_points, warm, **dkw)

    t0 = time.time()
    verts, tris, normals, density = extract_geometry(system.sample_points, args, **dkw)
    t_geom = time.time() - t0
    from nerfmeshes_tpu.mesh import extract as _ex

    tim = _ex.LAST_TIMINGS
    print(
        f"geometry {res}^3: {t_geom:.1f}s total — device eval "
        f"{tim.get('grid_eval_device_s', 0):.1f}s "
        f"({res**3/max(tim.get('grid_eval_device_s', 1e-9),1e-9)/1e6:.0f}M pts/s), "
        f"tunnel transfer {tim.get('grid_transfer_s', 0):.1f}s, "
        f"marching cubes {tim.get('marching_cubes_s', 0):.1f}s; "
        f"{len(verts)} verts / {len(tris)} tris"
    )
    print(f"  all timings: { {k: round(v, 2) if isinstance(v, float) else v for k, v in tim.items()} }")

    # Inverse-normal appearance pass (reference: src/mesh_nerf.py:164-193),
    # through the single-dispatch batched renderer (compile excluded).
    origins = verts - args.view_disparity * (-normals)
    system.query_rgb(origins[:65536], -normals[:65536], 0.0, args.view_disparity_max_bound)
    t0 = time.time()
    colors = system.query_rgb(
        origins, -normals, 0.0, args.view_disparity_max_bound, chunk=65536
    )
    t_app = time.time() - t0
    print(f"appearance: {t_app:.1f}s ({len(verts)/max(t_app,1e-9)/1e6:.2f}M verts/s)")
    print(f"TOTAL {res}^3 extraction: {t_geom + t_app:.1f}s")
    assert np.isfinite(colors).all()


if __name__ == "__main__":
    main()
