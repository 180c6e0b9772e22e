"""Score a surface-ray PLY point cloud against the hard scene's analytic
surface (chamfer + one-sided accuracy), on CPU — companion to
scripts/r4_surface_ray_evidence.py for clouds produced by the
`surface-ray-nerf` CLI.

Usage: python scripts/score_surface_ply.py logs/r4c_surface_cli.ply
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def read_ply_points(path: str):
    """Minimal reader for the PLY files export_ply/export_ply_binary write
    (vertex elements with x/y/z leading; binary_little_endian or ascii)."""
    import numpy as np

    with open(path, "rb") as fh:
        header = []
        while True:
            line = fh.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        n = next(int(l.split()[-1]) for l in header if l.startswith("element vertex"))
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        # Collect only the vertex element's properties (export_ply also
        # declares an `element face` whose list property must not be parsed
        # as a vertex field).
        props, in_vertex = [], False
        for line in header:
            if line.startswith("element "):
                in_vertex = line.startswith("element vertex")
            elif in_vertex and line.startswith("property "):
                props.append(line.split()[1:])
        typemap = {"float": "<f4", "float32": "<f4", "uchar": "u1", "uint8": "u1",
                   "double": "<f8", "int": "<i4"}
        if fmt == "ascii":
            data = np.loadtxt(fh, max_rows=n, dtype=np.float64)
            return data[:, :3].astype(np.float32)
        dtype = np.dtype([(name, typemap[t]) for t, name in props])
        rec = np.frombuffer(fh.read(n * dtype.itemsize), dtype=dtype, count=n)
        return np.stack([rec["x"], rec["y"], rec["z"]], -1).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ply")
    ap.add_argument("--n-cmp", type=int, default=20000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np

    points = read_ply_points(args.ply)
    print(f"{args.ply}: {len(points)} points", flush=True)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nerfmeshes_tpu.data.synthetic import hard_sdf
    from nerfmeshes_tpu.mesh.metrics import chamfer_distance

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
    surf = surf[rng.choice(len(surf), size=args.n_cmp,
                           replace=len(surf) < args.n_cmp)]
    pts_cmp = points[rng.choice(len(points), size=min(args.n_cmp, len(points)),
                                replace=False)]
    ch = float(chamfer_distance(surf, pts_cmp))
    from scipy.spatial import cKDTree

    d, _ = cKDTree(surf).query(pts_cmp, k=1)
    result = {
        "ply": args.ply,
        "points": int(len(points)),
        "chamfer_sq": ch,
        "chamfer_rms": float(np.sqrt(ch / 2.0)),
        "accuracy_rms": float(np.sqrt(np.mean(d**2))),
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=2)


if __name__ == "__main__":
    main()
