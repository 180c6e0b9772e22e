"""Write the procedural hard scene through the REAL LLFF file contract:
forward-facing cameras -> `images/*.png` + `poses_bounds.npy` (the format
colmap_convert produces and the fern config consumes; reference:
src/data/loaders/load_llff.py:278, config/nerf-colmap-fern.yml).

The resulting directory trains through data/loaders/llff.py ->
ColmapDataset with per-image bounds and NDC — the at-scale evidence for
the forward-facing regime (VERDICT r2 item 6). Cameras sit on a jittered
grid in a plane, all looking toward the scene at the origin (a fern-like
rig); bounds are per-image view-axis depths of the scene's bounding
sphere.

Usage:
  python scripts/make_llff_scene.py --out data/hard_llff --size 400 --n 24
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/hard_llff")
    ap.add_argument("--size", type=int, default=400)
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--scene", default="hard")
    ap.add_argument("--gt-samples", type=int, default=512)
    ap.add_argument("--cam-z", type=float, default=3.5)
    args = ap.parse_args()

    from nerfmeshes_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfmeshes_tpu.data.synthetic import render_ground_truth
    from nerfmeshes_tpu.ops.rays import get_ray_bundle

    H = W = int(args.size)
    focal = 0.5 * W / np.tan(0.5 * 0.6911)

    # Forward-facing rig: cameras on a jittered grid in the z=cam_z plane,
    # each looking at a point near the origin.
    rng = np.random.default_rng(3)
    side = int(np.ceil(np.sqrt(args.n)))
    xs = np.linspace(-0.7, 0.7, side)
    eyes = []
    for i in range(args.n):
        gx, gy = xs[i % side], xs[i // side % side]
        eyes.append([
            gx + rng.uniform(-0.05, 0.05),
            gy + rng.uniform(-0.05, 0.05),
            args.cam_z + rng.uniform(-0.15, 0.15),
        ])
    eyes = np.asarray(eyes, np.float64)
    targets = rng.uniform(-0.1, 0.1, size=(args.n, 3))
    targets[:, 2] = 0.0

    c2ws, rows = [], []
    scene_radius = 1.4  # hard scene content fits in |p| < ~1.3
    for eye, tgt in zip(eyes, targets):
        back = eye - tgt
        back /= np.linalg.norm(back)
        right = np.cross([0.0, 1.0, 0.0], back)
        right /= np.linalg.norm(right)
        up = np.cross(back, right)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, back, eye
        c2ws.append(c2w)
        # Per-image near/far: view-axis depth range of the scene's
        # bounding sphere (what colmap_convert derives from point depths).
        depth_c = float(np.dot(eye, back))  # origin-plane depth on the view axis
        near = max(0.3, depth_c - scene_radius)
        far = depth_c + scene_radius
        # LLFF stores rotation columns [down, right, back] (the loader
        # maps them back to NeRF's [right, up, back]).
        m = np.stack([-up, right, back, eye], 1)  # (3, 4)
        hwf = np.array([[H], [W], [focal]])
        rows.append(
            np.concatenate([np.concatenate([m, hwf], 1).ravel(), [near, far]])
        )

    out = Path(args.out)
    (out / "images").mkdir(parents=True, exist_ok=True)
    np.save(out / "poses_bounds.npy", np.stack(rows))

    # Render the GT images on device in one chunked program per image.
    poses = jnp.asarray(np.stack(c2ws), jnp.float32)
    origins, dirs = get_ray_bundle(H, W, focal, poses)

    @jax.jit
    def render_one(o, d):
        flat_d = d.reshape(-1, 3)
        flat_o = jnp.broadcast_to(o[None, :], flat_d.shape)
        chunk = 40000
        pad = (-flat_d.shape[0]) % chunk
        if pad:
            flat_o = jnp.concatenate([flat_o, flat_o[-1:].repeat(pad, 0)], 0)
            flat_d = jnp.concatenate([flat_d, flat_d[-1:].repeat(pad, 0)], 0)
        C = flat_o.shape[0] // chunk

        def body(od):
            co, cd = od
            return render_ground_truth(
                co, cd, 1.0, args.cam_z + 2.0, scene=args.scene,
                num_samples=args.gt_samples,
            )

        rgb = jax.lax.map(
            body, (flat_o.reshape(C, chunk, 3), flat_d.reshape(C, chunk, 3))
        )
        return rgb.reshape(-1, 3)[: H * W].reshape(H, W, 3)

    for i in range(args.n):
        rgb = np.asarray(render_one(origins[i], dirs[i]))
        img = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
        imageio.imwrite(out / "images" / f"im_{i:03d}.png", img)
        print(f"wrote image {i + 1}/{args.n}", flush=True)
    print(f"LLFF scene at {out}: {args.n} x {H}x{W}, poses_bounds.npy written")


if __name__ == "__main__":
    main()
