"""Evaluation CLI (the reference's src/eval_nerf.py, same flag surface):
renders the TEST split (or 120 synthesized orbit views), reports per-image
and dataset MSE/PSNR, optionally saves rgb/target/disparity PNGs.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Render + evaluate a checkpoint")
    parser.add_argument("--log-checkpoint", type=str, required=True,
                        help="Run log dir containing hparams.yaml + checkpoints.")
    parser.add_argument("--checkpoint", type=str, default="last",
                        help="'last' or a step number.")
    parser.add_argument("--save-dir", type=str, default=None,
                        help="Save images to this directory.")
    parser.add_argument("--save-images", action="store_true", default=False)
    parser.add_argument("--save-disparity", action="store_true", default=False)
    parser.add_argument("--synthesis-images", action="store_true", default=False,
                        help="Render 120 synthesized orbit poses instead of the test split.")
    parser.add_argument("--synthesis-video", type=str, default=None,
                        help="Also assemble the rendered frames into an animated GIF "
                        "at this path (the reference README's novel-view orbits; "
                        "implies --synthesis-images).")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.synthesis_video and not args.synthesis_video.endswith(".gif"):
        # Validate before build_system: backend init + model construction
        # cost minutes through the TPU tunnel.
        raise SystemExit(
            "--synthesis-video: only .gif is supported in this environment "
            "(no ffmpeg); got " + args.synthesis_video
        )

    from nerfmeshes_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    from nerfmeshes_tpu.config.paths import resolve_paths
    from nerfmeshes_tpu.data.datasets import DatasetType, build_dataset
    from nerfmeshes_tpu.ops.math import ssim
    from nerfmeshes_tpu.utils.images import cast_to_disparity_image
    from nerfmeshes_tpu.train.factory import build_system

    import jax.numpy as jnp

    from nerfmeshes_tpu.parallel.mesh import default_mesh

    cfg, paths = resolve_paths(log_checkpoint=args.log_checkpoint)
    # Shard the render over every visible chip (single device -> None).
    system = build_system(cfg, paths, default_mesh())
    dataset = build_dataset(cfg, DatasetType.TEST)
    if args.synthesis_images or args.synthesis_video:
        dataset.synthesis()
    system.setup_eval(dataset)
    system.restore(
        step=None if args.checkpoint == "last" else int(args.checkpoint),
        last=args.checkpoint == "last",
    )

    save_dir = Path(args.save_dir) if args.save_dir else None
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)

    H, W, _ = dataset.hwf
    H, W = int(H), int(W)
    mses = []
    ssims = []
    video_frames = [] if args.synthesis_video else None
    save_rgb = bool(
        (save_dir and (args.save_images or args.synthesis_images))
        or video_frames is not None
    )

    import jax

    # Metrics run ON DEVICE against the unfetched render (the old path
    # fetched f32 rgb then re-uploaded it + the target for SSIM — ~23 MB
    # of tunnel traffic per 800^2 view); the host receives two scalars,
    # plus uint8 rgb only when PNGs/frames are requested.
    @jax.jit
    def _metrics(rgb_flat, target_flat):
        mse = jnp.mean((rgb_flat - target_flat) ** 2)
        return mse, ssim(
            rgb_flat.reshape(H, W, 3), target_flat.reshape(H, W, 3)
        )

    @jax.jit
    def _to_u8(rgb_flat):
        scaled = jnp.clip(rgb_flat.reshape(H, W, 3), 0.0, 1.0) * 255.0
        return scaled.astype(jnp.uint8)

    for idx in range(len(dataset)):
        # Rays stay on device (dataset.image_rays); only targets/bounds
        # are host-side.
        origins, directions = dataset.image_rays(idx)
        near, far = np.asarray(dataset._bounds_for(idx)).reshape(-1)[:2]
        targets = (
            None
            if dataset.synthetic_poses is not None
            else np.asarray(dataset.bundle.ray_targets[idx])
        )
        out = system.query_rays(
            origins, directions, float(near), float(far),
            fields=("rgb_map", "disp_map") if args.save_disparity
            else ("rgb_map",),
            as_numpy=False,
        )

        line = f"[{idx:03d}]"
        if targets is not None:
            target = np.asarray(targets).reshape(H, W, 3)
            mse, s_val = (
                float(v)
                for v in jax.device_get(
                    _metrics(out.rgb_map, jnp.asarray(targets).reshape(-1, 3))
                )
            )
            mses.append(mse)
            ssims.append(s_val)
            # Host-side psnr (ops.math.mse2psnr semantics) — a device
            # mse2psnr call would cost a ~100 ms scalar fetch per view.
            psnr = -10.0 * float(np.log10(mse if mse > 0 else 1e-5))
            line += f" mse={mse:.5f} psnr={psnr:.2f} ssim={s_val:.4f}"
        print(line, flush=True)

        rgb_u8 = np.asarray(_to_u8(out.rgb_map)) if save_rgb else None
        if video_frames is not None:
            video_frames.append(rgb_u8)
        if save_dir and (args.save_images or args.synthesis_images):
            import imageio.v2 as imageio

            imageio.imwrite(save_dir / f"{idx:04d}_rgb.png", rgb_u8)
            if targets is not None:
                imageio.imwrite(
                    save_dir / f"{idx:04d}_target.png",
                    (np.clip(target, 0, 1) * 255).astype(np.uint8),
                )
            if args.save_disparity:
                disp = np.asarray(out.disp_map).reshape(H, W)
                imageio.imwrite(
                    save_dir / f"{idx:04d}_disparity.png",
                    cast_to_disparity_image(disp, cfg.dataset.white_background),
                )

    if video_frames:
        import imageio.v2 as imageio

        os.makedirs(Path(args.synthesis_video).resolve().parent, exist_ok=True)
        # duration is ms/frame on this imageio (2.37): ~24 fps, loop forever.
        imageio.mimwrite(args.synthesis_video, video_frames, duration=42, loop=0)
        print(f"wrote {len(video_frames)}-frame animation -> {args.synthesis_video}")

    if mses:
        mean_mse = float(np.mean(mses))
        mean_psnr = -10.0 * float(np.log10(mean_mse if mean_mse > 0 else 1e-5))
        print(
            f"dataset: mse={mean_mse:.5f} "
            f"psnr={mean_psnr:.2f} "
            f"ssim={float(np.mean(ssims)):.4f}"
        )


if __name__ == "__main__":
    main()
