"""Training CLI (the reference's src/train_nerf.py, same flag surface).

    python -m nerfmeshes_tpu.cli.train_nerf --config configs/tiny.yml
    python -m nerfmeshes_tpu.cli.train_nerf --log-checkpoint logs/.../version_0
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Train a NeRF / BuFF model on TPU")
    parser.add_argument(
        "--config", type=str, default=None,
        help="Path to (.yml) config file (new run).",
    )
    parser.add_argument(
        "--log-checkpoint", type=str, default=None,
        help="Existing run log dir to resume from (reads its hparams.yaml).",
    )
    parser.add_argument(
        "--checkpoint", type=str, default="last",
        help="Checkpoint to resume: 'last' or a step number.",
    )
    parser.add_argument(
        "--run-name", type=str, default=None, help="Name of the run (log subdir)."
    )
    parser.add_argument(
        "--gpus", type=int, default=None,
        help="Accelerator count to use; defaults to all visible devices. "
        "(The reference forwards this to Lightning; here it bounds the mesh.)",
    )
    parser.add_argument(
        "--precision", type=str, default=None, choices=["32", "16", "bf16"],
        help="Compute precision override (bf16 is TPU-native; 16 maps to bf16).",
    )
    parser.add_argument(
        "--deterministic", action="store_true", default=True,
        help="Seeded, reproducible run (always on: RNG is explicitly keyed).",
    )
    parser.add_argument(
        "--use-profiler", action="store_true", default=False,
        help="Capture a jax.profiler trace of the first training steps.",
    )
    parser.add_argument(
        "--override", nargs="*", default=None, metavar="KEY VALUE",
        help="Config overrides as dotted key/value pairs, e.g. "
        "--override optimizer.lr 1e-3 nerf.train.num_random_rays 4096",
    )
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from nerfmeshes_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    from nerfmeshes_tpu.config.paths import resolve_paths
    from nerfmeshes_tpu.train.factory import build_system

    # --precision folds into the override list so it lands BEFORE
    # hparams.yaml is written (a post-hoc cfg mutation would silently
    # revert on resume/eval, which read hparams — same bug class as the
    # --override ordering fix).
    overrides = list(args.override or [])
    if args.precision:
        overrides += ["experiment.compute_dtype", {
            "32": "float32", "16": "bfloat16", "bf16": "bfloat16"
        }[args.precision]]
    cfg, paths = resolve_paths(
        config_path=args.config,
        log_checkpoint=args.log_checkpoint,
        run_name=args.run_name,
        overrides=overrides,
    )

    import jax

    mesh = None
    n_devices = len(jax.devices())
    use_n = min(args.gpus, n_devices) if args.gpus else n_devices
    if use_n > 1:
        from nerfmeshes_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(jax.devices()[:use_n])

    system = build_system(cfg, paths, mesh)
    system.setup()

    if args.log_checkpoint is not None:
        step = None if args.checkpoint == "last" else int(args.checkpoint)
        system.restore(step=step, last=args.checkpoint == "last")
        print(f"Resumed from step {int(system.state.step)}")

    if system.logger is not None:
        system.logger.log_text("description", str(cfg.experiment.description))
        system.logger.log_text("config", cfg.dump())

    if args.use_profiler:
        import jax.profiler

        trace_dir = str(paths.log_dir / "profile")
        with jax.profiler.trace(trace_dir):
            system.fit(max_steps=int(system.state.step) + 3 * int(cfg.experiment.steps_per_call))
        print(f"Profile trace written to {trace_dir}")

    system.fit()
    print("Training complete.")


if __name__ == "__main__":
    main()
