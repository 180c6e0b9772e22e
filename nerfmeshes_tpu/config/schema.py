"""Default configuration schema.

Mirrors the reference's YAML schema exactly (keys + defaults surveyed from
/root/reference/config/nerf-synthetic-lego.yml and buff-synthetic-lego.yml;
see SURVEY.md §2.1) so the reference's `config/*.yml` experiment files merge
in unchanged. TPU-specific knobs live under `experiment.*` and `tpu.*` and
default to values that reproduce the reference behavior.
"""

from nerfmeshes_tpu.config.cfgnode import CfgNode


def get_default_cfg() -> CfgNode:
    cfg = CfgNode(
        {
            "experiment": {
                "id": "experiment",
                "model": "NeRFModel",
                "description": "",
                "logdir": "../logs",
                "randomseed": 42,
                "train_iters": 250000,
                "validate_every": 5000,
                "print_every": 100,
                "meshdir": "../data/meshes",
                "use_early_stopping": False,
                "early_stopping_step": 25,
                "chamfer_loss": False,
                "chamfer_sampling_size": 2400,
                # TPU additions (absent keys in reference configs are fine):
                # computation dtype of the MLP matmuls; fp32 matches reference
                # numerics, bf16 runs faster on the MXU.
                "compute_dtype": "bfloat16",
                # how many optimizer steps a single jitted call advances
                # (lax.scan over steps amortizes dispatch overhead).
                "steps_per_call": 10,
                # route eligible MLPs through the fused Pallas kernel.
                "use_fused_kernel": True,
            },
            "logging": {
                "use_acronyms": True,
                "use_projection": True,
                "projection_step_size": 5000,
            },
            "tree": {
                "subdivision_outer_count": 12,
                "subdivision_inner_count": 2,
                "max_depth": 4,
                "eps": 0.0001,
                "use_random_sampling": False,
                "max_voxel_count": 1536,
                "step_size_integration_offset": 6000,
                "step_size_tree": 6000,
                # 0 = auto (AUTO_CHORD_CAP = 64): chord-slot cap of the
                # deterministic sampler. Compaction cost is linear in K;
                # the dropped-chord counter auto-doubles it when it binds.
                "max_chords_per_ray": 0,
                # Ceiling for the auto-doubling: compaction workspace is
                # R x _SLAB_V x K (plus an R x K x K append one-hot on the
                # slab path), so unbounded growth would rebuild the
                # compile wall the slab scan exists to avoid (~2.2GB at
                # K=128 with R=2048; ~8.6GB at K=512). Past the ceiling,
                # drops are logged but the cap stays put.
                "max_chord_cap": 256,
            },
            "dataset": {
                "type": "blender",
                "basedir": "../data/nerf_synthetic/lego",
                "reduced_resolution": 1,
                "testskip": 1,
                "use_ndc": False,
                "near": 2.0,
                "far": 6.0,
                "empty": 0.0,
                "num_workers": 6,
                "llff_downsample_factor": 8,
                "llff_hold_step": 8,
                "white_background": False,
                "spherify": True,
                # synthetic datasets only: "blobs" (smooth) | "hard"
                # (crisp SDF geometry + high-frequency texture).
                "scene": "blobs",
                "synthetic": {
                    "num_images": 8,
                    "image_size": 32,
                    # GT quadrature samples/ray (512+ for the hard scene).
                    "gt_samples": 256,
                    # keep rendered targets in HBM (skip the tunnel fetch;
                    # right for big TPU runs, off for host-side tooling).
                    "keep_on_device": False,
                    "with_depth": False,
                },
                "caching": {
                    "use_caching": False,
                    "override_caching": False,
                    "cache_dir": "../cache/cache",
                    "num_variations": 4,
                    "sample_all": True,
                },
            },
            "models": {
                "coarse_type": "FlexibleNeRFModel",
                "coarse": _mlp_defaults(),
                "fine_type": "FlexibleNeRFModel",
                "use_fine": True,
                "fine": _mlp_defaults(),
            },
            "optimizer": {
                "type": "Adam",
                "lr": 5.0e-3,
                # micro-batch gradient accumulation: average grads over N
                # consecutive step bodies before one optimizer update (the
                # knob the reference hardcodes off via
                # accumulate_grad_batches=1, src/train_nerf.py:91).
                "accumulate_steps": 1,
            },
            "scheduler": {
                "type": "DefaultScheduler",
                "options": {
                    "gamma": 0.1,
                    "step_size": 450000,
                },
            },
            "nerf": {
                "use_viewdirs": True,
                "encode_position_fn": "positional_encoding",
                "encode_direction_fn": "positional_encoding",
                "train": _nerf_mode_defaults(train=True),
                "validation": _nerf_mode_defaults(train=False),
            },
        }
    )
    return cfg


def _mlp_defaults() -> dict:
    return {
        "num_layers": 8,
        "skip_step": 4,
        "encoding": "positional",
        "num_layers_view": -1,
        "hidden_size": 256,
        "include_input_xyz": True,
        "log_sampling_xyz": True,
        "num_encoding_fn_xyz": 10,
        "include_input_dir": True,
        "num_encoding_fn_dir": 4,
        "log_sampling_dir": True,
        "use_viewdirs": True,
        "luminance_function": "min1",
    }


def _nerf_mode_defaults(train: bool) -> dict:
    d = {
        "chunksize": 2048,
        "perturb": False,
        "num_coarse": 64,
        "num_fine": 128,
        "radiance_field_noise_std": 0.2 if train else 0.0,
        "lindisp": False,
    }
    if train:
        d["num_random_rays"] = 2048
        # sample every ray from the global (image, pixel) pool instead of
        # one image per step (decorrelates batches; off = reference scheme).
        d["sample_all_images"] = False
    else:
        d["num_samples"] = 1
        # Pin the validation view draw to seed 0 (identical views at every
        # validation) instead of redrawing per epoch — for benchmark runs
        # that compare checkpoints on fixed views.
        d["fixed_views"] = False
    return d


def load_config(path: str, overrides: list | None = None) -> CfgNode:
    """Load an experiment YAML on top of the default schema."""
    cfg = get_default_cfg()
    cfg.merge_from_file(path)
    if overrides:
        cfg.merge_from_list(overrides)
    return cfg
