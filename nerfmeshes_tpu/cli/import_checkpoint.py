"""Import a reference (qway/nerfmeshes) Lightning checkpoint into a
nerfmeshes_tpu run.

The reference saves torch Lightning ``.ckpt`` files
(src/train_nerf.py:65-66) whose ``state_dict`` holds the FlexibleNeRF
weights under ``model_coarse.``/``model_fine.`` (NeRFModel,
src/models/model_nerf.py:28) or ``model.`` (BuFFModel,
src/models/model_buff.py:17), plus the serialized voxel tree under
``checkpoint['tree']`` (src/models/model_buff.py:166-170). This CLI
transplants those weights (and the BuFF tree) into a fresh
nerfmeshes_tpu run directory with an orbax checkpoint, so a reference
user's trained model can be evaluated, meshed, or fine-tuned here:

    python -m nerfmeshes_tpu.cli.import_checkpoint \
        --ckpt <run>/checkpoints/model_last.ckpt
    python -m nerfmeshes_tpu.cli.eval_nerf --log-checkpoint <printed dir>

The config defaults to the ``hparams.yaml`` Lightning wrote next to the
checkpoints dir; pass ``--config`` to use a different YAML (either a
nested experiment config or a flat dot-keyed hparams file).

Only FlexibleNeRFModel weights are transplantable (it is the model every
shipped reference config uses); other zoo models abort with a clear
error. Optimizer moments are NOT imported — Adam state restarts from
zero, which is irrelevant for eval/mesh and a short transient when
resuming training.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import yaml


# -- torch checkpoint loading -------------------------------------------------


def load_reference_checkpoint(path: str) -> dict:
    """torch.load a Lightning ckpt, tolerating the pickled ``nerf.tree.Node``
    object BuFF checkpoints carry (we never use it — tree geometry comes
    from the ``voxels`` tensor)."""
    import torch

    try:
        import nerf.tree  # noqa: F401  (present when the reference is importable)
    except ImportError:
        import types

        pkg = types.ModuleType("nerf")
        mod = types.ModuleType("nerf.tree")

        class Node:  # minimal unpickle target; attribute dict is set by pickle
            pass

        mod.Node = Node
        pkg.tree = mod
        sys.modules.setdefault("nerf", pkg)
        sys.modules.setdefault("nerf.tree", mod)

    return torch.load(path, map_location="cpu", weights_only=False)


# -- weight transplant ---------------------------------------------------------


def _torch_linear_order(num_layers: int, use_viewdirs: bool) -> list:
    """Reference FlexibleNeRFModel submodule names in call order — the
    order our flax module materializes its TorchLinear_{i} params
    (src/nerf/models.py:4-80)."""
    names = ["layer1"] + [f"layers_xyz.{i}" for i in range(num_layers - 1)]
    if use_viewdirs:
        names += ["fc_feat", "fc_alpha", "layers_dir.0", "fc_rgb"]
    else:
        names += ["fc_out"]
    return names


def transplant_state_dict(flax_params: dict, sd: dict, prefix: str, model_cfg: dict) -> dict:
    """Map ``{prefix}layer1.weight``-style torch tensors onto the flax
    param tree (TorchLinear_{i} kernels/biases in call order). Shapes are
    validated against the existing tree; any mismatch aborts."""
    import jax

    num_layers = int(model_cfg.get("num_layers", 4))
    use_viewdirs = bool(model_cfg.get("use_viewdirs", True))
    names = _torch_linear_order(num_layers, use_viewdirs)

    p = jax.tree_util.tree_map(np.asarray, flax_params["params"])
    p = {k: dict(v) for k, v in p.items()}
    expected = [f"TorchLinear_{i}" for i in range(len(names))]
    if sorted(p) != sorted(expected):
        raise SystemExit(
            f"ERROR: param tree {sorted(p)} does not match the "
            f"FlexibleNeRFModel layout {expected} — only FlexibleNeRFModel "
            "checkpoints are importable."
        )
    for i, name in enumerate(names):
        wkey, bkey = f"{prefix}{name}.weight", f"{prefix}{name}.bias"
        if wkey not in sd:
            raise SystemExit(
                f"ERROR: checkpoint is missing {wkey!r}; its model does not "
                f"match the config (num_layers={num_layers}, "
                f"use_viewdirs={use_viewdirs})."
            )
        kernel = sd[wkey].detach().numpy().T
        bias = sd[bkey].detach().numpy()
        leaf = p[f"TorchLinear_{i}"]
        if leaf["kernel"].shape != kernel.shape:
            raise SystemExit(
                f"ERROR: {wkey} has shape {tuple(kernel.T.shape)} but the "
                f"config builds {tuple(leaf['kernel'].shape[::-1])} — check "
                "models.* (hidden_size/num_layers/encoding dims)."
            )
        leaf["kernel"] = kernel.astype(leaf["kernel"].dtype)
        leaf["bias"] = bias.astype(leaf["bias"].dtype)
    return {"params": p}


# -- BuFF tree conversion -------------------------------------------------------


def convert_reference_tree(tree_ckpt: dict, tree) -> dict:
    """Reference ``TreeSampling.serialize()`` (voxels (V,2,3) tensor, memm,
    counter — src/nerf/tree.py:345-358) → our padded serialization
    (buff/tree.py:serialize). Leaf depth is recovered arithmetically: a
    depth-d cell's edge is root_edge / (outer * inner^(d-1))."""
    voxels = np.asarray(tree_ckpt["voxels"].detach().cpu().numpy(), np.float32)
    memm = np.asarray(tree_ckpt["memm"].detach().cpu().numpy(), np.float32)
    counter = int(tree_ckpt["counter"])
    V = voxels.shape[0]
    if V > tree.capacity:
        raise SystemExit(
            f"ERROR: reference tree has {V} voxels; capacity here is "
            f"{tree.capacity} (max(tree.max_voxel_count, outer^3)). Raise "
            "tree.max_voxel_count in the config."
        )

    # leaves[0] is a depth-1 cell: root_edge = its edge * outer_count.
    root_edge = float(
        (tree.leaves[0].hi[0] - tree.leaves[0].lo[0]) * tree.outer_count
    )
    edges = (voxels[:, 1] - voxels[:, 0]).mean(axis=1)
    ratio = root_edge / (tree.outer_count * np.maximum(edges, 1e-12))
    depth = 1 + np.round(np.log(ratio) / np.log(tree.inner_count)).astype(np.int32)
    depth = np.clip(depth, 1, tree.max_depth)

    from nerfmeshes_tpu.buff.tree import _PAD_HI, _PAD_LO

    lo = np.full((tree.capacity, 3), _PAD_LO, np.float32)
    hi = np.full((tree.capacity, 3), _PAD_HI, np.float32)
    dep = np.zeros((tree.capacity,), np.int32)
    mem = np.zeros((tree.capacity,), np.float32)
    lo[:V], hi[:V], dep[:V], mem[:V] = voxels[:, 0], voxels[:, 1], depth, memm
    return {
        "leaf_lo": lo,
        "leaf_hi": hi,
        "leaf_depth": dep,
        "memm": mem,
        "counter": np.asarray(counter),
        "num_leaves": np.asarray(V, np.int32),
    }


# -- config resolution ----------------------------------------------------------


def load_any_config(path: str):
    """A nested experiment YAML or a flat dot-keyed hparams.yaml."""
    from nerfmeshes_tpu.config.cfgnode import CfgNode, nest_dict
    from nerfmeshes_tpu.config.schema import get_default_cfg, load_config

    with open(path) as fh:
        raw = yaml.safe_load(fh)
    if any("." in str(k) for k in raw):
        cfg = get_default_cfg()
        cfg.merge_from_other_cfg(CfgNode(nest_dict(raw)))
        return cfg
    return load_config(path)


def new_run_paths(cfg, run_name: str):
    """Fresh version_k run dir under <logdir>/<id>/<run> (the reference's
    PathParser layout, src/lightning_modules.py:146-222)."""
    from nerfmeshes_tpu.config.paths import ExperimentPaths, save_hparams

    base = Path(cfg.experiment.logdir) / cfg.experiment.id / run_name
    version = 0
    while (base / f"version_{version}").exists():
        version += 1
    paths = ExperimentPaths(base / f"version_{version}").create()
    save_hparams(cfg, paths)
    return paths


# -- CLI -------------------------------------------------------------------------


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Import a reference Lightning .ckpt into a nerfmeshes_tpu run"
    )
    parser.add_argument(
        "--ckpt", type=str, required=True,
        help="Path to the reference model_*.ckpt file.",
    )
    parser.add_argument(
        "--config", type=str, default=None,
        help="Experiment YAML or flat hparams.yaml (default: the "
        "hparams.yaml next to the checkpoint's parent dir).",
    )
    parser.add_argument(
        "--run-name", type=str, default="imported",
        help="Run subdirectory name for the new log dir.",
    )
    parser.add_argument(
        "--override", nargs="*", default=None, metavar="KEY VALUE",
        help="Config overrides as dotted key/value pairs.",
    )
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    ckpt_path = Path(args.ckpt)
    if not ckpt_path.exists():
        raise SystemExit(f"ERROR: checkpoint {ckpt_path} does not exist")
    config_path = args.config or str(ckpt_path.parent.parent / "hparams.yaml")
    if not Path(config_path).exists():
        raise SystemExit(
            f"ERROR: no config found at {config_path}; pass --config "
            "(the reference writes hparams.yaml next to its checkpoints dir)."
        )

    cfg = load_any_config(config_path)
    if args.override:
        cfg.merge_from_list(list(args.override))

    ckpt = load_reference_checkpoint(str(ckpt_path))
    sd = ckpt.get("state_dict", ckpt)
    step = int(ckpt.get("global_step", 0))

    paths = new_run_paths(cfg, args.run_name)

    from nerfmeshes_tpu.train.factory import build_system

    system = build_system(cfg, paths)
    params = dict(system.state.params)

    model_name = str(cfg.experiment.model)
    if model_name == "BuFFModel":
        params["coarse"] = transplant_state_dict(
            params["coarse"], sd, "model.", dict(cfg.models.coarse)
        )
        if "tree" in ckpt:
            data = convert_reference_tree(ckpt["tree"], system.tree)
            system.tree_state = system.tree.deserialize(data)
            print(f"imported BuFF tree: {int(data['num_leaves'])} voxels")
        else:
            print("WARNING: no 'tree' entry in the checkpoint; starting "
                  "from the initial root subdivision.")
    else:
        params["coarse"] = transplant_state_dict(
            params["coarse"], sd, "model_coarse.", dict(cfg.models.coarse)
        )
        if any(k.startswith("model_fine.") for k in sd):
            if system.fine is None:
                raise SystemExit(
                    "ERROR: the checkpoint has a fine network (model_fine.*) "
                    "but the config sets models.use_fine: False — import "
                    "with the run's own hparams.yaml or override "
                    "models.use_fine True."
                )
            params["fine"] = transplant_state_dict(
                params["fine"], sd, "model_fine.", dict(cfg.models.fine)
            )

    import jax.numpy as jnp

    system.state = system.state._replace(
        params=params, step=jnp.asarray(step, jnp.int32)
    )
    system.save(val_loss=None)
    print(f"imported step {step} -> {paths.log_dir}")
    print("note: optimizer moments reset (weights-only import)")
    print(f"eval: python -m nerfmeshes_tpu.cli.eval_nerf --log-checkpoint {paths.log_dir}")


if __name__ == "__main__":
    main()
