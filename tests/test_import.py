"""Reference-checkpoint importer tests (cli/import_checkpoint.py).

A real Lightning-style .ckpt is fabricated from the reference's own torch
FlexibleNeRFModel (loaded in place via refload), imported, and the
resulting run is restored through the normal checkpoint path — forward
outputs must match the torch model exactly.
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from nerfmeshes_tpu.cli import import_checkpoint as ic
from nerfmeshes_tpu.config import load_config
from nerfmeshes_tpu.config.paths import resolve_paths
from nerfmeshes_tpu.train.factory import build_system

from refload import ref_models, ref_tree

TINY = "/root/repo/configs/tiny.yml"


def _model_kwargs(cfg_models_block):
    d = dict(cfg_models_block)
    return {
        k: d[k]
        for k in (
            "num_layers", "hidden_size", "skip_step", "num_encoding_fn_xyz",
            "num_encoding_fn_dir", "use_viewdirs",
        )
        if k in d
    }


def _run_dir(tmp_path, exp_id):
    return tmp_path / exp_id / "imported" / "version_0"


def test_import_nerf_checkpoint(tmp_path, rng):
    cfg = load_config(TINY)
    m = ref_models()
    torch.manual_seed(0)
    ref_coarse = m.FlexibleNeRFModel(**_model_kwargs(cfg.models.coarse))
    ref_fine = m.FlexibleNeRFModel(**_model_kwargs(cfg.models.fine))
    sd = {f"model_coarse.{k}": v for k, v in ref_coarse.state_dict().items()}
    sd.update({f"model_fine.{k}": v for k, v in ref_fine.state_dict().items()})
    ckpt_path = tmp_path / "model_last.ckpt"
    torch.save({"state_dict": sd, "global_step": 123, "epoch": 4}, ckpt_path)

    ic.main([
        "--ckpt", str(ckpt_path), "--config", TINY,
        "--override", "experiment.logdir", str(tmp_path),
        "models.use_fine", "True",
    ])

    run_dir = _run_dir(tmp_path, "tiny")
    assert (run_dir / "checkpoints" / "last").exists()
    cfg2, paths2 = resolve_paths(log_checkpoint=str(run_dir))
    assert bool(cfg2.models.use_fine)  # override persisted into hparams.yaml
    system = build_system(cfg2, paths2)
    system.restore(last=True)
    assert int(system.state.step) == 123

    pts = rng.standard_normal((12, 3)).astype(np.float32)
    dirs = rng.standard_normal((12, 3)).astype(np.float32)
    for name, ref_model in (("coarse", ref_coarse), ("fine", ref_fine)):
        with torch.no_grad():
            expected = ref_model(torch.from_numpy(pts), torch.from_numpy(dirs)).numpy()
        model = system.coarse if name == "coarse" else system.fine
        got = np.asarray(
            model.apply(system.state.params[name], jnp.asarray(pts), jnp.asarray(dirs))
        )
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_import_buff_checkpoint_with_tree(tmp_path, rng):
    overrides = [
        "experiment.logdir", str(tmp_path), "experiment.model", "BuFFModel",
        "tree.subdivision_outer_count", "4", "tree.max_voxel_count", "256",
    ]
    cfg = load_config(TINY)
    cfg.merge_from_list(list(overrides))

    m = ref_models()
    torch.manual_seed(1)
    ref_model = m.FlexibleNeRFModel(**_model_kwargs(cfg.models.coarse))
    sd = {f"model.{k}": v for k, v in ref_model.state_dict().items()}

    # Reference-format tree: initial 4^3 grid with the last cell replaced
    # by one of its depth-2 children (edge halved). The importer must
    # recover depths arithmetically from the cell edges.
    from nerfmeshes_tpu.buff.tree import TreeSampling

    tree = TreeSampling(cfg)
    voxels = np.stack([np.stack([l.lo, l.hi]) for l in tree.leaves]).astype(np.float32)
    child_lo = voxels[-1, 0]
    child_hi = child_lo + (voxels[-1, 1] - voxels[-1, 0]) / 2.0
    voxels[-1] = np.stack([child_lo, child_hi])
    V = voxels.shape[0]
    memm = (np.arange(V) * 0.01).astype(np.float32)

    Node = ref_tree().Node
    root = Node.__new__(Node)  # attribute payload irrelevant to the importer
    tree_ckpt = {
        "root": root,
        "voxels": torch.from_numpy(voxels),
        "memm": torch.from_numpy(memm),
        "counter": 7,
    }
    ckpt_path = tmp_path / "model_last.ckpt"
    torch.save(
        {"state_dict": sd, "global_step": 50, "tree": tree_ckpt}, ckpt_path
    )

    ic.main(["--ckpt", str(ckpt_path), "--config", TINY, "--override"] + overrides)

    run_dir = _run_dir(tmp_path, "tiny")
    cfg2, paths2 = resolve_paths(log_checkpoint=str(run_dir))
    system = build_system(cfg2, paths2)
    system.restore(last=True)
    assert int(system.state.step) == 50

    # Tree survived the format conversion: same boxes, memm, counter,
    # and the halved cell recovered as depth 2.
    assert int(np.asarray(system.tree_state.active).sum()) == V
    np.testing.assert_allclose(np.asarray(system.tree_state.memm)[:V], memm)
    assert int(system.tree_state.counter) == 7
    np.testing.assert_allclose(
        np.asarray(system.tree_state.voxels)[:V],
        voxels,
        rtol=1e-6,
    )
    depths = [l.depth for l in system.tree.leaves]
    assert depths[-1] == 2 and set(depths[:-1]) == {1}

    pts = rng.standard_normal((8, 3)).astype(np.float32)
    dirs = rng.standard_normal((8, 3)).astype(np.float32)
    with torch.no_grad():
        expected = ref_model(torch.from_numpy(pts), torch.from_numpy(dirs)).numpy()
    got = np.asarray(
        system.coarse.apply(
            system.state.params["coarse"], jnp.asarray(pts), jnp.asarray(dirs)
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_import_rejects_mismatched_config(tmp_path):
    cfg = load_config(TINY)
    m = ref_models()
    ref = m.FlexibleNeRFModel(**_model_kwargs(cfg.models.coarse))
    sd = {f"model_coarse.{k}": v for k, v in ref.state_dict().items()}
    ckpt_path = tmp_path / "model_last.ckpt"
    torch.save({"state_dict": sd, "global_step": 1}, ckpt_path)

    with pytest.raises(SystemExit):
        ic.main([
            "--ckpt", str(ckpt_path), "--config", TINY,
            "--override", "experiment.logdir", str(tmp_path),
            "models.coarse.hidden_size", "64",  # ckpt was trained at 32
        ])
