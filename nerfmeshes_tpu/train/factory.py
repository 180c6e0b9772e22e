"""System factory by config name (the reference picks its LightningModule
class via getattr(models, cfg.experiment.model), src/train_nerf.py:62)."""

from __future__ import annotations


def build_system(cfg, paths=None, mesh=None):
    from nerfmeshes_tpu.train.system import NeRFSystem

    name = cfg.experiment.model
    if name == "NeRFModel":
        return NeRFSystem(cfg, paths, mesh)
    if name == "BuFFModel":
        from nerfmeshes_tpu.buff.system import BuFFSystem

        return BuFFSystem(cfg, paths, mesh)
    raise ValueError(f"Unknown experiment model {name!r}")
