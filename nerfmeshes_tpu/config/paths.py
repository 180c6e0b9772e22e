"""Experiment path resolution (the reference's PathParser,
src/lightning_modules.py:146-222).

Layout: <logdir>/<experiment.id>/<run_name>/version_<k>/
           hparams.yaml          (flat dot-keyed config, resume source)
           checkpoints/          (orbax checkpoints)
           events/               (tensorboard)

A new run picks the next free version_k; `--log-checkpoint` resumes by
re-nesting the flat hparams.yaml into a CfgNode.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

import yaml

from nerfmeshes_tpu.config.cfgnode import CfgNode, flatten_dict, nest_dict
from nerfmeshes_tpu.config.schema import get_default_cfg


@dataclass
class ExperimentPaths:
    log_dir: Path
    checkpoint_dir: Path = field(init=False)
    hparams_path: Path = field(init=False)
    events_dir: Path = field(init=False)

    def __post_init__(self):
        self.log_dir = Path(self.log_dir)
        self.checkpoint_dir = self.log_dir / "checkpoints"
        self.hparams_path = self.log_dir / "hparams.yaml"
        self.events_dir = self.log_dir / "events"

    def create(self) -> "ExperimentPaths":
        for d in (self.log_dir, self.checkpoint_dir, self.events_dir):
            os.makedirs(d, exist_ok=True)
        return self


def save_hparams(cfg: CfgNode, paths: ExperimentPaths) -> None:
    with open(paths.hparams_path, "w") as fh:
        yaml.safe_dump(flatten_dict(cfg.to_dict()), fh)


def load_hparams(log_dir: str) -> CfgNode:
    """Recover the full config from a run's flat hparams.yaml
    (reference: src/lightning_modules.py:185-192)."""
    with open(Path(log_dir) / "hparams.yaml") as fh:
        flat = yaml.safe_load(fh)
    cfg = get_default_cfg()
    cfg.merge_from_other_cfg(CfgNode(nest_dict(flat)))
    return cfg


def resolve_paths(
    config_path: Optional[str] = None,
    log_checkpoint: Optional[str] = None,
    run_name: Optional[str] = None,
    overrides: Optional[list] = None,
) -> tuple[CfgNode, ExperimentPaths]:
    """New run from a config YAML, or resume from an existing log dir.

    Exactly one of config_path / log_checkpoint must be given (the
    reference asserts the same XOR, src/lightning_modules.py:170-183).

    `overrides` (dotted KEY VALUE pairs, the --override flag) merge into
    the config BEFORE the run directory is derived and hparams.yaml is
    written — so experiment.id / experiment.logdir overrides place the
    run, and a later resume (which reads hparams.yaml) keeps every
    override instead of silently reverting to the YAML values.
    """
    if (config_path is None) == (log_checkpoint is None):
        raise ValueError("Provide exactly one of config_path or log_checkpoint")

    if log_checkpoint is not None:
        cfg = load_hparams(log_checkpoint)
        paths = ExperimentPaths(Path(log_checkpoint)).create()
        if overrides:
            cfg.merge_from_list(list(overrides))
            # Persist resume-time overrides (incl. --precision, which the
            # train CLI folds in) the same way fresh-run overrides persist:
            # the NEXT resume/eval reads hparams.yaml, and a checkpoint
            # written under the overridden config (e.g. a different
            # compute_dtype) must be reloaded under that config too. Only
            # the train CLI passes overrides here; eval/mesh never write.
            save_hparams(cfg, paths)
        return cfg, paths

    from nerfmeshes_tpu.config.schema import load_config

    cfg = load_config(config_path)
    if overrides:
        cfg.merge_from_list(list(overrides))
    run = run_name or "default"
    base = Path(cfg.experiment.logdir) / cfg.experiment.id / run
    version = 0
    while (base / f"version_{version}").exists():
        version += 1
    paths = ExperimentPaths(base / f"version_{version}").create()
    save_hparams(cfg, paths)
    return cfg, paths
