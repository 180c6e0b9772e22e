"""Checkpoint save/restore via orbax.

Mirrors the reference's checkpoint policy (src/train_nerf.py:65-66):
top-3 by validation loss plus always-keep-latest, under
<logdir>/checkpoints/<step>. BuFF tree state rides along as extra arrays
(the reference stores it in on_save_checkpoint, src/models/model_buff.py:166-170).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import orbax.checkpoint as ocp

from nerfmeshes_tpu.train.step import TrainState


def _state_to_pytree(state: TrainState, extra: Optional[dict] = None) -> dict:
    d = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "key_data": jax.random.key_data(state.key),
    }
    if extra:
        d["extra"] = extra
    return d


def _pytree_to_state(tree: dict) -> tuple[TrainState, dict]:
    state = TrainState(
        params=tree["params"],
        opt_state=tree["opt_state"],
        step=jax.numpy.asarray(tree["step"], jax.numpy.int32),
        key=jax.random.wrap_key_data(jax.numpy.asarray(tree["key_data"])),
    )
    return state, tree.get("extra", {})


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = Path(directory).resolve()
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda metrics: -metrics.get("val_loss", float("inf")),
            best_mode="max",
        )
        self._mgr = ocp.CheckpointManager(str(self.directory), options=options)
        # "last" is kept out-of-band so pruning the top-k never drops it.
        self._last = ocp.StandardCheckpointer()

    def save(
        self,
        state: TrainState,
        *,
        val_loss: Optional[float] = None,
        extra: Optional[dict] = None,
    ) -> None:
        tree = _state_to_pytree(state, extra)
        step = int(state.step)
        metrics = {"val_loss": float(val_loss)} if val_loss is not None else {}
        self._mgr.save(step, args=ocp.args.StandardSave(tree), metrics=metrics)
        self._mgr.wait_until_finished()
        # Write-then-rename so a crash mid-save never leaves the run with
        # NO `last` checkpoint (rmtree-then-save had that window).
        import shutil

        last_dir = self.directory / "last"
        tmp_dir = self.directory / "last.tmp"
        if tmp_dir.exists():
            shutil.rmtree(tmp_dir)
        self._last.save(tmp_dir, tree)
        self._last.wait_until_finished()
        if last_dir.exists():
            shutil.rmtree(last_dir)
        tmp_dir.rename(last_dir)

    def restore(
        self,
        template_state: TrainState,
        step: Optional[int] = None,
        last: bool = False,
        extra_template: Optional[dict] = None,
    ) -> tuple[TrainState, dict]:
        template = _state_to_pytree(template_state, extra_template)
        if last or (step is None and self._mgr.latest_step() is None):
            tree = self._last.restore(self.directory / "last", template)
        else:
            step = step if step is not None else self._mgr.latest_step()
            tree = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return _pytree_to_state(tree)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()
