"""Metric/image logging: TensorBoard when available, JSONL always.

The reference logs scalars/images/meshes through Lightning's
TensorBoardLogger plus a console callback with acronymized metric lines
every `print_every` steps (src/lightning_modules.py:14-143). Here a thin
writer does TB (via torch.utils.tensorboard, CPU torch is a host-side dep
only) + an append-only metrics.jsonl that tests and tools can parse.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict


def acronym(name: str) -> str:
    """'train/coarse_loss' -> 't/cl' (reference LoggerCallback's compaction,
    src/lightning_modules.py:41-49). Single-word metrics stay whole so
    'loss' and 'lr' don't both collapse to 'l'."""
    scope, _, metric = name.partition("/")
    if not metric:
        return scope
    parts = [p for p in metric.split("_") if p]
    short = "".join(p[0] for p in parts) if len(parts) > 1 else parts[0]
    return f"{scope[0]}/{short}"


def progress_bar(total: int, desc: str, initial: int = 0, position: int = 0):
    """Console progress bar, mirroring the reference's LoggerCallback which
    replaces Lightning's bar with two tqdm bars — train (total=max_steps)
    and validation (src/lightning_modules.py:14-143).

    Enabled when stderr is a TTY; force with NERFMESHES_PROGRESS=1/0.
    Returns a tqdm instance, or an inert stub when disabled/unavailable, so
    call sites never branch."""
    import os
    import sys

    env = os.environ.get("NERFMESHES_PROGRESS")
    enabled = sys.stderr.isatty() if env is None else env not in ("0", "false")
    if enabled:
        try:
            from tqdm import tqdm

            return tqdm(
                total=total,
                desc=desc,
                initial=initial,
                position=position,
                dynamic_ncols=True,
                leave=position == 0,
            )
        except Exception:
            pass

    class _NoopBar:
        def update(self, n=1):
            pass

        def set_postfix_str(self, s, refresh=True):
            pass

        def close(self):
            pass

    return _NoopBar()


class MetricsLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True, use_acronyms: bool = True):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.use_acronyms = use_acronyms
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(self.log_dir))
            except Exception:
                self._tb = None

    def log_scalars(self, metrics: Dict[str, float], step: int) -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            rec[k] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(k, float(v), step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def log_image(self, tag: str, image, step: int) -> None:
        """image: (H, W, 3) float in [0,1] or uint8."""
        import numpy as np

        img = np.asarray(image)
        if img.dtype != "uint8":
            img = (np.clip(img, 0.0, 1.0) * 255).astype("uint8")
        if self._tb is not None:
            self._tb.add_image(tag, img, step, dataformats="HWC")
        out_dir = self.log_dir / "images"
        out_dir.mkdir(exist_ok=True)
        try:
            import imageio.v2 as imageio

            imageio.imwrite(out_dir / f"{tag.replace('/', '_')}_{step}.png", img)
        except Exception:
            pass

    def log_text(self, tag: str, text: str, step: int = 0) -> None:
        if self._tb is not None:
            self._tb.add_text(tag, text, step)

    def console_line(self, metrics: Dict[str, float], step: int) -> str:
        items = []
        for k, v in metrics.items():
            name = acronym(k) if self.use_acronyms else k
            items.append(f"{name}={float(v):.5g}")
        return f"[step {step}] " + " ".join(items)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
