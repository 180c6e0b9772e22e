"""Load individual modules from the read-only PyTorch reference for parity
tests, without importing its full package graph (which needs torchvision /
pytorch-lightning that are not installed here).

The reference modules do `from nerf import cumprod_exclusive` etc.; we
pre-register a minimal stub `nerf` package exposing just those symbols,
then exec the target file as a submodule. Nothing from the reference is
copied into this repo — the modules are imported in place purely to
generate golden outputs inside tests.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from functools import lru_cache

REF_SRC = "/root/reference/src"


def _stub_nerf_package():
    if "nerf" in sys.modules and getattr(sys.modules["nerf"], "_is_parity_stub", False):
        return sys.modules["nerf"]
    import torch

    pkg = types.ModuleType("nerf")
    pkg._is_parity_stub = True
    pkg.__path__ = [REF_SRC + "/nerf"]

    def cumprod_exclusive(tensor):
        cumprod = torch.cumprod(tensor, -1)
        cumprod = torch.roll(cumprod, 1, -1)
        cumprod[..., 0] = 1.0
        return cumprod

    pkg.cumprod_exclusive = cumprod_exclusive
    sys.modules["nerf"] = pkg
    return pkg


@lru_cache(maxsize=None)
def load_ref_module(relpath: str, name: str):
    """Load e.g. load_ref_module('nerf/modules.py', 'nerf.modules')."""
    _stub_nerf_package()
    spec = importlib.util.spec_from_file_location(name, f"{REF_SRC}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def ref_modules():
    """The reference's src/nerf/modules.py (PositionalEncoding, VolumeRenderer,
    RaySampleInterval, SamplePDF, ...)."""
    return load_ref_module("nerf/modules.py", "nerf.modules")


def ref_models():
    """The reference's src/nerf/models.py (FlexibleNeRFModel, ...)."""
    ref_modules()
    return load_ref_module("nerf/models.py", "nerf.models")


def ref_tree():
    """The reference's src/nerf/tree.py (Node, TreeSampling)."""
    return load_ref_module("nerf/tree.py", "nerf.tree")


def ref_nerf_helpers():
    """The reference's src/nerf/nerf_helpers.py (get_ray_bundle, ndc_rays, ...).

    Stubs torchvision/tqdm (unavailable here, only used by image-cast
    helpers we don't exercise)."""
    for missing in ("torchvision",):
        if missing not in sys.modules:
            sys.modules[missing] = types.ModuleType(missing)
    if "tqdm" not in sys.modules:
        tq = types.ModuleType("tqdm")
        tq.tqdm = lambda it, **kw: it
        sys.modules["tqdm"] = tq
    return load_ref_module("nerf/nerf_helpers.py", "nerf.nerf_helpers")


def ref_model_helpers():
    """The reference's src/models/model_helpers.py (intervals_to_ray_points)."""
    return load_ref_module("models/model_helpers.py", "models.model_helpers")
