"""DataBundle — the universal ray/image batch container.

Pytree-registered dataclass carrying per-image camera rays, targets and
metadata; the analog of the reference's DataBundle
(src/data/data_helpers.py:79-167) but designed to live directly in device
HBM: arrays are numpy on the host and transfer wholesale with
`jax.device_put` (no per-batch host→device copies in the train loop).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np

from nerfmeshes_tpu.ops.rays import ndc_rays

Array = Any  # np.ndarray | jax.Array


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DataBundle:
    """One or many images' worth of rays.

    Shapes (N = images, H, W = image size; after `to_ray_batch` the image
    dims flatten to a ray axis):
        ray_origins:    (N, 3) or (..., 3)
        ray_directions: (N, H, W, 3) or (R, 3)
        ray_targets:    (N, H, W, 3) or (R, 3)
        ray_bounds:     (2,) or (N, 2) near/far
        target_depth:   optional (N, H, W) / (R,)
        target_normals: optional (N, H, W, 3) / (R, 3)
        poses:          optional (N, 4, 4)
        hwf:            (3,) = [H, W, focal]
    """

    ray_origins: Optional[Array] = None
    ray_directions: Optional[Array] = None
    ray_targets: Optional[Array] = None
    ray_bounds: Optional[Array] = None
    target_depth: Optional[Array] = None
    target_normals: Optional[Array] = None
    poses: Optional[Array] = None
    hwf: Optional[Array] = None

    _FIELDS = (
        "ray_origins",
        "ray_directions",
        "ray_targets",
        "ray_bounds",
        "target_depth",
        "target_normals",
        "poses",
        "hwf",
    )

    def tree_flatten(self):
        return tuple(getattr(self, f) for f in self._FIELDS), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(**dict(zip(cls._FIELDS, children)))

    # -- conversions ---------------------------------------------------------
    def __getitem__(self, index) -> "DataBundle":
        """Select image(s) along the leading axis; bounds/hwf pass through."""

        def sel(name, v):
            if v is None or name in ("ray_bounds", "hwf"):
                return v
            return v[index]

        return DataBundle(
            **{f: sel(f, getattr(self, f)) for f in self._FIELDS}
        )

    def to_ray_batch(self) -> "DataBundle":
        """Flatten image dims into a single ray axis (origins stay compact
        unless they're already per-ray)."""

        def flat(v, last):
            if v is None:
                return None
            return np.asarray(v).reshape(-1, last) if last else np.asarray(v).reshape(-1)

        return DataBundle(
            ray_origins=np.asarray(self.ray_origins).reshape(-1, 3)
            if self.ray_origins is not None and np.asarray(self.ray_origins).ndim > 2
            else self.ray_origins,
            ray_directions=flat(self.ray_directions, 3),
            ray_targets=flat(self.ray_targets, 3),
            ray_bounds=self.ray_bounds,
            target_depth=flat(self.target_depth, 0),
            target_normals=flat(self.target_normals, 3),
            poses=self.poses,
            hwf=self.hwf,
        )

    def ndc(self, focal: float | None = None) -> "DataBundle":
        """Convert rays to normalized device coordinates (LLFF forward-facing).

        Matches the reference's DataBundle.ndc (src/data/data_helpers.py:164-167):
        ``ndc_rays(*self.hwf, 1.0, ...)`` — H/W/**focal** all come from hwf
        (the 1.0 is ``near``), per-ray origins produced by the transform.
        """
        h, w = int(self.hwf[0]), int(self.hwf[1])
        if focal is None:
            focal = float(self.hwf[2])
        origins = np.broadcast_to(
            np.asarray(self.ray_origins)[..., None, None, :],
            np.asarray(self.ray_directions).shape,
        )
        o, d = ndc_rays(
            h, w, focal, 1.0, np.asarray(origins), np.asarray(self.ray_directions)
        )
        return dataclasses.replace(self, ray_origins=np.asarray(o), ray_directions=np.asarray(d))

    # -- (de)serialization -----------------------------------------------------
    def serialize(self) -> dict:
        return {f: getattr(self, f) for f in self._FIELDS if getattr(self, f) is not None}

    @classmethod
    def deserialize(cls, d: dict) -> "DataBundle":
        return cls(**{f: d.get(f) for f in cls._FIELDS})

    def device_put(self, sharding=None) -> "DataBundle":
        """Move every array onto device (optionally with a sharding)."""
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding) if x is not None else None, self
        )
