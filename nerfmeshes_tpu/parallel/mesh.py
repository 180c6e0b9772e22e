"""Device-mesh + sharding helpers.

Parallelism model (SURVEY.md §2.10): the only large axis in this workload
is rays × samples, so we shard the ray axis over a 1-D `data` mesh and
replicate the (tiny) MLP params. Gradients reduce over ICI via the psum XLA
inserts for the replicated-param jit partition — no hand-written
collectives needed. Multi-host would extend the same mesh over DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Rays sharded along the data axis, trailing dims replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rays(mesh: Optional[Mesh], *arrays):
    """Apply a ray-axis sharding constraint inside jit (no-op without mesh)."""
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return arrays if len(arrays) > 1 else arrays[0]
    spec = P(DATA_AXIS)
    out = tuple(
        jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec)) for a in arrays
    )
    return out if len(out) > 1 else out[0]
