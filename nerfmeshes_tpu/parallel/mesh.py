"""Device-mesh helpers.

Parallelism model (SURVEY.md §2.10): the only large axis in this workload
is rays x samples, so training shards the ray axis over a 1-D `data` mesh
with replicated (tiny) MLP params. The mechanism is `shard_map` in
train/step.py / buff/system.py: each device runs the full per-device step
body on its own ray slice and gradients/metrics reduce via EXPLICIT
`jax.lax.pmean` (BuFF additionally psums the voxel accumulators) —
shard_map(check_vma=False) inserts nothing automatically, so any new
cross-device state in the step body needs its own collective. Multi-host
would extend the same mesh over DCN.
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


def replicated(mesh: Mesh) -> NamedSharding:
    """Replicated placement (params/data before entering shard_map)."""
    return NamedSharding(mesh, P())


def maybe_shard(fn, mesh: Optional[Mesh], in_specs, out_specs, *, force: bool = False):
    """shard_map `fn` over the mesh, or return it unchanged on a single
    device (mesh None / size 1).

    One home for the repeated wrap boilerplate (train step, render chunk,
    rgb loop, BuFF variants, mesh grid eval). check_vma=False everywhere:
    the step/render bodies perform their own EXPLICIT collectives (pmean
    grads/metrics, psum voxel accumulators) — see the module docstring.

    `force=True` wraps even a size-1 mesh: identical math, but the program
    goes through shard_map + the (no-op) collectives. bench.py uses this
    for the sharded-vs-unsharded A/B on the single real TPU chip, pinning
    a no-regression contract for the code path a real slice would run."""
    if mesh is None or (mesh.size <= 1 and not force):
        return fn
    from jax import shard_map

    return shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )


def default_mesh(max_devices: Optional[int] = None) -> Optional[Mesh]:
    """Mesh over all visible devices, or None on a single device — what
    the CLIs use so eval/mesh extraction engage every chip by default."""
    devices = jax.devices()
    if max_devices:
        devices = devices[: int(max_devices)]
    if len(devices) <= 1:
        return None
    return create_mesh(devices)
