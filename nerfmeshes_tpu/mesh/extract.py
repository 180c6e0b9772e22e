"""Mesh extraction: dense sigma-grid evaluation -> iso-surface -> appearance.

TPU rework of the reference's mesh_nerf pipeline (src/mesh_nerf.py:27-201):
the res^3 radiance grid is evaluated on device in fixed-size jitted tiles
(no per-1024-point host loop), iso-surface extraction runs in the native
C++ library, and the inverse-normal appearance pass reuses the jitted
chunk renderer.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from pathlib import Path
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerfmeshes_tpu.mesh.native import marching_cubes

# Wall-time of the last _grid_eval, split into device compute vs the
# device->host transfer (through a TPU tunnel the transfer dominates and
# varies wildly; on a direct-attached host it is negligible).
LAST_TIMINGS: dict = {}


@dataclass
class MeshArgs:
    """Knobs of the reference CLI (src/mesh_nerf.py:204-266)."""

    iso_level: float = 32.0
    limit: float = 1.2
    res: int = 128
    super_sampling: int = 0
    batch_size: int = 1024
    no_view_dependence: bool = False
    view_disparity: float = 1e-2
    view_disparity_max_bound: float = 4.0
    use_cached_mesh: bool = False
    override_cache_mesh: bool = False
    cache_name: str = "mesh_cache.npz"
    save_dir: str = "."
    mesh_name: str = "mesh.obj"
    # Apply the reference's adaptive clamp iso -> [min+std, max-std]
    # (src/mesh_nerf.py:56-65). False uses the requested iso verbatim —
    # needed to test iso values below the adaptive floor (the clamp
    # drifts UP as the density field sharpens with training, eroding
    # thin geometry; see scripts/iso_sweep.py).
    clamp_iso: bool = True
    # Restrict extraction to the acceleration structure's support when
    # the system exposes one (BuFFSystem.mesh_mask_aabbs): a BuFF field
    # is only supervised where tree chords sample it, so density outside
    # the active voxels is unconstrained and sheds floaters (measured:
    # chamfer 0.061 -> see BASELINE.md). No effect on NeRFSystem runs.
    tree_mask: bool = True


def _mesh_size(mesh) -> int:
    from nerfmeshes_tpu.train.step import mesh_size

    return mesh_size(mesh)


def _grid_eval(
    sample_points_fn, limit: float, nums, *, channels: int, tile: int,
    density_fn=None, mesh=None,
) -> np.ndarray:
    """Evaluate the field over the dense grid entirely on device.

    Grid coordinates are synthesized from flat indices inside ONE jitted
    lax.map over tiles, and a single host transfer returns the result —
    the reference's per-1024-point host loop (src/mesh_nerf.py:43) becomes
    1688 tunnel round-trips at 480^3 and took minutes; this takes seconds.

    With a device `mesh`, each tile's point axis is sharded across it
    (device d evaluates points [d*tile/n, (d+1)*tile/n) of every tile;
    the gathered (n_tiles, tile) result is in exact flat-index order).
    """
    nx, ny, nz = nums
    n = nx * ny * nz
    n_dev = _mesh_size(mesh)
    tile = -(-tile // n_dev) * n_dev
    n_tiles = -(-n // tile)
    local = tile // n_dev
    sx = 2.0 * limit / max(nx - 1, 1)
    sy = 2.0 * limit / max(ny - 1, 1)
    sz = 2.0 * limit / max(nz - 1, 1)

    from nerfmeshes_tpu.parallel.mesh import DATA_AXIS

    def eval_tiles():
        shard = jax.lax.axis_index(DATA_AXIS) if n_dev > 1 else jnp.int32(0)

        def tile_fn(i):
            idx = i * tile + shard * local + jnp.arange(local)
            x = idx // (ny * nz)
            rem = idx % (ny * nz)
            y = rem // nz
            z = rem % nz
            pts = jnp.stack(
                [
                    -limit + x.astype(jnp.float32) * sx,
                    -limit + y.astype(jnp.float32) * sy,
                    -limit + z.astype(jnp.float32) * sz,
                ],
                axis=-1,
            )
            if channels == 1 and density_fn is not None:
                # Sigma-only fused path: no color heads, no channel-minor
                # layouts (see NeRFSystem.density_points).
                return density_fn(pts)
            out = sample_points_fn(pts, pts)
            return out[..., 3] if channels == 1 else out

        # f16 on the wire: the device->host link is the bottleneck at
        # 480^3 (442MB f32); half precision is ample for iso-surfacing.
        return jax.lax.map(tile_fn, jnp.arange(n_tiles)).astype(jnp.float16)

    from jax.sharding import PartitionSpec as P

    from nerfmeshes_tpu.parallel.mesh import maybe_shard

    eval_tiles = maybe_shard(eval_tiles, mesh, (), P(None, DATA_AXIS))
    eval_all = jax.jit(eval_tiles)

    import time

    t0 = time.time()
    dev = eval_all()
    # Completion barrier via a 1-element VALUE readback: through the TPU
    # tunnel, block_until_ready returns before the remote program
    # finishes, which would misattribute the whole eval to the transfer
    # phase (the r3 "133s transfer" lesson, see _sparse_density_extract).
    _ = np.asarray(jax.device_get(dev[:1, :1]))
    LAST_TIMINGS["grid_eval_device_s"] = time.time() - t0
    t0 = time.time()
    out = np.asarray(dev)
    LAST_TIMINGS["grid_transfer_s"] = time.time() - t0
    out = out.reshape(n_tiles * tile, -1)[:n]
    shape = (*nums, channels) if channels > 1 else tuple(nums)
    return out.reshape(shape).astype(np.float32)


def extract_density(
    sample_points_fn, limit: float, nums, *, tile: int = 262144,
    density_fn=None, mesh=None,
) -> np.ndarray:
    """Density-only grid (nx, ny, nz) — what geometry extraction needs;
    transfers 4x less than the full radiance grid. `density_fn`
    ((N,3) pts -> (N,) sigma), when given, replaces the full field query
    with the sigma-only kernel path."""
    if isinstance(nums, int):
        nums = (nums,) * 3
    return _grid_eval(
        sample_points_fn, limit, tuple(nums), channels=1, tile=tile,
        density_fn=density_fn, mesh=mesh,
    )


def extract_radiance(
    sample_points_fn,
    limit: float,
    nums,
    *,
    tile: int = 65536,
    mesh=None,
) -> np.ndarray:
    """Full radiance grid -> (nx, ny, nz, 4) (API parity with the
    reference's extract_radiance, src/mesh_nerf.py:27-53; geometry paths
    use extract_density instead)."""
    if isinstance(nums, int):
        nums = (nums,) * 3
    assert len(nums) == 3
    return _grid_eval(
        sample_points_fn, limit, tuple(nums), channels=4, tile=tile, mesh=mesh
    )


@dataclass
class SparseDensityGrid:
    """Block-sparse density grid (the sparse-transfer mesh path's density
    return): exact values in the fetched surface-adjacent blocks,
    per-block one-sided fill elsewhere. `to_dense()` materializes the
    full res^3 f32 array (expensive on slow hosts — ~res^3*4 bytes)."""

    res: int
    block_fill: np.ndarray  # (B, B, B) f32 per-block fill values
    block_ids: np.ndarray  # (K,) int32 flat ids of fetched blocks
    block_values: np.ndarray  # (K, 512) f32 fetched 8^3 blocks

    @property
    def shape(self):
        return (self.res, self.res, self.res)

    def to_dense(self) -> np.ndarray:
        from nerfmeshes_tpu.mesh.native import fill_blocks_native

        dense = fill_blocks_native(
            self.res, self.block_fill, self.block_ids, self.block_values
        )
        if dense is None:
            B = self.res // 8
            dense = np.empty(self.shape, np.float32)
            v = dense.reshape(B, 8, B, 8, B, 8)
            v[:] = self.block_fill.astype(np.float32).reshape(B, 1, B, 1, B, 1)
            bx, by, bz = np.unravel_index(self.block_ids, (B, B, B))
            v[bx, :, by, :, bz, :] = self.block_values.reshape(-1, 8, 8, 8).astype(
                np.float32
            )
        return dense


def _support_masks(
    mask_aabbs: np.ndarray, limit: float, res: int, cells_per_block: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(support, holes): two (B, B, B) bool masks from the support AABBs.

    `support` — blocks overlapping ANY support AABB: the region training
    chords actually sampled; extraction marches real density only here.
    `holes` — regions fully ENCLOSED by support (scipy hole filling).
    BuFF trees prune object interiors (transmittance past the surface is
    ~0, so interior chords carry no weight), so a solid object's inside
    lands here. Callers treat holes as SOLID fill: masking them to empty
    would march a spurious block-face skin one cell behind the real
    surface at every support/interior face, and marching their real
    density would surface whatever garbage the unsupervised field
    happens to hold inside. Solid fill caps the mesh at the real surface
    and is safe — an enclosed cavity cannot shed an outside-connected
    floater. Everything else (outside-connected non-support) reads as
    EMPTY fill, capping the supervised region at its silhouette.

    AABBs that do not overlap the grid at all are skipped: clipping them
    onto boundary blocks would punch permanent support-holes along every
    grid face they project onto.

    No dilation of `support`: every block a support-interior crossing
    cell touches already overlaps the AABB itself (rasterization rounds
    outward by one cell), and a dilation ring would re-admit real
    out-of-support density next to the boundary — whose silhouette then
    marches as a spurious skin against the empty fill one block further
    out.

    Rasterized per-AABB with slice assignment (V tiny cuboid writes)
    instead of a (B^3, V, 3) broadcast — this host's numpy is slow and the
    broadcast would build multi-GB intermediates at 480^3/V=4096."""
    B = res // cells_per_block
    scale = 2.0 * limit / max(res - 1, 1)
    support = np.zeros((B, B, B), bool)
    lo = np.asarray(mask_aabbs[:, 0], np.float64)
    hi = np.asarray(mask_aabbs[:, 1], np.float64)
    overlaps = (hi >= -limit).all(axis=1) & (lo <= limit).all(axis=1)
    lo, hi = lo[overlaps], hi[overlaps]
    # Grid index range each AABB covers (cell i sits at -limit + i*scale),
    # then the block range containing those cells.
    i_lo = np.clip(np.floor((lo + limit) / scale), 0, res - 1).astype(np.int64)
    i_hi = np.clip(np.ceil((hi + limit) / scale), 0, res - 1).astype(np.int64)
    k_lo = i_lo // cells_per_block
    k_hi = i_hi // cells_per_block
    for (x0, y0, z0), (x1, y1, z1) in zip(k_lo, k_hi):
        support[x0 : x1 + 1, y0 : y1 + 1, z0 : z1 + 1] = True
    holes = np.zeros_like(support)
    if support.any() and not support.all():
        from scipy import ndimage  # ships with jax

        holes = ndimage.binary_fill_holes(support) & ~support
    return support, holes


def _sparse_density_extract(
    density_fn, limit: float, res: int, iso_level: float, *, tile: int = 262144,
    density_params=None, mesh=None, clamp_iso: bool = True, mask_aabbs=None,
) -> Tuple[SparseDensityGrid, float]:
    """Density grid via sparse block transfer -> (SparseDensityGrid, iso).

    The dense res^3 grid never crosses to the host: the device computes
    per-8^3-block min/max (reshape-reduce) dilated over the 3^3 block
    neighborhood, and the host fetches ONLY blocks whose dilated range
    straddles the (adaptively clamped) iso level. Every cell lies inside
    the dilated window of each block it touches, so (a) every
    iso-crossing cell lands entirely in fetched blocks — the extracted
    surface is EXACT — and (b) unfetched blocks are one-sided, so a
    per-block min fill introduces no spurious crossings. At 480^3 this
    replaces a 221MB grid transfer (the wall-clock bottleneck through a
    TPU tunnel) with ~2-40MB depending on surface area.
    """
    import time

    assert res % 8 == 0
    import jax.numpy as jnp
    from jax import lax

    B = res // 8
    n = res**3
    n_dev = _mesh_size(mesh)
    tile = -(-tile // n_dev) * n_dev
    n_tiles = -(-n // tile)
    local = tile // n_dev
    scale = 2.0 * limit / max(res - 1, 1)

    # With density_params, density_fn is fn(params, pts) and the params
    # ride as a jit ARGUMENT — the compiled program is reused across
    # checkpoints (a pts-only closure bakes the weights in as constants,
    # recompiling per checkpoint).
    if density_params is None:
        density_call = lambda _p, pts: density_fn(pts)  # noqa: E731
    else:
        density_call = density_fn

    from nerfmeshes_tpu.parallel.mesh import DATA_AXIS

    def flat_eval(params):
        """Per-device grid evaluation: device d computes points
        [d*local, (d+1)*local) of every tile; the gathered (n_tiles,
        tile) array is in exact flat-index order. Block stats/dilation
        afterwards run on the gathered grid (tiny vs the eval cost)."""
        shard = jax.lax.axis_index(DATA_AXIS) if n_dev > 1 else jnp.int32(0)

        def tile_fn(i):
            idx = i * tile + shard * local + jnp.arange(local)
            x = idx // (res * res)
            rem = idx % (res * res)
            pts = jnp.stack(
                [
                    -limit + x.astype(jnp.float32) * scale,
                    -limit + (rem // res).astype(jnp.float32) * scale,
                    -limit + (rem % res).astype(jnp.float32) * scale,
                ],
                axis=-1,
            )
            return density_call(params, pts)

        return lax.map(tile_fn, jnp.arange(n_tiles))

    from jax.sharding import PartitionSpec as P

    from nerfmeshes_tpu.parallel.mesh import maybe_shard

    flat_eval = maybe_shard(flat_eval, mesh, (P(),), P(None, DATA_AXIS))

    @jax.jit
    def stage1(params, keep_blocks):
        flat = flat_eval(params).reshape(-1)[:n]
        sigma = flat.reshape(res, res, res).astype(jnp.float16)
        # Adaptive iso stats (extract_iso_level) on device: scalars only,
        # over the SUPPORT-kept cells (keep_blocks is all-True without a
        # mask): density in regions the mask will discard must not drive
        # the clamp — a huge unsupervised floater would inflate std and
        # erode thin real geometry via min+std.
        keepc = jnp.broadcast_to(
            keep_blocks[:, None, :, None, :, None], (B, 8, B, 8, B, 8)
        ).reshape(-1)
        s32 = flat
        big = jnp.float32(np.finfo(np.float32).max)
        cnt = jnp.maximum(jnp.sum(keepc.astype(jnp.float32)), 1.0)
        mean = jnp.sum(jnp.where(keepc, s32, 0.0)) / cnt
        var = jnp.maximum(
            jnp.sum(jnp.where(keepc, s32 * s32, 0.0)) / cnt - mean * mean, 0.0
        )
        # Per-block stats by separable reshape-reduce (layout-friendly:
        # no strided windows), then a 3^3-neighborhood dilation on the
        # tiny (B,B,B) array. The dilated range is a superset of the
        # 1-voxel-halo range, so the fetch set stays a superset of every
        # block a crossing cell touches (correctness unchanged, slightly
        # more blocks fetched).
        def blockify(x, reduce_fn):
            x = reduce_fn(x.reshape(B, 8, res, res), axis=1)
            x = reduce_fn(x.reshape(B, B, 8, res), axis=2)
            x = reduce_fn(x.reshape(B, B, B, 8), axis=3)
            return x

        def dilate(x, pair_fn, pad_val):
            for axis in range(3):
                p = jnp.full_like(jnp.take(x, jnp.array([0]), axis=axis), pad_val)
                lo = jnp.concatenate([p, jnp.take(x, jnp.arange(B - 1), axis=axis)], axis=axis)
                hi = jnp.concatenate([jnp.take(x, jnp.arange(1, B), axis=axis), p], axis=axis)
                x = pair_fn(pair_fn(lo, hi), x)
            return x

        bmin_own = blockify(sigma, jnp.min)
        bmin = dilate(bmin_own, jnp.minimum, jnp.float16(np.inf))
        bmax = dilate(blockify(sigma, jnp.max), jnp.maximum, jnp.float16(-np.inf))
        # One stacked host transfer: scalars + the three block-stat grids
        # (separate fetches each pay the ~100ms tunnel round-trip).
        stats = jnp.stack(
            [
                jnp.min(jnp.where(keepc, s32, big)),
                jnp.max(jnp.where(keepc, s32, -big)),
                jnp.sqrt(var),
            ]
        ).astype(jnp.float32)
        blocks3 = jnp.stack(
            [bmin_own.astype(jnp.float32), bmin.astype(jnp.float32),
             bmax.astype(jnp.float32)]
        )
        return sigma, stats, blocks3

    keep = holes = None
    if mask_aabbs is not None and len(mask_aabbs):
        keep, holes = _support_masks(mask_aabbs, limit, res, 8)
        if not keep.any():
            print(
                "mesh: support mask does not overlap the grid — extraction "
                "will be empty (check --limit vs the tree's extent).",
                flush=True,
            )
    keep_arg = jnp.asarray(np.ones((B, B, B), bool) if keep is None else keep)

    t0 = time.time()
    sigma_dev, stats_dev, blocks3_dev = stage1(density_params, keep_arg)
    # Through the TPU tunnel, block_until_ready returns before the remote
    # program has actually finished (r3: 8.9s "ready" vs a 260.9s first
    # value fetch); a VALUE readback is the only honest completion
    # barrier, so grid_eval is timed through the tiny stats fetch.
    mn, mx, std = (float(v) for v in np.asarray(stats_dev))
    LAST_TIMINGS["grid_eval_device_s"] = time.time() - t0

    t0 = time.time()
    t_stats = t0
    if clamp_iso:
        iso = float(min(max(iso_level, mn + std), mx - std))
    else:
        iso = float(iso_level)
    # Diagnostics for the adaptive clamp (mesh quality is sensitive to the
    # effective iso drifting up as the density field sharpens with
    # training — std grows, so min+std can exceed the requested level).
    # With a support mask these stats cover the KEPT cells only.
    LAST_TIMINGS.update(
        iso_requested=float(iso_level), iso_effective=iso,
        density_min=mn, density_max=mx, density_std=std,
    )
    if iso > float(iso_level) + 1e-6:
        print(
            f"mesh: adaptive clamp raised iso {iso_level:g} -> {iso:.3f} "
            f"(density min {mn:.2f} max {mx:.2f} std {std:.2f}); thin "
            "geometry may erode — consider an explicit --iso-level.",
            flush=True,
        )
    blocks3 = np.asarray(blocks3_dev)
    t_blocks3 = time.time()
    bmin_own, bminh, bmaxh = blocks3[0], blocks3[1], blocks3[2]
    fetch = (bminh <= iso) & (bmaxh >= iso)  # (B, B, B) halo straddle
    if keep is not None:
        LAST_TIMINGS["tree_masked_blocks"] = int((fetch & ~keep).sum())
        fetch &= keep
        # Out-of-support blocks are never fetched; their fill decides what
        # marching sees across support boundaries. Enclosed holes (object
        # interiors, pruned from the tree) read SOLID: empty fill would
        # march a block-face skin behind the real surface, and fetching
        # their real (unsupervised) density would surface interior
        # garbage. Outside-connected non-support reads EMPTY, capping the
        # supervised region at its silhouette (see _support_masks).
        empty_fill = min(mn, iso) - 1.0
        solid_fill = max(mx, iso) + 1.0
        bmin_own = np.where(
            keep, bmin_own, np.where(holes, solid_fill, empty_fill)
        )
    idx = np.flatnonzero(fetch)
    pad_to = max(4096, -(-idx.size // 4096) * 4096)
    idx_p = np.zeros(pad_to, np.int32)
    idx_p[: idx.size] = idx

    @jax.jit
    def stage2(sigma, blocks):
        sb = (
            sigma.reshape(B, 8, B, 8, B, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(B * B * B, 512)
        )
        return jnp.take(sb, blocks, axis=0)

    out_dev = stage2(sigma_dev, jnp.asarray(idx_p))
    _ = np.asarray(out_dev[:1, :1])  # value barrier (block_until_ready lies)
    t_gather = time.time()
    packed = np.asarray(out_dev)[: idx.size]
    t_packed = time.time()
    LAST_TIMINGS["grid_transfer_s"] = t_packed - t0
    # Phase split of the transfer (the r3 "133s transfer" was the tunnel's
    # deferred stage1 completion landing in the first fetch, now counted
    # in grid_eval_device_s; actual bandwidth here is healthy).
    LAST_TIMINGS["transfer_blocks3_fetch_s"] = t_blocks3 - t_stats
    LAST_TIMINGS["transfer_gather_compile_run_s"] = t_gather - t_blocks3
    LAST_TIMINGS["transfer_packed_fetch_s"] = t_packed - t_gather
    LAST_TIMINGS["transfer_packed_mb"] = packed.nbytes / 1e6
    LAST_TIMINGS["sparse_blocks_fetched"] = int(idx.size)
    LAST_TIMINGS["sparse_blocks_total"] = int(B**3)

    grid = SparseDensityGrid(
        res=res,
        block_fill=bmin_own.astype(np.float32),
        block_ids=idx.astype(np.int32),
        block_values=packed.astype(np.float32),
    )
    return grid, iso


def extract_iso_level(density: np.ndarray, iso_level: float) -> float:
    """Adaptive clamp of the iso level into [min+std, max-std]
    (reference: src/mesh_nerf.py:56-65)."""
    min_a, max_a, std_a = density.min(), density.max(), density.std()
    iso = float(min(max(iso_level, min_a + std_a), max_a - std_a))
    LAST_TIMINGS.update(
        iso_requested=float(iso_level), iso_effective=iso,
        density_min=float(min_a), density_max=float(max_a),
        density_std=float(std_a),
    )
    return iso


def _mask_dense_density(
    density: np.ndarray, args: MeshArgs, mask_aabbs
) -> Tuple[np.ndarray, float]:
    """Dense-path equivalent of the sparse support mask, at 1-cell
    granularity (the dense path only runs at small res): clamp stats are
    taken over the SUPPORT cells only, enclosed holes (object interiors)
    are set solid, everything else empty — same semantics as the sparse
    path (see _support_masks). Returns (masked density, iso)."""
    keep = holes = None
    if mask_aabbs is not None and len(mask_aabbs):
        keep, holes = _support_masks(mask_aabbs, args.limit, args.res, 1)
        if not keep.any():
            print(
                "mesh: support mask does not overlap the grid — extraction "
                "will be empty (check --limit vs the tree's extent).",
                flush=True,
            )
    stats_src = density[keep] if (keep is not None and keep.any()) else density
    if getattr(args, "clamp_iso", True):
        iso_value = extract_iso_level(stats_src, args.iso_level)
    else:
        iso_value = float(args.iso_level)
        LAST_TIMINGS.update(
            iso_requested=iso_value, iso_effective=iso_value,
            density_min=float(stats_src.min()),
            density_max=float(stats_src.max()),
            density_std=float(stats_src.std()),
        )
    if keep is not None:
        LAST_TIMINGS["tree_masked_blocks"] = int(
            ((density > iso_value) & ~keep).sum()
        )
        empty_fill = min(float(stats_src.min()), iso_value) - 1.0
        solid_fill = max(float(stats_src.max()), iso_value) + 1.0
        density = np.where(
            keep, density, np.where(holes, solid_fill, empty_fill)
        )
    return density, iso_value


def extract_geometry(
    sample_points_fn, args: MeshArgs, *, density_fn=None, density_params=None,
    mesh=None, mask_aabbs=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(vertices in world coords, triangles, normals, density grid)
    (reference: src/mesh_nerf.py:68-92).

    With a `density_fn` and res % 8 == 0, the grid transfers sparsely
    (_sparse_density_extract) and the 4th return is a
    `SparseDensityGrid` — NOT an ndarray. It marches identically
    (marching_cubes accepts it) and `.to_dense()` materializes the full
    array (exact in surface-adjacent blocks, block-min elsewhere);
    callers needing ndarray semantics on the density must convert."""
    import time

    if not getattr(args, "tree_mask", True):
        mask_aabbs = None
    if density_fn is not None and args.res % 8 == 0 and args.res >= 32:
        density, iso_value = _sparse_density_extract(
            density_fn, args.limit, args.res, args.iso_level,
            density_params=density_params, mesh=mesh,
            clamp_iso=getattr(args, "clamp_iso", True),
            mask_aabbs=mask_aabbs,
        )
    else:
        if density_fn is not None and density_params is not None:
            fn, p = density_fn, density_params
            density_fn = lambda pts: fn(p, pts)  # noqa: E731
        density = extract_density(
            sample_points_fn, args.limit, args.res, density_fn=density_fn,
            mesh=mesh,
        )
        density, iso_value = _mask_dense_density(density, args, mask_aabbs)
    t0 = time.time()
    vertices, triangles, normals = marching_cubes(density, iso_value)
    LAST_TIMINGS["marching_cubes_s"] = time.time() - t0
    # Grid-index -> world coords in (-limit, limit).
    vertices = args.limit * (vertices / (args.res / 2.0) - 1.0)
    return vertices.astype(np.float32), triangles, normals, density


def extract_geometry_with_super_sampling(
    sample_points_fn, args: MeshArgs, *, density_fn=None, density_params=None,
    mesh=None, mask_aabbs=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Axis-wise super-sampled extraction.

    The reference stubs this path behind a missing third-party module
    (src/mesh_nerf.py:95-128 raises NotImplementedError); here it works:
    the grid is evaluated at higher resolution along each axis in turn and
    the three density grids are averaged after downsampling back, cheaply
    anti-aliasing the field before extraction. The support mask applies
    at the base resolution, same semantics as extract_geometry.
    """
    s = args.super_sampling
    assert s >= 1
    if not getattr(args, "tree_mask", True):
        mask_aabbs = None
    if density_fn is not None and density_params is not None:
        fn, p = density_fn, density_params
        density_fn = lambda pts: fn(p, pts)  # noqa: E731
    base = args.res
    dense = base + (base - 1) * s
    acc = np.zeros((base, base, base), np.float32)
    for axis in range(3):
        nums = [base, base, base]
        nums[axis] = dense
        density = extract_density(
            sample_points_fn, args.limit, tuple(nums), density_fn=density_fn,
            mesh=mesh,
        )
        # Average the super-sampled axis back to base resolution: sample i
        # covers fine indices [i*(s+1) - s/2, ...]; use strided mean.
        fine = np.moveaxis(density, axis, 0)
        groups = fine[: (base - 1) * (s + 1) + 1]
        idx = np.arange(base) * (s + 1)
        out = groups[idx]
        for off in range(1, s + 1):
            lo = np.clip(idx - off, 0, dense - 1)
            hi = np.clip(idx + off, 0, dense - 1)
            out = out + 0.5 * (groups[lo] + groups[hi])
        out = out / (1 + s)
        acc += np.moveaxis(out, 0, axis)
    density = acc / 3.0
    density, iso_value = _mask_dense_density(density, args, mask_aabbs)
    vertices, triangles, normals = marching_cubes(density, iso_value)
    vertices = args.limit * (vertices / (args.res / 2.0) - 1.0)
    return vertices.astype(np.float32), triangles, normals, density


def export_marching_cubes(
    system,
    args: MeshArgs,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Full pipeline: geometry (with caching) + appearance + mesh export
    (reference: src/mesh_nerf.py:131-201). `system` provides
    sample_points(points, dirs) and query_rays(origins, dirs, near, far).
    A `.ply` mesh_name writes fast binary PLY; anything else writes the
    reference-compatible ASCII OBJ.

    Returns (vertices, triangles, diffuse, normals)."""
    from nerfmeshes_tpu.mesh.export import export_obj, export_ply_binary

    os.makedirs(args.save_dir, exist_ok=True)
    cache_path = Path(args.save_dir) / args.cache_name

    geometry_fn = (
        extract_geometry_with_super_sampling
        if args.super_sampling >= 1
        else extract_geometry
    )

    if args.use_cached_mesh and cache_path.exists() and not args.override_cache_mesh:
        data = np.load(cache_path)
        vertices, triangles, normals = data["vertices"], data["triangles"], data["normals"]
    else:
        # Prefer the params-as-argument form so the compiled grid-eval
        # program is shared across checkpoints. The system's device mesh
        # (if any) shards the grid evaluation across chips.
        if hasattr(system, "density_apply") and hasattr(system, "finest_params"):
            dkw = dict(
                density_fn=system.density_apply,
                density_params=system.finest_params,
            )
        else:
            dkw = dict(density_fn=getattr(system, "density_points", None))
        dkw["mesh"] = getattr(system, "mesh", None)
        # Acceleration-structure support (BuFFSystem.mesh_mask_aabbs):
        # restrict extraction to where the field was actually supervised.
        # Both geometry paths (plain + super-sampling) accept the mask.
        if hasattr(system, "mesh_mask_aabbs"):
            dkw["mask_aabbs"] = system.mesh_mask_aabbs()
        vertices, triangles, normals, density = geometry_fn(
            system.sample_points, args, **dkw
        )
        if args.use_cached_mesh or args.override_cache_mesh:
            np.savez(cache_path, vertices=vertices, triangles=triangles, normals=normals)

    # Appearance: cast along inverse surface normals (src/mesh_nerf.py:161-195).
    import time as _time

    _t0 = _time.time()
    targets, directions = vertices, -normals
    if args.no_view_dependence:
        diffuse = _query_diffuse_direct(system, targets, directions, args.batch_size)
    else:
        origins = targets - args.view_disparity * directions
        # args.batch_size mirrors the reference's GPU-memory knob
        # (--batch-size 1024); as a TPU dispatch size that would be
        # hopelessly call-bound, so treat it as a lower bound — clamped
        # to the actual ray count so small meshes don't render 65k of
        # padding.
        chunk = max(args.batch_size, min(65536, -(-len(targets) // 256) * 256))
        query_rgb = getattr(system, "query_rgb", None)
        if query_rgb is not None:
            # One batched program: single upload/dispatch/fetch. Colors
            # come back device-quantized uint8 (the mesh writers quantize
            # to uint8 anyway) — a 4x smaller fetch through the tunnel.
            # Probe the signature explicitly: a try/except TypeError around
            # the render would swallow unrelated TypeErrors from inside
            # query_rgb and silently re-run the whole expensive pass.
            import inspect

            try:
                has_uint8 = "as_uint8" in inspect.signature(query_rgb).parameters
            except (TypeError, ValueError):
                has_uint8 = False
            if has_uint8:
                diffuse = query_rgb(
                    origins, directions, 0.0, args.view_disparity_max_bound,
                    chunk=chunk, as_uint8=True,
                ).astype(np.float32) / 255.0
            else:
                diffuse = np.asarray(
                    query_rgb(
                        origins, directions, 0.0, args.view_disparity_max_bound,
                        chunk=chunk,
                    )
                )
        else:
            out = system.query_rays(
                origins, directions, 0.0, args.view_disparity_max_bound,
                chunk=chunk, fields=("rgb_map",),
            )
            diffuse = np.asarray(out.rgb_map)

    LAST_TIMINGS["appearance_s"] = _time.time() - _t0

    _t0 = _time.time()
    mesh_path = Path(args.save_dir) / args.mesh_name
    if mesh_path.suffix.lower() == ".ply":
        export_ply_binary(
            vertices, triangles, colors=diffuse, normals=normals,
            filename=str(mesh_path),
        )
    else:
        export_obj(vertices, triangles, diffuse, normals, str(mesh_path))
    LAST_TIMINGS["write_s"] = _time.time() - _t0
    return vertices, triangles, diffuse, normals


def _query_diffuse_direct(system, targets, directions, batch_size: int) -> np.ndarray:
    """Direct field query at the vertices (no_view_dependence path):
    dispatch every chunk, concatenate on device, fetch rgb once — a
    per-chunk fetch at the reference's batch_size=1024 would pay the
    tunnel round-trip ~700x for a 480^3 mesh."""
    import jax.numpy as jnp

    fn = jax.jit(system.sample_points)
    n = targets.shape[0]
    chunk = max(int(batch_size), min(65536, -(-n // 256) * 256))
    pending = []
    for start in range(0, n, chunk):
        p = np.asarray(targets[start : start + chunk], np.float32)
        d = np.asarray(directions[start : start + chunk], np.float32)
        pad = chunk - p.shape[0]
        if pad:
            p = np.concatenate([p, np.zeros((pad, 3), np.float32)])
            d = np.concatenate([d, np.zeros((pad, 3), np.float32)])
        pending.append(fn(jnp.asarray(p), jnp.asarray(d)))
    dev = jnp.concatenate(pending, axis=0)[:n, :3]
    return np.asarray(dev, np.float32)
