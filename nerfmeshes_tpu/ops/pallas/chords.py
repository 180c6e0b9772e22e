"""Fused ray/AABB slab-test + chord compaction as a Pallas TPU kernel.

The BuFF deterministic sampler first intersects every ray with every
active voxel, then compacts each ray's valid chords (entry t, exit t,
voxel id) into K slots in first-V-index order (buff/tree.py). The XLA
formulation materializes (R, V) slab-test buffers in HBM and performs
the compaction as an (R, V, K) one-hot contraction — measured as the
dominant non-MLP tail of the BuFF train step (DESIGN.md §7.2: the
one-hot workspace is ~0.9 GB of effective traffic per call at
R=2048, V=1728, K=64).

This kernel fuses both stages so nothing (R, V)-sized ever touches HBM:

- Inputs are lane-dense packed arrays (the {1,0}-layout rule from
  fused_mlp.py): rays as ONE (8, R) f32 array with rows
  [ox,oy,oz,dx,dy,dz,near,far] (per-ray COLMAP bounds ride rows 6-7 for
  free), voxels as (V_pad, 8) f32 columns [lox,loy,loz,hix,hiy,hiz,
  active,pad].
- Grid over ray tiles of R_TILE=128 lanes. Per tile, the kernel scans
  V in chunks of VC sublanes: slab test on the VPU, chord rank via a
  log-step inclusive scan along sublanes, then accumulation of each
  chord's (tmin, tmax, id) into rank-indexed rows of a (K, R_TILE)
  VMEM scratch.
- The accumulation is PREDICATED on the chunk's realized rank range:
  ranks in a chunk span [min(rank_base), max(rank_base + count)), so
  rank-row groups outside that window are skipped at runtime
  (`pl.when` on scalar bounds). A ray crosses ~3*outer_count cells of
  the shipped grids (~36), so most of the K x chunks product never
  executes — the work scales with chords present, not with K*V.
- Outputs are (K, R) channels-first (transposed to the sampler's (R, K)
  orientation by XLA outside, where it is a 64x2048 no-op-sized copy),
  plus the per-ray total hit count the auto-doubling cap logic reads.

Slot semantics match buff/tree.py's monolithic one-hot compaction
exactly: first K chords in V-index order, empty slots big for lo/hi and
0 for ids (tests pin kernel == XLA path bit-for-bit under HIGHEST
precision). Chords past rank K are dropped but still counted in n_hit.

Reference semantics: batch_ray_voxel_intersect, src/nerf/tree.py:215-343
(the slab test + per-ray chord collection this redesigns TPU-first).

Falls back to interpret mode off-TPU so parity tests run on the CPU
mesh.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_TILE = 128  # rays per grid step (lane dim of every intermediate)
VC = 1024  # voxel-chunk sublanes scanned per step
K_GROUP = 8  # rank rows per predicated accumulation block

RAY_W = 8  # packed ray rows: ox oy oz dx dy dz near far
BOX_W = 8  # packed voxel cols: lox loy loz hix hiy hiz active pad

_BIG = 2.0 * (1e8 + 1.0)  # matches buff.tree's empty-slot sentinel


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def kernel_enabled() -> bool:
    """Kernel path on by default on TPU; NERFMESHES_CHORDS_KERNEL=0/1
    forces either way (tests force 1 to run the kernel interpreted on
    the CPU mesh)."""
    env = os.environ.get("NERFMESHES_CHORDS_KERNEL")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() == "tpu"


def _cumsum_sublanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum along axis 0 (sublanes) via log-step shifted adds
    — jnp.cumsum's sublane lowering is not a Mosaic fast path."""
    n = x.shape[0]
    s = 1
    while s < n:
        shifted = jnp.concatenate(
            [jnp.zeros((s,) + x.shape[1:], x.dtype), x[:-s]], axis=0
        )
        x = x + shifted
        s *= 2
    return x


def _chords_kernel(K: int, V: int, rays_ref, boxes_ref,
                   lo_ref, hi_ref, ids_ref, nh_ref,
                   acc_lo, acc_hi, acc_ids):
    f32 = jnp.float32
    zero_acc = jnp.zeros((K, R_TILE), f32)
    acc_lo[:] = zero_acc
    acc_hi[:] = zero_acc
    acc_ids[:] = zero_acc

    o = [rays_ref[c : c + 1, :] for c in range(3)]  # (1, R_TILE)
    inv = [1.0 / rays_ref[3 + c : 4 + c, :] for c in range(3)]
    neg = [inv[c] < 0.0 for c in range(3)]
    near = rays_ref[6:7, :]
    far = rays_ref[7:8, :]

    rank_base = jnp.zeros((1, R_TILE), jnp.int32)
    total = jnp.zeros((1, R_TILE), jnp.int32)

    for c in range(V // VC):
        sl = slice(c * VC, (c + 1) * VC)
        lo = [boxes_ref[sl, j : j + 1] for j in range(3)]  # (VC, 1)
        hi = [boxes_ref[sl, 3 + j : 4 + j] for j in range(3)]
        act = boxes_ref[sl, 6:7]

        # Slab test in the XLA path's exact op order (_slab_test) so the
        # f32 results are bit-identical.
        tl = [(lo[j] - o[j]) * inv[j] for j in range(3)]  # (VC, R_TILE)
        th = [(hi[j] - o[j]) * inv[j] for j in range(3)]
        tvmin = [jnp.where(neg[j], th[j], tl[j]) for j in range(3)]
        tvmax = [jnp.where(neg[j], tl[j], th[j]) for j in range(3)]
        mask = (tvmin[0] <= tvmax[1]) & (tvmin[1] <= tvmax[0])
        tmin = jnp.maximum(tvmin[0], tvmin[1])
        tmax = jnp.minimum(tvmax[0], tvmax[1])
        mask &= (tmin <= tvmax[2]) & (tvmin[2] <= tmax)
        tmin = jnp.maximum(tmin, tvmin[2])
        tmax = jnp.minimum(tmax, tvmax[2])
        mask &= (tmin >= near) & (tmax <= far) & (act > 0.5)

        valid = mask.astype(jnp.int32)
        csum = _cumsum_sublanes(valid)  # (VC, R_TILE) inclusive
        grank = rank_base + (csum - valid)  # rank of each valid chord
        cnt = csum[VC - 1 : VC, :]  # (1, R_TILE) hits this chunk

        # Rank rows this chunk can touch — scalars, so whole K_GROUP
        # blocks of the accumulation are skipped when the chunk's chords
        # land elsewhere (or the chunk is empty: kmin_s >= kmax_s).
        kmin_s = jnp.min(rank_base)
        kmax_s = jnp.minimum(jnp.max(rank_base + cnt), K)

        sel_lo = jnp.where(mask, tmin, 0.0)
        sel_hi = jnp.where(mask, tmax, 0.0)
        # Mosaic only lowers integer iota; build int32 then cast (a float
        # iota fails TPU verification: "'tpu.iota' op result #0 must be
        # vector of integer or index values" — the r4 hardware break).
        ids = jax.lax.broadcasted_iota(jnp.int32, (VC, R_TILE), 0).astype(
            f32
        ) + float(c * VC)
        sel_ids = jnp.where(mask, ids, 0.0)

        for g in range(K // K_GROUP):
            g0 = g * K_GROUP

            @pl.when((g0 + K_GROUP > kmin_s) & (g0 < kmax_s))
            def _(g0=g0, grank=grank, mask=mask, sel_lo=sel_lo,
                  sel_hi=sel_hi, sel_ids=sel_ids):
                for k in range(g0, g0 + K_GROUP):
                    at = (grank == k) & mask
                    pick = at.astype(jnp.float32)
                    acc_lo[k : k + 1, :] += jnp.sum(
                        pick * sel_lo, axis=0, keepdims=True
                    )
                    acc_hi[k : k + 1, :] += jnp.sum(
                        pick * sel_hi, axis=0, keepdims=True
                    )
                    acc_ids[k : k + 1, :] += jnp.sum(
                        pick * sel_ids, axis=0, keepdims=True
                    )

        rank_base = rank_base + cnt
        total = total + cnt

    n_valid = jnp.minimum(total, K)  # (1, R_TILE)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (K, R_TILE), 0)
    in_use = k_iota < n_valid
    lo_ref[:] = jnp.where(in_use, acc_lo[:], _BIG)
    hi_ref[:] = jnp.where(in_use, acc_hi[:], _BIG)
    ids_ref[:] = jnp.where(in_use, acc_ids[:], 0.0)
    nh_ref[:] = total


def supported(V: int, K: int) -> bool:
    """Shapes the kernel handles: K in sublane-aligned groups (the
    auto-doubling cap only ever produces powers of two >= 64), bounded
    above — the kernel unrolls K/K_GROUP accumulation blocks per voxel
    chunk and holds 3*K*R_TILE f32 of scratch, so an auto-doubled cap
    past 256 would inflate compile time (tunnel-wedge risk) for a tree
    the slab-scan XLA path handles fine — and a voxel count whose padded
    VMEM residency stays comfortable."""
    return (
        K % K_GROUP == 0
        and K_GROUP <= K <= 256
        and _round_up(V, VC) <= 8 * VC
    )


_HEALTH: dict = {}


def kernel_usable(V: int, K: int) -> bool:
    """`supported()` plus a one-time guarded compile+run probe at this
    (V_pad, K) on the live backend, so a Mosaic regression degrades to
    the XLA path instead of crashing every BuFF run (the r4 ship-break:
    a kernel that never compiled on hardware was the default path with
    no fallback). The probe runs one R_TILE-ray tile — Mosaic verifies
    the kernel body independently of grid size, so a body-level failure
    at the production ray count is caught here. Results are cached per
    (V_pad, K) for the process lifetime."""
    if not supported(V, K):
        return False
    if _interpret():
        return True  # interpret mode cannot fail Mosaic verification
    cache_key = (_round_up(max(V, 1), VC), K)
    ok = _HEALTH.get(cache_key)
    if ok is None:
        try:
            voxels = jnp.zeros((V, 2, 3), jnp.float32)
            active = jnp.zeros((V,), bool)
            o = jnp.zeros((1, 3), jnp.float32)
            d = jnp.ones((1, 3), jnp.float32)
            jax.block_until_ready(
                compact_chords(voxels, active, o, d, 0.1, 1.0, K=K)
            )
            ok = True
        except Exception as e:  # pragma: no cover — backend-dependent
            import warnings

            warnings.warn(
                f"chords Pallas kernel failed its compile probe at V={V} "
                f"K={K} ({type(e).__name__}: {e}); using the XLA path"
            )
            ok = False
        _HEALTH[cache_key] = ok
    return ok


@functools.partial(jax.jit, static_argnames=("K",))
def compact_chords(voxels, active, origins, dirs, near, far, *, K: int):
    """Fused slab test + first-K-by-V-index chord compaction.

    voxels (V, 2, 3) f32, active (V,) bool, origins/dirs (R, 3) f32,
    near/far scalar or (R,). Returns (lo_k, hi_k, ids_k, n_hit):
    (R, K) f32 x3 + (R,) int32 — the exact tensors buff.tree's monolithic
    one-hot compaction produces (empty slots big/big/0; n_hit counts all
    chords including those dropped past K).
    """
    R = dirs.shape[0]
    V = voxels.shape[0]
    origins = jnp.broadcast_to(jnp.reshape(origins, (-1, 3)), (R, 3))

    R_pad = _round_up(max(R, 1), R_TILE)
    V_pad = _round_up(max(V, 1), VC)

    near = jnp.broadcast_to(jnp.asarray(near, jnp.float32), (R,))
    far = jnp.broadcast_to(jnp.asarray(far, jnp.float32), (R,))
    # Padding rays point nowhere: near > far fails every chord's bound
    # check, so padded lanes report zero hits.
    rays = jnp.stack(
        [
            origins[:, 0], origins[:, 1], origins[:, 2],
            dirs[:, 0], dirs[:, 1], dirs[:, 2],
            near, far,
        ]
    ).astype(jnp.float32)
    pad_col = jnp.array([0, 0, 0, 1, 1, 1, 1, 0], jnp.float32)[:, None]
    rays = jnp.concatenate(
        [rays, jnp.broadcast_to(pad_col, (RAY_W, R_pad - R))], axis=1
    )

    # Padding voxels are inactive (column 6 = 0).
    boxes = jnp.concatenate(
        [
            voxels[:, 0, :],
            voxels[:, 1, :],
            active[:, None].astype(jnp.float32),
            jnp.zeros((V, 1), jnp.float32),
        ],
        axis=1,
    ).astype(jnp.float32)
    boxes = jnp.concatenate(
        [boxes, jnp.zeros((V_pad - V, BOX_W), jnp.float32)], axis=0
    )

    grid = (R_pad // R_TILE,)
    lo_t, hi_t, ids_t, nh = pl.pallas_call(
        functools.partial(_chords_kernel, K, V_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_W, R_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, R_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, R_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, R_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, R_pad), jnp.float32),
            jax.ShapeDtypeStruct((K, R_pad), jnp.float32),
            jax.ShapeDtypeStruct((K, R_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, R_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, R_TILE), jnp.float32),
            pltpu.VMEM((K, R_TILE), jnp.float32),
            pltpu.VMEM((K, R_TILE), jnp.float32),
        ],
        interpret=_interpret(),
    )(rays, boxes)

    lo_k = lo_t.T[:R]
    hi_k = hi_t.T[:R]
    ids_k = ids_t.T[:R]
    n_hit = nh[0, :R]
    return lo_k, hi_k, ids_k, n_hit
