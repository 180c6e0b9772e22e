"""BuFF unstructured radiance volumes: adaptive AABB voxel tree sampling.

TPU redesign of the reference's TreeSampling (src/nerf/tree.py:39-358):

- The voxel set lives in FIXED-CAPACITY padded arrays (`max_voxel_count`
  rows; inactive rows carry far-away degenerate boxes) so every device op
  has static shapes and stays inside one jitted train step.
- `ray_voxel_intersect` is a vectorized R x V slab test + the reference's
  deterministic chord-length-proportional sampler, rebuilt TPU-first:
  valid chords compact into K slots via one-hot MXU contractions (a ray
  crosses ~3*outer_count cells, far fewer than V), get depth-sorted at
  size K, and the inverse length mapping uses K-sized comparison
  contractions — no V-sized sort/scatter/gather anywhere. Multinomial
  random sampling is also supported.
- `integrate` folds rendered weights back into the per-voxel running mean
  (`memm`) with one-hot reductions; memm/counter are functional state.
- Consolidation (prune + best-first subdivide, every `step_size_tree`
  steps) runs on host over a flat leaf list and re-uploads fresh padded
  arrays — the only host round-trip, at 1/6000 step frequency.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerfmeshes_tpu.ops.pallas import chords as _chords

# Inactive-row sentinel: a degenerate box far outside any scene so the slab
# test can never pass the near/far cap.
_PAD_LO = 1e8
_PAD_HI = 1e8 + 1.0

# Auto chord-slot cap: compaction cost is linear in K ((R, V, K) one-hot —
# the dominant tree-op buffer), and a ray crosses ~3*outer_count cells of
# the shipped grids (~36 measured). 64 buys ~8% train throughput over the
# old max(128, samples) default (probe_chord_cap.py: 156.8k vs 145.1k
# rays/s) and the dropped-chord counter + immediate auto-doubling in
# BuFFSystem keep deeper trees exact.
AUTO_CHORD_CAP = 64

# Voxel-slab bound on compaction/integration workspace: the monolithic
# (R, V, K) chord one-hot and the (R*S, V) integration one-hot scale
# linearly in V and wedge the compiler near V=8192 (~13GB of fusion
# workspace — BASELINE.md's documented wall). Above this V the device ops
# scan over V-slabs of this size, bounding every intermediate at
# R x _SLAB_V x K / (R*S) x _SLAB_V while computing the identical result
# (tests pin slab == monolithic exactly). Env-overridable so perf probes
# can A/B the slab scan against the monolithic fusion at a given V
# (scripts/probe_slab_perf.py).
import os as _os

_SLAB_V = int(_os.environ.get("NERFMESHES_SLAB_V", "2048"))


@dataclass
class Leaf:
    """One leaf cell of the subdivision tree (host side)."""

    lo: np.ndarray  # (3,)
    hi: np.ndarray  # (3,)
    depth: int


class TreeState(NamedTuple):
    """Device-side functional state threaded through the train step."""

    voxels: jnp.ndarray  # (MAX_V, 2, 3) AABB bounds
    active: jnp.ndarray  # (MAX_V,) bool
    memm: jnp.ndarray  # (MAX_V,) running mean weight
    counter: jnp.ndarray  # () int32 integration count


class TreeSampling:
    """Host-side controller owning the leaf list + consolidation schedule."""

    def __init__(self, cfg):
        self.cfg = cfg
        tree_cfg = cfg.tree
        self.max_voxels = int(tree_cfg.max_voxel_count)
        self.eps = float(tree_cfg.eps)
        self.max_depth = int(tree_cfg.max_depth)
        self.outer_count = int(tree_cfg.subdivision_outer_count)
        self.inner_count = int(tree_cfg.subdivision_inner_count)
        self.use_random_sampling = bool(tree_cfg.use_random_sampling)
        self.step_size_tree = int(tree_cfg.step_size_tree)
        self.integration_offset = int(tree_cfg.step_size_integration_offset)

        # The reference's cap bounds *subdivision*, not the initial grid:
        # outer_count^3 (12^3 = 1728) may exceed max_voxel_count (1536)
        # until the first consolidation prunes (reference: tree.py:153-167
        # applies the cap only when choosing what to subdivide).
        self.capacity = max(self.max_voxels, self.outer_count**3)

        near, far = float(cfg.dataset.near), float(cfg.dataset.far)
        mean = (near + far) / 2.0
        lo = np.full(3, near - mean, np.float32)
        hi = np.full(3, far - mean, np.float32)

        # Root subdivision: outer_count^3 cells at depth 1
        # (reference: Node.__init__/subdivide, tree.py:4-33, 81-92).
        self.leaves: List[Leaf] = _subdivide(Leaf(lo, hi, 0), self.outer_count)
        self._last_memm: Optional[np.ndarray] = None

    # -- padded device state --------------------------------------------------
    def device_state(self) -> TreeState:
        V = len(self.leaves)
        assert V <= self.capacity, f"{V} leaves exceed capacity {self.capacity}"
        voxels = np.stack(
            [np.stack([l.lo, l.hi]) for l in self.leaves]
        ).astype(np.float32)
        pad = self.capacity - V
        if pad:
            pad_box = np.stack(
                [np.full((3,), _PAD_LO, np.float32), np.full((3,), _PAD_HI, np.float32)]
            )
            voxels = np.concatenate([voxels, np.tile(pad_box, (pad, 1, 1))])
        active = np.zeros(self.capacity, bool)
        active[:V] = True
        return TreeState(
            voxels=jnp.asarray(voxels),
            active=jnp.asarray(active),
            memm=jnp.zeros(self.capacity, jnp.float32),
            counter=jnp.ones((), jnp.int32),
        )

    # -- consolidation (host) -----------------------------------------------------
    def consolidate(self, memm: np.ndarray) -> TreeState:
        """Prune weak voxels, subdivide strong ones best-first under the
        capacity cap, reset integration state (reference: tree.py:127-175)."""
        memm = np.asarray(memm)[: len(self.leaves)]
        keep = memm > self.eps
        kept = [self.leaves[i] for i in np.nonzero(keep)[0]]
        inv_w = (1.0 - memm[keep]).tolist()

        # Shallow + heavy first.
        order = sorted(range(len(kept)), key=lambda i: (kept[i].depth, inv_w[i]))
        kept = [kept[i] for i in order]

        inner_size = self.inner_count**3 - 1
        current = len(kept)
        children: List[Leaf] = []
        for index, leaf in enumerate(kept):
            projected = len(children) + inner_size + current - index
            if projected < self.max_voxels and leaf.depth < self.max_depth:
                children.extend(_subdivide(leaf, self.inner_count))
            else:
                children.append(leaf)

        if not children:
            raise RuntimeError(
                f"Tree pruning removed every voxel (eps={self.eps} too high)"
            )
        self.leaves = children
        return self.device_state()

    # -- checkpoint (reference: tree.py:345-358) -----------------------------------
    def serialize(self, state: TreeState) -> dict:
        """Leaf arrays padded to capacity so the checkpoint tree has stable
        shapes across consolidations (orbax restores by template)."""
        V = len(self.leaves)
        lo = np.full((self.capacity, 3), _PAD_LO, np.float32)
        hi = np.full((self.capacity, 3), _PAD_HI, np.float32)
        depth = np.zeros((self.capacity,), np.int32)
        lo[:V] = np.stack([l.lo for l in self.leaves])
        hi[:V] = np.stack([l.hi for l in self.leaves])
        depth[:V] = [l.depth for l in self.leaves]
        return {
            "leaf_lo": lo,
            "leaf_hi": hi,
            "leaf_depth": depth,
            "memm": np.asarray(state.memm),
            "counter": np.asarray(state.counter),
            "num_leaves": np.asarray(V, np.int32),
        }

    def deserialize(self, data: dict) -> TreeState:
        V = int(data["num_leaves"])
        self.leaves = [
            Leaf(
                np.asarray(data["leaf_lo"][i], np.float32),
                np.asarray(data["leaf_hi"][i], np.float32),
                int(data["leaf_depth"][i]),
            )
            for i in range(V)
        ]
        state = self.device_state()
        return state._replace(
            memm=jnp.asarray(data["memm"]),
            counter=jnp.asarray(data["counter"], jnp.int32),
        )


def _subdivide(leaf: Leaf, count: int) -> List[Leaf]:
    """Uniform count^3 split (reference: Node.subdivide, tree.py:19-33)."""
    offset = leaf.hi - leaf.lo
    out = []
    for i in range(count):
        for g in range(count):
            for h in range(count):
                ind1 = np.array([i, g, h], np.float32) / count * offset
                ind2 = np.array([i + 1, g + 1, h + 1], np.float32) / count * offset
                out.append(Leaf(leaf.lo + ind1, leaf.lo + ind2, leaf.depth + 1))
    return out


# ---------------------------------------------------------------------------
# Device ops (jitted, static shapes)
# ---------------------------------------------------------------------------


def ray_voxel_intersect(
    voxels: jnp.ndarray,
    active: jnp.ndarray,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    near,
    far,
    *,
    samples_count: int,
    use_random_sampling: bool = False,
    key: Optional[jax.Array] = None,
    max_chords: int = 0,
    _force_kernel: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batch ray/AABB intersection + per-ray depth sampling.

    voxels: (V, 2, 3); origins: (R, 3) or (3,); dirs: (R, 3).
    Returns (z_vals (R,S), voxel_indices (R,S), ray_mask (R,),
    dropped (R,) int32) with samples sorted by depth — semantics of the
    reference's batch_ray_voxel_intersect (src/nerf/tree.py:215-343).

    The deterministic sampler compacts each ray's chords into
    K = max_chords (default AUTO_CHORD_CAP = 64) slots; a ray
    crossing more than K active voxels has chords beyond rank K dropped
    (first-V-index order). `dropped` counts those per ray (always 0 for
    the random sampler, which has no cap) so callers can observe the cap
    binding instead of losing geometry silently — BuFFSystem reports it
    as train/dropped_chords and auto-doubles the cap at consolidation.
    The default K=64 covers the shipped configs (~36 measured crossings
    at depth 4) and the auto-doubling absorbs deeper trees; cost is
    linear in K.

    The fused Pallas kernel (ops/pallas/chords.py) vs XLA decision is
    resolved HERE, outside the jitted impl, and passed through a static
    arg — so the jit cache keys on it (flipping NERFMESHES_CHORDS_KERNEL
    mid-process takes effect for already-seen shapes) and so a kernel
    that fails its one-time compile probe on the live backend degrades
    to the XLA path instead of crashing BuFF.
    """
    V_total = voxels.shape[0]
    K_det = min(V_total, max_chords if max_chords > 0 else AUTO_CHORD_CAP)
    if use_random_sampling:
        use_kernel = False
    elif _force_kernel is not None:
        # Test override: pin either path (still bounded by supported()).
        use_kernel = _force_kernel and _chords.supported(V_total, K_det)
    else:
        use_kernel = _chords.kernel_enabled() and _chords.kernel_usable(
            V_total, K_det
        )
    return _ray_voxel_intersect_impl(
        voxels, active, origins, dirs, near, far,
        samples_count=samples_count,
        use_random_sampling=use_random_sampling,
        key=key,
        max_chords=max_chords,
        _use_kernel=use_kernel,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "samples_count", "use_random_sampling", "max_chords", "_use_kernel"
    ),
)
def _ray_voxel_intersect_impl(
    voxels, active, origins, dirs, near, far, *,
    samples_count: int,
    use_random_sampling: bool,
    key: Optional[jax.Array],
    max_chords: int,
    _use_kernel: bool,
):
    R = dirs.shape[0]
    origins = jnp.broadcast_to(jnp.reshape(origins, (-1, 3)), (R, 3))

    inv_d = 1.0 / dirs  # (R, 3); +-inf on zero components is fine for slabs
    neg = inv_d < 0.0  # (R, 3)

    # near/far may be scalars or per-ray (R,) (COLMAP per-image bounds):
    # add the voxel axis so they broadcast against (R, V).
    near_r, far_r = jnp.asarray(near), jnp.asarray(far)
    near = near_r[:, None] if near_r.ndim > 0 else near_r
    far = far_r[:, None] if far_r.ndim > 0 else far_r

    V_total = voxels.shape[0]
    K_det = min(
        V_total, max_chords if max_chords > 0 else AUTO_CHORD_CAP
    )
    # Fused Pallas slab-test + compaction (ops/pallas/chords.py): nothing
    # (R, V)-sized touches HBM. Same slot semantics as the XLA paths
    # below (tests pin it); decision made by the wrapper above.
    use_kernel = _use_kernel
    use_slabs = (
        (not use_random_sampling) and (not use_kernel) and V_total > _SLAB_V
    )

    if not use_slabs and not use_kernel:
        mask, tmin, tmax = _slab_test(
            voxels, active, origins, inv_d, neg, near, far
        )
        n_hit = jnp.sum(mask, axis=-1)  # (R,) chords per ray
        ray_mask = n_hit > 0
    dropped = jnp.zeros((R,), jnp.int32)

    if use_random_sampling:
        if key is None:
            raise ValueError("random voxel sampling requires a key")
        k_vox, k_t = jax.random.split(key)
        logits = jnp.where(mask, 0.0, -27.63)  # ~log(1e-12)
        samples = jax.random.categorical(
            k_vox, logits[:, None, :], axis=-1, shape=(R, samples_count)
        )
        smin = _onehot_gather(tmin, samples)
        smax = _onehot_gather(tmax, samples)
        u = jax.random.uniform(k_t, (R, samples_count))
        z_vals = smin + (smax - smin) * u
        voxel_idx = samples
        # Random path: order the samples by depth (reference: tree.py:337-341).
        sort_idx = jnp.argsort(z_vals, axis=-1)
        z_vals = _onehot_gather(z_vals, sort_idx)
        voxel_idx = _onehot_gather(
            voxel_idx.astype(jnp.float32), sort_idx,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)
    else:
        # Deterministic length-proportional sampling (semantics of the
        # reference's tree.py:298-335), redesigned for TPU: instead of
        # sorting/scattering over all V (=1728) voxels per ray — which
        # dominated the whole train step — valid chords are first COMPACTED
        # into K slots with a one-hot MXU contraction (K ~ samples_count;
        # a ray crosses far fewer cells than V), depth-sorted at size K,
        # and the linspace-over-total-length inverse mapping is built with
        # K-sized comparison contractions. The output is constructed in
        # depth order, so the reference's final sort disappears.
        V = V_total
        K = K_det
        big = jnp.asarray(2.0 * _PAD_HI, jnp.float32)

        if use_kernel:
            lo_k, hi_k, ids_k, n_hit = _chords.compact_chords(
                voxels, active, origins, dirs, near_r, far_r, K=K
            )
            ray_mask = n_hit > 0
        elif use_slabs:
            # V beyond the workspace bound: scan over _SLAB_V-voxel slabs,
            # compacting each slab to <=K chords and appending into a
            # running first-K-by-V-index buffer — identical output to the
            # monolithic path with every intermediate bounded at
            # R x _SLAB_V x K (the V=8192 compile wall, BASELINE.md).
            lo_k, hi_k, ids_k, n_hit = _chords_by_slab(
                voxels, active, origins, inv_d, neg, near, far, K
            )
            ray_mask = n_hit > 0
        else:
            valid = mask.astype(jnp.int32)
            rank = jnp.cumsum(valid, axis=-1) - 1  # slot in first-V-index order
            slots = jnp.where(mask, rank, K)  # invalid -> dropped slot K
            onehot = jax.nn.one_hot(slots, K + 1, dtype=jnp.float32)[..., :K]  # (R,V,K)
            # Compact (invalid slots get lo=hi=big: zero length, sorts to the end).
            lo_k = jnp.einsum("rv,rvk->rk", jnp.where(mask, tmin, 0.0), onehot)
            hi_k = jnp.einsum("rv,rvk->rk", jnp.where(mask, tmax, 0.0), onehot)
            # Voxel IDS through a contraction MUST stay exact: ids above
            # 256 are not representable in bf16, so a default-precision
            # MXU lowering would mis-attribute integration (the failure
            # mode of the reverted factored one-hot, DESIGN.md §7.2).
            ids_k = jnp.einsum(
                "rv,rvk->rk",
                jnp.where(mask, jnp.arange(V, dtype=jnp.float32)[None, :], 0.0),
                onehot,
                precision=jax.lax.Precision.HIGHEST,
            )
            n_valid = jnp.sum(valid, axis=-1, keepdims=True)  # (R,1)
            in_use = jnp.arange(K)[None, :] < n_valid
            lo_k = jnp.where(in_use, lo_k, big)
            hi_k = jnp.where(in_use, hi_k, big)
        dropped = jnp.maximum(n_hit - K, 0)

        # Depth-sort the K compacted chords (voxels are disjoint, so tmin
        # order == chord order along the ray).
        order_k = jnp.argsort(lo_k, axis=-1)
        lo_k = _onehot_gather(lo_k, order_k)
        hi_k = _onehot_gather(hi_k, order_k)
        ids_k = _onehot_gather(ids_k, order_k, precision=jax.lax.Precision.HIGHEST)
        lo_k = jnp.where(lo_k >= big, 0.0, lo_k)
        hi_k = jnp.where(hi_k >= big, 0.0, hi_k)

        residuals = hi_k - lo_k
        cums = jnp.cumsum(residuals, axis=-1)
        total = cums[..., -1:]
        samples = jnp.linspace(0.0, 1.0, samples_count)[None, :] * total  # (R,S)

        bucket = _searchsorted_left(cums, samples)  # (R,S) in [0, K]
        bucket = jnp.minimum(bucket, K - 1)
        first_in_bucket = _searchsorted_left(bucket, bucket)
        offset = samples - _onehot_gather(samples, first_in_bucket)
        z_vals = _onehot_gather(lo_k, bucket) + offset
        voxel_idx = _onehot_gather(
            ids_k, bucket, precision=jax.lax.Precision.HIGHEST
        ).astype(jnp.int32)
        # Construction order is already depth-sorted (monotone targets over
        # depth-sorted chords) — no final sort.

    return z_vals, voxel_idx, ray_mask, dropped


# The public wrapper is a plain function; tests clear the underlying jit
# cache through it (e.g. after monkeypatching _SLAB_V).
ray_voxel_intersect.clear_cache = _ray_voxel_intersect_impl.clear_cache


def _slab_test(voxels, active, origins, inv_d, neg, near, far):
    """Vectorized slab-method ray/AABB test over one voxel set.

    voxels (V,2,3), active (V,), origins/inv_d/neg (R,3), near/far scalar
    or (R,1). Returns (mask, tmin, tmax) each (R, V). Axis-pair overlap
    tests run in the reference's exact order (x-y, then z;
    src/nerf/tree.py:242-268)."""
    lo = voxels[:, 0, :]  # (V, 3)
    hi = voxels[:, 1, :]

    # Entry/exit per axis with sign-aware bound selection.
    t_lo = (lo[None, :, :] - origins[:, None, :]) * inv_d[:, None, :]  # (R,V,3)
    t_hi = (hi[None, :, :] - origins[:, None, :]) * inv_d[:, None, :]
    tvmin = jnp.where(neg[:, None, :], t_hi, t_lo)
    tvmax = jnp.where(neg[:, None, :], t_lo, t_hi)

    mask = (tvmin[..., 0] <= tvmax[..., 1]) & (tvmin[..., 1] <= tvmax[..., 0])
    tmin = jnp.maximum(tvmin[..., 0], tvmin[..., 1])
    tmax = jnp.minimum(tvmax[..., 0], tvmax[..., 1])
    mask = mask & (tmin <= tvmax[..., 2]) & (tvmin[..., 2] <= tmax)
    tmin = jnp.maximum(tmin, tvmin[..., 2])
    tmax = jnp.minimum(tmax, tvmax[..., 2])

    # Whole chord must lie within [near, far] (reference: tree.py:264-268).
    mask = mask & (tmin >= near) & (tmax <= far) & active[None, :]
    return mask, tmin, tmax


def _chords_by_slab(voxels, active, origins, inv_d, neg, near, far, K):
    """Chord compaction scanned over _SLAB_V-voxel slabs.

    Equivalent to the monolithic rank/one-hot compaction (first K chords
    in V-index order, empty slots filled with `big` = 2*_PAD_HI), but no
    intermediate ever exceeds R x _SLAB_V x K: each scan step slab-tests
    one voxel slab, compacts its valid chords into <=K V-ordered slots,
    and appends them into the running per-ray buffer at offset n_prev via
    a (R, K, K) one-hot shift. Chords past rank K within a slab are
    globally past rank K too (>=K same-slab chords precede them), so the
    per-slab clamp loses nothing the monolithic cap keeps.

    Returns (lo_k, hi_k, ids_k, n_hit): (R, K) buffers + total chord
    count per ray (including dropped ones — callers derive `dropped`)."""
    R = inv_d.shape[0]
    V = voxels.shape[0]
    n_slabs = -(-V // _SLAB_V)
    pad = n_slabs * _SLAB_V - V
    if pad:
        pad_box = jnp.stack(
            [jnp.full((3,), _PAD_LO, voxels.dtype), jnp.full((3,), _PAD_HI, voxels.dtype)]
        )
        voxels = jnp.concatenate([voxels, jnp.tile(pad_box, (pad, 1, 1))])
        active = jnp.concatenate([active, jnp.zeros((pad,), active.dtype)])
    voxels_s = voxels.reshape(n_slabs, _SLAB_V, 2, 3)
    active_s = active.reshape(n_slabs, _SLAB_V)
    bases = (jnp.arange(n_slabs) * _SLAB_V).astype(jnp.float32)

    big = jnp.asarray(2.0 * _PAD_HI, jnp.float32)
    j = jnp.arange(K)[None, :]  # (1, K)

    def body(carry, xs):
        lo_buf, hi_buf, ids_buf, n_prev, n_hit = carry
        vox, act, base = xs
        mask, tmin, tmax = _slab_test(vox, act, origins, inv_d, neg, near, far)
        valid = mask.astype(jnp.int32)
        rank = jnp.cumsum(valid, axis=-1) - 1
        slots = jnp.where(mask, rank, K)
        onehot = jax.nn.one_hot(slots, K + 1, dtype=jnp.float32)[..., :K]
        lo_k = jnp.einsum("rv,rvk->rk", jnp.where(mask, tmin, 0.0), onehot)
        hi_k = jnp.einsum("rv,rvk->rk", jnp.where(mask, tmax, 0.0), onehot)
        ids = base + jnp.arange(_SLAB_V, dtype=jnp.float32)[None, :]
        # IDS contractions pinned to HIGHEST precision: ids above 256 are
        # not bf16-representable, so a default-precision MXU lowering
        # would silently mis-attribute integration (DESIGN.md §7.2).
        exact = jax.lax.Precision.HIGHEST
        ids_k = jnp.einsum(
            "rv,rvk->rk", jnp.where(mask, ids, 0.0), onehot, precision=exact
        )
        cnt_all = jnp.sum(valid, axis=-1)  # (R,) incl. beyond-K
        cnt = jnp.minimum(cnt_all, K)

        # Append the slab's V-ordered chords at offset n_prev (drop past K).
        tgt = n_prev[:, None] + j  # (R, K)
        keep = (j < cnt[:, None]) & (tgt < K)
        oh = jax.nn.one_hot(jnp.where(keep, tgt, K), K + 1, dtype=jnp.float32)[..., :K]
        cov = jnp.sum(oh, axis=1)  # (R, K) 1 where this slab wrote
        lo_buf = jnp.where(cov > 0, jnp.einsum("rjk,rj->rk", oh, lo_k), lo_buf)
        hi_buf = jnp.where(cov > 0, jnp.einsum("rjk,rj->rk", oh, hi_k), hi_buf)
        ids_buf = jnp.where(
            cov > 0, jnp.einsum("rjk,rj->rk", oh, ids_k, precision=exact), ids_buf
        )
        n_prev = jnp.minimum(n_prev + cnt, K)
        return (lo_buf, hi_buf, ids_buf, n_prev, n_hit + cnt_all), None

    init = (
        jnp.full((R, K), big),
        jnp.full((R, K), big),
        jnp.zeros((R, K)),
        jnp.zeros((R,), jnp.int32),
        jnp.zeros((R,), jnp.int32),
    )
    (lo_buf, hi_buf, ids_buf, _, n_hit), _ = jax.lax.scan(
        body, init, (voxels_s, active_s, bases)
    )
    return lo_buf, hi_buf, ids_buf, n_hit


def _searchsorted_left(sorted_seq: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Batched searchsorted(side='left') via comparison contraction."""
    return jnp.sum(
        (sorted_seq[..., None, :] < values[..., :, None]).astype(jnp.int32), axis=-1
    )


def _onehot_gather(values: jnp.ndarray, idx: jnp.ndarray,
                   precision=None) -> jnp.ndarray:
    """values (R, K) gathered at idx (R, S) -> (R, S) via a one-hot MXU
    contraction (XLA's per-element gather is the slow path on TPU).
    Pass precision=HIGHEST when `values` are integer ids riding as floats
    (ids above 256 are not bf16-representable)."""
    onehot = jax.nn.one_hot(idx, values.shape[-1], dtype=values.dtype)
    return jnp.einsum("rsk,rk->rs", onehot, values, precision=precision)


@functools.partial(jax.jit, static_argnames=("axis_name",))
def integrate(
    state: TreeState,
    voxel_idx: jnp.ndarray,
    weights: jnp.ndarray,
    mask_weights: jnp.ndarray,
    ray_mask: jnp.ndarray,
    axis_name: str | None = None,
) -> TreeState:
    """Fold rendered sample weights into the per-voxel running mean
    (reference: ray_batch_integration, src/nerf/tree.py:177-206).

    voxel_idx/weights/mask_weights: (R, S); ray_mask: (R,).
    Under shard_map (`axis_name` set, per-device ray slices) the voxel
    accumulators are psum'ed over the mesh before the running-mean update,
    so the sharded step integrates exactly the global batch.
    """
    V = state.memm.shape[0]
    rm = ray_mask[:, None].astype(weights.dtype)
    # One-hot contraction instead of segment_sum: TPU scatter-add over 393k
    # elements is the slow path; the (R*S, V) masked reduce rides the MXU.
    flat_idx = voxel_idx.reshape(-1)
    w = (weights * rm).reshape(-1)
    f = (mask_weights * rm).reshape(-1)
    if V <= _SLAB_V:
        onehot = jax.nn.one_hot(flat_idx, V, dtype=weights.dtype)
        acc = jnp.einsum("nv,n->v", onehot, w)
        freq = jnp.einsum("nv,n->v", onehot, f)
    else:
        # Bound the (R*S, V) one-hot workspace at _SLAB_V per scan step
        # (out-of-slab indices one-hot to a zero row) — same result, no
        # V=8192 compile wedge (see _SLAB_V).
        n_slabs = -(-V // _SLAB_V)

        def body(_, s):
            oh = jax.nn.one_hot(
                flat_idx - s * _SLAB_V, _SLAB_V, dtype=weights.dtype
            )
            return None, (
                jnp.einsum("nv,n->v", oh, w), jnp.einsum("nv,n->v", oh, f)
            )

        _, (accs, freqs) = jax.lax.scan(body, None, jnp.arange(n_slabs))
        acc = accs.reshape(-1)[:V]
        freq = freqs.reshape(-1)[:V]
    if axis_name is not None:
        acc = jax.lax.psum(acc, axis_name)
        freq = jax.lax.psum(freq, axis_name)
    hit = freq > 0
    delta = jnp.where(hit, acc / jnp.where(hit, freq, 1.0) - state.memm, 0.0)
    memm = state.memm + delta / state.counter.astype(jnp.float32)
    return state._replace(memm=memm, counter=state.counter + 1)
