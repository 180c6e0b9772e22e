"""The jitted training step and full-image render path.

TPU-first redesign of the reference train loop
(src/models/model_nerf.py:88-151): where the reference moves CPU ray chunks
to the device inside a Python loop, here the entire dataset lives in HBM
and ONE jitted program per step does: sample an image + random pixels,
generate the rays, run coarse→PDF→fine rendering, compute losses, and apply
the optimizer update — optionally lax.scan-ed over `steps_per_call` steps
to amortize dispatch. Multi-chip runs wrap the same body in shard_map:
per-device ray slices, pmean of grads/metrics over ICI, replicated params.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerfmeshes_tpu.ops.math import img2mse, mse2psnr
from nerfmeshes_tpu.ops.rays import ndc_rays
from nerfmeshes_tpu.parallel.mesh import DATA_AXIS
from nerfmeshes_tpu.train.render import RenderSettings, render_rays


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar
    key: jax.Array


def init_train_state(params, optimizer, seed: int) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        key=jax.random.key(seed),
    )


def _sample_ray_batch(
    data, key, *, H, W, focal, num_rays, use_ndc, intrinsics=None,
    sample_all_images: bool = False,
):
    """On-device replacement for DataLoader workers + batch_random_sampling
    (reference: src/data/data_helpers.py:40-51): pick one image, then
    `num_rays` random pixels of it, and build their world rays from the pose.
    With `sample_all_images`, rays draw from the global (image, pixel) pool
    instead (the knob the reference's caching config gestures at with
    `sample_all`)."""
    from nerfmeshes_tpu.ops.rays import CameraIntrinsics, pixel_directions

    if intrinsics is None:
        intrinsics = CameraIntrinsics.from_hwf(H, W, focal)

    if getattr(key, "ndim", 0) == 1:
        # Pre-split (k_img, k_pix) pair: the sharded path replicates the
        # image choice but folds the shard index into the pixel choice.
        k_img, k_pix = key[0], key[1]
    else:
        k_img, k_pix = jax.random.split(key)
    num_images = data["poses"].shape[0]
    depth = None
    if sample_all_images:
        # Global ray pool: every ray draws its own (image, pixel) — decorrelates
        # the batch vs the reference's one-image-per-step scheme. Poses are
        # gathered per ray via a one-hot contraction (tiny: N_img x 16).
        img = jax.random.randint(k_img, (num_rays,), 0, num_images)
        pix = jax.random.randint(k_pix, (num_rays,), 0, H * W)
        onehot = jax.nn.one_hot(img, num_images, dtype=jnp.float32)
        pose = jnp.einsum(
            "rn,nij->rij", onehot, data["poses"].astype(jnp.float32)
        )  # (R, 4, 4)
        targets = data["targets"].reshape(num_images * H * W, -1)[
            img * (H * W) + pix
        ]
        if "target_depth" in data:
            depth = data["target_depth"].reshape(num_images * H * W)[
                img * (H * W) + pix
            ]
    else:
        img = jax.random.randint(k_img, (), 0, num_images)
        pix = jax.random.randint(k_pix, (num_rays,), 0, H * W)
        pose = data["poses"][img]
        targets = data["targets"][img].reshape(H * W, -1)[pix]
        if "target_depth" in data:
            depth = data["target_depth"][img].reshape(H * W)[pix]

    x = (pix % W).astype(jnp.float32)
    y = (pix // W).astype(jnp.float32)
    dirs_cam = pixel_directions(x, y, intrinsics)
    if pose.ndim == 3:  # per-ray poses (sample_all_images)
        directions = jnp.einsum("rij,rj->ri", pose[:, :3, :3], dirs_cam)
        origins = pose[:, :3, 3]
    else:
        directions = jnp.einsum("ij,rj->ri", pose[:3, :3], dirs_cam)
        origins = jnp.broadcast_to(pose[:3, 3], directions.shape)

    bounds = data["bounds"]
    if bounds.ndim == 2:
        near, far = bounds[img, 0], bounds[img, 1]
    else:
        near, far = bounds[0], bounds[1]

    if use_ndc:
        origins, directions = ndc_rays(H, W, focal, 1.0, origins, directions)

    return origins, directions, targets, near, far, depth


def depth_loss_metrics(scope, rgb_out, rgb_tgt, depth_out, depth_tgt, empty=0.0):
    """Device-side masked surface/void depth+rgb loss decomposition — the
    per-step DepthLossLogger (reference: src/nerf/loggers.py:75-108,
    wired at src/models/model_buff.py:96-107), computed inside the jitted
    step as scalars so the hot loop stays host-free (the host-side class
    in utils/loggers.py serves offline analysis of fetched arrays)."""
    mask = depth_tgt > empty
    n_s = jnp.maximum(jnp.sum(mask), 1)
    n_v = jnp.maximum(jnp.sum(~mask), 1)
    d2 = (depth_out - depth_tgt) ** 2
    rgb2 = (rgb_out - rgb_tgt) ** 2
    return {
        f"{scope}/depth_loss": jnp.mean(d2),
        f"{scope}/depth_empty": jnp.sum(jnp.where(mask, 0.0, d2)) / n_v,
        f"{scope}/depth_space": jnp.sum(jnp.where(mask, d2, 0.0)) / n_s,
        f"{scope}/depth_l1": jnp.sum(jnp.where(mask, depth_out - depth_tgt, 0.0)) / n_s,
        f"{scope}/rgb_surface_loss": jnp.sum(
            jnp.where(mask[:, None], rgb2, 0.0)
        ) / (n_s * rgb2.shape[-1]),
        f"{scope}/rgb_void_loss": jnp.sum(
            jnp.where(mask[:, None], 0.0, rgb2)
        ) / (n_v * rgb2.shape[-1]),
    }


def make_train_step(
    cfg,
    coarse_model,
    fine_model,
    optimizer: optax.GradientTransformation,
    *,
    H: int,
    W: int,
    focal: float,
    mesh=None,
    steps_per_call: Optional[int] = None,
    donate: bool = True,
    intrinsics=None,
    force_shard: bool = False,
):
    """Build the jitted multi-step train function.

    Returns fn(state, data) -> (state, metrics) advancing
    `steps_per_call` optimizer steps per call (metrics from the last step,
    matching per-step logging cadence).

    `force_shard=True` builds the full sharded program (shard_map +
    axis_index key folding + pmean collectives) even on a size-1 mesh —
    the exact multi-chip program on a 1-element axis. bench.py uses it
    for the sharded-vs-unsharded no-regression A/B on the one real chip.
    """
    settings = RenderSettings.from_cfg(cfg, train=True)
    num_rays = int(cfg.nerf.train.num_random_rays)
    use_ndc = bool(cfg.dataset.use_ndc)
    sample_all = bool(cfg.nerf.train.get("sample_all_images", False))
    use_fine = settings.use_fine and fine_model is not None
    lr_schedule_cfg = cfg  # captured for lr metric
    if steps_per_call is None:
        steps_per_call = int(cfg.experiment.steps_per_call)

    from nerfmeshes_tpu.train.optim import accumulation_steps, build_schedule

    schedule = build_schedule(lr_schedule_cfg)
    # With gradient accumulation the inner optimizer (and its schedule)
    # advances once per `accum` step bodies.
    accum = accumulation_steps(cfg)

    def loss_fn(params, origins, directions, targets, near, far, depth_tgt, key):
        coarse_bundle, fine_bundle = render_rays(
            coarse_model,
            fine_model,
            params,
            origins,
            directions,
            near,
            far,
            settings,
            train=True,
            key=key,
        )
        coarse_loss = img2mse(coarse_bundle.rgb_map, targets)
        loss = coarse_loss
        finest = fine_bundle if fine_bundle is not None else coarse_bundle
        metrics = {
            "train/coarse_loss": coarse_loss,
            "train/coarse_psnr": mse2psnr(coarse_loss),
            # For the reference's early-collapse check (model_base.py:179-187).
            "train/rgb_sum": jnp.sum(finest.rgb_map),
        }
        if use_fine:
            fine_loss = img2mse(fine_bundle.rgb_map, targets)
            loss = loss + fine_loss
            metrics["train/fine_loss"] = fine_loss
            metrics["train/fine_psnr"] = mse2psnr(fine_loss)
        if depth_tgt is not None:
            metrics.update(
                depth_loss_metrics(
                    "train", finest.rgb_map, targets, finest.depth_map, depth_tgt
                )
            )
        metrics["train/loss"] = loss
        return loss, metrics

    n_shards = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
    if num_rays % max(n_shards, 1) != 0:
        raise ValueError(
            f"num_random_rays {num_rays} must be divisible by the mesh size {n_shards}"
        )
    local_rays = num_rays // max(n_shards, 1)
    sharded_body = n_shards > 1 or (force_shard and mesh is not None)

    def one_step(state: TrainState, data) -> tuple[TrainState, dict]:
        """Per-device step body. Under shard_map each device samples its own
        `local_rays` pixel slice of the SAME image (key folded with the mesh
        axis index), computes local grads, and psums them — data parallelism
        over rays with replicated params, grads reduced over ICI."""
        key, k_sample, k_render = jax.random.split(state.key, 3)
        if sharded_body:
            shard = jax.lax.axis_index(DATA_AXIS)
            k_img, k_pix = jax.random.split(k_sample)
            k_pix = jax.random.fold_in(k_pix, shard)
            k_sample = _merge_img_pix_keys(k_img, k_pix)
            k_render = jax.random.fold_in(k_render, shard)
        origins, directions, targets, near, far, depth_tgt = _sample_ray_batch(
            data,
            k_sample,
            H=H,
            W=W,
            focal=focal,
            num_rays=local_rays,
            use_ndc=use_ndc,
            intrinsics=intrinsics,
            sample_all_images=sample_all,
        )
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, origins, directions, targets, near, far, depth_tgt, k_render
        )
        if sharded_body:
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.pmean(g, DATA_AXIS), grads
            )
            metrics = jax.tree_util.tree_map(
                lambda m: jax.lax.pmean(m, DATA_AXIS), metrics
            )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["train/lr"] = schedule(state.step // accum)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1, key=key
        )
        return new_state, metrics

    def multi_step(state: TrainState, data):
        if steps_per_call == 1:
            return one_step(state, data)
        state, metrics = jax.lax.scan(
            lambda s, _: one_step(s, data), state, None, length=steps_per_call
        )
        # Report the last step's metrics.
        return state, jax.tree_util.tree_map(lambda m: m[-1], metrics)

    from jax.sharding import PartitionSpec as P

    from nerfmeshes_tpu.parallel.mesh import maybe_shard

    # Everything (params, data) is replicated; the ray axis materializes
    # only inside the per-device body, so Pallas kernels run as-is per
    # device and the only collective is the gradient/metric pmean.
    sharded = maybe_shard(
        multi_step, mesh, (P(), P()), (P(), P()), force=force_shard
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def _merge_img_pix_keys(k_img: jax.Array, k_pix: jax.Array) -> jax.Array:
    """Stack (k_img, k_pix) into the pre-split pair _sample_ray_batch
    accepts — keeps the image choice replicated across shards while the
    pixel choice varies per shard."""
    return jnp.stack([k_img, k_pix])


def mesh_size(mesh) -> int:
    """Device count of a jax Mesh (1 for None)."""
    return int(np.prod(mesh.devices.shape)) if mesh is not None else 1


def round_chunk(chunk: int, mesh) -> int:
    """Smallest chunk >= `chunk` divisible by the mesh size (sharded
    renderers split the ray axis evenly across devices)."""
    n = mesh_size(mesh)
    return max(n, -(-int(chunk) // n) * n)


def make_render_chunk(cfg, coarse_model, fine_model, *, train: bool = False,
                      mesh=None):
    """Jitted fixed-shape ray-slab renderer for validation / eval / mesh
    appearance. Call with identically-shaped chunks to avoid recompiles;
    `render_image` below handles padding + assembly.

    With a device `mesh`, the chunk's ray axis is sharded across it via
    shard_map (params replicated, per-ray output maps gathered back —
    SURVEY §2.10/§5 "all_gather for eval tiles"): validation, the eval
    CLI and the mesh appearance pass then use every chip instead of one.
    Chunk sizes must be divisible by the mesh size (round_chunk)."""
    settings = RenderSettings.from_cfg(cfg, train=train)

    def body(params, origins, directions, near, far):
        coarse_bundle, fine_bundle = render_rays(
            coarse_model,
            fine_model,
            params,
            origins,
            directions,
            near,
            far,
            settings,
            train=False,
        )
        return coarse_bundle, fine_bundle

    from jax.sharding import PartitionSpec as P

    from nerfmeshes_tpu.parallel.mesh import maybe_shard

    # Rays sharded over the data axis; every output leaf is per-ray
    # (axis 0), so one P(DATA_AXIS) prefix gathers them all.
    body = maybe_shard(
        body, mesh, (P(), P(DATA_AXIS), P(DATA_AXIS), P(), P()), P(DATA_AXIS)
    )
    return jax.jit(body)


def make_pose_rays(H: int, W: int, focal: float, *, use_ndc: bool = False,
                   intrinsics=None):
    """Jitted full-image ray generation from a camera pose.

    Validation/eval render whole images; building the (H*W, 3) ray arrays
    on the host and uploading them costs ~15MB per 800^2 image through a
    TPU tunnel. This generates them on device from the 4x4 pose (a 64-byte
    upload), matching convert_poses_to_rays / the train step's ray math
    (reference: src/nerf/nerf_helpers.py:226-277 + ndc_rays)."""
    from nerfmeshes_tpu.ops.rays import CameraIntrinsics, pixel_directions

    if intrinsics is None:
        intrinsics = CameraIntrinsics.from_hwf(H, W, focal)

    @jax.jit
    def pose_rays(pose):
        pix = jnp.arange(H * W)
        x = (pix % W).astype(jnp.float32)
        y = (pix // W).astype(jnp.float32)
        dirs_cam = pixel_directions(x, y, intrinsics)
        pose = jnp.asarray(pose, jnp.float32)
        directions = jnp.einsum("ij,rj->ri", pose[:3, :3], dirs_cam)
        origins = jnp.broadcast_to(pose[:3, 3], directions.shape)
        if use_ndc:
            origins, directions = ndc_rays(H, W, focal, 1.0, origins, directions)
        return origins, directions

    return pose_rays


def make_render_rgb(cfg, coarse_model, fine_model, *, as_uint8: bool = False,
                    mesh=None):
    """Batched rgb-only renderer: ONE jitted program lax.maps over
    pre-chunked rays and returns just the finest rgb map.

    For bulk host-driven queries (the mesh appearance pass renders ~1M
    rays), the per-chunk dispatch pattern of render_image pays an upload +
    dispatch round-trip per chunk through the TPU tunnel; here the host
    uploads once, the device loops, and one fetch returns (R, 3).

    `as_uint8` quantizes on device to uint8 — a 4x smaller fetch through
    the ~20MB/s tunnel; right when the consumer quantizes anyway (mesh
    vertex colors).

    With a device `mesh`, the intra-chunk ray axis is sharded: each
    device renders chunk/n rays of every chunk (chunk must divide by the
    mesh size; chunk_rays_for_batched enforces it)."""
    settings = RenderSettings.from_cfg(cfg, train=False)

    def loop_body(params, origins, directions, near, far):
        # origins/directions: (C, local_chunk, 3) per device
        def body(od):
            o, d = od
            coarse_b, fine_b = render_rays(
                coarse_model, fine_model, params, o, d, near, far,
                settings, train=False,
            )
            b = fine_b if fine_b is not None else coarse_b
            return b.rgb_map

        return jax.lax.map(body, (origins, directions))  # (C, local, 3)

    from jax.sharding import PartitionSpec as P

    from nerfmeshes_tpu.parallel.mesh import maybe_shard

    loop_body = maybe_shard(
        loop_body, mesh,
        (P(), P(None, DATA_AXIS), P(None, DATA_AXIS), P(), P()),
        P(None, DATA_AXIS),
    )

    @jax.jit
    def render_rgb(params, origins, directions, near, far):
        out = loop_body(params, origins, directions, near, far)
        out = out.reshape(-1, out.shape[-1])
        if as_uint8:
            out = jnp.round(jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        return out

    return render_rgb


def chunk_rays_for_batched(origins, directions, chunk: int):
    """Host-side prep for make_render_rgb: pad to a chunk multiple and
    reshape to (C, chunk, 3). Returns (o, d, n_real)."""
    import numpy as np

    R = directions.shape[0]
    origins = np.broadcast_to(np.reshape(np.asarray(origins), (-1, 3)), (R, 3))
    directions = np.asarray(directions)
    pad = (-R) % chunk
    if pad:
        origins = np.concatenate([origins, np.repeat(origins[-1:], pad, 0)], 0)
        directions = np.concatenate(
            [directions, np.repeat(directions[-1:], pad, 0)], 0
        )
    C = origins.shape[0] // chunk
    return (
        origins.reshape(C, chunk, 3).astype(np.float32),
        directions.reshape(C, chunk, 3).astype(np.float32),
        R,
    )


def render_image(
    render_chunk,
    params,
    origins,
    directions,
    near,
    far,
    *,
    chunk_size: int,
    fields: Optional[tuple] = None,
    as_numpy: bool = True,
):
    """Render an arbitrary number of rays through the fixed-shape jitted
    chunk renderer (pads the tail chunk; host assembles the maps).

    origins: (R, 3) or (3,), directions: (R, 3).
    Returns (coarse, fine) RenderOutput pytrees of stacked numpy arrays.

    `fields` limits which RenderOutput fields are fetched to the host
    (others come back None). The per-sample maps (weights/mask_weights)
    are ~25MB/chunk at validation settings — transferring them when the
    caller only wants rgb dominates wall time through a TPU tunnel.
    `as_numpy=False` keeps the kept fields as DEVICE arrays (concatenated,
    unfetched) for callers that post-process on device (e.g. the
    surface-ray exporter's consistency mask) and fetch less later.
    """
    import numpy as np

    R = directions.shape[0]
    # Device-resident rays (e.g. from make_pose_rays) are sliced on
    # device — chunking must not round-trip them through the host.
    on_device = isinstance(directions, jax.Array) and not isinstance(
        directions, np.ndarray
    )
    xp = jnp if on_device else np
    origins = xp.broadcast_to(xp.reshape(xp.asarray(origins), (-1, 3)), (R, 3))
    directions = xp.asarray(directions)

    # Dispatch every chunk before fetching any: JAX dispatch is async, so
    # the device pipeline stays full and the per-chunk host round-trip
    # latency (~35ms each way through a TPU tunnel) is paid once, not
    # serialized with compute chunk by chunk.
    pending = []
    for start in range(0, R, chunk_size):
        o = origins[start : start + chunk_size]
        d = directions[start : start + chunk_size]
        pad = chunk_size - o.shape[0]
        if pad:
            o = xp.concatenate([o, xp.repeat(o[-1:], pad, 0)], 0)
            d = xp.concatenate([d, xp.repeat(d[-1:], pad, 0)], 0)
        pending.append(render_chunk(params, jnp.asarray(o), jnp.asarray(d), near, far))

    def gather(bundles):
        """Concatenate each kept field ON DEVICE, then fetch it once:
        per-chunk per-field np.asarray would pay the ~100ms tunnel
        round-trip 40-160x per 800^2 image."""
        if not bundles or bundles[0] is None:
            return None
        out = {}
        for name in bundles[0]._fields:
            vals = [getattr(b, name) for b in bundles]
            if vals[0] is None or (fields is not None and name not in fields):
                out[name] = None
                continue
            arr = jnp.concatenate(vals, 0)[:R]
            out[name] = np.asarray(arr) if as_numpy else arr
        return type(bundles[0])(**out)

    return (
        gather([c for c, _ in pending]),
        gather([f for _, f in pending]),
    )
