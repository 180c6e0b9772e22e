"""NeRFSystem — the training system (the reference's NeRFModel Lightning
module, src/models/model_nerf.py, rebuilt around one jitted step).

Responsibilities: build coarse/fine models from config, init params, own
the jitted train/render functions, run the fit loop with validation
cadence, early-collapse check, checkpointing and logging.
"""

from __future__ import annotations

import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerfmeshes_tpu.config.paths import ExperimentPaths
from nerfmeshes_tpu.data.datasets import DatasetType, RayDataset, build_dataset
from nerfmeshes_tpu.models import build_model
from nerfmeshes_tpu.train.checkpoint import CheckpointManager
from nerfmeshes_tpu.train.optim import build_optimizer
from nerfmeshes_tpu.train.step import (
    init_train_state,
    make_render_chunk,
    make_train_step,
    mesh_size,
    render_image,
    round_chunk,
)
from nerfmeshes_tpu.utils.logging import MetricsLogger


@jax.jit
def _mse_device(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Validation MSE on device — the render never crosses the host
    boundary just to be compared against a target that (for HBM-resident
    datasets) already lives next to it."""
    return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


@jax.jit
def _rgb_u8_device(rgb: jnp.ndarray) -> jnp.ndarray:
    """Device-side [0,1]->uint8 quantization (4x fewer fetched bytes for
    logged validation images; MetricsLogger.log_image takes uint8 as-is
    and writes the same PNG it would have produced from the f32 map)."""
    return (jnp.clip(rgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def _host_psnr(mse: float) -> float:
    """ops.math.mse2psnr semantics without a device round trip."""
    return -10.0 * float(np.log10(mse if mse > 0 else 1e-5))


def compute_dtype_from_cfg(cfg):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}[
        str(cfg.experiment.compute_dtype)
    ]


def create_models(cfg):
    """(coarse, fine|None) from cfg.models.* (reference:
    src/models/model_nerf.py:10-19)."""
    dtype = compute_dtype_from_cfg(cfg)
    coarse = build_model(cfg.models.coarse_type, dict(cfg.models.coarse), dtype=dtype)
    fine = None
    if "fine" in cfg.models and cfg.models.use_fine:
        fine = build_model(cfg.models.fine_type, dict(cfg.models.fine), dtype=dtype)
    return coarse, fine


def init_params(cfg, coarse, fine, key: jax.Array):
    pts = jnp.zeros((2, 2, 3), jnp.float32)
    k1, k2 = jax.random.split(key)
    params = {"coarse": coarse.init(k1, pts, pts)}
    params["fine"] = fine.init(k2, pts, pts) if fine is not None else {}
    return params


class NeRFSystem:
    """Owns models/params/optimizer and the train/eval functions."""

    def __init__(self, cfg, paths: Optional[ExperimentPaths] = None, mesh=None):
        self.cfg = cfg
        self.paths = paths
        self.mesh = mesh
        self.coarse, self.fine = create_models(cfg)
        self.optimizer = build_optimizer(cfg)

        seed = int(cfg.experiment.randomseed)
        params = init_params(self.cfg, self.coarse, self.fine, jax.random.key(seed))
        self.state = self._replicate(init_train_state(params, self.optimizer, seed))

        self.train_dataset: Optional[RayDataset] = None
        self.val_dataset: Optional[RayDataset] = None
        self._train_fn = None
        self._render_chunk = None
        self._data = None

        self.logger = (
            MetricsLogger(str(paths.events_dir), use_acronyms=cfg.logging.use_acronyms)
            if paths is not None
            else None
        )
        self.ckpt = (
            CheckpointManager(str(paths.checkpoint_dir)) if paths is not None else None
        )

    def _replicate(self, x):
        """Place a pytree replicated over the mesh (no-op without one).

        Every operand of a mesh-sharded program must already carry the
        mesh's NamedSharding: an input committed to a single device is
        RE-SHARDED on every call — logically a no-op replication, but it
        costs a full host-side copy per call through a TPU tunnel (measured
        6-17x train-step slowdown before this placement existed;
        scripts/diag_shardmap.py reproduces, BASELINE.md r4 has the A/B)."""
        if self.mesh is None or x is None:
            return x
        from nerfmeshes_tpu.parallel.mesh import replicated

        return jax.device_put(x, replicated(self.mesh))

    # -- setup ---------------------------------------------------------------
    def setup(self, train_dataset=None, val_dataset=None):
        self.train_dataset = train_dataset or build_dataset(self.cfg, DatasetType.TRAIN)
        self.val_dataset = val_dataset or build_dataset(self.cfg, DatasetType.VALIDATION)

        H, W, focal = self.train_dataset.hwf
        self._data = self._replicate(self.train_dataset.device_arrays())
        self._train_fn = make_train_step(
            self.cfg,
            self.coarse,
            self.fine,
            self.optimizer,
            H=int(H),
            W=int(W),
            focal=float(focal),
            mesh=self.mesh,
            intrinsics=self.train_dataset.intrinsics(),
        )
        self._render_chunk = make_render_chunk(
            self.cfg, self.coarse, self.fine, mesh=self.mesh
        )
        return self

    def setup_eval(self, val_dataset=None):
        """Lightweight setup for eval/mesh paths: no train dataset or train
        function, just the jitted chunk renderer."""
        if val_dataset is not None:
            self.val_dataset = val_dataset
        self._render_chunk = make_render_chunk(
            self.cfg, self.coarse, self.fine, mesh=self.mesh
        )
        return self

    def _chunk(self, chunk) -> int:
        """Chunk size rounded up to the render mesh size (sharded render
        chunks split the ray axis evenly over the devices)."""
        return round_chunk(int(chunk), self.mesh)

    # -- queries ------------------------------------------------------------------
    def query_rays(self, origins, directions, near, far, chunk: Optional[int] = None,
                   fields: Optional[tuple] = None, as_numpy: bool = True):
        """Render arbitrary rays with the finest model (validation settings);
        analog of NeRFModel.query (src/models/model_nerf.py:80-86).
        `fields` limits which maps are fetched to the host (see
        render_image) — ask for ("rgb_map",) unless you need more;
        `as_numpy=False` returns device arrays instead of fetching."""
        chunk = self._chunk(chunk or self.cfg.nerf.validation.chunksize)
        coarse, fine = render_image(
            self._render_chunk,
            self.state.params,
            origins,
            directions,
            float(near),
            float(far),
            chunk_size=chunk,
            fields=fields,
            as_numpy=as_numpy,
        )
        return fine if fine is not None else coarse

    def query_rgb(self, origins, directions, near, far, chunk: int = 65536,
                  as_uint8: bool = False):
        """Bulk rgb-only ray query through ONE batched jitted program (see
        make_render_rgb) — the fast path for the mesh appearance pass:
        one upload, one dispatch, one fetch instead of a dispatch per
        chunk. `as_uint8` fetches device-quantized uint8 (4x less tunnel
        traffic)."""
        from nerfmeshes_tpu.train.step import chunk_rays_for_batched, make_render_rgb

        cache = getattr(self, "_render_rgb_fns", None)
        if cache is None:
            cache = self._render_rgb_fns = {}
        if as_uint8 not in cache:
            cache[as_uint8] = make_render_rgb(
                self.cfg, self.coarse, self.fine, as_uint8=as_uint8,
                mesh=self.mesh,
            )
        o, d, n = chunk_rays_for_batched(origins, directions, self._chunk(chunk))
        out = cache[as_uint8](
            self.state.params, jnp.asarray(o), jnp.asarray(d),
            float(near), float(far),
        )
        return np.asarray(out)[:n]

    def sample_points(self, points, directions=None):
        """Point-query of the finest field (mesh extraction path; analog of
        BaseModel.sample_points, src/models/model_base.py:65-73)."""
        model = self.fine if self.fine is not None else self.coarse
        params = (
            self.state.params["fine"]
            if self.fine is not None
            else self.state.params["coarse"]
        )
        if bool(self.cfg.experiment.get("use_fused_kernel", True)) and directions is not None:
            from nerfmeshes_tpu.ops.pallas.fused_mlp import (
                fused_flexible_apply,
                supports_fused,
            )

            if supports_fused(model):
                return fused_flexible_apply(
                    model, params, points, directions, inference=True
                )
        out = model.apply(params, points, directions)
        if isinstance(out, tuple):
            out = out[0]
        return out

    @property
    def finest_params(self):
        """Variables of the finest model (pairs with density_apply)."""
        return (
            self.state.params["fine"]
            if self.fine is not None
            else self.state.params["coarse"]
        )

    def density_apply(self, params, points):
        """Density-only query of the finest field -> (...,) raw sigma,
        with params as an explicit argument so grid-eval programs compile
        once per SHAPE, not once per checkpoint (a closure would bake the
        weights in as XLA constants).

        The geometry half of mesh extraction (res^3 grid evals,
        src/mesh_nerf.py:27-53 keeps only channel 3) never needs the
        color heads: eligible models run the sigma-only fused kernel,
        which also skips the channel-minor output relayout."""
        model = self.fine if self.fine is not None else self.coarse
        if bool(self.cfg.experiment.get("use_fused_kernel", True)):
            from nerfmeshes_tpu.ops.pallas.fused_mlp import (
                fused_sigma_points,
                supports_fused,
            )

            if supports_fused(model):
                return fused_sigma_points(model, params, points)
        out = model.apply(params, points, points)
        if isinstance(out, tuple):
            out = out[0]
        return out[..., 3]

    def density_points(self, points):
        """density_apply bound to the current finest params."""
        return self.density_apply(self.finest_params, points)

    # -- validation -----------------------------------------------------------------
    def validate(self, max_images: Optional[int] = None, log_images: bool = True,
                 step: Optional[int] = None) -> dict:
        cfg_val = self.cfg.nerf.validation
        num = cfg_val.num_samples if max_images is None else max_images
        n_total = len(self.val_dataset)
        cur_step = int(self.state.step) if step is None else int(step)
        if num == -1 or num is None:
            indices = range(n_total)
        else:
            # Sampling WITH replacement mirrors the reference's val loader,
            # which redraws views every epoch (RandomSampler(replacement=True,
            # num_samples=...), src/models/model_base.py:139-142): the draw is
            # seeded by the current step — deterministic given the step,
            # different across validation epochs, so val_loss (which ranks the
            # top-3 checkpoints) never overfits to one frozen view set.
            # nerf.validation.fixed_views pins seed 0 for benchmark runs that
            # need identical views across checkpoints.
            seed = 0 if bool(cfg_val.get("fixed_views", False)) else cur_step
            indices = np.random.default_rng(seed).integers(0, n_total, size=max(1, min(num, n_total)))
        self._last_val_indices = list(int(i) for i in indices)

        H, W, _ = self.val_dataset.hwf
        losses, fine_losses = [], []
        from nerfmeshes_tpu.utils.logging import progress_bar

        vbar = progress_bar(len(self._last_val_indices), desc="val", position=1)
        for i, idx in enumerate(indices):
            # Rays generated and kept ON DEVICE (dataset.image_rays);
            # bounds are host scalars. Targets stay wherever the bundle
            # lives — for HBM-resident datasets the MSE below runs
            # entirely on device and only scalars (and, when logging,
            # uint8 images) ever cross the tunnel.
            origins, directions = self.val_dataset.image_rays(int(idx))
            near, far = np.asarray(
                self.val_dataset._bounds_for(int(idx))
            ).reshape(-1)[:2]
            target = jnp.asarray(self.val_dataset.bundle.ray_targets[int(idx)])
            target = target.reshape(-1, target.shape[-1])
            coarse, fine = render_image(
                self._render_chunk,
                self.state.params,
                origins,
                directions,
                float(near),
                float(far),
                chunk_size=self._chunk(cfg_val.chunksize),
                # Per-ray maps only: the (R, S) weights are ~16x larger
                # and unused here — skipping their host transfer is the
                # difference between seconds and minutes per 800^2 image
                # through a TPU tunnel. Without image logging, rgb alone.
                fields=("rgb_map", "disp_map") if log_images else ("rgb_map",),
                as_numpy=False,
            )
            # Device scalars, accumulated and fetched ONCE after the loop
            # (each mid-loop float() would pay a ~100ms tunnel round trip).
            losses.append(_mse_device(coarse.rgb_map, target))
            finest = coarse
            if fine is not None:
                fine_losses.append(_mse_device(fine.rgb_map, target))
                finest = fine
            if log_images and self.logger is not None:
                step = cur_step
                self.logger.log_image(
                    f"validation/rgb_{'fine' if fine is not None else 'coarse'}/{i}",
                    np.asarray(_rgb_u8_device(
                        finest.rgb_map.reshape(int(H), int(W), 3)
                    )),
                    step,
                )
                if fine is not None:
                    # The reference logs the coarse render alongside the
                    # fine one per view (src/models/model_nerf.py:186-220).
                    self.logger.log_image(
                        f"validation/rgb_coarse/{i}",
                        np.asarray(_rgb_u8_device(
                            coarse.rgb_map.reshape(int(H), int(W), 3)
                        )),
                        step,
                    )
                if finest.disp_map is not None:
                    from nerfmeshes_tpu.utils.images import cast_to_disparity_image

                    disp = cast_to_disparity_image(
                        np.asarray(finest.disp_map).reshape(int(H), int(W)),
                        white_background=bool(self.cfg.dataset.white_background),
                    )
                    self.logger.log_image(
                        f"validation/disparity/{i}", disp[..., None].repeat(3, -1), step
                    )
                self.logger.log_image(
                    f"validation/img_target/{i}",
                    np.asarray(_rgb_u8_device(
                        target.reshape(int(H), int(W), 3)
                    )),
                    step,
                )
            vbar.update(1)
        vbar.close()

        losses = [float(v) for v in jax.device_get(losses)]
        fine_losses = [float(v) for v in jax.device_get(fine_losses)]
        coarse_loss = float(np.mean(losses))
        metrics = {
            "validation/coarse_loss": coarse_loss,
            "validation/coarse_psnr": _host_psnr(coarse_loss),
        }
        loss = coarse_loss
        if fine_losses:
            fine_loss = float(np.mean(fine_losses))
            loss = loss + fine_loss
            metrics["validation/fine_loss"] = fine_loss
            metrics["validation/fine_psnr"] = _host_psnr(fine_loss)
        metrics["validation/loss"] = loss

        chamfer = self._chamfer_validation()
        if chamfer is not None:
            metrics["validation/chamfer_loss"] = chamfer
        return metrics

    def _chamfer_validation(self):
        """Chamfer distance of the extracted iso-surface against a target
        mesh (<basedir>/model.obj), re-extracting geometry each validation
        epoch (reference: src/models/model_base.py:82-102)."""
        cfg = self.cfg
        if not cfg.experiment.chamfer_loss:
            return None
        from pathlib import Path

        target_path = Path(cfg.dataset.basedir) / "model.obj"
        if not target_path.exists():
            return None
        from nerfmeshes_tpu.mesh import (
            MeshArgs,
            chamfer_distance,
            extract_geometry,
            import_obj,
            normalize_mesh,
            sample_points_from_mesh,
        )

        n_samples = int(cfg.experiment.chamfer_sampling_size)
        verts_t, faces_t, _, _ = import_obj(str(target_path))
        verts, faces, _, _ = extract_geometry(
            self.sample_points,
            MeshArgs(res=64, limit=1.2, iso_level=32),
            density_fn=self.density_apply,
            density_params=self.finest_params,
            mesh=self.mesh,
        )
        if len(faces) == 0:
            return None
        pts_a = sample_points_from_mesh(normalize_mesh(verts_t), faces_t, n_samples)
        pts_b = sample_points_from_mesh(normalize_mesh(verts), faces, n_samples)
        return float(chamfer_distance(pts_a, pts_b))

    # -- fit loop ------------------------------------------------------------------
    def fit(self, max_steps: Optional[int] = None) -> dict:
        cfg = self.cfg
        if self._train_fn is None:
            self.setup()

        max_steps = max_steps or int(cfg.experiment.train_iters)
        validate_every = int(cfg.experiment.validate_every)
        print_every = int(cfg.experiment.print_every)
        steps_per_call = int(cfg.experiment.steps_per_call)
        proj_every = max(1, int(cfg.logging.projection_step_size))
        use_projection = (
            bool(cfg.logging.use_projection)
            and self.logger is not None
            and self.logger._tb is not None
        )

        last_metrics = {}
        t0 = time.time()
        rays_done = 0
        # Host-side step mirror: int(self.state.step) per call would block
        # the host on every dispatch (+~100ms tunnel round-trip each),
        # breaking the async pipeline. The device counter stays
        # authoritative for checkpoints.
        step = int(self.state.step)
        from nerfmeshes_tpu.utils.logging import progress_bar

        pbar = progress_bar(max_steps, desc="train", initial=step)
        while step < max_steps:
            self.state, metrics = self._train_fn(self.state, self._data)
            step += steps_per_call
            pbar.update(steps_per_call)
            rays_done += steps_per_call * int(cfg.nerf.train.num_random_rays)

            self.on_step(step)
            self._check_early_stopping(metrics, step)

            if (
                use_projection
                and step >= proj_every
                and step % proj_every < steps_per_call
            ):
                self._log_depth_projection(step)

            if step % print_every < steps_per_call or step >= max_steps:
                host = {
                    k: float(v)
                    for k, v in jax.device_get(
                        {k: v for k, v in metrics.items() if k != "train/rgb_sum"}
                    ).items()
                }
                host["train/rays_per_sec"] = rays_done / max(time.time() - t0, 1e-9)
                # Divergence guard (free: metrics are already on the host
                # at this cadence). A non-finite loss never recovers — the
                # params are poisoned — so fail loudly instead of burning
                # the rest of the budget. The reference's only failure
                # detection is the color-collapse exit (model_base.py:179).
                loss = host.get("train/loss")
                if loss is not None and not np.isfinite(loss):
                    raise RuntimeError(
                        f"Training diverged: train/loss={loss} at step "
                        f"{step} (lr={host.get('train/lr')}). Restart from "
                        "the last checkpoint with a lower lr, fewer rays, "
                        "or sigma noise enabled."
                    )
                last_metrics = host
                self.on_host_metrics(host, step)
                pbar.set_postfix_str(
                    f"loss={host.get('train/loss', float('nan')):.4g} "
                    f"rps={host['train/rays_per_sec']:.3g}",
                    refresh=False,
                )
                if self.logger is not None:
                    self.logger.log_scalars(host, step)
                    print(self.logger.console_line(host, step), flush=True)

            if validate_every > 0 and (
                step % validate_every < steps_per_call or step >= max_steps
            ):
                val_metrics = self.validate(step=step)
                last_metrics.update(val_metrics)
                if self.logger is not None:
                    self.logger.log_scalars(val_metrics, step)
                    print(self.logger.console_line(val_metrics, step), flush=True)
                if self.ckpt is not None:
                    self.ckpt.save(
                        self.state,
                        val_loss=val_metrics["validation/loss"],
                        extra=self.checkpoint_extra(),
                    )
        pbar.close()
        return last_metrics

    def on_step(self, step: int) -> None:
        """Hook called after every jitted multi-step call (subclasses:
        BuFF tree consolidation)."""

    def on_host_metrics(self, metrics: dict, step: int) -> None:
        """Hook called with freshly fetched host metrics at print cadence
        (subclasses: BuFF chord-cap monitoring)."""

    def _log_depth_projection(self, step: int, max_rays: int = 2048) -> None:
        """Predicted-vs-target depth point cloud as a TB mesh every
        `logging.projection_step_size` steps (reference: LoggerDepthProjection,
        src/nerf/loggers.py:7-31, wired at src/models/model_buff.py:26-29).

        The reference projects the live training batch; here the hot loop is
        one jitted program with no host-visible batch, so a deterministic
        ~`max_rays`-ray probe of train view 0 is rendered and fetched at the
        same cadence instead (one small transfer per projection step)."""
        from nerfmeshes_tpu.utils.loggers import DepthProjectionLogger

        if getattr(self, "_proj_logger", None) is None:
            self._proj_logger = DepthProjectionLogger(step_size=1)
        origins, directions = self.train_dataset.image_rays(0)
        stride = max(1, int(directions.shape[0]) // max_rays)
        o, d = origins[::stride], directions[::stride]
        near, far = np.asarray(self.train_dataset._bounds_for(0)).reshape(-1)[:2]
        coarse, fine = render_image(
            self._render_chunk,
            self.state.params,
            o,
            d,
            float(near),
            float(far),
            chunk_size=self._chunk(
                min(int(self.cfg.nerf.validation.chunksize), d.shape[0])
            ),
            fields=("depth_map",),
        )
        finest = fine if fine is not None else coarse
        depth_target = None
        if self.train_dataset.bundle.target_depth is not None:
            depth_target = np.asarray(
                self.train_dataset.bundle.target_depth[0]
            ).reshape(-1)[::stride]
        self._proj_logger.tick(
            self.logger._tb,
            step,
            np.asarray(o),
            np.asarray(d),
            finest.depth_map,
            depth_target,
        )

    def checkpoint_extra(self) -> dict:
        return {}

    def _check_early_stopping(self, metrics, step: int):
        """Abort on color collapse at the configured step (reference:
        src/models/model_base.py:179-187)."""
        exp = self.cfg.experiment
        if not exp.use_early_stopping:
            return
        if abs(step - int(exp.early_stopping_step)) < int(exp.steps_per_call):
            rgb_sum = float(metrics["train/rgb_sum"])
            if rgb_sum < 1e-12:
                print(
                    f"Model is stuck in local minima, collapsing to {rgb_sum}; exiting.",
                    flush=True,
                )
                sys.exit(-1)

    # -- persistence -----------------------------------------------------------------
    def save(self, val_loss: Optional[float] = None):
        self.ckpt.save(self.state, val_loss=val_loss, extra=self.checkpoint_extra())

    def restore(self, step: Optional[int] = None, last: bool = False):
        self.state, extra = self.ckpt.restore(
            self.state, step=step, last=last, extra_template=self.checkpoint_extra() or None
        )
        # Restored arrays come back committed to one device; the sharded
        # train/render programs need them replicated over the mesh (a
        # committed single-device placement is a hard error under
        # shard_map, not a silent transfer).
        self.state = self._replicate(self.state)
        self.load_checkpoint_extra(extra)
        return self

    def load_checkpoint_extra(self, extra: dict):
        pass
