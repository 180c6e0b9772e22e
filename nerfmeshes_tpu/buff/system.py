"""BuFFSystem — training system for unstructured radiance volumes.

The analog of the reference's BuFFModel (src/models/model_buff.py): a
single radiance field whose depth samples come from the adaptive AABB tree
where rays hit active voxels (stratified fallback elsewhere), with rendered
weights integrated back into the tree each step and periodic host-side
consolidation.

The jitted step threads the functional TreeState (voxels/active are
constants per consolidation epoch; memm/counter update on device), so
training stays a single XLA program between consolidations.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerfmeshes_tpu.buff.tree import (
    TreeSampling,
    TreeState,
    integrate,
    ray_voxel_intersect,
)
from nerfmeshes_tpu.ops.math import img2mse, mse2psnr

from nerfmeshes_tpu.ops.render import volume_render
from nerfmeshes_tpu.ops.sampling import ray_sample_interval
from nerfmeshes_tpu.train.render import RenderSettings, _apply_field
from nerfmeshes_tpu.parallel.mesh import DATA_AXIS
from nerfmeshes_tpu.train.step import (
    TrainState,
    _merge_img_pix_keys,
    _sample_ray_batch,
)
from nerfmeshes_tpu.train.system import NeRFSystem


def buff_render_rays(
    model,
    params,
    tree_state: TreeState,
    origins,
    directions,
    near,
    far,
    settings: RenderSettings,
    *,
    train: bool,
    use_random_sampling: bool,
    key: Optional[jax.Array] = None,
    max_chords: int = 0,
):
    """Tree-sampled render of a ray batch (reference: BuFFModel.forward,
    src/models/model_buff.py:34-69). Returns
    (bundle, voxel_idx, ray_mask, dropped_chords)."""
    R = directions.shape[0]
    if key is None:
        key = jax.random.key(0)
    k_perturb, k_vox, k_noise, k_field = jax.random.split(key, 4)

    origins_b = jnp.broadcast_to(jnp.reshape(origins, (-1, 3)), (R, 3))
    stratified = ray_sample_interval(
        settings.num_coarse,
        R,
        near,
        far,
        lindisp=settings.lindisp,
        perturb=settings.perturb and train,
        key=k_perturb,
    )
    z_tree, voxel_idx, ray_mask, dropped = ray_voxel_intersect(
        tree_state.voxels,
        tree_state.active,
        origins_b,
        directions,
        near,
        far,
        samples_count=settings.num_coarse,
        use_random_sampling=use_random_sampling,
        key=k_vox,
        max_chords=max_chords,
    )
    intervals = jnp.where(ray_mask[:, None], z_tree, stratified)

    field = _apply_field(
        model, params, origins_b, directions, intervals,
        use_fused=settings.use_fused_kernel, inference=not train,
        key=k_field,
    )
    bundle = volume_render(
        field,
        intervals,
        directions,
        train=train,
        radiance_field_noise_std=settings.radiance_field_noise_std if train else 0.0,
        white_background=settings.white_background,
        attenuation_threshold=settings.attenuation_threshold,
        key=k_noise,
        channels_first=True,
    )
    return bundle, voxel_idx, ray_mask, dropped


class BuffCarry(NamedTuple):
    train: TrainState
    tree: TreeState


def make_buff_train_step(
    cfg,
    model,
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
    """Jitted BuFF train step: sample rays -> tree-sampled render -> MSE ->
    update; then (past the integration offset) fold weights into the tree.

    `force_shard=True` builds the full sharded program (shard_map +
    axis_index key folding + pmean/psum collectives) even on a size-1
    mesh — the exact multi-chip program on a 1-element axis; bench.py
    uses it for the BuFF sharded-vs-unsharded A/B on the one real chip
    (mirrors train/step.py:make_train_step)."""
    settings = RenderSettings.from_cfg(cfg, train=True)
    num_rays = int(cfg.nerf.train.num_random_rays)
    use_ndc = bool(cfg.dataset.use_ndc)
    sample_all = bool(cfg.nerf.train.get("sample_all_images", False))
    use_random = bool(cfg.tree.use_random_sampling)
    max_chords = int(cfg.tree.get("max_chords_per_ray", 0))
    offset = int(cfg.tree.step_size_integration_offset)
    if steps_per_call is None:
        steps_per_call = int(cfg.experiment.steps_per_call)

    from nerfmeshes_tpu.train.optim import accumulation_steps, build_schedule

    schedule = build_schedule(cfg)
    accum = accumulation_steps(cfg)

    n_shards = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
    if num_rays % max(n_shards, 1) != 0:
        raise ValueError(
            f"num_random_rays {num_rays} must be divisible by the mesh size {n_shards}"
        )
    local_rays = num_rays // max(n_shards, 1)
    sharded_body = n_shards > 1 or (force_shard and mesh is not None)
    axis_name = DATA_AXIS if sharded_body else None

    def loss_fn(params, tree_state, origins, directions, targets, near, far,
                depth_tgt, key):
        bundle, voxel_idx, ray_mask, dropped = buff_render_rays(
            model,
            params,
            tree_state,
            origins,
            directions,
            near,
            far,
            settings,
            train=True,
            use_random_sampling=use_random,
            key=key,
            max_chords=max_chords,
        )
        loss = img2mse(bundle.rgb_map, targets)
        metrics = {
            "train/loss": loss,
            "train/psnr": mse2psnr(loss),
            "train/rgb_sum": jnp.sum(bundle.rgb_map),
            # Chords beyond the per-ray compaction cap this step (per-device
            # batch sum; pmean'd across shards like every metric). Nonzero
            # means the sampler is losing geometry — BuFFSystem warns and
            # auto-doubles the cap at the next consolidation.
            "train/dropped_chords": jnp.sum(dropped).astype(jnp.float32),
        }
        if depth_tgt is not None:
            from nerfmeshes_tpu.train.step import depth_loss_metrics

            metrics.update(
                depth_loss_metrics(
                    "train", bundle.rgb_map, targets, bundle.depth_map, depth_tgt
                )
            )
        aux = {
            "weights": bundle.weights,
            "mask_weights": bundle.mask_weights,
            "voxel_idx": voxel_idx,
            "ray_mask": ray_mask,
            "metrics": metrics,
        }
        return loss, aux

    def one_step(carry: BuffCarry, data):
        """Per-device step body. Under shard_map each device renders its
        own ray slice of the SAME image (key folded with the mesh axis
        index, matching train/step.py), grads/metrics/voxel-accumulators
        reduce over ICI — the pallas kernel runs locally per device."""
        state, tree_state = carry
        key, k_sample, k_render = jax.random.split(state.key, 3)
        if sharded_body:
            shard = jax.lax.axis_index(DATA_AXIS)
            k_img, k_pix = jax.random.split(k_sample)
            k_pix = jax.random.fold_in(k_pix, shard)
            k_sample = _merge_img_pix_keys(k_img, k_pix)
            k_render = jax.random.fold_in(k_render, shard)
        origins, directions, targets, near, far, depth_tgt = _sample_ray_batch(
            data, k_sample, H=H, W=W, focal=focal, num_rays=local_rays,
            use_ndc=use_ndc, intrinsics=intrinsics,
            sample_all_images=sample_all,
        )
        grads, aux = jax.grad(loss_fn, has_aux=True)(
            state.params["coarse"],
            tree_state,
            origins,
            directions,
            targets,
            near,
            far,
            depth_tgt,
            k_render,
        )
        if sharded_body:
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.pmean(g, DATA_AXIS), grads
            )
            aux["metrics"] = jax.tree_util.tree_map(
                lambda m: jax.lax.pmean(m, DATA_AXIS), aux["metrics"]
            )
        updates, opt_state = optimizer.update(
            {"coarse": grads, "fine": {}}, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)

        # Ray-batch integration once the scene has begun to resolve
        # (reference: tree.py:185-188 gates on the offset).
        tree_state = jax.lax.cond(
            state.step >= offset,
            lambda ts: integrate(
                ts,
                aux["voxel_idx"],
                jax.lax.stop_gradient(aux["weights"]),
                jax.lax.stop_gradient(aux["mask_weights"]),
                aux["ray_mask"],
                axis_name=axis_name,
            ),
            lambda ts: ts,
            tree_state,
        )

        metrics = dict(aux["metrics"])
        metrics["train/lr"] = schedule(state.step // accum)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1, key=key
        )
        return BuffCarry(new_state, tree_state), metrics

    def multi_step(carry: BuffCarry, data):
        if steps_per_call == 1:
            return one_step(carry, data)
        carry, metrics = jax.lax.scan(
            lambda c, _: one_step(c, data), carry, None, length=steps_per_call
        )
        out = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        # dropped_chords SUMS over the scanned steps (not last-step only):
        # a cap that binds intermittently inside a call must still be seen.
        out["train/dropped_chords"] = jnp.sum(metrics["train/dropped_chords"])
        return carry, out

    from jax.sharding import PartitionSpec as P

    from nerfmeshes_tpu.parallel.mesh import maybe_shard

    # Params/tree/data replicated; the ray axis exists only inside the
    # per-device body (pallas kernels run as-is per device), collectives =
    # grad/metric pmean + voxel-accumulator psum.
    sharded = maybe_shard(
        multi_step, mesh, (P(), P()), (P(), P()), force=force_shard
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


class BuFFSystem(NeRFSystem):
    """NeRFSystem with tree sampling; selected by cfg.experiment.model ==
    'BuFFModel' (see nerfmeshes_tpu.train.factory.build_system)."""

    def __init__(self, cfg, paths=None, mesh=None):
        # BuFF uses a single model: disable the fine network regardless of
        # cfg.models.use_fine (the reference's BuFFModel builds only
        # cfg.models.coarse, src/models/model_buff.py:17).
        cfg = cfg.clone() if hasattr(cfg, "clone") else cfg
        cfg.models.use_fine = False
        super().__init__(cfg, paths, mesh)
        self.tree = TreeSampling(cfg)
        self.tree_state = self._replicate(self.tree.device_state())

    def setup(self, train_dataset=None, val_dataset=None):
        super().setup(train_dataset, val_dataset)
        self._build_train_fn()
        self._render_chunk = self._build_render_chunk()
        return self

    def _build_train_fn(self) -> None:
        H, W, focal = self.train_dataset.hwf
        buff_fn = make_buff_train_step(
            self.cfg,
            self.coarse,
            self.optimizer,
            H=int(H),
            W=int(W),
            focal=float(focal),
            mesh=self.mesh,
            intrinsics=self.train_dataset.intrinsics(),
        )

        def train_fn(state, data):
            carry, metrics = buff_fn(BuffCarry(state, self.tree_state), data)
            self.tree_state = carry.tree
            # Pipeline the dropped-chords counter to the host: start an async
            # copy now, read the PREVIOUS call's value in on_step. Reading the
            # fresh value would block on this call's whole computation; the
            # previous one is already materialized, so the check is free and
            # the cap grows within one steps_per_call window of a drop.
            d = metrics["train/dropped_chords"]
            try:
                d.copy_to_host_async()
            except AttributeError:
                pass
            self._dropped_prev, self._dropped_cur = (
                getattr(self, "_dropped_cur", None), d
            )
            return carry.train, metrics

        self._train_fn = train_fn

    # -- chord-cap observability ---------------------------------------------
    def _effective_max_chords(self) -> int:
        from nerfmeshes_tpu.buff.tree import AUTO_CHORD_CAP

        configured = int(self.cfg.tree.get("max_chords_per_ray", 0))
        if configured > 0:
            return configured
        return AUTO_CHORD_CAP

    def on_host_metrics(self, metrics: dict, step: int) -> None:
        self._note_dropped(float(metrics.get("train/dropped_chords", 0.0)), step)

    def _note_dropped(self, dropped: float, step: int) -> None:
        """React to a nonzero dropped-chords counter: warn and double the
        cap immediately (one recompile, at most log2(capacity) times) —
        waiting for the next consolidation would drop geometry for
        thousands of steps. Reached per call via the async counter
        pipeline (on_step) and at print cadence (on_host_metrics); the
        step guard keeps the two paths from double-doubling on the same
        observation."""
        if dropped <= 0:
            return
        if getattr(self, "_grew_at_step", None) == step:
            return
        if self._effective_max_chords() >= self._chord_cap_ceiling():
            # Cap pinned — at tree capacity (cannot bind there: K is
            # clamped to V, so every chord fits) or at the configured
            # max_chord_cap workspace ceiling. Warn once, not every call.
            if not getattr(self, "_warned_capped", False):
                self._warned_capped = True
                print(
                    f"WARNING: BuFF dropped {dropped:.0f} chords at step "
                    f"{step} with the cap at its ceiling "
                    f"({self._chord_cap_ceiling()}); not growing further — "
                    "raise tree.max_chord_cap to trade compile workspace "
                    "for exactness.",
                    flush=True,
                )
            return
        print(
            f"WARNING: BuFF chord cap binding at step {step}: "
            f"{dropped:.0f} ray/voxel chords dropped "
            f"(max_chords_per_ray={self._effective_max_chords()}); "
            "doubling the cap now.",
            flush=True,
        )
        self._grew_at_step = step
        self._grow_chord_cap()

    def setup_eval(self, val_dataset=None):
        if val_dataset is not None:
            self.val_dataset = val_dataset
        self._render_chunk = self._build_render_chunk()
        return self

    def _build_render_chunk(self):
        # Validation/query path renders through the tree as well. The tree
        # state is passed per call (a jit-closure capture would go stale
        # after consolidation). With a device mesh the chunk's ray axis is
        # sharded (params + tree replicated) like make_render_chunk.
        settings = RenderSettings.from_cfg(self.cfg, train=False)
        use_random = bool(self.cfg.tree.use_random_sampling)
        max_chords = int(self.cfg.tree.get("max_chords_per_ray", 0))

        def body(params, tree_state, origins, directions, near, far):
            bundle, _, _, _ = buff_render_rays(
                self.coarse,
                params["coarse"],
                tree_state,
                origins,
                directions,
                near,
                far,
                settings,
                train=False,
                use_random_sampling=use_random,
                max_chords=max_chords,
            )
            return bundle, None

        from jax.sharding import PartitionSpec as P

        from nerfmeshes_tpu.parallel.mesh import maybe_shard

        body = maybe_shard(
            body, self.mesh,
            (P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(), P()), P(DATA_AXIS),
        )
        render_chunk_with_tree = jax.jit(body)

        return lambda params, o, d, near, far: render_chunk_with_tree(
            params, self.tree_state, o, d, near, far
        )

    def query_rgb(self, origins, directions, near, far, chunk: int = 65536,
                  as_uint8: bool = False):
        """Batched rgb-only query through the tree renderer (one program,
        tree state passed per call so consolidation never goes stale).
        `as_uint8` fetches device-quantized uint8 (4x less tunnel traffic)."""
        import jax.numpy as jnp
        import numpy as np

        from nerfmeshes_tpu.train.step import chunk_rays_for_batched

        if getattr(self, "_render_rgb_buff", None) is None:
            self._render_rgb_buff = {}
        if as_uint8 not in self._render_rgb_buff:
            settings = RenderSettings.from_cfg(self.cfg, train=False)
            use_random = bool(self.cfg.tree.use_random_sampling)
            max_chords = int(self.cfg.tree.get("max_chords_per_ray", 0))

            def loop_body(params, tree_state, origins, directions, near, far):
                def body(od):
                    o, d = od
                    bundle, _, _, _ = buff_render_rays(
                        self.coarse, params["coarse"], tree_state, o, d,
                        near, far, settings, train=False,
                        use_random_sampling=use_random,
                        max_chords=max_chords,
                    )
                    return bundle.rgb_map

                return jax.lax.map(body, (origins, directions))

            from jax.sharding import PartitionSpec as P

            from nerfmeshes_tpu.parallel.mesh import maybe_shard

            loop_body = maybe_shard(
                loop_body, self.mesh,
                (P(), P(), P(None, DATA_AXIS), P(None, DATA_AXIS), P(), P()),
                P(None, DATA_AXIS),
            )

            @jax.jit
            def render_rgb(params, tree_state, origins, directions, near, far):
                out = loop_body(params, tree_state, origins, directions, near, far)
                out = out.reshape(-1, out.shape[-1])
                if as_uint8:
                    out = jnp.round(
                        jnp.clip(out, 0.0, 1.0) * 255.0
                    ).astype(jnp.uint8)
                return out

            self._render_rgb_buff[as_uint8] = render_rgb
        o, d, n = chunk_rays_for_batched(origins, directions, self._chunk(chunk))
        out = self._render_rgb_buff[as_uint8](
            self.state.params, self.tree_state, jnp.asarray(o), jnp.asarray(d),
            float(near), float(far),
        )
        return np.asarray(out)[:n]

    def on_step(self, step: int) -> None:
        # Previous call's dropped-chords counter (already on host via the
        # async copy started in train_fn — reading it does not stall the
        # dispatch pipeline).
        prev = getattr(self, "_dropped_prev", None)
        if prev is not None:
            self._note_dropped(float(prev), step)
        spc = int(self.cfg.experiment.steps_per_call)
        # Fire when a consolidation boundary fell inside this jitted call.
        boundary = self.tree.integration_offset + self.tree.step_size_tree
        if step >= boundary:
            cur = step - self.tree.integration_offset
            if cur % self.tree.step_size_tree < spc:
                self._log_tree(step)
                memm = np.asarray(self.tree_state.memm)
                self.tree_state = self._replicate(self.tree.consolidate(memm))
                self._log_tree(step + 1)

    def _chord_cap_ceiling(self) -> int:
        """Upper bound for the auto-doubling: tree capacity (K>V cannot
        bind) or the configured compile-workspace ceiling, whichever is
        smaller."""
        return min(
            self.tree.capacity, int(self.cfg.tree.get("max_chord_cap", 256))
        )

    def _grow_chord_cap(self) -> None:
        """Double max_chords_per_ray after observed drops and rebuild the
        jitted functions (one recompile; at most log2(capacity) times —
        the kernel clamps K to the voxel capacity)."""
        # Counters produced under the old cap must not trigger a second
        # doubling after this one.
        self._dropped_prev = self._dropped_cur = None
        cur = self._effective_max_chords()
        ceiling = self._chord_cap_ceiling()
        if cur >= ceiling:
            # Workspace guard: compaction materializes R x _SLAB_V x K (+ an
            # R x K x K append shift on the slab path); doubling K without
            # bound would recreate the compile wall mid-run. Keep training
            # with drops rather than wedging the tunnel compiler.
            print(
                f"BuFF: chord cap {cur} at its ceiling ({ceiling}); further "
                "drops will NOT grow it — raise tree.max_chord_cap to trade "
                "compile workspace for exactness.",
                flush=True,
            )
            return
        new = min(2 * cur, ceiling)
        print(
            f"BuFF: raising tree.max_chords_per_ray {cur} -> {new} "
            "(dropped chords observed; recompiling the train step).",
            flush=True,
        )
        self.cfg.tree.max_chords_per_ray = new
        if self.paths is not None:
            # Persist the effective cap: a later eval/mesh session reloads
            # this run's hparams.yaml and must see the grown cap, or trees
            # deeper than the original cap silently lose chords at eval.
            from nerfmeshes_tpu.config.paths import save_hparams

            save_hparams(self.cfg, self.paths)
        self._build_train_fn()
        self._render_chunk = self._build_render_chunk()
        self._render_rgb_buff = None

    def _log_tree(self, step: int) -> None:
        """Voxel mesh + sorted-memm curve to TB (the reference logs these
        every training step, src/models/model_buff.py:100-107; we log at
        consolidation boundaries to keep the hot loop host-free)."""
        if self.logger is None or self.logger._tb is None:
            return
        from nerfmeshes_tpu.utils.loggers import TreeLogger, TreeWeightsLogger

        active = np.asarray(self.tree_state.active)
        TreeLogger().tick(
            self.logger._tb, step, np.asarray(self.tree_state.voxels), active
        )
        TreeWeightsLogger().tick(
            self.logger._tb, step, np.asarray(self.tree_state.memm), active
        )

    def mesh_mask_aabbs(self) -> "np.ndarray":
        """(V, 2, 3) active-leaf AABBs — the field's supervised support.
        The mesh path (mesh/extract.py) restricts extraction to these:
        density outside the tree is never sampled by a training chord, so
        it is unconstrained and sheds floaters (the reference's mesh path
        would inherit the same artifact for its BuFF model)."""
        return np.stack([np.stack([l.lo, l.hi]) for l in self.tree.leaves])

    def checkpoint_extra(self) -> dict:
        return {"tree": self.tree.serialize(self.tree_state)}

    def load_checkpoint_extra(self, extra: dict) -> None:
        if "tree" in extra:
            self.tree_state = self._replicate(self.tree.deserialize(extra["tree"]))
